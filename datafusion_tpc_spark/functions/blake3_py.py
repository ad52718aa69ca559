"""Pure-Python BLAKE3 (hash mode only) — public spec
(https://github.com/BLAKE3-team/BLAKE3-specs, the reference_impl
structure: chunk states, a chaining-value stack, deferred-root Output).

The reference engine links blake3 through its Rust `digest` dependency
(reference Cargo.lock:1222-1223); this container has no blake3 wheel
and no network, so q_fn_blake3 falls back to this implementation.
Python-speed hashing is the documented slow path — functions/digests.py
prefers the wheel when importable — but the algorithm is bit-exact
(spec test vectors in tests/test_sources_and_skew.py), which is what
the parity surface needs.
"""

from __future__ import annotations

import struct

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
_CHUNK_START, _CHUNK_END, _PARENT, _ROOT = 1, 2, 4, 8
_MASK = 0xFFFFFFFF


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & _MASK


def _g(s, a, b, c, d, mx, my):
    s[a] = (s[a] + s[b] + mx) & _MASK
    s[d] = _rotr(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotr(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b] + my) & _MASK
    s[d] = _rotr(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotr(s[b] ^ s[c], 7)


def _compress(cv, block_words, counter, block_len, flags):
    s = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        _IV[0], _IV[1], _IV[2], _IV[3],
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        _g(s, 0, 4, 8, 12, m[0], m[1])
        _g(s, 1, 5, 9, 13, m[2], m[3])
        _g(s, 2, 6, 10, 14, m[4], m[5])
        _g(s, 3, 7, 11, 15, m[6], m[7])
        _g(s, 0, 5, 10, 15, m[8], m[9])
        _g(s, 1, 6, 11, 12, m[10], m[11])
        _g(s, 2, 7, 8, 13, m[12], m[13])
        _g(s, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[p] for p in _PERM]
    return [
        *(s[i] ^ s[i + 8] for i in range(8)),
        *(s[i + 8] ^ cv[i] for i in range(8)),
    ]


def _words(block: bytes):
    block = block.ljust(64, b"\x00")
    return struct.unpack("<16I", block)


class _Output:
    """A node whose compression is deferred until we know whether it is
    the tree root (the ROOT flag changes the digest)."""

    __slots__ = ("cv", "block_words", "counter", "block_len", "flags")

    def __init__(self, cv, block_words, counter, block_len, flags):
        self.cv = cv
        self.block_words = block_words
        self.counter = counter
        self.block_len = block_len
        self.flags = flags

    def chaining_value(self):
        return _compress(
            self.cv, self.block_words, self.counter, self.block_len, self.flags
        )[:8]

    def root_hex(self) -> str:
        out = _compress(
            self.cv, self.block_words, 0, self.block_len, self.flags | _ROOT
        )[:8]
        return struct.pack("<8I", *out).hex()


def _chunk_output(chunk: bytes, chunk_index: int) -> _Output:
    cv = list(_IV)
    blocks = [chunk[i : i + 64] for i in range(0, len(chunk), 64)] or [b""]
    for i, blk in enumerate(blocks):
        flags = (_CHUNK_START if i == 0 else 0) | (
            _CHUNK_END if i == len(blocks) - 1 else 0
        )
        if i == len(blocks) - 1:
            return _Output(cv, _words(blk), chunk_index, len(blk), flags)
        cv = _compress(cv, _words(blk), chunk_index, len(blk), flags)[:8]
    raise AssertionError("unreachable")


def _parent_output(left_cv, right_cv) -> _Output:
    return _Output(list(_IV), (*left_cv, *right_cv), 0, 64, _PARENT)


def blake3_hex(data: bytes) -> str:
    """32-byte BLAKE3 digest, hex-encoded."""
    chunks = [data[i : i + 1024] for i in range(0, len(data), 1024)] or [b""]
    cv_stack: list[list[int]] = []
    for idx, chunk in enumerate(chunks[:-1]):
        cv = _chunk_output(chunk, idx).chaining_value()
        total = idx + 1
        while total & 1 == 0:
            cv = _parent_output(cv_stack.pop(), cv).chaining_value()
            total >>= 1
        cv_stack.append(cv)
    output = _chunk_output(chunks[-1], len(chunks) - 1)
    while cv_stack:
        output = _parent_output(cv_stack.pop(), output.chaining_value())
    return output.root_hex()
