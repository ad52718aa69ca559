"""Avro source without the spark-avro jar — Spark 4 Python DataSource.

The reference ships AvroExec via DataFusion 19 (reference Cargo.toml:15,
SURVEY §2.1 Tier B). spark-avro is an external Scala module whose jar is
not in this container and cannot be fetched (no network), so this module
implements the Avro Object Container File format (public spec,
https://avro.apache.org/docs/current/specification/) in pure Python and
exposes it through Spark 4's Python DataSource API — the idiomatic
jar-less extension point: `spark.dataSource.register(PyAvroDataSource)`
then `spark.read.format("pyavro").load(path)`.

Scale shape:
- `schema()` reads ONE file header (Avro is self-describing — schema
  discovery is a ~KB read, not a data scan).
- `partitions()` walks each file's block index with seeks only (two
  varints + skip per block — O(blocks) metadata I/O, not O(bytes)), and
  emits ONE InputPartition PER BLOCK: Avro's 16-byte sync markers exist
  precisely to make container files splittable, so a single large file
  still fans out across executors — same split story as Spark's own
  AvroFileFormat.
- `read()` runs on executors: seek to the block, inflate (null/deflate
  codecs), decode `count` rows. No driver data path anywhere.

Supported types (covers the TPC fixture surface): null, boolean, int,
long, float, double, bytes, string, top-level record, and 2-branch
null unions (nullable fields). Unsupported schemas raise at schema().
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_MAGIC = b"Obj\x01"
_SYNC_SIZE = 16


# ---- binary primitive codec (Avro spec §"Binary encoding") ------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _read_varint_stream(f) -> int | None:
    shift, acc = 0, 0
    while True:
        raw = f.read(1)
        if not raw:
            return None  # clean EOF before a varint = end of file
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (acc >> 1) ^ -(acc & 1)
        shift += 7


def _encode_value(schema, v) -> bytes:
    if isinstance(schema, list):  # union — fixture surface: [null, X]
        if v is None:
            idx = schema.index("null")
            return _zigzag_encode(idx)
        idx = 1 if schema[0] == "null" else 0
        return _zigzag_encode(idx) + _encode_value(schema[idx], v)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _zigzag_encode(int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t in ("bytes", "string"):
        raw = v.encode("utf-8") if t == "string" else bytes(v)
        return _zigzag_encode(len(raw)) + raw
    if t == "record":
        return b"".join(
            _encode_value(fld["type"], v[fld["name"]]) for fld in schema["fields"]
        )
    raise ValueError(f"unsupported avro type for encode: {t!r}")


def _make_decoder(schema):
    """Compile a schema into a `(buf, pos) -> (value, pos)` decoder."""
    if isinstance(schema, list):
        branches = [_make_decoder(s) for s in schema]

        def dec_union(buf, pos):
            idx, pos = _read_varint(buf, pos)
            return branches[idx](buf, pos)

        return dec_union
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return lambda buf, pos: (None, pos)
    if t == "boolean":
        return lambda buf, pos: (buf[pos] == 1, pos + 1)
    if t in ("int", "long"):
        return _read_varint
    if t == "float":
        return lambda buf, pos: (struct.unpack_from("<f", buf, pos)[0], pos + 4)
    if t == "double":
        return lambda buf, pos: (struct.unpack_from("<d", buf, pos)[0], pos + 8)
    if t == "bytes":

        def dec_bytes(buf, pos):
            n, pos = _read_varint(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n

        return dec_bytes
    if t == "string":

        def dec_str(buf, pos):
            n, pos = _read_varint(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n

        return dec_str
    if t == "record":
        field_decs = [_make_decoder(fld["type"]) for fld in schema["fields"]]

        def dec_record(buf, pos):
            out = []
            for d in field_decs:
                v, pos = d(buf, pos)
                out.append(v)
            return tuple(out), pos

        return dec_record
    raise ValueError(f"unsupported avro type for decode: {t!r}")


# ---- container file writer (driver-side; fixtures + tests) ------------


def _write_ocf(path, schema, row_iter, rows_per_block, codec) -> int:
    """Stream rows into an OCF: shared by the driver-side fixture
    writer (write_avro) and the executor-side task writer
    (PyAvroWriter) so the framing — magic, metadata map,
    schema-derived sync marker, block encoding — has exactly one
    implementation. Buffers one block at a time (bounded memory at
    any partition size). Returns the row count."""
    schema_json = json.dumps(schema, sort_keys=True)
    sync = hashlib.md5(b"pyavro-sync|" + schema_json.encode()).digest()
    meta = {"avro.schema": schema_json, "avro.codec": codec}
    n_rows = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(_zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            kb, vb = k.encode(), v.encode()
            f.write(_zigzag_encode(len(kb)) + kb)
            f.write(_zigzag_encode(len(vb)) + vb)
        f.write(_zigzag_encode(0))  # end of metadata map
        f.write(sync)
        block: list[bytes] = []

        def flush():
            if not block:
                return
            payload = b"".join(block)
            if codec == "deflate":
                comp = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate
                payload = comp.compress(payload) + comp.flush()
            f.write(_zigzag_encode(len(block)))
            f.write(_zigzag_encode(len(payload)))
            f.write(payload)
            f.write(sync)
            block.clear()

        for r in row_iter:
            block.append(_encode_value(schema, r))
            n_rows += 1
            if len(block) >= rows_per_block:
                flush()
        flush()
    return n_rows


def write_avro(
    path: str,
    schema: dict,
    rows: list[dict],
    rows_per_block: int = 8,
    codec: str = "deflate",
) -> None:
    """Write an Avro Object Container File. Multi-block on purpose
    (rows_per_block small) so the reader's per-block splits are
    exercised by every fixture. Sync marker is derived from the schema
    (deterministic — no RNG, byte-replayable fixtures)."""
    _write_ocf(path, schema, iter(rows), rows_per_block, codec)


# ---- container file header / block index ------------------------------


def read_header(path: str) -> tuple[dict, str, bytes, int]:
    """Parse magic + metadata map + sync. Returns (schema, codec, sync,
    offset-of-first-block). Reads only the header bytes."""
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        meta: dict[str, bytes] = {}
        while True:
            n = _read_varint_stream(f)
            if n is None:
                raise ValueError(f"{path}: truncated header")
            if n == 0:
                break
            if n < 0:  # negative count prefixes a byte-size long — skip it
                _read_varint_stream(f)
                n = -n
            for _ in range(n):
                klen = _read_varint_stream(f)
                k = f.read(klen).decode()
                vlen = _read_varint_stream(f)
                meta[k] = f.read(vlen)
        sync = f.read(_SYNC_SIZE)
        schema = json.loads(meta["avro.schema"].decode())
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise ValueError(f"{path}: unsupported avro codec {codec!r}")
        return schema, codec, sync, f.tell()


def block_index(path: str, first_block: int) -> list[tuple[int, int, int]]:
    """Seek-walk the block chain: [(offset, row_count, byte_size)].
    O(blocks) I/O — reads two varints per block and skips the payload."""
    out = []
    with open(path, "rb") as f:
        f.seek(first_block)
        while True:
            off = f.tell()
            count = _read_varint_stream(f)
            if count is None:
                return out
            size = _read_varint_stream(f)
            out.append((off, count, size))
            f.seek(size + _SYNC_SIZE, io.SEEK_CUR)


def avro_to_ddl(schema: dict) -> str:
    """Top-level record schema → Spark DDL string."""
    prim = {
        "boolean": "boolean",
        "int": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "bytes": "binary",
        "string": "string",
    }

    def one(s) -> str:
        if isinstance(s, list):
            non_null = [b for b in s if b != "null"]
            if len(non_null) != 1:
                raise ValueError(f"unsupported union {s!r}")
            return one(non_null[0])
        t = s["type"] if isinstance(s, dict) else s
        if t in prim:
            return prim[t]
        raise ValueError(f"unsupported avro type {t!r}")

    return ", ".join(f"{fld['name']} {one(fld['type'])}" for fld in schema["fields"])


# ---- Spark 4 Python DataSource ----------------------------------------


class _AvroBlockPartition(InputPartition):
    def __init__(self, path: str, offset: int):
        self.path = path
        self.offset = offset


class PyAvroReader(DataSourceReader):
    def __init__(self, options: dict):
        self._paths = _expand(options["path"])

    def partitions(self):
        parts = []
        for p in self._paths:
            _, _, _, first = read_header(p)
            for off, _count, _size in block_index(p, first):
                parts.append(_AvroBlockPartition(p, off))
        return parts

    def read(self, partition: _AvroBlockPartition):
        schema, codec, _sync, _ = read_header(partition.path)
        dec = _make_decoder(schema)
        with open(partition.path, "rb") as f:
            f.seek(partition.offset)
            count = _read_varint_stream(f)
            size = _read_varint_stream(f)
            payload = f.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        pos = 0
        for _ in range(count):
            row, pos = dec(payload, pos)
            yield row


def spark_schema_to_avro(schema) -> dict:
    """Spark StructType → top-level Avro record schema (inverse of
    avro_to_ddl; same supported surface). Nullable fields become
    2-branch null unions."""
    prim = {
        "boolean": "boolean",
        "integer": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "binary": "bytes",
        "string": "string",
    }
    fields = []
    for f in schema.fields:
        t = f.dataType.typeName()
        if t not in prim:
            raise ValueError(f"unsupported spark type for avro write: {t!r}")
        fields.append(
            {"name": f.name, "type": ["null", prim[t]] if f.nullable else prim[t]}
        )
    return {"type": "record", "name": "row", "fields": fields}


class _AvroPartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class PyAvroWriter(DataSourceWriter):
    """Distributed OCF writer: each task encodes its partition into one
    part-*.avro file (the shared write_avro block encoder — deflate
    blocks + deterministic sync markers), the driver commits by
    writing a _SUCCESS marker listing the parts. This is the write
    path the reference left as todo!() (reference
    src/object_store/file.rs:215-228,303-309), expressed through the
    same exactly-once protocol as streaming/py_sink.py: task output
    becomes visible only at driver commit; abort removes orphans."""

    def __init__(self, options: dict, schema, overwrite: bool):
        self._dir = options["path"]
        self._avro_schema = spark_schema_to_avro(schema)
        self._names = [f.name for f in schema.fields]
        if overwrite and os.path.isdir(self._dir):
            import shutil

            shutil.rmtree(self._dir, ignore_errors=True)
        os.makedirs(self._dir, exist_ok=True)

    def write(self, iterator) -> _AvroPartFile:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(self._dir, f"part-{pid:05d}.avro")
        # Stream through the shared OCF encoder — the task never
        # materializes its whole partition (one block in memory).
        n_rows = _write_ocf(
            path,
            self._avro_schema,
            (dict(zip(self._names, r)) for r in iterator),
            rows_per_block=256,
            codec="deflate",
        )
        return _AvroPartFile(path, n_rows)

    def commit(self, messages) -> None:
        parts = sorted(m.path for m in messages if m is not None)
        with open(os.path.join(self._dir, "_SUCCESS"), "w") as f:
            f.write("\n".join(os.path.basename(p) for p in parts))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class PyAvroDataSource(DataSource):
    """`spark.read.format("pyavro").load(path)` — path may be a file,
    a directory of .avro files, or a glob — and
    `df.write.format("pyavro").option("path", dir).save()`."""

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self) -> str:
        paths = _expand(self.options["path"])
        avro_schema, _, _, _ = read_header(paths[0])
        return avro_to_ddl(avro_schema)

    def reader(self, schema) -> PyAvroReader:
        return PyAvroReader(self.options)

    def writer(self, schema, overwrite: bool) -> PyAvroWriter:
        return PyAvroWriter(self.options, schema, overwrite)


def _expand(path: str) -> list[str]:
    import glob as g

    if os.path.isdir(path):
        # Manifest-gated visibility: a directory written by
        # PyAvroWriter lists its committed parts in _SUCCESS — trust
        # the manifest, never the listing, so an orphan part from a
        # failed task (whose commit message never reached the driver)
        # is invisible (same invariant as streaming/py_sink.py).
        # Directories without a manifest (external fixtures) fall
        # back to the glob.
        manifest = os.path.join(path, "_SUCCESS")
        if os.path.exists(manifest):
            with open(manifest) as f:
                hits = [
                    os.path.join(path, name)
                    for name in sorted(l for l in f.read().splitlines() if l)
                ]
        else:
            hits = sorted(g.glob(os.path.join(path, "*.avro")))
    else:
        hits = sorted(g.glob(path)) if any(c in path for c in "*?[") else [path]
    if not hits:
        raise FileNotFoundError(f"no avro files under {path!r}")
    return hits


def register(spark) -> None:
    """Idempotently register the pyavro format on a session."""
    try:
        spark.dataSource.register(PyAvroDataSource)
    except Exception:
        pass  # already registered on this session
