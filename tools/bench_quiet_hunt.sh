#!/bin/bash
# Quiet-window bench hunter (r16). The machine's ambient load moves on
# a minutes timescale (BASELINE.md ambient-band protocol), so a single
# scheduled bench run lands wherever it lands. This tool probes the
# quiet-machine MARKER query (q_dedup_prefix) every ~9 minutes and
# fires the full headline bench only when the marker's min-of-6 lands
# within ~10% of the floor — turning "re-pin the numbers of record on
# a quiet machine" from a matter of luck into a protocol. The r16 gate
# row (7.8217 median / 7.1329 min, 2026-08-17 01:17) was produced by
# exactly this: probe 1 read 1.32 (ambient), probe 2 read 1.0153 →
# headline fired inside the window.
#
# MARKER FLOOR RE-PIN (r17): the single-doc-exchange q_dedup_prefix
# rewrite moved the solo floor from 0.92-0.97 s (r8-r16) to an
# estimated ~0.62 s (interleaved A/B min ratio 0.645 × the old
# floor; BASELINE.md r17 records the first quiet observation). The
# default threshold drops 1.02 → 0.68 accordingly — override with
# QUIET_MARKER_MAX while hunting on a machine whose floor has moved.
#
# Usage: tools/bench_quiet_hunt.sh [out_json] [log]
#   out_json  headline bench JSON on success (default /tmp/bench_quiet.json)
#   log       probe log (default /tmp/quiet_hunt.log)
# Exits 0 with the headline JSON written iff a quiet window was found
# within 14 probes (~2h); exits 1 otherwise.
set -u
OUT="${1:-/tmp/bench_quiet.json}"
LOG="${2:-/tmp/quiet_hunt.log}"
THRESH="${QUIET_MARKER_MAX:-0.68}"
cd "$(dirname "$0")/.."
for i in $(seq 1 14); do
  out=$(SPARK_GRAFT_BENCH_RUNS=6 SPARK_GRAFT_BENCH_QUERIES=q_dedup_prefix python bench.py 2>/dev/null)
  mn=$(printf '%s' "$out" | python -c "import json,sys; print(json.load(sys.stdin)['sum_min_sec'])")
  echo "$(date +%F' '%H:%M:%S) probe $i marker_min=$mn" >> "$LOG"
  if python -c "import sys; sys.exit(0 if $mn < $THRESH else 1)"; then
    echo "$(date +%F' '%H:%M:%S) QUIET (marker $mn < $THRESH) — running headline" >> "$LOG"
    python bench.py > "$OUT" 2>/dev/null
    echo "$(date +%F' '%H:%M:%S) headline done -> $OUT" >> "$LOG"
    exit 0
  fi
  sleep 540
done
echo "$(date +%F' '%H:%M:%S) no quiet window in 14 probes" >> "$LOG"
exit 1
