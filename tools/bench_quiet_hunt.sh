#!/bin/bash
# Quiet-window bench hunter (r16). The machine's ambient load moves on
# a minutes timescale (BASELINE.md ambient-band protocol), so a single
# scheduled bench run lands wherever it lands. This tool probes the
# quiet-machine MARKER query (q_dedup_prefix, stable 0.92-0.97 s
# min-channel floor since r8) every ~9 minutes and fires the full
# headline bench only when the marker's min-of-6 lands within ~5% of
# the floor — turning "re-pin the numbers of record on a quiet
# machine" from a matter of luck into a protocol. The r16 gate row
# (7.8217 median / 7.1329 min, 2026-08-17 01:17) was produced by
# exactly this: probe 1 read 1.32 (ambient), probe 2 read 1.0153 →
# headline fired inside the window.
#
# Usage: tools/bench_quiet_hunt.sh [out_json] [log]
#   out_json  headline bench JSON on success (default /tmp/bench_quiet.json)
#   log       probe log (default /tmp/quiet_hunt.log)
# Exits 0 with the headline JSON written iff a quiet window was found
# within 14 probes (~2h); exits 1 otherwise.
set -u
OUT="${1:-/tmp/bench_quiet.json}"
LOG="${2:-/tmp/quiet_hunt.log}"
THRESH="${QUIET_MARKER_MAX:-1.02}"
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
