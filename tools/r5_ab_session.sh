#!/bin/bash
# Round-5 healthy-tunnel A/B session (VERDICT r4 item 3).
#
# Runs the two overdue exact-mode A/Bs as single-mode bench children
# (BENCH_MODE=none — identical measurement harness to bench.py's exact
# mode, one mode per process):
#   leg A: default routing   (grouped-conv auto -> loop128 s1/s2)
#   leg B: UNIRESTORE_GROUPED_CONV=autor3 (r3 routing: dense4/native)
#   leg C: UNIRESTORE_FUSED_OUT_ATTN=1   (out-proj-fused btc kernel)
# plus deep-mode (headline) legs at the CURRENT default turbo knobs
# (BENCH_TURBO_STRIDE/WARMUP - (5,2) when this was first run on
# 2026-08-20; (17,3) since) so the turbo number is also on record.
#
# Appends one line per leg to $OUT (default /tmp/r5_ab.jsonl). Each leg
# is bounded; a dead tunnel fails a leg in <= $LEG_TIMEOUT s.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r5_ab.jsonl}
LEG_TIMEOUT=${LEG_TIMEOUT:-1800}

run_leg() {
  local name="$1"; shift
  echo "=== leg $name ($(date -u +%H:%M:%S)) env: $* ===" >&2
  local t0=$SECONDS
  local line
  line=$(env "$@" timeout "$LEG_TIMEOUT" python bench.py 2>/tmp/r5_leg_err.log \
         | grep '^RESULT' | tail -1)
  local rc=$?
  local dt=$((SECONDS - t0))
  if [ -n "$line" ]; then
    echo "{\"leg\": \"$name\", \"dt_s\": $dt, \"result\": ${line#RESULT }}" >> "$OUT"
    echo "leg $name done in ${dt}s: $line" >&2
  else
    echo "{\"leg\": \"$name\", \"dt_s\": $dt, \"error\": \"rc=$rc no RESULT\"}" >> "$OUT"
    echo "leg $name FAILED rc=$rc in ${dt}s; stderr tail:" >&2
    tail -5 /tmp/r5_leg_err.log >&2
  fi
}

# exact-mode A/Bs (stride 1): routing + attention
run_leg exact_default      BENCH_MODE=none
run_leg exact_autor3       BENCH_MODE=none UNIRESTORE_GROUPED_CONV=autor3
run_leg exact_fused_out    BENCH_MODE=none UNIRESTORE_FUSED_OUT_ATTN=1
# repeat default to bracket drift within the session
run_leg exact_default_2    BENCH_MODE=none
# headline-mode legs for routing (deep cache stride 5 warmup 2)
run_leg deep_default       BENCH_MODE=deep
run_leg deep_autor3        BENCH_MODE=deep UNIRESTORE_GROUPED_CONV=autor3
echo "session complete -> $OUT" >&2
