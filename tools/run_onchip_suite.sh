#!/usr/bin/env bash
# One-stop on-chip measurement pass (single v5e via the axon tunnel).
# Runs each benchmark SEQUENTIALLY (the chip serializes anyway; parallel
# clients can wedge the tunnel) and appends one JSON line per run to
# $OUT (default /tmp/onchip_suite.jsonl). Safe to re-run; ~20 min total.
#
#   bash tools/run_onchip_suite.sh            # everything
#   ONLY=early bash tools/run_onchip_suite.sh # just the early-exit sweep
set -u
cd "$(dirname "$0")/.."
OUT="${OUT:-/tmp/onchip_suite.jsonl}"
ONLY="${ONLY:-all}"

run() { # name, cmd...
  local name="$1"; shift
  echo "== $name ==" >&2
  local t0=$(date +%s)
  if timeout 1800 "$@" >> "$OUT" 2>/tmp/onchip_err.log; then
    echo "$name ok ($(( $(date +%s) - t0 ))s)" >&2
  else
    echo "$name FAILED rc=$? — tail of stderr:" >&2
    tail -5 /tmp/onchip_err.log >&2
    echo "{\"bench\": \"$name\", \"error\": true}" >> "$OUT"
  fi
}

if [ "$ONLY" = all ] || [ "$ONLY" = train ]; then
  run train python bench.py
fi
if [ "$ONLY" = all ] || [ "$ONLY" = eval ]; then
  run eval env BENCH_MODE=eval python bench.py
fi
if [ "$ONLY" = all ] || [ "$ONLY" = early ]; then
  run early_exit python tools/bench_early_exit.py
fi
if [ "$ONLY" = all ] || [ "$ONLY" = serve ]; then
  run serve_demo python serve.py --config configs/train-tvqa-eval-tvqa-c3.yml \
      --demo 256 --concurrency 16 --buckets 1,8,32
fi
echo "results in $OUT" >&2
