#!/bin/bash
# Trimmed round-2-end TPU measurement session: the headline bench plus
# the four A/Bs that pick defaults for the changes shipped during the
# tunnel outage (pair kernel, in-kernel shift, in-kernel label masks,
# parity head fold), then the train-step pair A/B.  Same-session numbers
# are directly comparable (cross-session drift ~±5%, docs/PERF.md).
#
# Usage: bash tools/tpu_ab_r2end.sh [out.log]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_ab_r2end.log}
: > "$OUT"
# Per-run scratch files suffixed with $$ so concurrent sessions
# can't clobber each other's A/B outputs.
LINE=/tmp/ab_line.$$.json
ERR=/tmp/ab_err.$$.log
trap 'rm -f "$LINE" "$ERR"' EXIT
export BENCH_PREFLIGHT_TIMEOUT=0

run() {
  local name="$1"; shift
  echo "=== $name ($*)" | tee -a "$OUT"
  local t0=$(date +%s)
  env "$@" timeout 2400 python bench.py >"$LINE" 2>"$ERR"
  local rc=$?
  local t1=$(date +%s)
  echo "rc=$rc elapsed=$((t1-t0))s" | tee -a "$OUT"
  cat "$LINE" | tee -a "$OUT"
  grep -h '"detail"' "$ERR" | tail -1 | tee -a "$OUT"
  grep -hE "tier .* failed|FALLBACK" "$ERR" | tee -a "$OUT"
}

run full
run no-pair-kernel MIVP_NO_PAIR_KERNEL=1
run no-kernel-shift MIVP_NO_PAIR_KERNEL=1 MIVP_NO_KERNEL_SHIFT=1
run mask-dma BENCH_TIER=1
run no-fold-head BENCH_FOLD_HEAD_HW=0

for knob in "" "MIVP_NO_PAIR_KERNEL=1"; do
  echo "=== train-step ${knob:-full}" | tee -a "$OUT"
  env $knob timeout 2400 python tools/bench_train_step.py 2>/dev/null \
    | tail -4 | tee -a "$OUT"
done

echo "=== summary" | tee -a "$OUT"
grep -h '"value"' "$OUT" || true
