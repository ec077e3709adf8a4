#!/bin/bash
# One-shot TPU measurement session: run the headline bench over the A/B
# matrix around the ROUND-3 defaults (fused block + in-kernel shift,
# mask-DMA label masks, pair kernel OFF, head H/W fold OFF), plus a
# chunk-size sweep.  Same-session numbers are directly comparable
# (cross-session drift is ~±5%, docs/PERF.md).
#
# Usage: bash tools/tpu_ab.sh [out.log]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_ab.log}
: > "$OUT"
# Per-run scratch files suffixed with $$ so concurrent sessions
# can't clobber each other's A/B outputs.
LINE=/tmp/ab_line.$$.json
ERR=/tmp/ab_err.$$.log
trap 'rm -f "$LINE" "$ERR"' EXIT
# The caller (watchdog) already proved the tunnel is up; skip the
# per-run preflight probe and its slow remote backend init.
export BENCH_PREFLIGHT_TIMEOUT=0

run() {
  local name="$1"; shift
  echo "=== $name ($*)" | tee -a "$OUT"
  local t0=$(date +%s)
  env "$@" timeout 3000 python bench.py >"$LINE" 2>"$ERR"
  local rc=$?
  local t1=$(date +%s)
  echo "rc=$rc elapsed=$((t1-t0))s" | tee -a "$OUT"
  cat "$LINE" | tee -a "$OUT"
  grep -h '"detail"' "$ERR" | tail -1 | tee -a "$OUT"
  grep -hE "tier .* failed|FALLBACK" "$ERR" | tee -a "$OUT"
}

# 1. Default configuration — exactly the round-end driver setting.
run default
# 2. Opt the one-kernel block pairs back in.
run pair-kernel MIVP_PAIR_KERNEL=1
# 3. In-kernel int32 label masks instead of the mask DMA (tier 1).
run in-kernel-mask BENCH_TIER=1
# 4. Drop the in-kernel fused window shift (tier 2).
run no-kernel-shift BENCH_TIER=2
# 5. Opt the parity (subpixel) H/W head fold back in.
run fold-head BENCH_FOLD_HEAD_HW=1
# 6. Drop the fused block entirely (tier 4 = packed kernels).
run no-fused-block BENCH_TIER=4
# 7. Chunk-size sweep at the default configuration.
for c in 8 16 20 40 80; do
  run "chunk$c" BENCH_CHUNK=$c
done

# 8. End-to-end serving throughput (NIfTI IO + bucketed inference).
echo "=== serving" | tee -a "$OUT"
timeout 3000 python tools/bench_serving.py --n 12 2>/dev/null \
  | tail -2 | tee -a "$OUT"

# 9. Training-step times (downstream + phase-2 north-star) with and
#    without the pair kernel opt-in.
for knob in "" "MIVP_PAIR_KERNEL=1"; do
  echo "=== train-step ${knob:-default}" | tee -a "$OUT"
  env $knob timeout 3000 python tools/bench_train_step.py 2>/dev/null \
    | tail -4 | tee -a "$OUT"
done

echo "=== summary" | tee -a "$OUT"
grep -h '"value"' "$OUT" || true
