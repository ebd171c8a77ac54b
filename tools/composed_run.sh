#!/usr/bin/env bash
# Composed convergence run on the REAL chip (VERDICT r3 next-step 1):
# flagship STF-LSTM-UNet on a synthetic BreaDM tree with EVERY r3/r4
# production feature composed into one session —
#   --data-pack (decode-free epochs + eval-geometry val)  + EMA + --amp
#   + transfer-lean val + early stopping + rotation-split augmentation,
# then the test phase with --tta --per-patient --surface-metrics
# --threshold-sweep, then post-hoc int8 (stf-quantize --threshold-sweep)
# on the converged checkpoint.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash tools/composed_run.sh
# Logs + artifacts under /tmp/composed_run/; per-phase wall-clock printed
# at the end (goes into PERFORMANCE.md "Round 4").
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK=/tmp/composed_run
LOG="$WORK/log"
export STF_UNET_COMPILE_CACHE="${STF_UNET_COMPILE_CACHE:-/tmp/xlacache}"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
rm -rf "$WORK"; mkdir -p "$WORK" "$LOG"

phase() { echo "=== $1 @ $(date +%s) ==="; }

phase "tree"
python - <<PY
from stf_unet_tpu.data.synthetic import make_synthetic_breadm
make_synthetic_breadm("$WORK/tree", size=256, time_steps=8,
                      patients_per_split=8, slices_per_patient=8)
print("tree ok: 64 slices per split @ 256^2, T=8")
PY

phase "pack"
python -m stf_unet_tpu.cli.pack --data-path "$WORK/tree" \
    --output "$WORK/pack" --eval-size 224 2>&1 | tee "$LOG/pack.txt"

phase "train"
python -m stf_unet_tpu.cli.train \
    --data-path "$WORK/tree" --model stflstm --epochs 20 \
    --batch-size 16 --amp --data-pack "$WORK/pack" \
    --optim-ema-decay 0.95 --early-stop-patience 5 --eval-batch-size 8 \
    --save-dir "$WORK/weights" --output-dir "$WORK/out" \
    2>&1 | tee "$LOG/train.txt"

phase "test"
python -m stf_unet_tpu.cli.test \
    --model stflstm --model-dir "$WORK/weights" --root "$WORK/tree" \
    --data-pack "$WORK/pack" --output-dir "$WORK/test_out" \
    --tta --per-patient --surface-metrics --threshold-sweep \
    2>&1 | tee "$LOG/test.txt"

phase "quantize"
python -m stf_unet_tpu.cli.quantize \
    --model stflstm --model-dir "$WORK/weights" --root "$WORK/tree" \
    --calib-samples 16 --batch-size 4 --threshold-sweep \
    2>&1 | tee "$LOG/quantize.txt"

phase "done"
echo "artifacts:"; ls -R "$WORK/test_out" | head -30
echo; echo "--- phase timestamps (diff for wall-clock) ---"
grep -h "^=== " "$0" >/dev/null 2>&1 || true
