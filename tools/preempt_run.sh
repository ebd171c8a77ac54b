#!/usr/bin/env bash
# Chip-side preemption-resume proof (VERDICT r4 next-step 5): the
# bit-identical resume claim of tests/test_preemption.py, demonstrated
# end-to-end on the REAL chip with a REAL SIGTERM.
#
#   Run A: flagship train (AMP + EMA + data-pack), 6 epochs, uninterrupted
#          -> test dice.
#   Run B: identical config/seed; SIGTERM delivered mid-epoch-2 (the
#          PreemptionGuard saves a step-exact checkpoint and exits 0);
#          `--resume latest` runs it to completion -> test dice.
#   Compare: (1) final latest-checkpoint trees bit-for-bit,
#            (2) the two test-phase dice values (must be equal).
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash tools/preempt_run.sh
# Logs under /tmp/preempt_run/log; summary printed at the end (goes into
# PERFORMANCE.md "Round 5"). Resume semantics anchor: ref:train.py:249-256
# (epoch-granular in the reference; step-exact here).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK=/tmp/preempt_run
LOG="$WORK/log"
export STF_UNET_COMPILE_CACHE="${STF_UNET_COMPILE_CACHE:-/tmp/xlacache}"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
rm -rf "$WORK"; mkdir -p "$WORK" "$LOG"

# Knobs (defaults = the chip-session config; the CPU smoke in
# tests/tooling can shrink everything):
#   PREEMPT_SIZE/PREEMPT_CROP/PREEMPT_BASE  source/crop/base-size px
#   PREEMPT_MODEL                           stflstm | unet
#   PREEMPT_EXTRA                           extra train flags (string)
SIZE="${PREEMPT_SIZE:-256}"
CROP="${PREEMPT_CROP:-224}"
BASE="${PREEMPT_BASE:-256}"
MODEL="${PREEMPT_MODEL:-stflstm}"
read -r -a EXTRA <<< "${PREEMPT_EXTRA:-}"

phase() { echo "=== $1 @ $(date +%s) ==="; }

phase "tree"
python - <<PY
from stf_unet_tpu.data.synthetic import make_synthetic_breadm
make_synthetic_breadm("$WORK/tree", size=$SIZE, time_steps=8,
                      patients_per_split=4, slices_per_patient=4)
print("tree ok: 16 slices per split @ $SIZE^2, T=8")
PY

phase "pack"
python -m stf_unet_tpu.cli.pack --data-path "$WORK/tree" \
    --output "$WORK/pack" --eval-size "$CROP" 2>&1 | tee "$LOG/pack.txt"

# 16 train slices / batch 4 -> 4 steps per epoch: a mid-epoch SIGTERM has
# real step boundaries to land between. Seed pinned; EMA + AMP on so the
# preemption checkpoint must round-trip the full production state.
FLAGS=(--data-path "$WORK/tree" --model "$MODEL" --epochs 6
       --batch-size 4 --amp --data-pack "$WORK/pack"
       --data-base-size "$BASE" --data-crop-size "$CROP"
       --optim-ema-decay 0.95 --eval-batch-size 8
       --seed 7 --print-freq 1 "${EXTRA[@]}")

phase "train A (uninterrupted)"
python -m stf_unet_tpu.cli.train "${FLAGS[@]}" \
    --save-dir "$WORK/wA" --output-dir "$WORK/oA" \
    2>&1 | tee "$LOG/trainA.txt"

phase "test A"
python -m stf_unet_tpu.cli.test \
    --model "$MODEL" --model-dir "$WORK/wA" --root "$WORK/tree" \
    --data-pack "$WORK/pack" --output-dir "$WORK/tA" \
    2>&1 | tee "$LOG/testA.txt"

phase "train B (SIGTERM mid-epoch 2)"
python -m stf_unet_tpu.cli.train "${FLAGS[@]}" \
    --save-dir "$WORK/wB" --output-dir "$WORK/oB" \
    > "$LOG/trainB1.txt" 2>&1 &
BPID=$!
# Watch for the first epoch-2 step line, then deliver a real SIGTERM.
# The guard finishes the in-flight step, saves step-exact, exits 0.
for i in $(seq 1 900); do
    if grep -q "Epoch: \[2\]" "$LOG/trainB1.txt" 2>/dev/null; then
        sleep 1
        kill -TERM "$BPID"
        break
    fi
    if ! kill -0 "$BPID" 2>/dev/null; then
        echo "train B exited before reaching epoch 2" >&2
        cat "$LOG/trainB1.txt" >&2
        exit 1
    fi
    sleep 1
done
BRC=0; wait "$BPID" || BRC=$?
echo "train B exited rc=$BRC after SIGTERM"
tail -3 "$LOG/trainB1.txt"
if [ "$BRC" -ne 0 ]; then
    echo "expected rc=0 (graceful preemption save)" >&2
    exit 1
fi

phase "train B (resume latest)"
python -m stf_unet_tpu.cli.train "${FLAGS[@]}" \
    --save-dir "$WORK/wB" --output-dir "$WORK/oB" --resume latest \
    2>&1 | tee "$LOG/trainB2.txt"

phase "test B"
python -m stf_unet_tpu.cli.test \
    --model "$MODEL" --model-dir "$WORK/wB" --root "$WORK/tree" \
    --data-pack "$WORK/pack" --output-dir "$WORK/tB" \
    2>&1 | tee "$LOG/testB.txt"

phase "compare"
python - <<PY
import json, re, sys
import numpy as np
import orbax.checkpoint as ocp
import jax

def flat(path):
    tree = ocp.PyTreeCheckpointer().restore(path)
    return {jax.tree_util.keystr(kp): np.asarray(v)
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]
            if hasattr(v, "dtype") or isinstance(v, (int, float))}

a = flat("$WORK/wA/${MODEL}_latest_model")
b = flat("$WORK/wB/${MODEL}_latest_model")
assert a.keys() == b.keys(), (a.keys() ^ b.keys())
bad = [k for k in a if not np.array_equal(a[k], b[k])]
print(f"latest-checkpoint arrays compared: {len(a)}; mismatching: {len(bad)}")
for k in bad[:10]:
    d = np.max(np.abs(np.asarray(a[k], np.float64)
                      - np.asarray(b[k], np.float64)))
    print(f"  {k}: max|diff| {d:.3e}")

def dice(log):
    txt = open(log).read()
    m = re.findall(r"^Dice: ([0-9.]+)", txt, re.M)
    assert m, f"no dice in {log}"
    return m[-1]

da, db = dice("$LOG/testA.txt"), dice("$LOG/testB.txt")
print(f"test dice A={da} B={db}")
ok = (not bad) and da == db
print("PREEMPTION RESUME " + ("BIT-IDENTICAL: PASS" if ok else
      ("DICE-EQUAL: PASS (state differs)" if da == db else "FAIL")))
sys.exit(0 if da == db else 1)
PY

phase "done"
