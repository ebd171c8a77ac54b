#!/usr/bin/env bash
# One-command real-chip measurement session. Run when the axon tunnel is
# back up (a 240 s probe decides; see bench.py:tpu_reachable). Collects
# every number the round's docs are waiting on, in dependency order, with
# the persistent compile cache so reruns are warm.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash tools/chip_session.sh
#
# Outputs land in /tmp/chip_session/: one log per step plus the JSON
# lines the docs quote. Safe to rerun; each step is independent.

set -u
cd "$(dirname "$0")/.."
export STF_UNET_COMPILE_CACHE="${STF_UNET_COMPILE_CACHE:-/tmp/xlacache}"
OUT=/tmp/chip_session
mkdir -p "$OUT"

probe=$(timeout 300 python - <<'EOF'
import bench
p = bench.tpu_reachable()
print("up" if p is None else f"down: {p}")
EOF
) || probe="down: probe runner itself failed (PYTHONPATH/bench import?)"
if [ "${probe:-}" != "up" ]; then
    # tpu_reachable distinguishes a hung tunnel from a fast plugin/import
    # failure — surface the diagnostic, don't collapse it to "down".
    echo "TPU not measurable — ${probe:-probe timed out before printing}" >&2
    exit 1
fi
echo "TPU up; measuring (compiles ride $STF_UNET_COMPILE_CACHE)"

run() {  # run <name> <cmd...>
    local name=$1; shift
    echo "=== $name ==="
    timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -5
}

# 1. The perf regression gate: headline device numbers + history row.
run perf_regression python tools/perf_regression.py \
    --out perf_history.jsonl --check

# 2. The driver benchmark line (f32/bf16 train throughput + MFU).
run bench python bench.py

# 3. int8 vs bf16 serving forward (the toolchain-dependent lowering —
#    re-measured every chip session per PERFORMANCE.md "int8" section).
run perf_int8 python tools/perf_int8.py

echo "=== done — logs in $OUT; update PERFORMANCE.md/BASELINE.md if any"
echo "    number moved, and commit perf_history.jsonl's new row."
