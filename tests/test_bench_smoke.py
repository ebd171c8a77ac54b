"""bench.py wiring smoke: the driver-facing benchmark must always be able
to produce a parseable headline line (VERDICT r4 #7 — a bench.py syntax or
import regression must be caught by the suite, not by the driver's
end-of-round run; r4's BENCH artifact was lost to exactly that class of
failure).

Runs `python bench.py` as a subprocess (the same invocation the driver
uses) in STF_BENCH_SMOKE mode: CPU backend, tiny shapes, 2 iters, no TPU
probe, no torch baseline run, no extras. Asserts the headline JSON
contract the driver parses.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_headline_smoke():
    env = dict(os.environ)
    env["STF_BENCH_SMOKE"] = "1"
    env["STF_UNET_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=600,
                       env=env, cwd=REPO)
    assert r.returncode == 0, f"bench.py smoke failed:\n{r.stderr[-2000:]}"
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, f"no JSON line on stdout:\n{r.stdout[-2000:]}"
    # the driver parses the LAST json line; in smoke mode there is exactly
    # one (headline only, no extras pass)
    rec = json.loads(lines[-1])
    assert rec["metric"] == "unet_train_slices_per_sec_per_chip"
    assert rec["unit"] == "slices/sec"
    assert isinstance(rec["value"], (int, float)) and rec["value"] > 0
    assert rec["bf16_value"] > 0
    # smoke must never poison the cached full-size torch baseline
    assert rec["vs_baseline"] is None or rec["vs_baseline"] > 0
