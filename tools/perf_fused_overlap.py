"""Does the Pallas fused-LSTM kernel still win INSIDE the fused program?

The kernel's 'auto' routing was tuned on the PURE train step (r2:
48.4 ms auto vs 52.4 scan). The production program is different: it
prepends the augmentation warp, and a Pallas custom call is opaque to
XLA's scheduler, so in principle the scan form (plain HLO) could overlap
the augment gathers better and flip the routing decision for the fused
program. The first `fused_stflstm_bf16_ms` gate row (60.55 ms at rev
b7b5c73 vs a 66 ms pure+augment sum) shows the fused program DOES
overlap ~5.5 ms with the kernel in place — this tool answers whether
scan would overlap even more.

Measures the fused flagship step under each lstm_backend ('auto' =
Pallas fused at C<=128, 'scan') plus the pure train step for both, on
the real chip, and prints a JSON table. If scan wins FUSED while Pallas
wins PURE, the fused path should route to scan.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_fused_overlap.py
"""
from __future__ import annotations

import json

from stf_unet_tpu.core.cache import enable_compilation_cache
from stf_unet_tpu.utils.benchkit import measure_fused_train, measure_train_step


def main():
    enable_compilation_cache()
    out = {}
    for backend in ("auto", "scan"):
        fused = measure_fused_train(iters=20, model_name="stflstm",
                                    lstm_backend=backend)
        pure = measure_train_step("stflstm", amp=True, iters=20,
                                  lstm_backend=backend)
        out[backend] = {
            "fused_ms": round(fused["ms_per_step"], 2),
            "pure_ms": round(pure["ms_per_step"], 2),
        }
        print(f"lstm_backend={backend}: fused {out[backend]['fused_ms']} ms, "
              f"pure {out[backend]['pure_ms']} ms", flush=True)
    print(json.dumps({"metric": "fused_overlap_sweep", **out}))


if __name__ == "__main__":
    main()
