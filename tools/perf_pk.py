"""Clinical-scale PK (extended Tofts) fitting throughput on the real chip.

Synthesizes a volume from known (Ktrans, ve, vp) with the quadrature
forward model, then times `pk/maps.py:fit_volume` end-to-end (preprocess +
masked LM solve + scatter-back) cold and warm. The reference fits the same
problem with 100 Adam epochs x ceil(N/1024) minibatches per volume
(ref:pk_fitting.py:257,316-353).

Usage: python tools/perf_pk.py [--sizes 224 512] [--solver lm]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[224, 512])
    ap.add_argument("--solver", default="lm", choices=["lm", "adam"])
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from stf_unet_tpu.core.config import PKConfig
    from stf_unet_tpu.pk.aif import make_aif
    from stf_unet_tpu.pk.maps import fit_volume
    from stf_unet_tpu.pk.tofts import ToftsQuadrature, extended_tofts_batch

    cfg = dataclasses.replace(PKConfig(), solver=args.solver)
    rng = np.random.default_rng(0)
    quad = ToftsQuadrature.build(cfg.time_points,
                                 make_aif(cfg.aif_method, cfg.aif_dose),
                                 cfg.dt)

    def make_volume(h, w):
        yy, xx = np.mgrid[:h, :w]
        disk = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h * 0.4) ** 2
        kt = np.where(disk, 0.3, 0.0).ravel()
        ve = np.where(disk, 0.2, 0.1).ravel()
        vp = np.where(disk, 0.05, 0.0).ravel()
        curves = np.asarray(extended_tofts_batch(
            quad, jnp.asarray(kt, jnp.float32), jnp.asarray(ve, jnp.float32),
            jnp.asarray(vp, jnp.float32)))
        frames = curves.reshape(h, w, -1).transpose(2, 0, 1) * 300 + 40
        frames = np.clip(frames + rng.integers(0, 3, frames.shape), 0, 255)
        return frames.astype(np.uint8), disk

    for size in args.sizes:
        frames, disk = make_volume(size, size)
        t0 = time.perf_counter()
        fit_volume(frames, cfg)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        maps = fit_volume(frames, cfg)
        warm = time.perf_counter() - t0
        n = size * size
        err = abs(float(maps[0][disk].mean()) - 0.3)
        print(f"{size}x{size}: cold {cold:.2f}s (incl compile), warm "
              f"{warm:.2f}s = {n / warm / 1e3:.1f}k voxels/s "
              f"(tumor Ktrans err {err:.3f})")


if __name__ == "__main__":
    main()
