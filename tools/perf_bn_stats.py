"""Micro-bench BatchNorm statistics (mean + mean-of-squares over B,H,W)
for the UNet's hot activation shapes, comparing XLA reduce strategies.

Context: the r2 UNet bf16 train-step trace (tools/trace_top_ops.py) shows
`convert_reduce_fusion.*` ops — flax BatchNorm's f32 stats reductions over
bf16 activations — at ~1.25 ms each for shapes that are ~0.1 ms of HBM
traffic, totalling ~8-9 ms of a 39.4 ms step. This harness isolates the
reduction to find a faster formulation before reaching for Pallas.

Variants:
  flax      jnp.mean(x, axes, dtype=f32) + jnp.mean(x*x, axes, dtype=f32)
            (what flax.linen.BatchNorm._compute_stats emits)
  bf16red   reduce in bf16, convert the [C] result (accuracy-losing; bound)
  einsum    reshape [N, C]; sum via 'nc->c', sumsq via 'nc,nc->c' with
            preferred_element_type=f32 (MXU-eligible contraction)
  onesmm    ones[1,N] @ [N,C] matmul for sum, x*x matmul for sumsq
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    (16, 224, 224, 64),
    (16, 112, 112, 128),
    (16, 56, 56, 256),
    (16, 28, 28, 512),
    (16, 14, 14, 1024),
]


INNER = 30  # repetitions inside one jit call so device time dominates
              # the axon per-dispatch RPC (~0.8 ms measured)


def make_looped(stats_fn):
    """Chain INNER stat computations with a data dependency so XLA cannot
    CSE or overlap them; per-iteration cost = (total - overhead) / INNER."""

    @jax.jit
    def looped(x):
        def body(i, carry):
            x_c, acc = carry
            mu, mu2 = stats_fn(x_c)
            # fold the (tiny) result back into x so iterations serialize
            return x_c + (mu[0] * 0).astype(x_c.dtype), acc + mu2[0]
        _, acc = jax.lax.fori_loop(0, INNER, body, (x, jnp.float32(0)))
        return acc

    return looped


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / INNER * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    def flax_stats(x):
        mu = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
        mu2 = jnp.mean(jax.lax.square(x), axis=(0, 1, 2), dtype=jnp.float32)
        return mu, mu2

    def bf16_stats(x):
        mu = jnp.mean(x, axis=(0, 1, 2)).astype(jnp.float32)
        mu2 = jnp.mean(jax.lax.square(x), axis=(0, 1, 2)).astype(jnp.float32)
        return mu, mu2

    def einsum_stats(x):
        n = x.shape[0] * x.shape[1] * x.shape[2]
        f = x.reshape(n, x.shape[3])
        s = jnp.einsum("nc->c", f, preferred_element_type=jnp.float32)
        s2 = jnp.einsum("nc,nc->c", f, f, preferred_element_type=jnp.float32)
        return s / n, s2 / n

    def onesmm_stats(x):
        n = x.shape[0] * x.shape[1] * x.shape[2]
        f = x.reshape(n, x.shape[3])
        ones = jnp.ones((1, n), x.dtype)
        s = jax.lax.dot(ones, f, preferred_element_type=jnp.float32)[0]
        s2 = jax.lax.dot(ones, f * f, preferred_element_type=jnp.float32)[0]
        return s / n, s2 / n

    variants = {
        "flax": flax_stats,
        "bf16red": bf16_stats,
        "einsum": einsum_stats,
        "onesmm": onesmm_stats,
    }

    rng = np.random.default_rng(0)
    print(f"{'shape':24s} {'MB':>7s} " +
          " ".join(f"{k:>9s}" for k in variants) + f" {'bound_ms':>9s}")
    for shape in SHAPES:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        mb = np.prod(shape) * 2 / 1e6
        bound = mb / 819e3 * 1e3  # v5e ~819 GB/s
        cells = []
        ref = None
        for name, fn in variants.items():
            ms = timeit(make_looped(fn), x, iters=args.iters)
            mu, mu2 = jax.device_get(jax.jit(fn)(x))
            bad = ""
            if ref is None:
                ref = (mu, mu2)
            else:
                err = max(np.abs(mu - ref[0]).max(), np.abs(mu2 - ref[1]).max())
                if err > 5e-2:
                    bad = "!"  # accuracy break vs the flax reference
            cells.append(f"{ms:8.3f}{bad or ' '}")
        print(f"{str(shape):24s} {mb:7.1f} " + " ".join(cells)
              + f" {bound:9.3f}")


if __name__ == "__main__":
    main()
