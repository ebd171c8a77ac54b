"""Tiled (sliding-window) native-resolution inference.

The reference can only segment at the resized training geometry: its eval
path short-edge-resizes every volume to crop_size (ref:train.py:70-74)
and test.py runs the same 224² contract (ref:test.py:148-160) — on real
BreaDM geometry (~520²) that throws away ~80% of the pixels before the
model ever sees them. This module segments at NATIVE resolution with the
model still running at its trained tile geometry, the TPU-first way:

  * ONE jitted program per input geometry: normalize on device, extract
    overlapping tiles at STATIC offsets (pure lax slices — XLA never
    sees a dynamic shape), run all tiles through the model as a batch
    (MXU at batch efficiency), blend tile logits with a Gaussian
    importance window via static-slice scatter-adds (XLA fuses these),
    argmax, uint8 mask out. One dispatch per volume.
  * Center-weighted blending: conv zero-padding makes tile-border
    predictions the least trustworthy; overlapping tiles vote with
    exp(-d²/2σ²) weight (σ = sigma_frac·tile — the nnU-Net recipe).
    Per-pixel weight normalization is a positive scalar per pixel, so
    it cancels inside argmax and is never materialized.
  * Bounded compiles: one program per (T, H, W) geometry, cached like
    the serving engine's shape buckets; the tile batch is chunked to
    max_tile_batch, so arbitrarily large volumes trace at most two
    model shapes (full chunk + remainder) inside that one program.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np


def plan_tiles(size: int, tile: int, stride: int) -> Tuple[int, ...]:
    """1-D tile offsets covering [0, size): start every `stride` px, and
    keep the last tile flush with the edge. Requires size >= tile (pad
    smaller inputs first)."""
    if size < tile:
        raise ValueError(f"size {size} < tile {tile}; pad the input first")
    offs = list(range(0, size - tile + 1, max(int(stride), 1)))
    if offs[-1] != size - tile:
        offs.append(size - tile)
    return tuple(offs)


def gaussian_window(tile: int, sigma_frac: float = 0.125,
                    floor: float = 1e-4) -> np.ndarray:
    """[tile, tile] float32 separable Gaussian importance map, peak 1 at
    the center, floored away from exact zero so single-coverage corner
    pixels keep finite weight."""
    sigma = max(float(sigma_frac) * tile, 1e-6)
    d = (np.arange(tile, dtype=np.float64) - (tile - 1) / 2.0) / sigma
    g = np.exp(-0.5 * d * d)
    w = np.maximum(np.outer(g, g), floor)
    return w.astype(np.float32)


def _chunks(seq: Sequence, n: int):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


class TiledPredictor:
    """Native-resolution argmax segmentation via overlapping tiles.

    predict() takes one volume, uint8 [T(+pk), H, W, 1] (the serving wire
    contract, InferenceEngine.predict's per-sample layout), and returns
    an int32 [H, W] mask. H and W are arbitrary; inputs smaller than the
    tile are edge-replicate padded on device and the mask cropped back.
    """

    def __init__(self, model, variables, mean: float, std: float,
                 tile: int = 224, overlap: float = 0.5,
                 sigma_frac: float = 0.125, max_tile_batch: int = 16,
                 mesh=None):
        """mesh: optional 1-D data mesh — the tile batch of each volume
        shards over the mesh devices (a 520² volume's 16 tiles become 2
        per chip on an 8-chip host), cutting per-volume latency instead of
        just throughput; params replicate, the blend's scatter-adds gather
        the sharded logits via GSPMD collectives. Identical masks to the
        single-device program (tested on the simulated 8-device mesh)."""
        if not 0.0 <= float(overlap) < 1.0:
            raise ValueError(f"overlap must be in [0, 1), got {overlap}")
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from stf_unet_tpu.core.mesh import replicate
            variables = replicate(mesh, variables)
        self.variables = variables
        self.mean = float(mean)
        self.std = float(std)
        self.tile = int(tile)
        self.stride = max(int(round(self.tile * (1.0 - float(overlap)))), 1)
        self.sigma_frac = float(sigma_frac)
        self.max_tile_batch = int(max_tile_batch)
        self._fns: Dict[Tuple[int, ...], Any] = {}

    def _fn_for(self, shape: Tuple[int, ...]):
        fn = self._fns.get(shape)
        if fn is None:
            import jax
            import jax.numpy as jnp

            from stf_unet_tpu.data.transforms import normalize
            from stf_unet_tpu.models.registry import preprocess_input

            model, mean, std = self.model, self.mean, self.std
            mesh = self.mesh
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from stf_unet_tpu.core.mesh import DATA_AXIS
                tile_sharding = NamedSharding(mesh, P(DATA_AXIS))
            t_steps, h, w, _ = shape
            tile = self.tile
            ph, pw = max(tile - h, 0), max(tile - w, 0)
            ys = plan_tiles(h + ph, tile, self.stride)
            xs = plan_tiles(w + pw, tile, self.stride)
            offsets = [(y, x) for y in ys for x in xs]
            window = jnp.asarray(
                gaussian_window(tile, self.sigma_frac))[:, :, None]
            out_dtype = (jnp.uint8 if int(model.num_classes) <= 256
                         else jnp.int32)

            @jax.jit
            def fwd(variables, x_u8):
                x = normalize(x_u8, mean, std)  # [T, H, W, 1] f32
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                mode="edge")
                acc = jnp.zeros((h + ph, w + pw, int(model.num_classes)),
                                jnp.float32)
                for group in _chunks(offsets, self.max_tile_batch):
                    tiles = jnp.stack(
                        [x[:, y:y + tile, xo:xo + tile, :]
                         for (y, xo) in group])  # [n, T, tile, tile, 1]
                    if mesh is not None:
                        tiles = jax.lax.with_sharding_constraint(
                            tiles, tile_sharding)
                    logits = model.apply(
                        variables, preprocess_input(tiles, model),
                        train=False)["out"].astype(jnp.float32)
                    for i, (y, xo) in enumerate(group):
                        acc = acc.at[y:y + tile, xo:xo + tile, :].add(
                            logits[i] * window)
                # The per-pixel weight sum is positive and class-uniform:
                # argmax(acc / wsum) == argmax(acc), so never divide.
                return jnp.argmax(acc[:h, :w, :], axis=-1).astype(out_dtype)

            fn = self._fns[shape] = fwd
        return fn

    def num_tiles(self, h: int, w: int) -> int:
        tile = self.tile
        return (len(plan_tiles(max(h, tile), tile, self.stride))
                * len(plan_tiles(max(w, tile), tile, self.stride)))

    def predict(self, image: np.ndarray) -> np.ndarray:
        """uint8 [T(+pk), H, W, 1] -> int32 [H, W] native-res mask."""
        if image.ndim != 4 or image.shape[-1] != 1:
            raise ValueError(
                f"expected [T, H, W, 1], got shape {image.shape}")
        fn = self._fn_for(tuple(image.shape))
        return np.asarray(fn(self.variables, image)).astype(np.int32)
