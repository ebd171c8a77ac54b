"""Serving inference engine: checkpoint -> compiled forward, with
shape-bucketed dynamic batching.

The reference has no serving story (its test.py is a batch CLI that
re-imports torch and the source tree, ref:test.py:137-196). This is the
deployment path of the TPU rebuild: one process owns the chip, keeps the
jitted forward warm per input-shape bucket, and coalesces concurrent
requests into batches so the MXU runs at batch efficiency instead of
batch-1 dispatch latency.

Design notes:
  * Transfer-lean: requests ship PIL-parity-resized uint8 frames
    (host-side native banded resize, data/transforms); normalization runs
    inside the jitted forward — the same r3 eval-path contract
    (train/loop._EvalStepCache), so served predictions are bit-identical
    to cli/test's.
  * Static shapes for XLA: batches are padded up to power-of-two sizes
    (1, 2, 4, ... max_batch), bounding the compile count per input shape
    at log2(max_batch)+1; padding rows replicate row 0 and are sliced off.
  * The engine is model-agnostic host code; there is no torch, no HTTP in
    this module (the HTTP layer lives in serve/http.py).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


class InferenceEngine:
    """Compiled argmax-segmentation forward over raw uint8 inputs.

    predict() takes [B, T(+pk), h, w, 1] uint8 and returns int32 masks
    [B, h, w] (argmax semantics, SURVEY §3.3 unification; sigmoid
    compatibility is a render-side concern, cli/test.predict_mask).
    """

    def __init__(self, model, variables, mean: float, std: float,
                 max_batch: int = 8, mesh=None, tiled=None):
        """mesh: optional 1-D data mesh (core.mesh.create_mesh) — one
        serving process owns N chips, request batches shard over the
        batch axis, params replicate. Batch buckets floor at the mesh
        size so every shard stays non-empty (GSPMD static shapes).

        tiled: optional serve.tiled.TiledPredictor — volumes whose
        spatial geometry differs from the trained tile are segmented at
        NATIVE resolution via sliding-window tiles instead of a
        full-conv forward at that arbitrary shape (which would compile
        per shape and, at e.g. 520² flagship, cost ~5x the activation
        memory). Tile-geometry inputs keep the batched fast path."""
        import jax

        self.model = model
        self.mean = float(mean)
        self.std = float(std)
        self.max_batch = int(max_batch)
        self.mesh = mesh
        if mesh is not None:
            from stf_unet_tpu.core.mesh import replicate

            self._n_dev = int(mesh.devices.size)
            if self.max_batch < self._n_dev:
                raise ValueError(
                    f"max_batch={max_batch} smaller than the "
                    f"{self._n_dev}-device mesh; batches could not shard")
            self.variables = replicate(mesh, variables)
        else:
            self._n_dev = 1
            self.variables = variables
        self.tiled = tiled
        self._fns: Dict[Tuple[int, ...], Any] = {}
        self._prob_fns: Dict[Tuple[int, ...], Any] = {}
        self._jax = jax

    def _fn_for(self, shape: Tuple[int, ...], probs: bool = False):
        # probs variants live in their own cache: _fns keys (input shapes)
        # are reported by the /metrics endpoint and asserted by tests.
        cache = self._prob_fns if probs else self._fns
        fn = cache.get(shape)
        if fn is None:
            import jax
            import jax.numpy as jnp

            from stf_unet_tpu.data.transforms import normalize
            from stf_unet_tpu.models.registry import preprocess_input

            model, mean, std = self.model, self.mean, self.std

            # masks ride D2H as uint8 when classes fit a byte (4x fewer
            # bytes on the serving link); predict() widens back to int32
            out_dtype = (jnp.uint8 if int(model.num_classes) <= 256
                         else jnp.int32)

            @jax.jit
            def fwd(variables, x_u8):
                x = normalize(x_u8, mean, std)
                logits = model.apply(variables, preprocess_input(x, model),
                                     train=False)["out"]
                mask = jnp.argmax(logits, axis=-1).astype(out_dtype)
                if probs:  # float16 softmax for compact prob artifacts
                    return mask, jax.nn.softmax(
                        logits, axis=-1).astype(jnp.float16)
                return mask

            fn = cache[shape] = fwd
        return fn

    def _bucket(self, n: int, max_batch: int) -> int:
        b = self._n_dev  # mesh size is a power of two; 1 when unmeshed
        while b < n and b < max_batch:
            b *= 2
        if b > max_batch:
            # A non-power-of-two --max-batch is an operator MEMORY cap:
            # never pad past it (the overshoot bucket would compile and
            # run a batch the flag was set to prevent). Keep the bucket a
            # multiple of the mesh size so shards stay non-empty.
            b = max(max_batch - max_batch % self._n_dev, self._n_dev)
        return b

    def predict(self, images: np.ndarray, return_probs: bool = False):
        """images uint8 [B, T, h, w, 1] -> masks int32 [B, h, w];
        return_probs=True additionally returns float16 softmax
        probabilities [B, h, w, C] from the SAME compiled forward
        (same bucketing; argmax is taken from the logits, so masks are
        identical either way)."""
        if (self.tiled is not None
                and images.shape[2:4] != (self.tiled.tile, self.tiled.tile)):
            if return_probs:
                raise ValueError("return_probs is unavailable on the tiled "
                                 "path (the tile blend emits argmax masks)")
            return np.stack([self.tiled.predict(img) for img in images])
        n = images.shape[0]
        b = self._bucket(n, self.max_batch)
        if n < b:  # pad by replicating row 0; sliced off below
            pad = np.repeat(images[:1], b - n, axis=0)
            images = np.concatenate([images, pad], axis=0)
        fn = self._fn_for(tuple(images.shape), probs=return_probs)
        if self.mesh is not None:
            from stf_unet_tpu.core.mesh import shard_batch

            images = shard_batch(self.mesh, images)
        out = fn(self.variables, images)
        if return_probs:
            masks, probs = out
            return (np.asarray(masks).astype(np.int32)[:n],
                    np.asarray(probs)[:n])
        return np.asarray(out).astype(np.int32)[:n]

    def warmup(self, t_steps: int, h: int, w: int) -> None:
        """Pre-compile every batch bucket for one input geometry so the
        first real requests don't pay the XLA compile — including the
        probs variant at its request bucket (?probs=1 requests arrive
        batch-1 via segment_probs and compile a SEPARATE program)."""
        for b in sorted({self._bucket(i + 1, self.max_batch)
                         for i in range(self.max_batch)}):
            x = np.zeros((b, t_steps, h, w, 1), np.uint8)
            self.predict(x)
        self.predict(np.zeros((1, t_steps, h, w, 1), np.uint8),
                     return_probs=True)


class _Request:
    __slots__ = ("image", "event", "mask", "error", "enqueue_t")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.mask: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None
        self.enqueue_t = time.perf_counter()


class DynamicBatcher:
    """Coalesce concurrent same-shape requests into one device batch.

    Requests queue per input shape; a single worker thread takes the
    oldest request's shape, waits up to `window_ms` for peers (or until
    `max_batch` accumulate), runs the engine once, and fans results back
    out. One worker == one chip owner: device dispatch stays serialized,
    which is what the TPU wants.
    """

    def __init__(self, engine: InferenceEngine, max_batch: int = 8,
                 window_ms: float = 5.0):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.window_s = float(window_ms) / 1000.0
        self._lock = threading.Condition()
        self._queues: Dict[Tuple[int, ...], deque] = {}
        self._order: deque = deque()  # shapes in arrival order
        self._stop = False
        # Observed batch sizes: bounded window (a long-running server must
        # not grow per-batch state without limit) + a lifetime counter.
        self.batch_sizes: deque = deque(maxlen=4096)
        self.total_batches = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, image: np.ndarray) -> _Request:
        req = _Request(image)
        shape = tuple(image.shape)
        with self._lock:
            q = self._queues.get(shape)
            if q is None:
                q = self._queues[shape] = deque()
            q.append(req)
            self._order.append(shape)
            self._lock.notify_all()
        return req

    def infer(self, image: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        """Blocking single-sample inference: image [T, h, w, 1] uint8 ->
        mask [h, w] int32."""
        req = self.submit(image)
        if not req.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if req.error is not None:
            raise req.error
        return req.mask

    def close(self) -> None:
        with self._lock:
            self._stop = True
            self._lock.notify_all()
        self._worker.join(timeout=5)

    def _collect(self) -> Optional[List[_Request]]:
        """Wait for work; return one same-shape batch (holds the lock
        internally, returns with it released)."""
        with self._lock:
            while not self._order and not self._stop:
                self._lock.wait()
            if self._stop and not self._order:
                return None
            shape = self._order[0]
            q = self._queues[shape]
            deadline = q[0].enqueue_t + self.window_s
            while (len(q) < self.max_batch and not self._stop):
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                self._lock.wait(remaining)
            batch = []
            while q and len(batch) < self.max_batch:
                batch.append(q.popleft())
                self._order.remove(shape)
            if not q:
                del self._queues[shape]
            return batch

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            images = np.stack([r.image for r in batch], axis=0)
            self.batch_sizes.append(len(batch))
            self.total_batches += 1
            try:
                masks = self.engine.predict(images)
                for r, m in zip(batch, masks):
                    r.mask = m
            except BaseException as e:  # surface to every waiter
                for r in batch:
                    r.error = e
            finally:
                for r in batch:
                    r.event.set()
