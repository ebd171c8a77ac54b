"""Host-side data loading: decode + batch assembly + prefetch.

The reference decodes with cv2 (imdecode fallback for non-ASCII paths,
ref:my_dataset.py:151-153) inside DataLoader worker processes. Here the host
pipeline only decodes and batches raw uint8 frames; every geometric/photometric
transform runs on-device in one fused jitted pass (data/transforms.py) —
the TPU-native split of work.

A background thread prefetches the next batch while the device computes
(HBM copy overlapped with compute), standing in for pin_memory/prefetch_factor
(ref:train.py:198-205).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from stf_unet_tpu.data.index import DatasetIndex, SampleRecord

PK_PARAM_NAMES = ("ktrans", "ve", "vp")  # ref:my_dataset.py:203


def prefetch_iterator(iterable, prefetch: int):
    """Drain `iterable` on a background thread, `prefetch` items deep.
    prefetch <= 0 degrades to plain iteration. Producer exceptions are
    re-raised in the consumer (never a silently truncated epoch). A
    consumer that abandons the generator early (break / generator close /
    exception) cancels the producer instead of leaving it blocked on a
    full queue holding decoded batches."""
    if prefetch <= 0:
        yield from iterable
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = object()
    cancelled = threading.Event()

    def put(item) -> bool:
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not put((None, item)):
                    return
            put(stop)
        except BaseException as e:  # surface in the consumer
            put((e, None))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            err, value = item
            if err is not None:
                raise RuntimeError("data prefetch thread failed") from err
            yield value
    finally:
        cancelled.set()
        t.join()


def _decode_grayscale(path: str) -> np.ndarray:
    """uint8 [H, W]. PIL decode (libjpeg/libpng) handles any path encoding,
    covering the reference's cv2-imdecode fallback (ref:151-153)."""
    with Image.open(path) as img:
        return np.asarray(img.convert("L"), dtype=np.uint8)


def load_pk_stack(pk_dir: str, h: int, w: int,
                  warn: bool = False) -> np.ndarray:
    """[3, H, W] uint8 ktrans/ve/vp stack from `pk_dir/{name}.png`.
    Off-resolution maps NEAREST-resize to (h, w) (PIL parity,
    ref:my_dataset.py:214); missing/unreadable maps zero-fill
    (ref:206-224), printing a warning when asked."""
    maps = []
    for name in PK_PARAM_NAMES:
        path = f"{pk_dir}/{name}.png"
        try:
            arr = _decode_grayscale(path)
            if arr.shape != (h, w):
                arr = np.asarray(
                    Image.fromarray(arr).resize((w, h), Image.NEAREST))
        except Exception:
            if warn:
                print(f"Warning: PK map {path} unreadable — zero-filling")
            arr = np.zeros((h, w), dtype=np.uint8)
        maps.append(arr)
    return np.stack(maps)


def decode_stack(paths: Sequence[str]) -> np.ndarray:
    """uint8 [N, H, W] stack of same-size grayscale images: one threaded
    native decode when available, PIL fallback otherwise (the
    load_sample_raw_native routing, minus the mask)."""
    from stf_unet_tpu.data import native_loader

    if native_loader.native_available():
        size = native_loader.image_size(paths[0])
        if size is not None:
            canvas, sizes = native_loader.decode_batch(list(paths), *size,
                                                       fill=0)
            if all(tuple(sz) == size for sz in sizes):
                return canvas
    return np.stack([_decode_grayscale(p) for p in paths])


def load_sample_raw(rec: SampleRecord, use_pk_maps: bool = False,
                    mask_format: str = "binary"
                    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """-> (frames uint8 [T, H, W], mask uint8 [H, W] in {0,1}, pk [3, H, W]).

    mask_format="binary": /255-binarized like the reference (ref:166-168);
    "index": mask pixels already hold class indices (multiclass datasets).
    Missing or unreadable PK maps zero-fill (ref:206-224).
    """
    frames = np.stack([_decode_grayscale(p) for p in rec.image_paths])
    with Image.open(rec.mask_path) as m:
        mask = np.asarray(m.convert("L"), dtype=np.uint16)
        if mask_format == "binary":
            mask = mask // 255
        mask = mask.astype(np.uint8)

    pk = None
    if use_pk_maps:
        h, w = frames.shape[1:]
        pk = load_pk_stack(rec.pk_maps_path, h, w)
    return frames, mask, pk


def load_sample_raw_native(rec: SampleRecord, use_pk_maps: bool = False,
                           mask_format: str = "binary"
                           ) -> Tuple[np.ndarray, np.ndarray,
                                      Optional[np.ndarray]]:
    """load_sample_raw via the native C++ decoder (same contract). Decodes
    all frames + mask in one threaded call at the probed native size;
    falls back to the PIL path when the library is unavailable or any
    entry fails to decode (eval must not silently zero a sample)."""
    from stf_unet_tpu.data import native_loader

    if not native_loader.native_available():
        return load_sample_raw(rec, use_pk_maps, mask_format)
    size = native_loader.image_size(rec.image_paths[0])
    if size is None:
        return load_sample_raw(rec, use_pk_maps, mask_format)
    h, w = size
    paths = list(rec.image_paths) + [rec.mask_path]
    canvas, sizes = native_loader.decode_batch(paths, h, w, fill=0)
    if not all(tuple(sz) == (h, w) for sz in sizes):
        # mixed sizes / bad file
        return load_sample_raw(rec, use_pk_maps, mask_format)
    frames = canvas[:-1]
    mask = canvas[-1]
    if mask_format == "binary":
        mask = mask // 255
    mask = mask.astype(np.uint8)

    pk = None
    if use_pk_maps:
        pk_paths = [f"{rec.pk_maps_path}/{n}.png" for n in PK_PARAM_NAMES]
        pk_canvas, pk_sizes = native_loader.decode_batch(pk_paths, h, w,
                                                         fill=0)
        maps = []
        for m, sz, path in zip(pk_canvas, pk_sizes, pk_paths):
            if tuple(sz) == (h, w):
                maps.append(m)
                continue
            try:  # PK maps at a different resolution: NEAREST-resize (PIL
                arr = _decode_grayscale(path)  # parity, ref:my_dataset 214)
                maps.append(np.asarray(
                    Image.fromarray(arr).resize((w, h), Image.NEAREST)))
            except Exception:
                maps.append(np.zeros((h, w), np.uint8))
        pk = np.stack(maps)
    return frames, mask, pk


@dataclass
class Batch:
    """Raw uint8 host batch; device transforms consume it directly."""

    frames: np.ndarray          # [B, T, H, W] uint8
    masks: np.ndarray           # [B, H, W] uint8 {0,1} (255 = pad)
    pk: Optional[np.ndarray]    # [B, 3, H, W] uint8 or None
    sizes: np.ndarray           # [B, 2] original (h, w) before canvas padding


def _pad_canvas(arrs: Sequence[np.ndarray], canvas: Tuple[int, int],
                fill: int = 0) -> np.ndarray:
    """Stack variable-size [..., H, W] arrays onto a fixed canvas,
    top-left anchored, like the reference's cat_list (ref:247-257)."""
    out_shape = (len(arrs),) + arrs[0].shape[:-2] + canvas
    out = np.full(out_shape, fill, dtype=arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, ..., :a.shape[-2], :a.shape[-1]] = a
    return out


class HostLoader:
    """Minimal epoch iterator: shuffled batches of raw uint8 samples.

    Variable source sizes are padded to the per-batch max canvas (rounded up
    to `canvas_multiple`) with image fill 0 / mask fill 255 — 255 being the
    ignore/padding label (ref:my_dataset.py:243).
    """

    def __init__(self, index: DatasetIndex, batch_size: int, *,
                 shuffle: bool, seed: int = 0, use_pk_maps: bool = False,
                 drop_last: bool = False, canvas_multiple: int = 32,
                 prefetch: int = 2, use_native: Optional[bool] = None,
                 host_index: int = 0, num_hosts: int = 1,
                 fixed_canvas: bool = True, mask_format: str = "binary",
                 cache_ram: bool = False, pack=None):
        self.index = index
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.use_pk_maps = use_pk_maps
        self.mask_format = mask_format
        self.drop_last = drop_last
        self.canvas_multiple = canvas_multiple
        self.prefetch = prefetch
        if use_native is None:
            from stf_unet_tpu.data import native_loader
            use_native = native_loader.native_available()
        self.use_native = use_native
        self.host_index = host_index
        self.num_hosts = num_hosts
        # One dataset-wide canvas keeps every batch the SAME shape, so the
        # fused augment+train program compiles exactly once (per-batch-max
        # canvases would recompile the whole step per slice geometry).
        # Probing is header-only (native stf_image_size / PIL lazy open).
        # Packed-dataset source (data/pack.py): batches come straight off
        # the pack's memmaps — no decode at all, any epoch. The pack's own
        # canvas wins (all packed arrays share it), and cache_ram is
        # redundant (the OS page cache already holds hot pack pages).
        self.pack = pack
        if pack is not None:
            pack.validate(index, mask_format=mask_format,
                          use_pk_maps=use_pk_maps)
            if cache_ram:
                print("note: --data-cache-ram ignored — the dataset pack "
                      "already serves decoded bytes")
                cache_ram = False
        self.canvas: Optional[Tuple[int, int]] = None
        if pack is not None:
            self.canvas = pack.canvas
        elif fixed_canvas and len(index) > 0:
            self.canvas = self._probe_canvas()
        # In-RAM decoded-sample cache: the first epoch decodes and caches
        # the canvas-packed uint8 sample (frames/mask/pk/size); later
        # epochs assemble batches by np.stack, skipping JPEG/PNG decode
        # entirely. On 1-2 core hosts, decode is the real end-to-end
        # training bound (the device step is tens of ms while host decode
        # is ~0.1 s/batch), so this converts epochs 1+ from decode-bound
        # to device-bound. Requires the dataset-wide fixed canvas (cached
        # arrays must keep one shape across epochs).
        self._cache: dict = {}
        self.cache_ram = bool(cache_ram) and self.canvas is not None
        if cache_ram and self.canvas is None:
            print("warning: cache_ram disabled — it requires the "
                  "fixed-canvas loader mode")
        if self.cache_ram:
            ch, cw = self.canvas
            t = len(index.records[0].image_paths) if len(index) else 0
            per = (t + 1 + (3 if use_pk_maps else 0)) * ch * cw
            print(f"RAM cache: ~{len(index) * per / 2**30:.2f} GiB of "
                  f"decoded uint8 samples after the first epoch")

    def _probe_canvas(self) -> Tuple[int, int]:
        from stf_unet_tpu.data import native_loader
        max_h = max_w = 1
        for rec in self.index.records:
            size = None
            if self.use_native:
                size = native_loader.image_size(rec.image_paths[0])
            if size is None:
                from PIL import Image
                with Image.open(rec.image_paths[0]) as im:
                    size = (im.height, im.width)
            max_h = max(max_h, size[0])
            max_w = max(max_w, size[1])
        cm = self.canvas_multiple
        return (-(-max_h // cm) * cm, -(-max_w // cm) * cm)

    def __len__(self) -> int:
        n = len(self.index) // self.num_hosts if self.num_hosts > 1 \
            else len(self.index)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, recs: List[SampleRecord]) -> Batch:
        if self.use_native:
            return self._make_batch_native(recs)
        samples = [load_sample_raw(r, self.use_pk_maps, self.mask_format)
                   for r in recs]
        sizes = np.asarray([s[0].shape[1:] for s in samples], dtype=np.int32)
        if self.canvas is not None:
            ch, cw = self.canvas
        else:
            cm = self.canvas_multiple
            ch = int(-(-sizes[:, 0].max() // cm) * cm)
            cw = int(-(-sizes[:, 1].max() // cm) * cm)
        frames = _pad_canvas([s[0] for s in samples], (ch, cw), fill=0)
        masks = _pad_canvas([s[1] for s in samples], (ch, cw), fill=255)
        pk = None
        if self.use_pk_maps:
            pk = _pad_canvas([s[2] for s in samples], (ch, cw), fill=0)
        return Batch(frames=frames, masks=masks, pk=pk, sizes=sizes)

    def _make_batch_native(self, recs: List[SampleRecord]) -> Batch:
        """Native C++ decode/pack path (data/native_loader.py): header-probe
        sizes, then one threaded decode call per tensor kind."""
        from stf_unet_tpu.data import native_loader

        b = len(recs)
        t_steps = len(recs[0].image_paths)
        if self.canvas is not None:
            ch, cw = self.canvas
        else:
            probed = [native_loader.image_size(r.image_paths[0]) or (0, 0)
                      for r in recs]
            cm = self.canvas_multiple
            ch = int(-(-max(h for h, _ in probed) // cm) * cm)
            cw = int(-(-max(w for _, w in probed) // cm) * cm)

        frame_paths = [p for r in recs for p in r.image_paths]
        canvas, fsizes = native_loader.decode_batch(frame_paths, ch, cw, fill=0)
        frames = canvas.reshape(b, t_steps, ch, cw)
        sizes = fsizes.reshape(b, t_steps, 2)[:, 0, :].copy()

        mask_canvas, msizes = native_loader.decode_batch(
            [r.mask_path for r in recs], ch, cw, fill=0)
        masks = np.full((b, ch, cw), 255, dtype=np.uint8)
        for i in range(b):
            h, w = msizes[i]
            # "binary": floor-div /255 binarization exactly like the PIL
            # path and the reference (ref:my_dataset.py:166-168: only
            # 255 -> 1); "index": raw class indices. Padding stays 255.
            if self.mask_format == "binary":
                masks[i, :h, :w] = mask_canvas[i, :h, :w] // 255
            else:
                masks[i, :h, :w] = mask_canvas[i, :h, :w]

        pk = None
        if self.use_pk_maps:
            pk_paths = [f"{r.pk_maps_path}/{n}.png"
                        for r in recs for n in PK_PARAM_NAMES]
            pk_canvas, _ = native_loader.decode_batch(pk_paths, ch, cw, fill=0)
            pk = pk_canvas.reshape(b, 3, ch, cw)
        return Batch(frames=frames, masks=masks, pk=pk, sizes=sizes)

    def epoch(self, epoch_num: int = 0,
              skip_batches: int = 0) -> Iterator[Batch]:
        """One seeded epoch. skip_batches drops the first N batches WITHOUT
        decoding them (the generator is lazy) — mid-epoch resume after a
        preemption replays the identical remaining batches
        (train/preempt.py)."""
        order = np.arange(len(self.index))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch_num)
            rng.shuffle(order)
        if self.num_hosts > 1:
            # Per-host dataset sharding for multi-host meshes (SURVEY §2.8):
            # every host draws the SAME seeded permutation, then takes its
            # strided slice — disjoint cover, no coordination traffic.
            # Truncate to the common floor so every host yields the SAME
            # number of batches (hosts proceed in lockstep).
            per_host = len(order) // self.num_hosts
            order = order[self.host_index::self.num_hosts][:per_host]
        if self.drop_last:
            order = order[: len(self) * self.batch_size]

        chunks = [order[i:i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]
        if skip_batches:
            chunks = chunks[skip_batches:]
        if self.pack is not None:
            batches = (self.pack.batch([int(i) for i in chunk],
                                       use_pk_maps=self.use_pk_maps)
                       for chunk in chunks)
        elif self.cache_ram:
            batches = (self._cached_batch([int(i) for i in chunk])
                       for chunk in chunks)
        else:
            batches = (self._make_batch([self.index[int(i)] for i in chunk])
                       for chunk in chunks)
        yield from prefetch_iterator(batches, self.prefetch)

    def _cached_batch(self, idxs: List[int]) -> Batch:
        """Assemble a batch from the RAM cache, decoding (and caching) any
        missing samples with the normal batch path first — epoch 0 keeps
        the threaded native batch decode, epochs 1+ are pure np.stack."""
        missing = [i for i in idxs if i not in self._cache]
        if missing:
            fresh = self._make_batch([self.index[i] for i in missing])
            for j, i in enumerate(missing):
                self._cache[i] = (fresh.frames[j], fresh.masks[j],
                                  None if fresh.pk is None else fresh.pk[j],
                                  fresh.sizes[j])
        samples = [self._cache[i] for i in idxs]
        return Batch(
            frames=np.stack([s[0] for s in samples]),
            masks=np.stack([s[1] for s in samples]),
            pk=(np.stack([s[2] for s in samples])
                if samples[0][2] is not None else None),
            sizes=np.stack([s[3] for s in samples]))
