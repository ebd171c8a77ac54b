"""Native C++ decoder: build, decode parity with PIL, batch packing, and
HostLoader parity between native and PIL paths."""

import numpy as np
import pytest

from stf_unet_tpu.data import DatasetIndex, HostLoader
from stf_unet_tpu.data import native_loader

SEQS = tuple(f"VIBRANT+C{i}" for i in range(1, 9))

pytestmark = pytest.mark.skipif(not native_loader.native_available(),
                                reason="native decoder unavailable")


def test_image_size_probe(synthetic_root):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    assert native_loader.image_size(idx[0].image_paths[0]) == (64, 64)


def test_decode_matches_pil(synthetic_root):
    from PIL import Image
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    paths = list(idx[0].image_paths)
    canvas, sizes = native_loader.decode_batch(paths, 64, 64)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            want = np.asarray(im.convert("L"))
        np.testing.assert_array_equal(canvas[i], want)
        assert tuple(sizes[i]) == want.shape


def test_decode_batch_padding_and_failures(tmp_path, synthetic_root):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    good = idx[0].image_paths[0]
    missing = str(tmp_path / "nope.png")
    canvas, sizes = native_loader.decode_batch([good, missing], 96, 96,
                                               fill=7)
    assert tuple(sizes[0]) == (64, 64)
    assert tuple(sizes[1]) == (0, 0)          # failure -> zero size
    assert (canvas[0, 64:, :] == 7).all()     # pad fill
    assert (canvas[1] == 7).all()             # failed slot left at fill


def test_jpeg_decode(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (40, 56), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    canvas, sizes = native_loader.decode_batch([p], 40, 56)
    with Image.open(p) as im:
        want = np.asarray(im.convert("L"))
    assert tuple(sizes[0]) == (40, 56)
    np.testing.assert_array_equal(canvas[0], want)


def test_hostloader_native_matches_pil(synthetic_root):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    nat = HostLoader(idx, batch_size=4, shuffle=False, prefetch=0,
                     use_native=True)
    pil = HostLoader(idx, batch_size=4, shuffle=False, prefetch=0,
                     use_native=False)
    bn = next(iter(nat.epoch(0)))
    bp = next(iter(pil.epoch(0)))
    np.testing.assert_array_equal(bn.frames, bp.frames)
    np.testing.assert_array_equal(bn.masks, bp.masks)
    np.testing.assert_array_equal(bn.sizes, bp.sizes)


def test_load_sample_raw_native_matches_pil(tmp_path):
    """Eval path decode: native must produce pixel-identical samples."""
    import numpy as np
    import pytest
    from stf_unet_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("native decoder unavailable")
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import load_sample_raw, load_sample_raw_native

    root = make_synthetic_breadm(str(tmp_path), size=40, time_steps=4,
                                 splits=("training",), patients_per_split=1,
                                 slices_per_patient=2, with_pk_maps=True)
    seqs = tuple(f"VIBRANT+C{i}" for i in range(1, 5))
    idx = DatasetIndex(root, "train", seqs, use_pk_maps=True)
    assert len(idx) == 2
    for rec in idx.records:
        f_p, m_p, pk_p = load_sample_raw(rec, use_pk_maps=True)
        f_n, m_n, pk_n = load_sample_raw_native(rec, use_pk_maps=True)
        np.testing.assert_array_equal(f_n, f_p)
        np.testing.assert_array_equal(m_n, m_p)
        np.testing.assert_array_equal(pk_n, pk_p)


def test_index_mask_format_native_matches_pil(tmp_path):
    """mask_format='index' (multiclass class-index masks) must decode
    identically on the native and PIL paths — raw values, no //255 — and
    both HostLoader decode paths must agree."""
    import numpy as np
    import pytest
    from stf_unet_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("native decoder unavailable")
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import (HostLoader, load_sample_raw,
                                          load_sample_raw_native)

    root = make_synthetic_breadm(str(tmp_path), size=40, time_steps=4,
                                 splits=("training",), patients_per_split=1,
                                 slices_per_patient=2, mask_classes=3)
    seqs = tuple(f"VIBRANT+C{i}" for i in range(1, 5))
    idx = DatasetIndex(root, "train", seqs)
    classes_seen = set()
    for rec in idx.records:
        _, m_p, _ = load_sample_raw(rec, mask_format="index")
        _, m_n, _ = load_sample_raw_native(rec, mask_format="index")
        np.testing.assert_array_equal(m_n, m_p)
        classes_seen |= set(np.unique(m_p).tolist())
    assert classes_seen == {0, 1, 2, 3}  # indices survived the decode

    nat = HostLoader(idx, batch_size=2, shuffle=False, prefetch=0,
                     use_native=True, mask_format="index")
    pil = HostLoader(idx, batch_size=2, shuffle=False, prefetch=0,
                     use_native=False, mask_format="index")
    bn = next(iter(nat.epoch(0)))
    bp = next(iter(pil.epoch(0)))
    np.testing.assert_array_equal(bn.masks, bp.masks)
    assert set(np.unique(bn.masks).tolist()) <= {0, 1, 2, 3, 255}


def test_load_sample_raw_native_fallback_on_bad_file(tmp_path):
    """A 0-byte frame makes the native fast path fall back to PIL, which
    surfaces a decode error instead of silently zero-filling eval data."""
    import os
    import pytest
    from stf_unet_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("native decoder unavailable")
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import load_sample_raw_native

    root = make_synthetic_breadm(str(tmp_path), size=24, time_steps=2,
                                 splits=("training",), patients_per_split=1,
                                 slices_per_patient=1)
    seqs = ("VIBRANT+C1", "VIBRANT+C2")
    idx = DatasetIndex(root, "train", seqs)
    open(idx[0].image_paths[1], "wb").close()
    with pytest.raises(Exception):
        load_sample_raw_native(idx[0])


def test_native_banded_resize_bit_identical_to_numpy():
    """The C++ banded-resize kernel (native/decoder.cpp stf_banded_resize)
    must be BIT-identical to the numpy fallback — both accumulate the f64
    taps in ascending-k order and round half-even — across down/up-scales,
    non-square shapes, and the identity size."""
    if not native_loader.native_available():
        pytest.skip("native decoder unavailable")
    from stf_unet_tpu.data.transforms import (_banded_resize_taps,
                                              banded_resize_u8)

    rng = np.random.default_rng(7)
    cases = [(256, 256, 224, 224), (520, 520, 224, 224), (48, 64, 32, 42),
             (100, 80, 224, 179), (224, 224, 224, 224), (31, 77, 64, 159),
             (64, 64, 1, 1)]
    for h, w, oh, ow in cases:
        idx_h, wgt_h = _banded_resize_taps(h, oh)
        idx_w, wgt_w = _banded_resize_taps(w, ow)
        x = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
        ref = banded_resize_u8(x, oh, ow, idx_h, wgt_h, idx_w, wgt_w,
                               force_numpy=True)
        nat = native_loader.banded_resize(x, oh, ow, idx_h, wgt_h,
                                          idx_w, wgt_w)
        np.testing.assert_array_equal(ref, nat, err_msg=f"{(h, w, oh, ow)}")


def test_eval_preprocess_native_vs_numpy_paths_identical(monkeypatch):
    """eval_preprocess output must not depend on whether the native resize
    kernel is present (the fallback host must see identical metrics)."""
    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.data.transforms import eval_preprocess

    if not native_loader.native_available():
        pytest.skip("native decoder unavailable")
    cfg = DataConfig(crop_size=48)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (4, 100, 80), dtype=np.uint8)
    mask = rng.integers(0, 2, (100, 80)).astype(np.uint8)
    with_native = eval_preprocess(frames, mask, cfg, raw=True)
    monkeypatch.setattr(native_loader, "native_available", lambda: False)
    without = eval_preprocess(frames, mask, cfg, raw=True)
    np.testing.assert_array_equal(with_native[0], without[0])
    np.testing.assert_array_equal(with_native[1], without[1])
