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
