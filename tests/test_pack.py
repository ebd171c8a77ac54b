"""Packed dataset format (data/pack.py, cli/pack.py): pack-fed batches must
be byte-identical to decode-fed ones, stale packs must fail loudly, and the
full train CLI must run end-to-end on --data-pack alone."""

import glob
import os

import numpy as np
import pytest

from stf_unet_tpu.core.config import DataConfig
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.data.loader import HostLoader
from stf_unet_tpu.data.pack import DatasetPack, open_split_pack, write_pack
from stf_unet_tpu.data.synthetic import make_synthetic_breadm

SEQ = tuple(f"VIBRANT+C{i}" for i in range(1, 9))


@pytest.fixture(scope="module")
def pack_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("breadm_pack")
    make_synthetic_breadm(str(root), size=48, time_steps=8,
                          patients_per_split=2, slices_per_patient=2,
                          with_pk_maps=True)
    return str(root)


@pytest.fixture(scope="module")
def train_pack(pack_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("packs")
    index = DatasetIndex(pack_root, "train", SEQ)
    write_pack(index, os.path.join(out, "train"))
    return DatasetPack(os.path.join(out, "train")), index, str(out)


def _epoch_batches(loader, epoch=0):
    return list(loader.epoch(epoch))


def test_pack_train_batches_byte_identical(train_pack):
    pack, index, _ = train_pack
    kw = dict(batch_size=3, shuffle=True, seed=7, prefetch=0)
    plain = HostLoader(index, **kw)
    packed = HostLoader(index, pack=pack, **kw)
    assert packed.canvas == plain.canvas
    a, b = _epoch_batches(plain, 1), _epoch_batches(packed, 1)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.frames, y.frames)
        np.testing.assert_array_equal(x.masks, y.masks)
        np.testing.assert_array_equal(x.sizes, y.sizes)
        assert x.pk is None and y.pk is None


def test_pack_eval_batches_byte_identical(train_pack):
    from stf_unet_tpu.train.loop import eval_batches_from_index
    pack, index, _ = train_pack
    cfg = DataConfig(data_path=index.root, base_size=40, crop_size=32)
    a = list(eval_batches_from_index(index, cfg, prefetch=0))
    b = list(eval_batches_from_index(index, cfg, prefetch=0, pack=pack))
    assert len(a) == len(b) > 0
    for (img0, tgt0), (img1, tgt1) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
        np.testing.assert_array_equal(np.asarray(tgt0), np.asarray(tgt1))


def test_pack_with_pk_maps(pack_root, tmp_path):
    index = DatasetIndex(pack_root, "train", SEQ, use_pk_maps=True)
    write_pack(index, str(tmp_path), use_pk_maps=True)
    pack = DatasetPack(str(tmp_path))
    kw = dict(batch_size=2, shuffle=False, prefetch=0, use_pk_maps=True)
    a = _epoch_batches(HostLoader(index, **kw))
    b = _epoch_batches(HostLoader(index, pack=pack, **kw))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.pk, y.pk)
        np.testing.assert_array_equal(x.frames, y.frames)


def test_pack_validation_failures(train_pack, pack_root):
    pack, index, _ = train_pack
    # mask_format mismatch
    with pytest.raises(ValueError, match="mask_format"):
        pack.validate(index, mask_format="index", use_pk_maps=False)
    # PK maps requested from a pack built without them
    with pytest.raises(ValueError, match="PK maps"):
        pack.validate(index, mask_format="binary", use_pk_maps=True)
    # dataset changed: different split has different records
    val_index = DatasetIndex(pack_root, "val", SEQ)
    with pytest.raises(ValueError):
        pack.validate(val_index, mask_format="binary", use_pk_maps=False)
    # sequence-set mismatch: SUB sequences have the same patients, slice
    # filenames, count, and T — only the sequence dir distinguishes them
    make_synthetic_breadm(pack_root, size=48, time_steps=8,
                          patients_per_split=2, slices_per_patient=2,
                          sequence_prefix="SUB", splits=("training",))
    sub_index = DatasetIndex(
        pack_root, "train", tuple(f"SUB{i}" for i in range(1, 9)))
    assert len(sub_index) == len(index)
    with pytest.raises(ValueError, match="sequence"):
        pack.validate(sub_index, mask_format="binary", use_pk_maps=False)
    # cache_ram is ignored (not an error) when a pack serves the bytes
    loader = HostLoader(index, 2, shuffle=False, prefetch=0, pack=pack,
                        cache_ram=True)
    assert not loader.cache_ram


def test_pack_eval_store_byte_identical(pack_root, tmp_path):
    """A pack built with eval_size serves val/test samples straight from
    the pre-materialized eval store — byte-identical to the live
    decode+resize path in both raw-uint8 and host-normalized modes."""
    from stf_unet_tpu.train.loop import eval_batches_from_index

    index = DatasetIndex(pack_root, "val", SEQ)
    write_pack(index, str(tmp_path), eval_size=32)
    pack = DatasetPack(str(tmp_path))
    assert pack.eval_size == 32 and not pack.eval_has_pk
    assert pack.serves_eval(32, use_pk_maps=False)
    assert not pack.serves_eval(40, use_pk_maps=False)
    assert not pack.serves_eval(32, use_pk_maps=True)

    cfg = DataConfig(data_path=index.root, base_size=40, crop_size=32)
    for raw in (True, False):
        live = list(eval_batches_from_index(index, cfg, prefetch=0, raw=raw))
        stored = list(eval_batches_from_index(index, cfg, prefetch=0,
                                              raw=raw, pack=pack))
        assert len(live) == len(stored) > 0
        for (img0, tgt0), (img1, tgt1) in zip(live, stored):
            assert np.asarray(img1).dtype == np.asarray(img0).dtype
            np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
            np.testing.assert_array_equal(np.asarray(tgt0), np.asarray(tgt1))


def test_pack_eval_store_with_pk_and_geometry_fallback(pack_root, tmp_path):
    """PK channels ride the eval store; a crop-size mismatch falls back to
    the live resize over pack.sample (same results, store unused)."""
    from stf_unet_tpu.train.loop import eval_batches_from_index

    index = DatasetIndex(pack_root, "val", SEQ, use_pk_maps=True)
    write_pack(index, str(tmp_path), use_pk_maps=True, eval_size=32)
    pack = DatasetPack(str(tmp_path))
    assert pack.serves_eval(32, use_pk_maps=True)
    img, tgt = pack.eval_sample(0)
    assert img.shape[0] == 8 + 3  # frames + ktrans/ve/vp

    for crop in (32, 24):  # 24 = geometry mismatch -> live fallback
        cfg = DataConfig(data_path=index.root, base_size=40, crop_size=crop,
                         use_pk_maps=True)
        live = list(eval_batches_from_index(index, cfg, prefetch=0,
                                            use_pk_maps=True))
        stored = list(eval_batches_from_index(index, cfg, prefetch=0,
                                              use_pk_maps=True, pack=pack))
        for (img0, tgt0), (img1, tgt1) in zip(live, stored):
            np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
            np.testing.assert_array_equal(np.asarray(tgt0), np.asarray(tgt1))


def test_pack_without_eval_store_rejects_eval_sample(train_pack):
    pack, _, _ = train_pack
    assert pack.eval_size is None
    with pytest.raises(ValueError, match="--eval-size"):
        pack.eval_sample(0)


def test_pack_missing_dir_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="stf_unet_tpu.cli.pack"):
        open_split_pack(str(tmp_path), "train")


def test_pack_cli_then_train_cli(pack_root, tmp_path):
    """stf-pack over every split, then the full train CLI running on
    --data-pack alone (train batches, val epochs, and the test-phase
    eval all ride the pack)."""
    from stf_unet_tpu.cli.pack import main as pack_main
    from stf_unet_tpu.cli.train import run

    out_root = os.path.join(tmp_path, "pack")
    pack_main(["--data-path", pack_root, "--output", out_root])
    for mode in ("train", "val", "test"):
        assert os.path.exists(os.path.join(out_root, mode, "meta.json"))

    result = run([
        "--model", "unet", "--data-path", pack_root,
        "--data-pack", out_root,
        "--batch-size", "2", "--epochs", "1",
        "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--save-dir", os.path.join(tmp_path, "weights"),
        "--output-dir", os.path.join(tmp_path, "output"),
        "--print-freq", "1",
    ])
    assert np.isfinite(result["test"]["dice"])
    assert glob.glob(os.path.join(tmp_path, "output", "unet_results_*.txt"))

    # cli/test with and without --data-pack: identical metrics
    from stf_unet_tpu.cli.test import main as test_main
    base = ["--model", "unet",
            "--model-dir", os.path.join(tmp_path, "weights"),
            "--root", pack_root,
            "--output-dir", os.path.join(tmp_path, "output", "t")]
    plain = test_main(base)
    packed = test_main(base + ["--data-pack", out_root])
    assert packed["dice"] == plain["dice"]
    np.testing.assert_array_equal(packed["confusion_matrix"],
                                  plain["confusion_matrix"])


def test_pack_cli_eval_size_never_applies_to_train():
    """An explicit --eval-size must still restrict the eval store to the
    splits the eval path reads (val/test); train would be dead bytes."""
    import argparse
    from stf_unet_tpu.cli import pack as pack_cli

    # exercise the CLI's split_eval_size via a tiny shim of main()'s logic:
    # parse the real flags, then call the closure indirectly by invoking
    # main with a stub pack_split that records what it was asked to build.
    calls = {}

    def fake_pack_split(data_cfg, mode, out_root, *, batch_size,
                        eval_size=None, **kw):
        calls[mode] = eval_size
        return {"n": 1, "t": 8, "canvas": [8, 8]}

    orig = pack_cli.pack_split
    pack_cli.pack_split = fake_pack_split
    try:
        pack_cli.main(["--data-path", "/nonexistent", "--output", "/tmp/x",
                       "--eval-size", "224"])
    finally:
        pack_cli.pack_split = orig
    assert calls == {"train": None, "val": 224, "test": 224}
