"""Data pipeline tests: index scanner fault tolerance, loader batching,
device augmentation invariants, eval preprocessing parity."""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stf_unet_tpu.core.config import DataConfig
from stf_unet_tpu.data import (DatasetIndex, HostLoader, TrainAugment,
                               make_synthetic_breadm)
from stf_unet_tpu.data.loader import load_sample_raw
from stf_unet_tpu.data.transforms import eval_preprocess

SEQS = tuple(f"VIBRANT+C{i}" for i in range(1, 9))


def test_index_finds_all_samples(synthetic_root):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    assert len(idx) == 4  # 2 patients x 2 slices
    rec = idx[0]
    assert len(rec.image_paths) == 8
    assert os.path.exists(rec.mask_path)


def test_index_warn_and_skip(tmp_path, capsys):
    root = make_synthetic_breadm(str(tmp_path), size=32,
                                 patients_per_split=2, slices_per_patient=1)
    shutil.rmtree(os.path.join(root, "seg/training/images/P000/VIBRANT+C3"))
    os.remove(os.path.join(root, "seg/training/labels/P001/VIBRANT+C1/slice_000.png"))
    idx = DatasetIndex(root, "train", SEQS)
    out = capsys.readouterr().out
    assert "Warning: Sequence VIBRANT+C3 not found for patient P000" in out
    assert "Warning: No mask found" in out
    assert len(idx) == 0


def test_index_pk_maps_required(tmp_path):
    root = make_synthetic_breadm(str(tmp_path), size=32, patients_per_split=1,
                                 slices_per_patient=1, with_pk_maps=False)
    idx = DatasetIndex(root, "train", SEQS, use_pk_maps=True)
    assert len(idx) == 0  # no pk_maps dir -> patient skipped (ref:79-89)


def test_index_invalid_mode(synthetic_root):
    with pytest.raises(ValueError):
        DatasetIndex(synthetic_root, "validation", SEQS)


def test_load_sample_raw(synthetic_root):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    frames, mask, pk = load_sample_raw(idx[0])
    assert frames.shape == (8, 64, 64) and frames.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 1})  # /255 binarized (ref:166-168)
    assert pk is None


def test_loader_batches_and_padding(synthetic_root):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    loader = HostLoader(idx, batch_size=3, shuffle=True, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # 4 samples / bs 3 -> 2 (no drop_last)
    b = batches[0]
    assert b.frames.shape == (3, 8, 64, 64)
    assert b.masks.shape == (3, 64, 64)
    assert b.sizes.tolist() == [[64, 64]] * 3


def test_loader_shuffle_is_seeded(synthetic_root):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    l1 = HostLoader(idx, batch_size=4, shuffle=True, seed=7, prefetch=0)
    l2 = HostLoader(idx, batch_size=4, shuffle=True, seed=7, prefetch=0)
    b1 = next(iter(l1.epoch(3)))
    b2 = next(iter(l2.epoch(3)))
    np.testing.assert_array_equal(b1.frames, b2.frames)


def test_augment_shapes_and_labels():
    cfg = DataConfig(base_size=48, crop_size=32)
    aug = TrainAugment(cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 8, 48, 40), dtype=np.uint8)
    masks = rng.integers(0, 2, (2, 48, 40)).astype(np.uint8)
    sizes = np.array([[48, 40], [30, 40]], dtype=np.int32)
    imgs, tgts = aug(jax.random.key(0), jnp.asarray(frames),
                     jnp.asarray(masks), jnp.asarray(sizes))
    assert imgs.shape == (2, 8, 32, 32, 1)
    assert tgts.shape == (2, 32, 32)
    assert set(np.unique(np.asarray(tgts))).issubset({0, 1})


def test_augment_shared_across_frames():
    """All T frames of one sample get the SAME transform — the deliberate
    fix of ref:my_dataset.py:173-179's per-frame re-roll."""
    cfg = DataConfig(base_size=48, crop_size=32, hflip_prob=1.0,
                     vflip_prob=0.0, rotate_prob=0.0)
    aug = TrainAugment(cfg)
    base = np.arange(48 * 48, dtype=np.uint8).reshape(48, 48) % 251
    frames = np.stack([base] * 8)[None]  # identical frames
    masks = np.zeros((1, 48, 48), np.uint8)
    sizes = np.array([[48, 48]], np.int32)
    imgs, _ = aug(jax.random.key(0), jnp.asarray(frames), jnp.asarray(masks),
                  jnp.asarray(sizes))
    arr = np.asarray(imgs)[0, :, :, :, 0]
    for t in range(1, 8):
        np.testing.assert_allclose(arr[t], arr[0], atol=1e-5)


def test_augment_pk_appended_as_steps():
    cfg = DataConfig(base_size=48, crop_size=32)
    aug = TrainAugment(cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (1, 8, 48, 48), dtype=np.uint8)
    masks = np.zeros((1, 48, 48), np.uint8)
    sizes = np.array([[48, 48]], np.int32)
    pk = rng.integers(0, 255, (1, 3, 48, 48), dtype=np.uint8)
    imgs, _ = aug(jax.random.key(0), jnp.asarray(frames), jnp.asarray(masks),
                  jnp.asarray(sizes), jnp.asarray(pk))
    assert imgs.shape == (1, 11, 32, 32, 1)  # 8 frames + 3 pk pseudo-steps


def test_eval_preprocess_short_edge_and_mask():
    from PIL import Image
    cfg = DataConfig(crop_size=32)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 48, 64), dtype=np.uint8)
    mask = rng.integers(0, 2, (48, 64)).astype(np.uint8)
    img, tgt = eval_preprocess(frames, mask, cfg)
    assert img.shape == (2, 32, 42, 1)  # short edge 48 -> 32, int(64*32/48) -> 42
    assert tgt.shape == (32, 42)
    # image channel 0 == PIL bilinear of frame 0 (normalized)
    pil = np.asarray(Image.fromarray(frames[0]).resize((42, 32), Image.BILINEAR))
    expect = (pil.astype(np.float32) / 255.0 - cfg.mean) / cfg.std
    # PIL's fixed-point rounding vs our float rounding: <= 1 intensity level
    one_level = (1.0 / 255.0) / cfg.std
    np.testing.assert_allclose(img[0, :, :, 0], expect, atol=one_level * 1.01)
    # mask values still {0,1}
    assert set(np.unique(tgt)).issubset({0, 1})


def test_loader_host_sharding(synthetic_root):
    """Multi-host slicing: same seeded permutation, disjoint strided cover."""
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    all_ids = []
    for host in range(2):
        loader = HostLoader(idx, batch_size=1, shuffle=True, seed=5,
                            prefetch=0, host_index=host, num_hosts=2)
        assert len(loader) == 2  # 4 samples / 2 hosts / bs 1
        for batch in loader.epoch(0):
            all_ids.append(batch.frames.tobytes())
    assert len(all_ids) == 4
    assert len(set(all_ids)) == 4  # disjoint cover, no duplicates


def test_augment_per_frame_reroll_mode():
    """shared_frame_augmentation=False reproduces the reference's per-frame
    re-roll (ref:my_dataset.py:173-179): identical frames come out DIFFERENT."""
    cfg = DataConfig(base_size=48, crop_size=32,
                     shared_frame_augmentation=False)
    aug = TrainAugment(cfg)
    base = np.arange(48 * 48, dtype=np.uint8).reshape(48, 48) % 251
    frames = np.stack([base] * 8)[None]
    masks = np.zeros((1, 48, 48), np.uint8)
    sizes = np.array([[48, 48]], np.int32)
    imgs, _ = aug(jax.random.key(0), jnp.asarray(frames), jnp.asarray(masks),
                  jnp.asarray(sizes))
    arr = np.asarray(imgs)[0, :, :, :, 0]
    diffs = [np.abs(arr[t] - arr[0]).max() for t in range(1, 8)]
    assert max(diffs) > 0.1  # at least one frame drew a different transform


def test_prefetch_error_surfaces(synthetic_root):
    """A failing decode in the prefetch thread must raise, not silently
    truncate the epoch."""
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    loader = HostLoader(idx, batch_size=2, shuffle=False, prefetch=2,
                        use_native=False)
    # sabotage one record's frame path
    import dataclasses as dc
    rec = idx.records[2]
    idx.records[2] = dc.replace(rec, image_paths=("/nope/missing.png",) * 8)
    try:
        with pytest.raises(RuntimeError, match="prefetch"):
            list(loader.epoch(0))
    finally:
        idx.records[2] = rec


def test_config_single_element_tuple_override():
    from stf_unet_tpu.core.config import parse_config
    cfg = parse_config(["--data-sequence-types", "SUB1"])
    assert cfg.data.resolved_sequence_types == ("SUB1",)
    cfg2 = parse_config(["--data-sequence-types", "SUB1,SUB2"])
    assert cfg2.data.resolved_sequence_types == ("SUB1", "SUB2")


def test_config_bare_boolean_flags():
    """Reference-style bare flags (store_true) must work (ref:train.py:102-118)."""
    from stf_unet_tpu.core.config import parse_config
    cfg = parse_config(["--use-subtraction", "--use-pk-maps", "--amp",
                        "--silent", "false"])
    assert cfg.data.use_subtraction is True
    assert cfg.data.use_pk_maps is True
    assert cfg.model.use_pk_maps is True
    assert cfg.amp is True
    assert cfg.silent is False


def test_config_reference_command_line_runs_unchanged(capsys):
    """A reference user's full train.py command line (ref:train.py:96-121)
    parses without modification: vestigial flags (--device, --workers,
    --momentum) are accepted and ignored with a notice (MIGRATION.md)."""
    from stf_unet_tpu.core.config import parse_config
    cfg = parse_config([
        "--model", "stflstm", "--data-path", "/data/BreaDM",
        "--num-classes", "1", "--device", "cuda:0", "--batch-size", "16",
        "--epochs", "100", "--lr", "0.001", "--momentum", "0.9",
        "--weight-decay", "1e-4", "--print-freq", "10", "--workers", "4",
        "--amp", "--save-best", "--use-pk-maps",
    ])
    assert cfg.model.model == "stflstm"
    assert cfg.data.data_path == "/data/BreaDM"
    assert cfg.batch_size == 16 and cfg.amp is True
    assert cfg.optim.lr == 0.001 and cfg.optim.weight_decay == 1e-4
    out = capsys.readouterr().out
    for flag in ("--device", "--workers", "--momentum"):
        assert flag in out  # the ignored-flag notice names each flag


def test_affine_warp_matches_pil_resize_crop():
    """Fixed-parameter check of the fused warp: upscale x2 (PIL bilinear has
    no antialias when upscaling) + crop == PIL resize -> crop."""
    from PIL import Image
    from stf_unet_tpu.data.transforms import _bilinear_gather, _build_affine

    rng = np.random.default_rng(9)
    src = rng.integers(0, 255, (32, 32), dtype=np.uint8)

    # PIL chain: short edge 32 -> 64 (scale 2), crop 48x48 at (y0=8, x0=5)
    pil = Image.fromarray(src).resize((64, 64), Image.BILINEAR)
    want = np.asarray(pil, dtype=np.float32)[8:8 + 48, 5:5 + 48] / 255.0

    compose = _build_affine(
        scale=jnp.float32(2.0), res_h=jnp.float32(64.0),
        res_w=jnp.float32(64.0), hflip=jnp.asarray(False),
        vflip=jnp.asarray(False), angle=jnp.float32(0.0),
        y0=jnp.float32(8.0), x0=jnp.float32(5.0))
    gy, gx = compose(*jnp.meshgrid(jnp.arange(48, dtype=jnp.float32),
                                   jnp.arange(48, dtype=jnp.float32),
                                   indexing="ij"))
    got = np.asarray(_bilinear_gather(
        jnp.asarray(src, jnp.float32) / 255.0, gy, gx,
        jnp.float32(32), jnp.float32(32)))
    # PIL rounds to uint8 after resize; allow 1 intensity level
    assert np.abs(got - want).max() <= (1.0 / 255.0) * 1.01


def test_affine_warp_flip_parity():
    """hflip in the composed warp == PIL transpose on the resized image."""
    from PIL import Image
    from stf_unet_tpu.data.transforms import _bilinear_gather, _build_affine

    rng = np.random.default_rng(10)
    src = rng.integers(0, 255, (24, 24), dtype=np.uint8)
    pil = Image.fromarray(src).resize((48, 48), Image.BILINEAR)
    flipped = pil.transpose(Image.FLIP_LEFT_RIGHT)
    want = np.asarray(flipped, dtype=np.float32)[4:4 + 32, 6:6 + 32] / 255.0

    compose = _build_affine(
        scale=jnp.float32(2.0), res_h=jnp.float32(48.0),
        res_w=jnp.float32(48.0), hflip=jnp.asarray(True),
        vflip=jnp.asarray(False), angle=jnp.float32(0.0),
        y0=jnp.float32(4.0), x0=jnp.float32(6.0))
    gy, gx = compose(*jnp.meshgrid(jnp.arange(32, dtype=jnp.float32),
                                   jnp.arange(32, dtype=jnp.float32),
                                   indexing="ij"))
    got = np.asarray(_bilinear_gather(
        jnp.asarray(src, jnp.float32) / 255.0, gy, gx,
        jnp.float32(24), jnp.float32(24)))
    assert np.abs(got - want).max() <= (1.0 / 255.0) * 1.01


def test_affine_warp_rotation_matches_pil():
    """Rotation component == PIL Image.rotate (CCW, bilinear, expand=False)
    to 1 intensity level away from the border fill."""
    from PIL import Image
    from stf_unet_tpu.data.transforms import _bilinear_gather, _build_affine

    rng = np.random.default_rng(11)
    src = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    angle = 20.0
    pil = Image.fromarray(src).rotate(angle, resample=Image.BILINEAR,
                                      expand=False)
    want = np.asarray(pil, np.float32)[16:48, 16:48] / 255.0

    compose = _build_affine(
        scale=jnp.float32(1.0), res_h=jnp.float32(64.0),
        res_w=jnp.float32(64.0), hflip=jnp.asarray(False),
        vflip=jnp.asarray(False), angle=jnp.float32(np.deg2rad(angle)),
        y0=jnp.float32(16.0), x0=jnp.float32(16.0))
    gy, gx = compose(*jnp.meshgrid(jnp.arange(32, dtype=jnp.float32),
                                   jnp.arange(32, dtype=jnp.float32),
                                   indexing="ij"))
    got = np.asarray(_bilinear_gather(
        jnp.asarray(src, jnp.float32) / 255.0, gy, gx,
        jnp.float32(64), jnp.float32(64)))
    assert np.abs(got - want).max() <= (1.0 / 255.0) * 1.5


# ---------------------------------------------------------------------------
# Real-data readiness audit (VERDICT r1 next-step 10): adversarial layouts
# the reference's fault-tolerance hooks exist for (ref:my_dataset.py:69-126
# warn-and-skip, :151-153 imdecode fallback for non-ASCII paths).
# ---------------------------------------------------------------------------

def _write_tree(root, patient, seqs, slices_by_seq, mask_slices, size=24,
                img_ext=".png"):
    """Minimal BreaDM tree builder with per-sequence slice control."""
    import os
    from PIL import Image
    import numpy as np
    rng = np.random.default_rng(0)
    base = os.path.join(root, "seg", "training")
    for seq in seqs:
        d = os.path.join(base, "images", patient, seq)
        os.makedirs(d, exist_ok=True)
        for name in slices_by_seq.get(seq, []):
            arr = rng.integers(0, 255, (size, size), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, name))
    md = os.path.join(base, "labels", patient, seqs[0])
    os.makedirs(md, exist_ok=True)
    for name in mask_slices:
        m = np.zeros((size, size), np.uint8)
        m[6:12, 6:12] = 255
        Image.fromarray(m).save(os.path.join(md, name))
    return root


SEQS4 = tuple(f"VIBRANT+C{i}" for i in range(1, 5))


def test_audit_mixed_jpg_same_name(tmp_path):
    """A slice stored as .jpg with the same filename in EVERY sequence is
    accepted and decodes (ref keeps exact-filename matching, :96-108)."""
    from stf_unet_tpu.data import DatasetIndex
    from stf_unet_tpu.data.loader import load_sample_raw
    root = _write_tree(str(tmp_path), "P0", SEQS4,
                       {s: ["s0.jpg"] for s in SEQS4}, ["s0.png"])
    idx = DatasetIndex(root, "train", SEQS4)
    assert len(idx) == 1
    frames, mask, _ = load_sample_raw(idx[0])
    assert frames.shape == (4, 24, 24)
    assert set(np.unique(mask)) <= {0, 1}


def test_audit_extension_mismatch_across_sequences_skipped(tmp_path, capsys):
    """slice.jpg in seq1 but slice.png in the others -> filename does not
    match in every sequence -> sample skipped (reference rule)."""
    from stf_unet_tpu.data import DatasetIndex
    slices = {SEQS4[0]: ["s0.jpg"]}
    for s in SEQS4[1:]:
        slices[s] = ["s0.png"]
    root = _write_tree(str(tmp_path), "P0", SEQS4, slices, ["s0.png"])
    idx = DatasetIndex(root, "train", SEQS4)
    assert len(idx) == 0


def test_audit_non_ascii_patient_dir(tmp_path):
    """Non-ASCII patient directories index and decode on both the PIL and
    the native C++ paths (the reference needs an imdecode fallback for
    this, ref:151-153; PIL/libjpeg take raw bytes so no fallback needed)."""
    from stf_unet_tpu.data import DatasetIndex
    from stf_unet_tpu.data.loader import HostLoader, load_sample_raw
    root = _write_tree(str(tmp_path), "病人001", SEQS4,
                       {s: ["切片_000.png"] for s in SEQS4}, ["切片_000.png"])
    idx = DatasetIndex(root, "train", SEQS4)
    assert len(idx) == 1
    frames, mask, _ = load_sample_raw(idx[0])
    assert frames.shape == (4, 24, 24)

    from stf_unet_tpu.data import native_loader
    if native_loader.native_available():
        loader = HostLoader(idx, batch_size=1, shuffle=False, use_native=True)
        batch = next(loader.epoch(0))
        assert batch.frames.shape[0] == 1
        # native decode produced real pixels (size recorded, not zero)
        assert tuple(batch.sizes[0]) == (24, 24)
        np.testing.assert_array_equal(
            batch.frames[0, 0, :24, :24], frames[0])


def test_audit_mismatched_slice_sets(tmp_path):
    """seq2 missing one slice -> only the complete slice survives."""
    from stf_unet_tpu.data import DatasetIndex
    slices = {s: ["a.png", "b.png"] for s in SEQS4}
    slices[SEQS4[1]] = ["a.png"]  # b.png missing in sequence 2
    root = _write_tree(str(tmp_path), "P0", SEQS4, slices,
                       ["a.png", "b.png"])
    idx = DatasetIndex(root, "train", SEQS4)
    assert len(idx) == 1
    assert idx[0].image_paths[0].endswith("a.png")


def test_audit_zero_byte_image_pil_path(tmp_path):
    """A 0-byte image file passes the filename-only scan (as in the
    reference) and surfaces a clear decode error from the loader."""
    import os
    from stf_unet_tpu.data import DatasetIndex
    from stf_unet_tpu.data.loader import HostLoader
    root = _write_tree(str(tmp_path), "P0", SEQS4,
                       {s: ["s0.png"] for s in SEQS4}, ["s0.png"])
    bad = os.path.join(root, "seg", "training", "images", "P0", SEQS4[2],
                       "s0.png")
    open(bad, "wb").close()  # truncate to 0 bytes
    idx = DatasetIndex(root, "train", SEQS4)
    assert len(idx) == 1  # scan is filename-only, like the reference
    loader = HostLoader(idx, batch_size=1, shuffle=False, use_native=False,
                        prefetch=2)
    with pytest.raises(RuntimeError, match="prefetch"):
        list(loader.epoch(0))


def test_audit_zero_byte_image_native_isolation(tmp_path):
    """The native decoder isolates failures: a 0-byte frame yields a
    zero-size entry and fill pixels instead of crashing the batch."""
    import os
    from stf_unet_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("native decoder unavailable")
    from PIL import Image
    good = str(tmp_path / "good.png")
    Image.fromarray(np.full((8, 8), 7, np.uint8)).save(good)
    bad = str(tmp_path / "bad.png")
    open(bad, "wb").close()
    canvas, sizes = native_loader.decode_batch([good, bad], 8, 8, fill=0)
    assert tuple(sizes[0]) == (8, 8)
    assert tuple(sizes[1]) == (0, 0)
    assert (canvas[0] == 7).all()
    assert (canvas[1] == 0).all()


def test_audit_zero_byte_mask_native_ignored(tmp_path):
    """A 0-byte mask on the native path leaves the sample's mask all-255
    (ignore label) — the sample contributes nothing to loss/metrics rather
    than poisoning them."""
    import os
    from stf_unet_tpu.data import DatasetIndex, native_loader
    from stf_unet_tpu.data.loader import HostLoader
    if not native_loader.native_available():
        pytest.skip("native decoder unavailable")
    root = _write_tree(str(tmp_path), "P0", SEQS4,
                       {s: ["s0.png"] for s in SEQS4}, ["s0.png"])
    bad = os.path.join(root, "seg", "training", "labels", "P0", SEQS4[0],
                       "s0.png")
    open(bad, "wb").close()
    idx = DatasetIndex(root, "train", SEQS4)
    loader = HostLoader(idx, batch_size=1, shuffle=False, use_native=True)
    batch = next(loader.epoch(0))
    assert (batch.masks == 255).all()


def test_fused_warp_matches_standalone_gathers():
    """_warp_bilinear_and_nearest (mask riding the frame tap gathers) must
    reproduce _bilinear_gather + _nearest_gather exactly — including
    banker's-rounding nearest selection, 255 canvas padding, and
    out-of-valid zero/fill handling."""
    import jax.numpy as jnp

    from stf_unet_tpu.data.transforms import (_bilinear_gather,
                                              _nearest_gather,
                                              _warp_bilinear_and_nearest)

    rng = np.random.default_rng(7)
    h = w = 40
    chans = jnp.asarray(rng.random((5, h, w)), jnp.float32)
    mask = np.full((h, w), 255, np.uint8)
    mask[:33, :37] = rng.integers(0, 2, (33, 37))  # valid region + 255 pad
    mask_f = jnp.asarray(mask, jnp.float32)
    # coords spanning in-range, out-of-range, and exact .5 fractions
    gy = jnp.asarray(rng.uniform(-3, h + 2, (24, 24)), jnp.float32)
    gx = jnp.asarray(rng.uniform(-3, w + 2, (24, 24)), jnp.float32)
    gy = gy.at[0, :8].set(jnp.arange(8, dtype=jnp.float32) + 0.5)
    gx = gx.at[0, :8].set(jnp.arange(8, dtype=jnp.float32) + 0.5)
    valid_h, valid_w = jnp.float32(33), jnp.float32(37)

    bil, near = _warp_bilinear_and_nearest(chans, mask_f, gy, gx,
                                           valid_h, valid_w)
    want_bil = _bilinear_gather(chans, gy, gx, valid_h, valid_w)
    want_near = _nearest_gather(jnp.asarray(mask, jnp.int32), gy, gx,
                                valid_h, valid_w, fill=0)
    np.testing.assert_array_equal(np.asarray(bil), np.asarray(want_bil))
    np.testing.assert_array_equal(np.asarray(near).astype(np.int32),
                                  np.asarray(want_near))


def test_fused_warp_bf16_raw_scale_exact():
    """The shared augment path gathers RAW uint8-scale values in bf16
    (integers 0..255 are bf16-exact, half the gathered bytes). The result
    must be bit-identical to gathering the same raw values in f32."""
    import jax.numpy as jnp

    from stf_unet_tpu.data.transforms import _warp_bilinear_and_nearest

    rng = np.random.default_rng(3)
    h = w = 40
    raw = rng.integers(0, 256, (5, h, w)).astype(np.uint8)
    mask = rng.integers(0, 2, (h, w)).astype(np.uint8) * 255
    gy = jnp.asarray(rng.uniform(-2, h + 1, (16, 16)), jnp.float32)
    gx = jnp.asarray(rng.uniform(-2, w + 1, (16, 16)), jnp.float32)
    vh, vw = jnp.float32(h), jnp.float32(w)

    bil16, near16 = _warp_bilinear_and_nearest(
        jnp.asarray(raw, jnp.bfloat16), jnp.asarray(mask, jnp.bfloat16),
        gy, gx, vh, vw)
    bil32, near32 = _warp_bilinear_and_nearest(
        jnp.asarray(raw, jnp.float32), jnp.asarray(mask, jnp.float32),
        gy, gx, vh, vw)
    np.testing.assert_array_equal(np.asarray(bil16), np.asarray(bil32))
    np.testing.assert_array_equal(np.asarray(near16), np.asarray(near32))


def test_tap_dtype_variants_bit_identical(monkeypatch):
    """STF_UNET_TAP_DTYPE is a pure performance knob (transforms._tap_dtype):
    the full TrainAugment program must produce bit-identical images and
    targets for every tap dtype, since raw-scale 0..255 integers are exact
    in f32, bf16, and uint8 alike."""
    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.data.transforms import TrainAugment

    rng = np.random.default_rng(11)
    b, t, src = 2, 3, 48
    frames = rng.integers(0, 256, (b, t, src, src)).astype(np.uint8)
    masks = rng.integers(0, 2, (b, src, src)).astype(np.uint8)
    sizes = np.full((b, 2), src, np.int32)
    cfg = DataConfig(base_size=src, crop_size=32)
    outs = {}
    for dt in ("bf16", "f32", "u8"):
        monkeypatch.setenv("STF_UNET_TAP_DTYPE", dt)
        aug = TrainAugment(cfg)  # fresh instance -> fresh trace
        img, tgt = aug(jax.random.key(5), frames, masks, sizes)
        outs[dt] = (np.asarray(img), np.asarray(tgt))
    for dt in ("f32", "u8"):
        np.testing.assert_array_equal(outs[dt][0], outs["bf16"][0])
        np.testing.assert_array_equal(outs[dt][1], outs["bf16"][1])


def test_warp_gather_modes_bit_identical(monkeypatch):
    """STF_UNET_WARP_GATHER is a pure performance knob
    (transforms._warp_gather_mode): the patch modes fetch each output
    pixel's 2x2 tap window with ONE gather index and reconstruct the four
    taps by in-register selects.

    Contract pinned here, two levels:
      1. The WARP ITSELF (_warp_bilinear_and_nearest as its own jitted
         program) is bit-identical across all three modes — values,
         out-of-range fills (rotation corners), canvas-padded valid
         regions, nearest-mask banker's rounding.
      2. Inside the full fused TrainAugment program, TARGETS stay exact
         (pure selects) and IMAGES agree to a few f32 ulps of the
         normalize epilogue (~5e-5 in z-scored units): the mode changes
         the gather's graph structure, so XLA's fusion/FMA reassociation
         of the lerp+normalize chain may round differently — that is a
         compiler freedom, not a semantics difference.
    """
    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.data.transforms import (TrainAugment,
                                              _warp_bilinear_and_nearest)

    rng = np.random.default_rng(12)
    b, t, src = 4, 3, 48
    frames = rng.integers(0, 256, (b, t, src, src)).astype(np.uint8)
    masks = rng.integers(0, 2, (b, src, src)).astype(np.uint8)
    # canvas padding: two samples have a smaller valid region (and one is
    # non-square), exercising the valid_h/valid_w fill path
    sizes = np.full((b, 2), src, np.int32)
    sizes[1] = (40, 48)
    sizes[2] = (37, 31)
    cfg = DataConfig(base_size=src, crop_size=32)

    # level 1: the isolated warp program, coords straddling every edge
    chans = jnp.asarray(frames[0], jnp.bfloat16)
    mask1 = jnp.asarray(masks[0], jnp.bfloat16)
    gy = jnp.asarray(rng.uniform(-3, src + 2, (32, 32)), jnp.float32)
    gx = jnp.asarray(rng.uniform(-3, src + 2, (32, 32)), jnp.float32)
    warp_outs = {}
    for mode in ("point", "patch", "patch_chw"):
        monkeypatch.setenv("STF_UNET_WARP_GATHER", mode)
        f = jax.jit(lambda c, m, y, x: _warp_bilinear_and_nearest(
            c, m, y, x, jnp.float32(40), jnp.float32(src)))
        bil, near = f(chans, mask1, gy, gx)
        warp_outs[mode] = (np.asarray(bil), np.asarray(near))
    for mode in ("patch", "patch_chw"):
        np.testing.assert_array_equal(warp_outs[mode][0],
                                      warp_outs["point"][0])
        np.testing.assert_array_equal(warp_outs[mode][1],
                                      warp_outs["point"][1])

    # level 2: the full fused augment program
    outs = {}
    for mode in ("point", "patch", "patch_chw"):
        monkeypatch.setenv("STF_UNET_WARP_GATHER", mode)
        aug = TrainAugment(cfg)  # fresh instance -> fresh trace
        img, tgt = aug(jax.random.key(7), frames, masks, sizes)
        outs[mode] = (np.asarray(img), np.asarray(tgt))
    for mode in ("patch", "patch_chw"):
        np.testing.assert_array_equal(outs[mode][1], outs["point"][1])
        np.testing.assert_allclose(outs[mode][0], outs["point"][0],
                                   rtol=0, atol=5e-5)


def test_cache_ram_epochs_identical_to_decode(synthetic_root):
    """cache_ram: epoch 0 (decode+populate) and epoch 1+ (pure np.stack
    from cache) yield byte-identical batches to the uncached loader, and
    epoch 1 touches no decode path (cache fully populated)."""
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    plain = HostLoader(idx, batch_size=3, shuffle=True, seed=9, prefetch=0)
    cached = HostLoader(idx, batch_size=3, shuffle=True, seed=9, prefetch=0,
                        cache_ram=True)
    assert cached.cache_ram
    for epoch in (0, 1, 2):
        for a, b in zip(plain.epoch(epoch), cached.epoch(epoch)):
            np.testing.assert_array_equal(a.frames, b.frames)
            np.testing.assert_array_equal(a.masks, b.masks)
            np.testing.assert_array_equal(a.sizes, b.sizes)
            assert (a.pk is None) == (b.pk is None)
        if epoch == 0:
            assert len(cached._cache) == len(idx)
            # epoch 1+ must not decode: poison the decode path
            cached._make_batch = None  # type: ignore[assignment]


def test_cache_ram_requires_fixed_canvas(synthetic_root, capsys):
    idx = DatasetIndex(synthetic_root, "train", SEQS)
    loader = HostLoader(idx, batch_size=2, shuffle=False, prefetch=0,
                        fixed_canvas=False, cache_ram=True)
    assert not loader.cache_ram  # disabled with a warning, not broken
    assert "cache_ram disabled" in capsys.readouterr().out
    list(loader.epoch(0))  # still iterates via the decode path


def test_cached_eval_batches_replay_identical(synthetic_root):
    """CachedEvalBatches: second iteration replays byte-identical batches
    without re-invoking the factory; an interrupted first pass does not
    poison the cache."""
    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.train.loop import (CachedEvalBatches,
                                         eval_batches_from_index)

    idx = DatasetIndex(synthetic_root, "val", SEQS)
    cfg = DataConfig(crop_size=32)
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return eval_batches_from_index(idx, cfg, prefetch=0)

    cached = CachedEvalBatches(factory)
    it = iter(cached)
    next(it)  # interrupted first pass
    del it
    first = [(i.copy(), t.copy()) for i, t in cached]   # full pass
    second = list(cached)
    assert calls["n"] == 2  # interrupted + full; the replay doesn't call
    assert len(first) == len(second) > 0
    for (i1, t1), (i2, t2) in zip(first, second):
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(t1, t2)


def test_affine_warp_rotation_property_sweep_vs_pil():
    """Property sweep of the rotation component: 12 random (angle, source
    size, crop offset) configs vs PIL Image.rotate + crop — the golden
    fixed-parameter test generalized, so no angle/offset family regresses
    silently."""
    from PIL import Image
    from stf_unet_tpu.data.transforms import _bilinear_gather, _build_affine

    rng = np.random.default_rng(42)
    for trial in range(12):
        size = int(rng.integers(40, 97))
        crop = int(rng.integers(16, size // 2 + 8))
        angle = float(rng.uniform(-30.0, 30.0))
        y0 = int(rng.integers(0, size - crop))
        x0 = int(rng.integers(0, size - crop))
        src = rng.integers(0, 255, (size, size), dtype=np.uint8)

        pil = Image.fromarray(src).rotate(angle, resample=Image.BILINEAR,
                                          expand=False)
        want = np.asarray(pil, np.float32)[y0:y0 + crop,
                                           x0:x0 + crop] / 255.0

        compose = _build_affine(
            scale=jnp.float32(1.0), res_h=jnp.float32(size),
            res_w=jnp.float32(size), hflip=jnp.asarray(False),
            vflip=jnp.asarray(False),
            angle=jnp.float32(np.deg2rad(angle)),
            y0=jnp.float32(y0), x0=jnp.float32(x0))
        gy, gx = compose(*jnp.meshgrid(
            jnp.arange(crop, dtype=jnp.float32),
            jnp.arange(crop, dtype=jnp.float32), indexing="ij"))
        got = np.asarray(_bilinear_gather(
            jnp.asarray(src, jnp.float32) / 255.0, gy, gx,
            jnp.float32(size), jnp.float32(size)))
        # Compare where the sample coordinates are strictly in-bounds:
        # out-of-source pixels take each implementation's border-fill
        # semantics (the golden center-crop test dodges them the same
        # way); the interpolation is what must agree.
        inb = np.asarray((gy >= 1) & (gy <= size - 2)
                         & (gx >= 1) & (gx <= size - 2))
        assert inb.mean() > 0.5  # the sweep must mostly test real pixels
        err = np.abs(got - want)[inb].max()
        assert err <= (1.0 / 255.0) * 1.5, (
            f"trial {trial}: size={size} crop={crop} angle={angle:.2f} "
            f"off=({y0},{x0}) max err {err * 255:.2f} levels")


# ---------------------------------------------------------------------------
# Rotation-probability split (DataConfig.rotation_split)
# ---------------------------------------------------------------------------

def _split_batch(b=6, t=3, s=80):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (b, t, s, s)), jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (b, s, s)), jnp.uint8)
    sizes = jnp.asarray(np.stack([np.full(b, s - 8), np.full(b, s - 16)], 1),
                        jnp.int32)
    return frames, masks, sizes


def test_rotation_split_matches_single_program():
    """rotation_split_apply == __call__ for the same key: rotated samples
    take the identical warp path (bit-equal); unrotated samples compute the
    same bilinear sum separably (float association only); masks exact."""
    from stf_unet_tpu.core.prng import augment_key

    cfg = DataConfig(base_size=64, crop_size=48)
    aug = TrainAugment(cfg)
    frames, masks, sizes = _split_batch()
    b = frames.shape[0]
    root = jax.random.key(3)
    for step in range(4):  # several buckets incl. different ladder sizes
        key = augment_key(root, 0, step)
        img1, tgt1 = aug(key, frames, masks, sizes)
        rot_idx = aug.rotation_bucket(root, 0, step, b)
        img2, tgt2 = aug.rotation_split_apply(key, frames, masks, sizes,
                                              jnp.asarray(rot_idx))
        np.testing.assert_array_equal(np.asarray(tgt1), np.asarray(tgt2))
        np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                                   atol=1e-5)
        rot = set(int(i) for i in rot_idx if i < b)
        for i in rot:  # the warp bucket is the SAME program: bit-equal
            np.testing.assert_array_equal(np.asarray(img1[i]),
                                          np.asarray(img2[i]))


def test_rotation_split_with_pk_maps():
    from stf_unet_tpu.core.prng import augment_key

    cfg = DataConfig(base_size=64, crop_size=48)
    aug = TrainAugment(cfg)
    frames, masks, sizes = _split_batch()
    b = frames.shape[0]
    rng = np.random.default_rng(7)
    pk = jnp.asarray(rng.integers(0, 255, (b, 3, 80, 80)), jnp.uint8)
    root = jax.random.key(5)
    key = augment_key(root, 1, 0)
    img1, tgt1 = aug(key, frames, masks, sizes, pk)
    rot_idx = jnp.asarray(aug.rotation_bucket(root, 1, 0, b))
    img2, tgt2 = aug.rotation_split_apply(key, frames, masks, sizes,
                                          rot_idx, pk)
    assert img1.shape == img2.shape == (b, 6, 48, 48, 1)
    np.testing.assert_array_equal(np.asarray(tgt1), np.asarray(tgt2))
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)


def test_rotation_bucket_flags_match_device_draws():
    """The host replay (rotation_bucket) selects EXACTLY the samples whose
    in-program k[3] Bernoulli fires — membership and draws come from the
    same threefry stream."""
    from stf_unet_tpu.core.prng import augment_key
    from stf_unet_tpu.data.transforms import _sample_params

    cfg = DataConfig(base_size=64, crop_size=48)
    aug = TrainAugment(cfg)
    root = jax.random.key(11)
    for step in range(5):
        key = augment_key(root, 2, step)
        keys = jax.random.split(key, 16)
        # the device program's own do_rot draw (angle != 0 iff rotated;
        # a drawn angle of exactly 0.0 has measure zero)
        angles = [
            float(_sample_params(k, 32, 76, 0.5, 0.5, cfg.rotate_prob,
                                 30.0, 48, jnp.float32(64.0),
                                 jnp.float32(64.0))[5])
            for k in keys
        ]
        device_rot = {i for i, a in enumerate(angles) if a != 0.0}
        idx = aug.rotation_bucket(root, 2, step, 16)
        host_rot = {int(i) for i in idx if i < 16}
        assert host_rot == device_rot


def test_rotation_bucket_ladder_and_padding():
    aug = TrainAugment(DataConfig())
    assert aug.rotation_bucket_sizes(16) == (4, 8, 12, 16)
    root = jax.random.key(0)
    for step in range(8):
        idx = aug.rotation_bucket(root, 0, step, 16)
        assert len(idx) in (4, 8, 12, 16)
        real = idx[idx < 16]
        pads = idx[idx >= 16]
        assert (pads == 16).all()
        assert len(np.unique(real)) == len(real)
        assert (np.sort(real) == real).all()


def test_rotation_split_eligibility():
    from stf_unet_tpu.train.loop import make_train_step

    assert TrainAugment(DataConfig()).can_rotation_split
    assert not TrainAugment(
        DataConfig(shared_frame_augmentation=False)).can_rotation_split
    assert not TrainAugment(DataConfig(elastic_alpha=2.0)).can_rotation_split
    assert not TrainAugment(DataConfig(rotate_prob=1.0)).can_rotation_split
    assert not TrainAugment(DataConfig(rotate_prob=0.0)).can_rotation_split
    with pytest.raises(ValueError, match="rotation_split"):
        make_train_step(None, None, None, 2,
                        augment=TrainAugment(DataConfig(rotate_prob=1.0)),
                        rotation_split=True)


def test_rotation_split_photometric_mode():
    """Photometric jitter (extended mode without elastic) still splits; the
    k_ph stream consumption matches the single program."""
    from stf_unet_tpu.core.prng import augment_key

    cfg = DataConfig(base_size=64, crop_size=48, brightness=0.2,
                     contrast=0.1)
    aug = TrainAugment(cfg)
    assert aug.can_rotation_split
    frames, masks, sizes = _split_batch()
    b = frames.shape[0]
    root = jax.random.key(9)
    key = augment_key(root, 0, 1)
    img1, tgt1 = aug(key, frames, masks, sizes)
    rot_idx = jnp.asarray(aug.rotation_bucket(root, 0, 1, b))
    img2, tgt2 = aug.rotation_split_apply(key, frames, masks, sizes, rot_idx)
    np.testing.assert_array_equal(np.asarray(tgt1), np.asarray(tgt2))
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)
