"""Beyond-reference on-device augmentations (elastic deformation +
photometric jitter, data/transforms.py). All knobs default OFF; these
tests pin the extended behavior. Default-path parity is pinned separately
by the golden PIL warp tests in tests/test_data.py (which run TrainAugment
with the default config)."""

import dataclasses

import numpy as np
import pytest

import jax

from stf_unet_tpu.core.config import DataConfig
from stf_unet_tpu.data.transforms import TrainAugment


def _cfg(**kw):
    return dataclasses.replace(
        DataConfig(base_size=40, crop_size=32), **kw)


def _batch(b=2, t=3, size=48, seed=0, constant=None):
    rng = np.random.default_rng(seed)
    if constant is not None:
        frames = np.full((b, t, size, size), constant, np.uint8)
    else:
        frames = rng.integers(0, 256, (b, t, size, size), dtype=np.uint8)
    masks = (rng.random((b, size, size)) < 0.3).astype(np.uint8)
    sizes = np.full((b, 2), size, np.int32)
    return frames, masks, sizes


def _run(cfg, key=0, **bkw):
    frames, masks, sizes = _batch(**bkw)
    aug = TrainAugment(cfg)
    imgs, tgts = aug(jax.random.key(key), frames, masks, sizes)
    return np.asarray(imgs), np.asarray(tgts)


def test_photometric_changes_images_not_targets():
    """Two extended configs that differ only photometrically draw the SAME
    geometry (the key split is shared), so targets match exactly while
    images differ."""
    a_img, a_tgt = _run(_cfg(brightness=0.5))
    b_img, b_tgt = _run(_cfg(brightness=1e-9))
    np.testing.assert_array_equal(a_tgt, b_tgt)
    assert np.abs(a_img - b_img).max() > 1e-3


def test_brightness_is_a_shared_multiplicative_factor():
    """With only brightness on and a constant-intensity image, the ratio
    vs a near-no-op extended run is ONE factor shared across all T frames
    and pixels of a sample."""
    cfg = _cfg(brightness=0.3, hflip_prob=0.0, vflip_prob=0.0,
               rotate_prob=0.0)
    ref = dataclasses.replace(cfg, brightness=1e-12)
    a_img, _ = _run(cfg, constant=100)
    b_img, _ = _run(ref, constant=100)
    # un-normalize back to [0,1] intensities
    un = lambda v: v * cfg.std + cfg.mean  # noqa: E731
    for i in range(a_img.shape[0]):
        va, vb = un(a_img[i]), un(b_img[i])
        valid = vb > 1e-3  # zero-filled out-of-source pixels stay 0
        ratio = va[valid] / vb[valid]
        assert ratio.std() < 1e-3, "factor must be shared across T/pixels"
        assert 0.7 - 1e-3 <= ratio.mean() <= 1.3 + 1e-3
    # per-sample draws differ
    r0 = (un(a_img[0]) / np.clip(un(b_img[0]), 1e-6, None))
    r1 = (un(a_img[1]) / np.clip(un(b_img[1]), 1e-6, None))
    assert abs(np.median(r0) - np.median(r1)) > 1e-4


def test_noise_std_perturbs_images():
    a_img, a_tgt = _run(_cfg(noise_std=0.05))
    b_img, b_tgt = _run(_cfg(noise_std=1e-12))
    np.testing.assert_array_equal(a_tgt, b_tgt)
    d = np.abs(a_img - b_img)
    assert d.mean() > 1e-3


def test_elastic_prob_zero_is_identity_within_extended_mode():
    a = _run(_cfg(elastic_alpha=1.0, elastic_prob=0.0))
    b = _run(_cfg(elastic_alpha=8.0, elastic_prob=0.0))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_elastic_deforms_geometry_and_mask_follows():
    """Elastic on vs off (same extended key split): outputs differ, and the
    nearest-sampled mask rides the SAME displaced coordinates — pinned by
    warping frames whose content IS the mask and checking agreement."""
    rng = np.random.default_rng(1)
    size, b = 48, 2
    masks = np.zeros((b, size, size), np.uint8)
    masks[:, 12:36, 16:40] = 1  # a block: mostly-flat regions
    frames = (masks[:, None].repeat(3, axis=1) * 255).astype(np.uint8)
    sizes = np.full((b, 2), size, np.int32)

    on = TrainAugment(_cfg(elastic_alpha=4.0, elastic_prob=1.0))
    off = TrainAugment(_cfg(elastic_alpha=4.0, elastic_prob=0.0))
    img_on, tgt_on = on(jax.random.key(3), frames, masks, sizes)
    img_off, tgt_off = off(jax.random.key(3), frames, masks, sizes)
    assert np.abs(np.asarray(img_on) - np.asarray(img_off)).max() > 1e-3
    assert (np.asarray(tgt_on) != np.asarray(tgt_off)).any()

    # label alignment: binarized warped image ~= warped mask
    cfg = _cfg()
    un = (np.asarray(img_on)[:, 0, :, :, 0] * cfg.std + cfg.mean)
    pred = (un > 0.5).astype(np.int32)
    agree = (pred == np.asarray(tgt_on)).mean()
    assert agree > 0.97, f"mask/image elastic alignment broke: {agree}"


def test_quirk_mode_ignores_elastic_with_note(capsys):
    cfg = _cfg(elastic_alpha=3.0, shared_frame_augmentation=False)
    aug = TrainAugment(cfg)
    assert not aug.elastic
    assert "elastic" in capsys.readouterr().out


def test_default_config_is_not_extended():
    aug = TrainAugment(DataConfig())
    assert not aug.extended
