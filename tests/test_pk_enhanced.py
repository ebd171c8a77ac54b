"""Enhanced PK pipeline (ref:test_pk_fitting.py fork): Otsu/bilateral
preprocessing, param-map postprocessing, AIF-method comparison CLI, debug
renders, and the bucket-padded O(1)-compile chunking of pk/fit.py."""

import os

import numpy as np
import pytest

from stf_unet_tpu.core.config import PKConfig


def _synthetic_volume(size=48, t_steps=8, seed=3):
    """Bright enhancing disk over dark noisy background, uint8 [T, H, W]."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    disk = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) <= (size / 3) ** 2
    frames = []
    for t in range(t_steps):
        base = rng.uniform(0, 12, (size, size))
        signal = disk * (60 + 140 * (1 - np.exp(-0.8 * (t + 1))))
        frames.append(np.clip(base + signal, 0, 255).astype(np.uint8))
    return np.stack(frames)


FAST_CFG = PKConfig(solver="lm", lm_iters=6)


class TestEnhancedPreprocess:
    def test_matches_direct_cv2_pipeline(self):
        """Pin Otsu+morphology mask and bilateral/minmax frames against the
        exact cv2 call sequence (ref:test_pk_fitting.py:253-293)."""
        import cv2
        from stf_unet_tpu.pk.enhanced import enhanced_preprocess

        vol = _synthetic_volume()
        processed, mask = enhanced_preprocess(vol)

        imgs = vol.astype(np.float32) / 255.0
        max_u8 = (imgs.max(axis=0) * 255).astype(np.uint8)
        blurred = cv2.GaussianBlur(max_u8, (5, 5), 0)
        _, want_u8 = cv2.threshold(blurred, 0, 255,
                                   cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        kernel = np.ones((5, 5), np.uint8)
        want_u8 = cv2.morphologyEx(want_u8, cv2.MORPH_CLOSE, kernel)
        want_u8 = cv2.morphologyEx(want_u8, cv2.MORPH_OPEN, kernel)
        np.testing.assert_array_equal(mask, want_u8 > 0)

        t = 2
        filtered = cv2.bilateralFilter(imgs[t], 5, 75, 75)
        masked = filtered * (want_u8 / 255.0)
        want = cv2.normalize(masked, None, 0, 1, cv2.NORM_MINMAX)
        np.testing.assert_allclose(processed[t], want, atol=1e-6)

    def test_mask_and_range_properties(self):
        from stf_unet_tpu.pk.enhanced import enhanced_preprocess
        vol = _synthetic_volume()
        processed, mask = enhanced_preprocess(vol)
        assert processed.shape == vol.shape
        assert processed.dtype == np.float32
        # disk center in, corners out
        assert mask[24, 24]
        assert not mask[0, 0] and not mask[-1, -1]
        # background zeroed, frames minmax-normalized into [0, 1]
        assert processed[:, 0, 0].max() == 0.0
        assert processed.min() >= 0.0 and processed.max() <= 1.0 + 1e-6
        assert processed.max() == pytest.approx(1.0, abs=1e-6)

    def test_debug_artifacts(self, tmp_path):
        from stf_unet_tpu.pk.enhanced import enhanced_preprocess
        d = str(tmp_path / "dbg")
        enhanced_preprocess(_synthetic_volume(), debug_output_dir=d)
        for name in ("tissue_mask.png", "max_image.png", "original_t0.png",
                     "filtered_t0.png", "masked_t0.png", "enhanced_t7.png"):
            assert os.path.exists(os.path.join(d, name)), name


class TestPostprocess:
    def test_thresholds_and_mask(self):
        """Per-parameter low-value thresholds .01/.05/.005 + tissue re-mask
        (ref:test_pk_fitting.py:477-483)."""
        import cv2
        from stf_unet_tpu.pk.enhanced import (POSTPROCESS_THRESHOLDS,
                                              postprocess_param_maps)
        h = w = 32
        tissue = np.zeros((h, w), bool)
        tissue[4:28, 4:28] = True
        rng = np.random.default_rng(0)
        maps = rng.uniform(0, 0.2, (3, h, w)).astype(np.float32)
        out = postprocess_param_maps(maps, tissue)

        for i, name in enumerate(("ktrans", "ve", "vp")):
            smooth = cv2.GaussianBlur(maps[i], (5, 5), 0.5)
            want = np.where(smooth < POSTPROCESS_THRESHOLDS[name], 0, smooth)
            want = want * tissue
            np.testing.assert_allclose(out[i], want, atol=1e-6)
        assert (out[:, ~tissue] == 0).all()

    def test_debug_artifacts(self, tmp_path):
        from stf_unet_tpu.pk.enhanced import postprocess_param_maps
        tissue = np.ones((16, 16), bool)
        maps = np.full((3, 16, 16), 0.1, np.float32)
        d = str(tmp_path / "dbg")
        postprocess_param_maps(maps, tissue, debug_output_dir=d)
        for i in range(3):
            for tag in ("original", "smooth", "threshold", "final"):
                assert os.path.exists(os.path.join(d, f"param_{i}_{tag}.png"))


class TestEnhancedFitVolume:
    def test_end_to_end(self, tmp_path):
        from stf_unet_tpu.pk.enhanced import fit_volume_enhanced
        vol = _synthetic_volume(size=32)
        out_dir = str(tmp_path / "maps")
        maps = fit_volume_enhanced(vol, FAST_CFG, output_dir=out_dir)
        assert maps.shape == (3, 32, 32)
        assert np.isfinite(maps).all()
        assert (maps > 0).sum() > 10  # fit produced signal inside tissue
        for name in ("ktrans", "ve", "vp"):
            assert os.path.exists(os.path.join(out_dir, f"{name}.png"))
        assert os.path.exists(os.path.join(out_dir, "combined_map.png"))


@pytest.fixture(scope="module")
def sub_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm_enh")
    return make_synthetic_breadm(str(root), size=32, time_steps=8,
                                 splits=("training",),
                                 patients_per_split=1, slices_per_patient=1,
                                 sequence_prefix="SUB")


class TestCLI:
    def test_enhanced_map_generation(self, sub_root):
        """--enhanced routes dataset generation through the enhanced fork."""
        from stf_unet_tpu.pk import maps as pk_maps
        pk_maps.main([sub_root, "--splits", "training", "--enhanced"])
        pk_dir = os.path.join(sub_root, "seg", "training", "pk_maps", "P000")
        for name in ("ktrans", "ve", "vp"):
            assert os.path.exists(os.path.join(pk_dir, f"{name}.png"))
        # postprocess zeroes sub-threshold values — raw maps contain 0s
        kt = np.load(os.path.join(pk_dir, "ktrans_raw.npy"))
        assert kt.shape == (32, 32) and np.isfinite(kt).all()

    def test_compare_aif_cli(self, sub_root):
        """compare_aif_methods runs from the CLI and renders per-method +
        pairwise difference maps (ref:test_pk_fitting.py:709-887)."""
        from stf_unet_tpu.pk import maps as pk_maps
        pk_maps.main([sub_root, "--splits", "training", "--compare-aif"])
        base = os.path.join(sub_root, "seg", "training",
                            "pk_aif_comparison", "P000")
        for method in ("population", "modified", "auto"):
            assert os.path.exists(os.path.join(base, method, "ktrans.png"))
        for name in ("ktrans", "ve", "vp"):
            assert os.path.exists(os.path.join(base, f"compare_{name}.png"))
            assert os.path.exists(os.path.join(
                base, f"diff_{name}_population_modified.png"))
            assert os.path.exists(os.path.join(
                base, f"diff_{name}_modified_auto.png"))


class TestDebugRenders:
    def test_fit_volume_debug_adam(self, tmp_path):
        """fit_volume(debug_output_dir=...) produces the reference debug
        artifact set (ref:pk_fitting.py:271-287,357-366;
        ref:test_pk_fitting.py:204-231)."""
        import dataclasses
        from stf_unet_tpu.pk.maps import fit_volume
        cfg = dataclasses.replace(FAST_CFG, solver="adam", num_epochs=6,
                                  aif_method="auto")
        d = str(tmp_path / "dbg")
        vol = _synthetic_volume(size=32)
        fit_volume(vol, cfg, debug_output_dir=d)
        for name in ("sample_time_curves.png", "training_loss.png",
                     "detected_aif_curve.png", "aif_location.png",
                     "max_time_derivative.png"):
            assert os.path.exists(os.path.join(d, name)), name

    def test_adam_loss_history_decreases(self):
        from stf_unet_tpu.pk.aif import make_aif
        from stf_unet_tpu.pk.fit import fit_adam_debug
        from stf_unet_tpu.pk.tofts import ToftsQuadrature, extended_tofts_batch
        import dataclasses
        cfg = dataclasses.replace(FAST_CFG, solver="adam", num_epochs=20)
        quad = ToftsQuadrature.build(cfg.time_points,
                                     make_aif("population"), cfg.dt)
        true = np.array([[0.2, 0.3, 0.05]] * 40, np.float32)
        curves = np.asarray(extended_tofts_batch(
            quad, true[:, 0], true[:, 1], true[:, 2]))
        fitted, losses = fit_adam_debug(curves, quad, cfg)
        assert losses.shape == (20,)
        assert losses[-1] < losses[0]
        assert fitted.shape == (40, 3)


class TestBucketPadding:
    def test_o1_compiles_across_voxel_counts(self):
        """Two volumes with different tissue-voxel counts reuse one compiled
        chunk fn (VERDICT r1 next-step 5: kill the per-volume recompile)."""
        from stf_unet_tpu.pk.aif import make_aif
        from stf_unet_tpu.pk.fit import (_bucket_size, _lm_fit_chunk, fit_lm,
                                         CHUNK, MIN_BUCKET)
        from stf_unet_tpu.pk.tofts import ToftsQuadrature

        assert _bucket_size(1) == MIN_BUCKET
        assert _bucket_size(MIN_BUCKET) == MIN_BUCKET
        assert _bucket_size(MIN_BUCKET + 1) == 2 * MIN_BUCKET
        assert _bucket_size(CHUNK + 999) == CHUNK

        quad = ToftsQuadrature.build(FAST_CFG.time_points,
                                     make_aif("population"), FAST_CFG.dt)
        rng = np.random.default_rng(0)
        before = _lm_fit_chunk._cache_size()
        out1 = fit_lm(rng.uniform(0, 1, (57, 8)).astype(np.float32),
                      quad, FAST_CFG)
        mid = _lm_fit_chunk._cache_size()
        out2 = fit_lm(rng.uniform(0, 1, (201, 8)).astype(np.float32),
                      quad, FAST_CFG)
        after = _lm_fit_chunk._cache_size()
        assert out1.shape == (57, 3) and out2.shape == (201, 3)
        assert mid == after  # same bucket (256) -> no new compile
        assert mid <= before + 1

    def test_padding_does_not_change_results(self):
        """Pad rows are per-voxel independent — results match the unpadded
        semantics (fit of each real curve)."""
        from stf_unet_tpu.pk.aif import make_aif
        from stf_unet_tpu.pk.fit import fit_lm
        from stf_unet_tpu.pk.tofts import ToftsQuadrature, extended_tofts_batch

        quad = ToftsQuadrature.build(FAST_CFG.time_points,
                                     make_aif("population"), FAST_CFG.dt)
        true = np.array([[0.3, 0.25, 0.03]] * 10, np.float32)
        curves = np.asarray(extended_tofts_batch(
            quad, true[:, 0], true[:, 1], true[:, 2]))
        a = fit_lm(curves, quad, FAST_CFG)          # padded to 256
        b = fit_lm(np.tile(curves, (30, 1)), quad, FAST_CFG)[:10]  # 300->512
        np.testing.assert_allclose(a, b, atol=1e-5)
