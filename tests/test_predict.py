"""stf-predict (cli/predict.py): offline inference on UNLABELED data —
the deployment case no other offline CLI covers (DatasetIndex requires
labels/, ref:my_dataset.py:124-126)."""

import os
import shutil

import numpy as np
import pytest

from stf_unet_tpu.cli.predict import scan_unlabeled


SEQS = [f"VIBRANT+C{i}" for i in range(1, 9)]


def _strip_labels(root, split="test"):
    """Turn a synthetic BreaDM split into an unlabeled images tree."""
    src = os.path.join(root, "seg", split, "images")
    dst = os.path.join(root, "unlabeled")
    shutil.copytree(src, dst)
    return dst


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One tiny trained checkpoint + unlabeled tree shared by the tests."""
    from stf_unet_tpu.cli import train as train_cli
    from stf_unet_tpu.core import config as config_lib
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    base = tmp_path_factory.mktemp("predict")
    root = str(base / "data")
    make_synthetic_breadm(root, size=40, time_steps=8)
    cfg = config_lib.parse_config([
        "--data-path", root, "--model", "unet", "--epochs", "1",
        "--batch-size", "2", "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--save-dir", str(base / "w"), "--output-dir", str(base / "o")])
    train_cli.main(cfg)
    return base, root, _strip_labels(root)


class TestScan:
    def test_tree_and_single_patient_layouts(self, trained):
        _, _, unlabeled = trained
        items = scan_unlabeled(unlabeled, SEQS)
        assert len(items) == 4  # 2 patients x 2 slices
        assert {i[0] for i in items} == {"P000", "P001"}
        # single-patient dir: sequence dirs sit directly inside
        single = scan_unlabeled(os.path.join(unlabeled, "P000"), SEQS)
        assert len(single) == 2
        assert all(pid == "P000" for pid, _, _ in single)

    def test_missing_sequence_warns_and_skips(self, trained, capsys):
        _, _, unlabeled = trained
        broken = unlabeled + "_broken"
        if not os.path.isdir(broken):
            shutil.copytree(unlabeled, broken)
            shutil.rmtree(os.path.join(broken, "P001", SEQS[3]))
        items = scan_unlabeled(broken, SEQS)
        assert {i[0] for i in items} == {"P000"}
        assert "skipping" in capsys.readouterr().out

    def test_missing_slice_in_one_sequence_skips_that_slice(self, trained):
        _, _, unlabeled = trained
        broken = unlabeled + "_slice"
        if not os.path.isdir(broken):
            shutil.copytree(unlabeled, broken)
            victim = sorted(os.listdir(
                os.path.join(broken, "P000", SEQS[2])))[0]
            os.remove(os.path.join(broken, "P000", SEQS[2], victim))
        items = scan_unlabeled(broken, SEQS)
        assert len([i for i in items if i[0] == "P000"]) == 1
        assert len([i for i in items if i[0] == "P001"]) == 2

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(SystemExit):
            scan_unlabeled(str(tmp_path), SEQS)

    def test_empty_single_patient_dir_raises(self, tmp_path):
        # sequence dirs all exist but hold no slice files: the
        # single-patient branch must abort like the tree branch does,
        # not exit 0 having written nothing
        for s in SEQS:
            os.makedirs(tmp_path / s)
        with pytest.raises(SystemExit):
            scan_unlabeled(str(tmp_path), SEQS)


def test_predict_cli_end_to_end(trained):
    from stf_unet_tpu.cli import predict as predict_cli

    base, _, unlabeled = trained
    out = str(base / "pred")
    res = predict_cli.main([
        "--input", unlabeled, "--model", "unet",
        "--model-dir", str(base / "w"), "--output-dir", out])
    assert res == {"patients": 2, "slices": 4, "output_dir": out}
    for pid in ("P000", "P001"):
        files = sorted(os.listdir(os.path.join(out, pid)))
        masks = [f for f in files if f.endswith("_mask.png")]
        overlays = [f for f in files if f.endswith("_overlay.png")]
        assert len(masks) == 2 and len(overlays) == 2
    # masks are written at the eval geometry (32 short edge), 0/255 binary
    from PIL import Image
    m = np.asarray(Image.open(
        os.path.join(out, "P000", masks[0])))
    assert min(m.shape) == 32
    assert set(np.unique(m)) <= {0, 255}


def test_predict_matches_cli_test_masks(trained):
    """On the SAME slices, stf-predict's argmax masks must equal the masks
    cli/test renders from its logits (identical restore + preprocess +
    forward contract)."""
    from stf_unet_tpu.cli import predict as predict_cli
    from stf_unet_tpu.cli import test as test_cli

    base, root, unlabeled = trained
    out = str(base / "pred_parity")
    predict_cli.main(["--input", unlabeled, "--model", "unet",
                      "--model-dir", str(base / "w"), "--output-dir", out,
                      "--no-overlay"])
    m = test_cli.main(["--model", "unet", "--model-dir", str(base / "w"),
                       "--root", root,
                       "--output-dir", str(base / "t_parity")])
    # cli/test consumes records in index order: P000 slices then P001
    from PIL import Image
    preds = []
    for pid in ("P000", "P001"):
        for f in sorted(os.listdir(os.path.join(out, pid))):
            preds.append(np.asarray(Image.open(
                os.path.join(out, pid, f))) // 255)
    test_masks = [np.argmax(lg[0], axis=-1)
                  for lg in m["outputs"]]
    assert len(preds) == len(test_masks)
    for ours, theirs in zip(preds, test_masks):
        np.testing.assert_array_equal(ours, theirs)


def test_predict_npz_and_full_size(trained, tmp_path):
    from stf_unet_tpu.cli import predict as predict_cli

    base, _, _ = trained
    rng = np.random.default_rng(3)
    vol = rng.integers(0, 255, (8, 48, 40), np.uint8)
    npz_dir = tmp_path / "vols"
    npz_dir.mkdir()
    np.savez(npz_dir / "caseA.npz", frames=vol)
    np.savez(npz_dir / "caseB.npz", frames=vol)
    out = str(tmp_path / "pred_npz")
    res = predict_cli.main([
        "--input", str(npz_dir), "--model", "unet",
        "--model-dir", str(base / "w"), "--output-dir", out,
        "--full-size", "--no-overlay"])
    assert res["patients"] == 2 and res["slices"] == 2
    from PIL import Image
    m = np.asarray(Image.open(
        os.path.join(out, "caseA", "caseA_mask.png")))
    assert m.shape == (48, 40)  # upsampled back to the input geometry

    # single-file input
    out2 = str(tmp_path / "pred_one")
    res2 = predict_cli.main([
        "--input", str(npz_dir / "caseA.npz"), "--model", "unet",
        "--model-dir", str(base / "w"), "--output-dir", out2,
        "--no-overlay"])
    assert res2["slices"] == 1

    # bad npz payload
    np.savez(tmp_path / "bad.npz", wrong_key=vol)
    with pytest.raises(SystemExit):
        predict_cli.main(["--input", str(tmp_path / "bad.npz"),
                          "--model", "unet",
                          "--model-dir", str(base / "w"),
                          "--output-dir", out2])


def test_predict_save_probs(trained, tmp_path):
    """--save-probs: per-class softmax npz whose argmax equals the mask
    and whose classes sum to 1."""
    from stf_unet_tpu.cli import predict as predict_cli

    base, _, unlabeled = trained
    out = str(tmp_path / "probs")
    predict_cli.main(["--input", os.path.join(unlabeled, "P000"),
                      "--model", "unet", "--model-dir", str(base / "w"),
                      "--output-dir", out, "--save-probs", "--no-overlay"])
    from PIL import Image
    pdir = os.path.join(out, "P000")
    names = sorted(f[:-9] for f in os.listdir(pdir)
                   if f.endswith("_mask.png"))
    assert len(names) == 2
    for nm in names:
        mask = np.asarray(Image.open(
            os.path.join(pdir, f"{nm}_mask.png"))) // 255
        with np.load(os.path.join(pdir, f"{nm}_probs.npz")) as npz:
            probs = npz["probs"]
        assert probs.dtype == np.float16
        assert probs.shape == mask.shape + (2,)
        # masks argmax from LOGITS; f16 rounding can flip near-ties
        p32 = probs.astype(np.float32)
        decided = np.abs(p32[..., 1] - p32[..., 0]) > 2e-3
        np.testing.assert_array_equal(np.argmax(probs, -1)[decided],
                                      mask[decided])
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=2e-3)

    # incompatible-mode guard
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        predict_cli.main(["--input", unlabeled, "--model", "unet",
                          "--model-dir", str(base / "w"),
                          "--output-dir", out, "--save-probs", "--tiled"])


def test_predict_pk_fit(trained, tmp_path):
    """--pk-fit: labels-free Tofts analysis — per-slice combined render +
    raw parameter maps at native resolution."""
    from stf_unet_tpu.cli import predict as predict_cli

    base, _, unlabeled = trained
    out = str(tmp_path / "pk")
    res = predict_cli.main(["--input", os.path.join(unlabeled, "P001"),
                            "--model", "unet",
                            "--model-dir", str(base / "w"),
                            "--output-dir", out, "--pk-fit",
                            "--pk-solver", "lm", "--no-overlay"])
    assert res["slices"] == 2
    pdir = os.path.join(out, "P001")
    pngs = [f for f in os.listdir(pdir) if f.endswith("_pk.png")]
    assert len(pngs) == 2
    with np.load(os.path.join(pdir, "slice_000_pk.npz")) as npz:
        for key in ("ktrans", "ve", "vp"):
            m = npz[key]
            assert m.shape == (40, 40)  # NATIVE geometry, not eval-resized
            assert np.all(np.isfinite(m))
        assert npz["ktrans"].max() > 0  # something fit inside the tissue


def test_predict_pk_requires_dir(trained):
    from stf_unet_tpu.cli import predict as predict_cli

    base, _, unlabeled = trained
    with pytest.raises(SystemExit):
        predict_cli.main(["--input", unlabeled, "--model", "unet",
                          "--model-dir", str(base / "w"),
                          "--use-pk-maps",
                          "--output-dir", str(base / "x")])
