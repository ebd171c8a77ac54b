"""stf-doctor: dataset diagnostics must explain every skip the index
performs, flag damaged files, and keep `usable` == len(DatasetIndex)."""

import json
import os
import shutil

import numpy as np
import pytest
from PIL import Image

from stf_unet_tpu.cli.doctor import check_split, main
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.data.synthetic import make_synthetic_breadm

SEQ = tuple(f"VIBRANT+C{i}" for i in range(1, 9))


@pytest.fixture()
def tree(tmp_path):
    root = str(tmp_path / "breadm")
    make_synthetic_breadm(root, size=40, time_steps=8,
                          patients_per_split=3, slices_per_patient=2)
    return root


def _damage(tree):
    """Apply one instance of every damage class; returns expectations."""
    train = os.path.join(tree, "seg", "training")
    # P000: remove one sequence dir -> patient skipped
    shutil.rmtree(os.path.join(train, "images", "P000", "VIBRANT+C3"))
    # P001: remove slice 0 from one sequence -> slice skipped
    os.remove(os.path.join(train, "images", "P001", "VIBRANT+C5",
                           "slice_000.png"))
    # P001: remove the mask of slice 1 -> slice skipped (orphanless)
    os.remove(os.path.join(train, "labels", "P001", "VIBRANT+C1",
                           "slice_001.png"))
    # P002: truncate one frame to 0 bytes -> damaged-file error
    open(os.path.join(train, "images", "P002", "VIBRANT+C2",
                      "slice_000.png"), "wb").close()
    # P002: corrupt another frame's header -> bad-magic error
    with open(os.path.join(train, "images", "P002", "VIBRANT+C4",
                           "slice_001.png"), "wb") as f:
        f.write(b"JUNKJUNKJUNK")


def test_clean_tree_is_clean(tree):
    r = check_split(tree, "train", SEQ)
    assert r["errors"] == [] and r["warnings"] == []
    assert r["usable"] == 6


def test_damage_classes_reported_and_usable_matches_index(tree, capsys):
    _damage(tree)
    r = check_split(tree, "train", SEQ)
    text = "\n".join(r["warnings"] + r["errors"])
    assert "missing sequence dirs ['VIBRANT+C3']" in text
    assert "missing from sequences ['VIBRANT+C5']" in text
    assert "no mask" in text
    assert "empty file (0 bytes)" in text
    assert "not a PNG" in text
    # the scanner serves: P000 none, P001 none (one slice lost each way),
    # P002 both (damage is not an existence failure)
    index = DatasetIndex(tree, "train", SEQ)
    assert r["usable"] == len(index) == 2


def test_decode_mode_catches_sizes_and_mask_values(tree):
    train = os.path.join(tree, "seg", "training")
    # one frame resized -> cross-sequence size mismatch
    p = os.path.join(train, "images", "P000", "VIBRANT+C2", "slice_000.png")
    Image.open(p).resize((24, 24)).save(p)
    # one mask with a non-binary value
    mp = os.path.join(train, "labels", "P001", "VIBRANT+C1", "slice_000.png")
    arr = np.asarray(Image.open(mp).convert("L")).copy()
    arr[0, 0] = 7
    Image.fromarray(arr).save(mp)

    r = check_split(tree, "train", SEQ, decode=True)
    text = "\n".join(r["warnings"])
    assert "frame sizes differ" in text
    assert "besides 0/255" in text
    # index-mask mode instead bounds values by num_classes+1
    r2 = check_split(tree, "train", SEQ, decode=True, mask_format="index",
                     num_classes=2)
    assert any(">= num_classes+1" in w for w in r2["warnings"])


def test_cli_exit_codes_and_json(tree, capsys):
    assert main(["--data-path", tree]) == 0
    out = capsys.readouterr().out
    assert "usable samples: 6" in out and "summary:" in out

    _damage(tree)
    assert main(["--data-path", tree, "--json"]) == 1
    reports = json.loads(capsys.readouterr().out)
    assert [r["mode"] for r in reports] == ["train", "val", "test"]
    assert reports[0]["errors"] and not reports[1]["errors"]


def test_missing_split_reports_not_crashes(tree):
    shutil.rmtree(os.path.join(tree, "seg", "val"))
    assert main(["--data-path", tree, "--splits", "val"]) == 1


def test_empty_split_is_an_error(tree):
    # strip every mask -> zero usable samples
    train = os.path.join(tree, "seg", "training")
    for p in ("P000", "P001", "P002"):
        shutil.rmtree(os.path.join(train, "labels", p))
    r = check_split(tree, "train", SEQ)
    assert any("NO usable samples" in e for e in r["errors"])


def test_decode_catches_truncated_file(tree):
    """PIL's Image.open is lazy (header-only); --decode must force the
    full pixel decode so a truncated-but-valid-header file is an error."""
    train = os.path.join(tree, "seg", "training")
    p = os.path.join(train, "images", "P000", "VIBRANT+C2", "slice_000.png")
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[: max(len(data) // 2, 30)])
    # header magic intact -> the cheap probe passes
    r_cheap = check_split(tree, "train", SEQ)
    assert r_cheap["errors"] == []
    r = check_split(tree, "train", SEQ, decode=True)
    assert any("decode failed" in e for e in r["errors"])


def test_decode_undecodable_mask_is_an_error(tree):
    """A truncated mask is damage (exit 1), not an advisory warning."""
    train = os.path.join(tree, "seg", "training")
    mp = os.path.join(train, "labels", "P001", "VIBRANT+C1",
                      "slice_000.png")
    data = open(mp, "rb").read()
    with open(mp, "wb") as f:
        f.write(data[: max(len(data) // 2, 30)])
    r = check_split(tree, "train", SEQ, decode=True)
    assert any("mask decode failed" in e for e in r["errors"])
    assert main(["--data-path", tree, "--splits", "train", "--decode"]) == 1


def test_skipped_slice_mask_not_reported_orphan(tree):
    """A slice skipped for 'missing from sequences' still has a real image
    in the first sequence — its mask must not be called an orphan."""
    train = os.path.join(tree, "seg", "training")
    os.remove(os.path.join(train, "images", "P001", "VIBRANT+C5",
                           "slice_000.png"))
    r = check_split(tree, "train", SEQ)
    assert any("missing from sequences" in w for w in r["warnings"])
    assert not any("orphan" in w for w in r["warnings"])
    # a genuinely stray mask IS still reported
    mask_dir = os.path.join(train, "labels", "P002", "VIBRANT+C1")
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        os.path.join(mask_dir, "slice_999.png"))
    r2 = check_split(tree, "train", SEQ)
    assert any("orphan" in w and "slice_999.png" in w
               for w in r2["warnings"])


def test_unknown_split_is_a_diagnostic_not_a_crash(tree, capsys):
    """--splits training (the dir name, not the mode key) must explain
    itself rather than raise KeyError."""
    assert main(["--data-path", tree, "--splits", "training"]) == 1
    out = capsys.readouterr().out
    assert "unknown split 'training'" in out and "train" in out


def test_cross_split_patient_leakage_is_an_error(tmp_path, capsys):
    """The same patient id in two splits (hand-built trees) must fail the
    doctor: slice-level leakage invalidates the test score."""
    import shutil

    from stf_unet_tpu.cli.doctor import main as doctor_main
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = str(tmp_path / "leaky")
    make_synthetic_breadm(root, size=24, time_steps=2)
    # copy a training patient into test under the SAME id
    src = os.path.join(root, "seg", "training")
    dst = os.path.join(root, "seg", "test")
    shutil.copytree(os.path.join(src, "images", "P000"),
                    os.path.join(dst, "images", "P000"), dirs_exist_ok=True)
    shutil.copytree(os.path.join(src, "labels", "P000"),
                    os.path.join(dst, "labels", "P000"), dirs_exist_ok=True)
    rc = doctor_main(["--data-path", root, "--sequence-types",
                      "VIBRANT+C1,VIBRANT+C2"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "patient leakage between train and test" in out
    assert "P000" in out

    # a clean tree stays clean
    clean = str(tmp_path / "clean")
    make_synthetic_breadm(clean, size=24, time_steps=2)
    assert doctor_main(["--data-path", clean, "--sequence-types",
                        "VIBRANT+C1,VIBRANT+C2"]) == 0


def test_class_stats_binary(tree):
    """Pixel counts match an independent PIL count over exactly the served
    masks; suggested weights are inverse-frequency with mean 1."""
    from stf_unet_tpu.cli.doctor import class_pixel_stats

    stats = class_pixel_stats(tree, "train", SEQ)
    index = DatasetIndex(root=tree, mode="train", sequence_types=SEQ)
    fg = total = 0
    for rec in index.records:
        m = np.asarray(Image.open(rec.mask_path).convert("L")) // 255
        fg += int(m.sum())
        total += m.size
    assert stats["counts"] == [total - fg, fg]
    assert stats["ignored"] == 0
    w = stats["weights"]
    assert w[1] > w[0] > 0  # tumor is the rare class
    assert abs((w[0] + w[1]) / 2 - 1.0) < 1e-3  # normalized to mean 1
    # inverse-frequency up to the shared normalizer
    assert w[1] / w[0] == pytest.approx(stats["counts"][0] /
                                        stats["counts"][1], rel=1e-3)


def test_class_stats_index_masks_and_ignore(tmp_path):
    """Index-format masks: per-class counts, 255 pixels land in 'ignored',
    and a zero-pixel class yields weight None + a console warning."""
    from stf_unet_tpu.cli.doctor import class_pixel_stats
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = str(tmp_path / "breadm")
    make_synthetic_breadm(root, size=40, time_steps=2, mask_classes=3)
    seq = ("VIBRANT+C1", "VIBRANT+C2")

    # paint one mask corner with the 255 ignore label
    index = DatasetIndex(root=root, mode="train", sequence_types=seq)
    m = np.asarray(Image.open(index.records[0].mask_path).convert("L"))
    m = m.copy()
    m[:4, :4] = 255
    Image.fromarray(m).save(index.records[0].mask_path)

    stats = class_pixel_stats(root, "train", seq, mask_format="index",
                              num_classes=3)
    assert len(stats["counts"]) == 4
    assert all(c > 0 for c in stats["counts"])  # concentric bands: 0..3
    assert stats["ignored"] == 16
    assert sum(stats["counts"]) + 16 == len(index.records) * 40 * 40

    # declaring more classes than the masks hold -> empty class, no weight
    stats5 = class_pixel_stats(root, "train", seq, mask_format="index",
                               num_classes=5)
    assert stats5["counts"][4] == stats5["counts"][5] == 0
    assert stats5["weights"][4] is None and stats5["weights"][5] is None


def test_class_stats_cli(tree, capsys):
    rc = main(["--data-path", tree, "--splits", "train,val",
               "--class-stats"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "class pixels: class 0:" in out
    # the weight suggestion comes from the train split only
    assert out.count("suggested inverse-frequency --loss-class-weights") == 1

    rc = main(["--data-path", tree, "--splits", "train", "--class-stats",
               "--json"])
    rep = json.loads(capsys.readouterr().out)
    assert rep[0]["class_stats"]["counts"][0] > 0


def test_class_stats_counts_undecodable_masks(tree, capsys):
    """Masks that fail to decode are counted and surfaced in the printout
    (ADVICE r3: --class-stats without --decode must not silently compute
    frequencies over a partial mask set)."""
    from stf_unet_tpu.cli.doctor import class_pixel_stats, format_class_stats

    index = DatasetIndex(root=tree, mode="train", sequence_types=SEQ)
    with open(index.records[0].mask_path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    stats = class_pixel_stats(tree, "train", SEQ)
    assert stats["skipped"] == 1
    lines = "\n".join(format_class_stats("train", stats))
    assert "1 masks failed to decode" in lines


def test_class_stats_zero_class_suppresses_weight_suggestion(tmp_path):
    """With a zero-pixel class the copy-pasteable --loss-class-weights line
    is suppressed (a pasted 0 weight would silence that class's CE loss if
    it appears in val/test) — ADVICE r3."""
    from stf_unet_tpu.cli.doctor import class_pixel_stats, format_class_stats
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = str(tmp_path / "breadm")
    make_synthetic_breadm(root, size=40, time_steps=2, mask_classes=3)
    seq = ("VIBRANT+C1", "VIBRANT+C2")
    stats = class_pixel_stats(root, "train", seq, mask_format="index",
                              num_classes=5)  # classes 4,5 empty
    lines = "\n".join(format_class_stats("train", stats))
    assert "no --loss-class-weights suggestion" in lines
    assert "suggested inverse-frequency" not in lines
