"""PK map generation pipeline over a synthetic SUB-sequence tree
(ref:pk_fitting.py:605-730 drivers + my_dataset pk_maps contract)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sub_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm_sub")
    return make_synthetic_breadm(str(root), size=32, time_steps=8,
                                 patients_per_split=1, slices_per_patient=1,
                                 sequence_prefix="SUB")


def test_generate_pk_maps_and_consume(sub_root):
    from stf_unet_tpu.core.config import PKConfig
    from stf_unet_tpu.pk.maps import generate_pk_maps_for_dataset
    cfg = PKConfig(solver="lm", lm_iters=10)  # fast CI setting
    out = generate_pk_maps_for_dataset(sub_root, splits=["training"], cfg=cfg)

    pk_dir = os.path.join(out["training"], "P000")
    for name in ("ktrans", "ve", "vp"):
        assert os.path.exists(os.path.join(pk_dir, f"{name}.png"))
        raw = np.load(os.path.join(pk_dir, f"{name}_raw.npy"))
        assert raw.shape == (32, 32)
        assert np.isfinite(raw).all()
    assert os.path.exists(os.path.join(pk_dir, "combined_map.png"))

    # maps are nonzero inside tissue (the fit actually did something)
    kt = np.load(os.path.join(pk_dir, "ktrans_raw.npy"))
    assert (kt > 0).sum() > 10

    # the dataset index consumes the generated maps (ref:my_dataset.py:198-227)
    from stf_unet_tpu.data import DatasetIndex
    from stf_unet_tpu.data.loader import load_sample_raw
    seqs = tuple(f"SUB{i}" for i in range(1, 9))
    idx = DatasetIndex(sub_root, "train", seqs, use_pk_maps=True)
    assert len(idx) == 1
    frames, mask, pk = load_sample_raw(idx[0], use_pk_maps=True)
    assert pk.shape == (3, 32, 32)
    assert pk.max() > 0


def test_patient_shards_partition_the_dataset(tmp_path):
    """--num-shards/--shard-index: the two shards of a 3-patient split fit
    disjoint patient sets whose union is the full set (fleet sharding)."""
    from stf_unet_tpu.core.config import PKConfig
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    from stf_unet_tpu.pk.maps import process_dataset

    root = make_synthetic_breadm(str(tmp_path / "b"), size=32, time_steps=8,
                                 patients_per_split=3, slices_per_patient=1,
                                 sequence_prefix="SUB")
    cfg = PKConfig(solver="lm", lm_iters=5)
    out_dir = os.path.join(root, "seg", "training", "pk_maps")

    process_dataset(root, "training", cfg, num_shards=2, shard_index=0)
    shard0 = set(os.listdir(out_dir))
    process_dataset(root, "training", cfg, num_shards=2, shard_index=1)
    both = set(os.listdir(out_dir))

    assert shard0 == {"P000", "P002"}
    assert both == {"P000", "P001", "P002"}

    with pytest.raises(ValueError):
        process_dataset(root, "training", cfg, num_shards=2, shard_index=2)
