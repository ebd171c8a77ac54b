"""Batched eval with shape bucketing + threaded prefetch (VERDICT r1
next-step 6): bucketed batched eval must reproduce batch-1 metrics exactly
(no 255-pad boundary approximation)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.train.loop import eval_batches_from_index, evaluate
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer

SEQS = tuple(f"VIBRANT+C{i}" for i in range(1, 3))  # T=2 keeps CPU jit fast


@pytest.fixture(scope="module")
def two_shape_root(tmp_path_factory):
    """Four slices per aspect ratio (square 24x24 -> 16x16 eval shape,
    rectangular 24x48 -> 16x24) with patient names interleaving the two
    shapes in sorted index order."""
    root = str(tmp_path_factory.mktemp("two_shapes"))
    rng = np.random.default_rng(0)
    base = os.path.join(root, "seg", "training")
    for k in range(4):
        for h, w in ((24, 24), (24, 48)):
            patient = f"P{k}_{h}x{w}"
            for seq in SEQS:
                d = os.path.join(base, "images", patient, seq)
                os.makedirs(d, exist_ok=True)
                arr = rng.integers(0, 255, (h, w), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, "s0.png"))
            md = os.path.join(base, "labels", patient, SEQS[0])
            os.makedirs(md, exist_ok=True)
            m = np.zeros((h, w), np.uint8)
            m[4:h // 2, 4:w // 2] = 255
            Image.fromarray(m).save(os.path.join(md, "s0.png"))
    return root


def _tiny_state():
    cfg = ModelConfig(model="unet", num_classes=1, time_steps=2, base_c=4)
    model = create_model(cfg)
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    x = np.zeros((1, 2, 16, 16, 1), np.float32)
    state = create_train_state(jax.random.key(0), cfg, optim, x)
    return state, model


def test_bucketed_batched_eval_matches_batch1_exactly(two_shape_root):
    data_cfg = DataConfig(data_path=two_shape_root, crop_size=16)
    index = DatasetIndex(two_shape_root, "train", SEQS)
    assert len(index) == 8
    state, model = _tiny_state()

    m1 = evaluate(state, model,
                  eval_batches_from_index(index, data_cfg, batch_size=1), 2,
                  data_cfg=data_cfg)
    m4 = evaluate(state, model,
                  eval_batches_from_index(index, data_cfg, batch_size=4), 2,
                  data_cfg=data_cfg)
    # Confusion counts are integers -> must match EXACTLY (no padding
    # pixels entering the scatter-add). Dice matches to f32 reduction-order
    # noise (batch-4 sums per-image dices in one reduction; ~1e-8), far
    # below the ~1e-3 boundary error the old 255-pad batching produced.
    np.testing.assert_array_equal(m4["confusion_matrix"],
                                  m1["confusion_matrix"])
    assert m4["dice"] == pytest.approx(m1["dice"], abs=1e-6)


def test_raw_uint8_eval_path_matches_host_normalized(two_shape_root):
    """The transfer-lean eval path (uint8 to device, normalize inside the
    jitted eval step) must reproduce the host-normalized f32 path EXACTLY:
    integer-equal confusion counts and identical dice — while shipping ~4x
    fewer bytes per batch (VERDICT r2 next-step 1)."""
    data_cfg = DataConfig(data_path=two_shape_root, crop_size=16)
    index = DatasetIndex(two_shape_root, "train", SEQS)
    state, model = _tiny_state()

    raw_batches = list(eval_batches_from_index(index, data_cfg, batch_size=1))
    f32_batches = list(eval_batches_from_index(index, data_cfg, batch_size=1,
                                               raw=False))
    # the wire format really is uint8 and ~4x leaner
    assert raw_batches[0][0].dtype == np.uint8
    assert raw_batches[0][1].dtype == np.uint8
    assert f32_batches[0][0].dtype == np.float32
    lean = sum(i.nbytes + t.nbytes for i, t in raw_batches)
    fat = sum(i.nbytes + t.nbytes for i, t in f32_batches)
    assert fat / lean == pytest.approx(4.0, rel=0.25)
    # the device normalization is the same f32 expression
    img_dev = np.asarray(
        (np.asarray(raw_batches[0][0]).astype(np.float32) / 255.0
         - data_cfg.mean) / data_cfg.std)
    np.testing.assert_array_equal(img_dev, f32_batches[0][0])

    m_raw = evaluate(state, model, iter(raw_batches), 2, data_cfg=data_cfg)
    m_f32 = evaluate(state, model, iter(f32_batches), 2)
    np.testing.assert_array_equal(m_raw["confusion_matrix"],
                                  m_f32["confusion_matrix"])
    assert m_raw["dice"] == m_f32["dice"]

    # without data_cfg the raw path must refuse loudly, not mis-normalize
    with pytest.raises(ValueError, match="data_cfg"):
        evaluate(state, model, iter(raw_batches[:1]), 2)


def test_buckets_are_uniform_shape_and_cover_everything(two_shape_root):
    data_cfg = DataConfig(data_path=two_shape_root, crop_size=16)
    index = DatasetIndex(two_shape_root, "train", SEQS)
    batches = list(eval_batches_from_index(index, data_cfg, batch_size=3))
    # 8 samples, two shape buckets of 4 -> per bucket one batch of 3 + one
    # leftover of 1 (leftovers stay same-shape, never cross-shape padded)
    assert sorted(b[0].shape[0] for b in batches) == [1, 1, 3, 3]
    assert sum(b[0].shape[0] for b in batches) == len(index)
    for image, target in batches:
        # bucketing means NO synthetic 255 padding: every 255 pixel would
        # come from padding since masks only hold {0, 1}
        assert not (target == 255).any()


def test_legacy_pad_path_still_available(two_shape_root):
    """bucket_by_shape=False restores sequential 255-pad cat_list batching
    (ref:my_dataset.py:237-257)."""
    data_cfg = DataConfig(data_path=two_shape_root, crop_size=16)
    index = DatasetIndex(two_shape_root, "train", SEQS)
    batches = list(eval_batches_from_index(index, data_cfg, batch_size=4,
                                           bucket_by_shape=False))
    assert [b[0].shape[0] for b in batches] == [4, 4]
    # index order interleaves 24px and 32px patients -> mixed-shape batches
    # carry 255 padding
    assert any((t == 255).any() for _, t in batches)


def test_prefetch_iterator_semantics():
    from stf_unet_tpu.data.loader import prefetch_iterator

    assert list(prefetch_iterator(iter(range(10)), 3)) == list(range(10))
    assert list(prefetch_iterator(iter(range(5)), 0)) == list(range(5))

    def boom():
        yield 1
        raise ValueError("decode failed")

    with pytest.raises(RuntimeError, match="prefetch"):
        list(prefetch_iterator(boom(), 2))


def test_eval_prefetch_off_matches_on(two_shape_root):
    data_cfg = DataConfig(data_path=two_shape_root, crop_size=16)
    index = DatasetIndex(two_shape_root, "train", SEQS)
    a = list(eval_batches_from_index(index, data_cfg, batch_size=2,
                                     prefetch=0))
    b = list(eval_batches_from_index(index, data_cfg, batch_size=2,
                                     prefetch=2))
    assert len(a) == len(b)
    for (ia, ta), (ib, tb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)


def test_prefetch_abandoned_consumer_stops_producer():
    """Breaking out of a prefetched epoch must cancel the producer thread
    rather than leaving it blocked on a full queue."""
    import threading
    from stf_unet_tpu.data.loader import prefetch_iterator

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch_iterator(gen(), 2)
    assert next(it) == 0
    it.close()  # abandon early
    # producer must have exited; no runaway production past the queue depth
    assert threading.active_count() <= before + 1
    assert len(produced) < 20


def test_mesh_sharded_evaluate_matches_single_device(two_shape_root):
    """evaluate(mesh=...) must reproduce the unmeshed metrics exactly.

    The fixture has two shape buckets of 4 samples each. With a 4-device
    mesh and batch_size=4 every batch is divisible -> the true sharded
    placement; with an 8-device mesh batch 4 is indivisible -> the
    replicated fallback. Both must give integer-equal confusion and
    float-equal dice."""
    from stf_unet_tpu.core.mesh import create_mesh

    data_cfg = DataConfig(data_path=two_shape_root, crop_size=16)
    index = DatasetIndex(two_shape_root, "train", SEQS)
    state, model = _tiny_state()

    base = evaluate(state, model,
                    eval_batches_from_index(index, data_cfg, batch_size=4),
                    2, data_cfg=data_cfg)
    for n_dev in (4, 8):  # sharded placement / replicated fallback
        meshed = evaluate(state, model,
                          eval_batches_from_index(index, data_cfg,
                                                  batch_size=4), 2,
                          data_cfg=data_cfg, mesh=create_mesh(n_dev))
        np.testing.assert_array_equal(meshed["confusion_matrix"],
                                      base["confusion_matrix"])
        assert meshed["dice"] == pytest.approx(base["dice"], abs=1e-6)
