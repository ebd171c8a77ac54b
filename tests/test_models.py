"""Model shape/gradient/semantics tests (tiny shapes — 1-core CI)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stf_unet_tpu.core.config import ModelConfig
from stf_unet_tpu.models import STFLSTMUNet, UNet, create_model, preprocess_input


def test_unet_shapes_and_head():
    m = UNet(num_classes=2, base_c=4)
    x = jnp.ones((1, 32, 32, 8))
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert set(out.keys()) == {"out"}
    assert out["out"].shape == (1, 32, 32, 2)


def test_stflstm_full_resolution_output():
    """Documented divergence: logits upsampled to input resolution (the
    reference stops at H/2, ref:src/stf_lstm_unet.py:250-254)."""
    m = STFLSTMUNet(num_classes=2, time_steps=4)
    x = jnp.ones((1, 4, 64, 64, 1))
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out["out"].shape == (1, 64, 64, 2)


def test_stflstm_pk_channel_split():
    m = STFLSTMUNet(num_classes=2, time_steps=4, use_pk_maps=True)
    x = jnp.ones((1, 7, 64, 64, 1))  # 4 time steps + 3 pk pseudo-steps
    v = m.init(jax.random.key(0), x, train=False)
    assert "pk_fusion1" in v["params"]
    out = m.apply(v, x, train=False)
    assert out["out"].shape == (1, 64, 64, 2)


def test_batch_stats_update_in_train_mode():
    m = UNet(num_classes=2, base_c=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 8)),
                    dtype=jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_gradients_flow_everywhere():
    m = STFLSTMUNet(num_classes=2, time_steps=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 32, 32, 1)),
                    dtype=jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)

    def loss(params):
        out = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                      x, train=True, mutable=["batch_stats"])[0]["out"]
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [jax.tree_util.keystr(k) for k, g in flat
            if float(jnp.max(jnp.abs(g))) == 0.0]
    assert not zero, f"dead params: {zero[:10]}"


def test_create_model_and_preprocess_flat_channels():
    cfg = ModelConfig(model="unet", num_classes=1, time_steps=8)
    m = create_model(cfg)
    assert m.num_classes == 2  # +1 background (ref:train.py:144)
    seq = jnp.arange(2 * 8 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 8, 4, 4, 1)
    flat = preprocess_input(seq, m)
    assert flat.shape == (2, 4, 4, 8)
    # channel t of flat == frame t (ref:train_and_eval.py:12-14 view semantics)
    np.testing.assert_array_equal(np.asarray(flat[0, :, :, 3]),
                                  np.asarray(seq[0, 3, :, :, 0]))


def test_preprocess_average_frame():
    class Avg:
        input_format = "average_frame"

    seq = jnp.ones((2, 8, 4, 4, 1))
    out = preprocess_input(seq, Avg())
    assert out.shape == (2, 4, 4, 1)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        create_model(ModelConfig(model="nope"))


def test_stflstm_remat_matches_no_remat():
    m1 = STFLSTMUNet(num_classes=2, time_steps=2, remat=False)
    m2 = STFLSTMUNet(num_classes=2, time_steps=2, remat=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 32, 32, 1)),
                    dtype=jnp.float32)
    v = m1.init(jax.random.key(0), x, train=False)
    out1 = m1.apply(v, x, train=False)["out"]
    out2 = m2.apply(v, x, train=False)["out"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)

    def loss(mdl, params):
        out = mdl.apply({"params": params, "batch_stats": v["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])[0]["out"]
        return jnp.sum(out ** 2)

    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    g2 = jax.grad(lambda p: loss(m2, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_models_multiclass_heads():
    """--num-classes > 1 (reference flag) must produce matching head widths
    on both model families."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.models import STFLSTMUNet, UNet

    x = jnp.zeros((1, 4, 32, 32, 1), jnp.float32)
    for m, inp in ((UNet(num_classes=4, base_c=4),
                    x.reshape(1, 32, 32, 4)),
                   (STFLSTMUNet(num_classes=4, time_steps=4), x)):
        variables = m.init(jax.random.key(0), inp, train=False)
        out = m.apply(variables, inp, train=False)["out"]
        assert out.shape == (1, 32, 32, 4)
