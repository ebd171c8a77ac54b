"""Spatial (H-axis) sharding: sharded inference must match unsharded
(GSPMD halo exchange for convs/pools) on the CPU-simulated mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from stf_unet_tpu.models import STFLSTMUNet, UNet
from stf_unet_tpu.parallel import create_2d_mesh, replicate, spatial_sharding


def test_unet_spatially_sharded_matches():
    mesh = create_2d_mesh(2, 4)
    model = UNet(num_classes=2, base_c=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 8)), jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)

    fwd = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False)["out"])
    want = np.asarray(fwd(v, x))

    xs = jax.device_put(x, spatial_sharding(mesh, 4, h_axis=1))
    vs = replicate(mesh, v)
    got = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stflstm_spatially_sharded_matches():
    mesh = create_2d_mesh(1, 8)
    model = STFLSTMUNet(num_classes=2, time_steps=2, lstm_backend="scan")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 1)), jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)

    fwd = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False)["out"])
    want = np.asarray(fwd(v, x))

    xs = jax.device_put(x, spatial_sharding(mesh, 5, h_axis=2))
    vs = replicate(mesh, v)
    got = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
