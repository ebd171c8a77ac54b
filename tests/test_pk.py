"""PK module tests: AIF models, Tofts quadrature numerics vs a direct
loop oracle, synthetic parameter recovery for both solvers, morphology
parity with cv2 (SURVEY.md §4 golden-parity + §7 Tofts numerics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stf_unet_tpu.core.config import PKConfig
from stf_unet_tpu.pk.aif import auto_detect_aif, make_aif, modified_aif, population_aif
from stf_unet_tpu.pk.fit import (fit_adam, fit_lm, preprocess_images,
                                 tissue_mask_morphology)
from stf_unet_tpu.pk.tofts import ToftsQuadrature, extended_tofts_batch

T_POINTS = np.arange(8, dtype=np.float32)


def _oracle_tofts(t_points, ktrans, ve, vp, aif_fn, dt=0.01):
    """Direct per-time-point masked quadrature, the textbook form of
    C(t) = vp Cp(t) + Ktrans ∫ Cp(τ) exp(-Ktrans (t-τ)/ve) dτ, evaluated
    with the same grid/mask/dt discretization the reference uses."""
    tau = np.arange(0, t_points[-1], dt)
    cp_tau = np.asarray(aif_fn(jnp.asarray(tau)))
    cp_t = np.asarray(aif_fn(jnp.asarray(t_points)))
    out = np.zeros((len(ktrans), len(t_points)))
    for i, ti in enumerate(t_points):
        m = tau < ti
        if not m.any():
            out[:, i] = vp * cp_t[i]
            continue
        tv, av = tau[m], cp_tau[m]
        for n in range(len(ktrans)):
            decay = np.exp(-ktrans[n] * (ti - tv) / ve[n])
            out[n, i] = vp[n] * cp_t[i] + ktrans[n] * np.sum(av * decay) * dt
    return out


def test_population_aif_values():
    # dose*(a1*exp(-m1 t)+a2*exp(-m2 t)) at t=0 -> 0.1*(3.99+4.78)
    v0 = float(population_aif(jnp.asarray(0.0)))
    assert abs(v0 - 0.877) < 1e-6
    assert float(population_aif(jnp.asarray(5.0))) < v0


def test_modified_aif_is_undosed():
    t = jnp.asarray([0.0, 1.0, 3.0])
    np.testing.assert_allclose(np.asarray(population_aif(t, dose=0.1)) * 10,
                               np.asarray(modified_aif(t)), rtol=1e-6)


def test_make_aif_methods():
    t = jnp.asarray(1.0)
    assert float(make_aif("population")(t)) == pytest.approx(
        float(population_aif(t)))
    assert float(make_aif("modified")(t)) == pytest.approx(
        float(modified_aif(t)))
    # auto without a detected curve falls back to modified (ref:85-87)
    assert float(make_aif("auto")(t)) == pytest.approx(float(modified_aif(t)))
    with pytest.raises(ValueError):
        make_aif("nope")


def test_auto_detect_aif_picks_steepest_voxel():
    imgs = np.zeros((4, 8, 8), np.float32)
    imgs[:, 3, 5] = [0, 10, 10, 10]  # steepest rise at (3,5)
    imgs[:, 1, 1] = [0, 1, 2, 3]
    mask = np.ones((8, 8), bool)
    aif, pos = auto_detect_aif(imgs, mask, np.arange(4, dtype=np.float32))
    assert pos == (3, 5)
    # curve interp hits the sample values at sample times
    np.testing.assert_allclose(np.asarray(aif(jnp.asarray([1.0, 2.0]))),
                               [10.0, 10.0], rtol=1e-5)
    # linear extrapolation beyond the last sample (scipy parity)
    assert float(aif(jnp.asarray(4.0))) == pytest.approx(10.0, rel=1e-5)


def test_quadrature_matches_direct_loop():
    aif = make_aif("population")
    quad = ToftsQuadrature.build(T_POINTS, aif)
    rng = np.random.default_rng(0)
    k = rng.uniform(0.01, 0.5, 16).astype(np.float32)
    ve = rng.uniform(0.05, 0.4, 16).astype(np.float32)
    vp = rng.uniform(0.0, 0.15, 16).astype(np.float32)
    ours = np.asarray(extended_tofts_batch(
        quad, jnp.asarray(k), jnp.asarray(ve), jnp.asarray(vp)))
    oracle = _oracle_tofts(T_POINTS, k, ve, vp, aif)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_tofts_closed_form_limits():
    """ktrans=0 => C = vp*Cp (SURVEY §4 closed-form check)."""
    aif = make_aif("population")
    quad = ToftsQuadrature.build(T_POINTS, aif)
    vp = jnp.asarray([0.1])
    c = extended_tofts_batch(quad, jnp.asarray([0.0]), jnp.asarray([0.2]), vp)
    np.testing.assert_allclose(np.asarray(c)[0],
                               0.1 * np.asarray(quad.aif_at_t), rtol=1e-6)


@pytest.mark.parametrize("solver", ["lm", "adam"])
def test_synthetic_parameter_recovery(solver):
    """Fit recovers known (Ktrans, ve, vp) from clean synthetic curves —
    the quantitative version of what ref test_aif_methods eyeballs."""
    cfg = PKConfig(solver=solver, num_epochs=300, lm_iters=60)
    aif = make_aif("population")
    quad = ToftsQuadrature.build(cfg.time_points, aif, cfg.dt)
    true = np.array([[0.12, 0.25, 0.04],
                     [0.30, 0.15, 0.02],
                     [0.05, 0.35, 0.08]], np.float32)
    curves = np.asarray(extended_tofts_batch(
        quad, jnp.asarray(true[:, 0]), jnp.asarray(true[:, 1]),
        jnp.asarray(true[:, 2])))
    fit = fit_lm if solver == "lm" else fit_adam
    est = fit(curves, quad, cfg)
    tol = 0.02 if solver == "lm" else 0.08
    np.testing.assert_allclose(est, true, atol=tol)


def test_fit_respects_clamp_box():
    cfg = PKConfig(solver="lm", lm_iters=40)
    aif = make_aif("population")
    quad = ToftsQuadrature.build(cfg.time_points, aif, cfg.dt)
    # absurd curves push params to the bounds; they must stay inside
    curves = np.full((8, 8), 50.0, np.float32)
    est = fit_lm(curves, quad, cfg)
    assert (est[:, 0] >= cfg.ktrans_bounds[0] - 1e-6).all()
    assert (est[:, 0] <= cfg.ktrans_bounds[1] + 1e-6).all()
    assert (est[:, 1] >= cfg.ve_bounds[0] - 1e-6).all()
    assert (est[:, 2] <= cfg.vp_bounds[1] + 1e-6).all()


def test_morphology_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    mask = (rng.uniform(size=(40, 40)) > 0.6).astype(np.uint8)
    kernel = np.ones((5, 5), np.uint8)
    ref = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
    ref = cv2.morphologyEx(ref, cv2.MORPH_CLOSE, kernel)
    ours = np.asarray(tissue_mask_morphology(mask)).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_preprocess_images_mask_and_scale():
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (8, 32, 32)).astype(np.uint8)
    imgs[:, :8, :8] = 0  # dark corner below threshold
    cfg = PKConfig()
    norm, mask = preprocess_images(imgs, cfg)
    assert float(jnp.max(norm)) <= 1.0
    m = np.asarray(mask)
    assert m[:6, :6].sum() == 0  # dark corner excluded


def test_analytic_jacobian_matches_autodiff():
    from stf_unet_tpu.pk.tofts import extended_tofts_with_jacobian
    import jax
    aif = make_aif("population")
    quad = ToftsQuadrature.build(T_POINTS, aif)
    rng = np.random.default_rng(5)
    p = jnp.asarray(np.stack([rng.uniform(0.02, 0.5, 8),
                              rng.uniform(0.05, 0.4, 8),
                              rng.uniform(0.0, 0.15, 8)], axis=1),
                    jnp.float32)
    c, jac = extended_tofts_with_jacobian(quad, p[:, 0], p[:, 1], p[:, 2])

    def fwd(pp):
        return extended_tofts_batch(quad, pp[:, 0], pp[:, 1], pp[:, 2])

    np.testing.assert_allclose(np.asarray(c), np.asarray(fwd(p)),
                               rtol=1e-5, atol=1e-6)
    want = jax.jacfwd(fwd)(p)  # [N, T, N, 3] block-diagonal
    n = p.shape[0]
    want_diag = np.asarray(want)[np.arange(n), :, np.arange(n), :]
    np.testing.assert_allclose(np.asarray(jac), want_diag,
                               rtol=1e-4, atol=1e-5)


def test_tofts_pallas_kernel_parity():
    """Fused dual-contraction kernel == XLA einsum pair (interpret mode)."""
    from stf_unet_tpu.pk.tofts import _dual_sums
    aif = make_aif("population")
    quad = ToftsQuadrature.build(T_POINTS, aif)
    rng = np.random.default_rng(7)
    rate = jnp.asarray(rng.uniform(0.05, 5.0, 100), jnp.float32)
    s_x, sl_x = _dual_sums(quad, rate, "xla")
    s_p, sl_p = _dual_sums(quad, rate, "pallas_interpret")
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sl_p), np.asarray(sl_x),
                               rtol=1e-5, atol=1e-6)


def test_solve3x3_matches_lapack():
    """The closed-form adjugate solve used by the LM step (75x faster than
    batched LU on TPU) must agree with LAPACK on damped-JtJ-like systems."""
    from stf_unet_tpu.pk.fit import _solve3x3

    rng = np.random.default_rng(0)
    jac = rng.normal(size=(64, 8, 3)).astype(np.float32)
    a = np.einsum("nti,ntj->nij", jac, jac)
    # LM-style damping across the lambda range the solver clips to
    lams = np.logspace(-8, 2, 64).astype(np.float32)
    a = a + lams[:, None, None] * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(64, 3)).astype(np.float32)

    got = np.asarray(_solve3x3(jnp.asarray(a), jnp.asarray(b)))
    want = np.linalg.solve(a.astype(np.float64),
                           b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-4)


@pytest.mark.parametrize("solver", ["lm", "adam"])
def test_mesh_sharded_fit_matches_single_device(solver):
    """Voxel-sharded fitting over the 8-device mesh must reproduce the
    single-device result — voxels are independent, so the shard_map split
    changes nothing but the device placement. Exercises the per-shard
    bucket padding path (N=1000 -> ceil(125)/shard -> 256-bucket)."""
    from stf_unet_tpu.core.mesh import create_mesh

    cfg = PKConfig(solver=solver, num_epochs=50, lm_iters=20)
    aif = make_aif("population")
    quad = ToftsQuadrature.build(cfg.time_points, aif, cfg.dt)
    rng = np.random.default_rng(11)
    n = 1000
    true_k = rng.uniform(0.02, 0.4, n).astype(np.float32)
    true_ve = rng.uniform(0.1, 0.4, n).astype(np.float32)
    true_vp = rng.uniform(0.01, 0.09, n).astype(np.float32)
    curves = np.asarray(extended_tofts_batch(
        quad, jnp.asarray(true_k), jnp.asarray(true_ve),
        jnp.asarray(true_vp)))
    curves = curves + rng.normal(0, 1e-3, curves.shape).astype(np.float32)

    fit = fit_lm if solver == "lm" else fit_adam
    single = fit(curves, quad, cfg)
    sharded = fit(curves, quad, cfg, mesh=create_mesh(8))
    # Both solvers are per-voxel with shard-invariant gradient scales ->
    # the sharded run is bitwise-identical.
    np.testing.assert_allclose(sharded, single, atol=0.0, rtol=0)
