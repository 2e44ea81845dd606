"""Pallas NB GLM kernel vs the plain-JAX references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppcseq_tpu.model import nb_model
from ppcseq_tpu.ops.nb_kernel import nb_glm_likelihood, nb_glm_loglik_reference


def _case(S=21, G=300, C=2, n_check=4, seed=0, exclude_frac=0.05):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(S)] + [rng.integers(0, 2, S).astype(float) for _ in range(C - 1)])
    alpha = rng.normal(4.0, 1.0, size=(C, G))
    alpha[1:] = rng.normal(0, 0.5, size=(C - 1, G))
    log_phi = rng.normal(0.0, 1.0, size=G)
    exposure = rng.normal(0.0, 0.3, size=S)
    eta = exposure[:, None] + X @ alpha
    counts = rng.poisson(np.minimum(np.exp(eta), 1e6)).astype(np.int64)
    exclude = rng.uniform(size=(S, G)) < exclude_frac
    data, dims = nb_model.prepare_data(
        counts, X, exposure, n_check, exclude_mask=exclude, dtype=jnp.float64
    )
    return data, dims, jnp.asarray(alpha, jnp.float64), jnp.asarray(log_phi, jnp.float64)


def _reference_value(data, alpha, log_phi):
    return nb_glm_loglik_reference(
        jnp.asarray(data.X, jnp.float64),
        jnp.asarray(alpha, jnp.float64),
        jnp.asarray(log_phi, jnp.float64),
        jnp.asarray(data.exposure_rate, jnp.float64),
        data.counts,
        jnp.asarray(data.like_mask, jnp.float64),
    )


def test_stable_likelihood_equals_unfolded():
    data, dims, alpha, log_phi = _case()
    stable = nb_model.masked_likelihood(data, alpha, log_phi)
    want = _reference_value(data, alpha, log_phi)
    np.testing.assert_allclose(float(stable), float(want), rtol=1e-10)


def test_delta_likelihood_equals_unfolded():
    data, dims, alpha, log_phi = _case(seed=3)
    datab = nb_model.with_baseline(data, dims)
    delta = nb_model.masked_likelihood(datab, alpha, log_phi)  # auto-dispatches
    want = _reference_value(data, alpha, log_phi)
    # log1p/expm1_precise are float32-targeted polynomials (~1e-7 relative)
    np.testing.assert_allclose(float(delta), float(want), rtol=1e-6)
    # gradients agree with the plain form
    g_delta = jax.grad(lambda a, p: nb_model.delta_likelihood(datab, a, p), (0, 1))(alpha, log_phi)
    g_plain = jax.grad(
        lambda a, p: nb_glm_loglik_reference(
            data.X, a, p, data.exposure_rate, data.counts, data.like_mask
        ),
        (0, 1),
    )(alpha, log_phi)
    for gd, gp in zip(g_delta, g_plain):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gp), rtol=2e-3, atol=1e-3)


def test_kernel_forward_matches_reference():
    data, dims, alpha, log_phi = _case()
    got = nb_glm_likelihood(data, alpha, log_phi, 128, True)
    want = _reference_value(data, alpha, log_phi)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_kernel_forward_unaligned_gene_count():
    data, dims, alpha, log_phi = _case(G=37)
    got = nb_glm_likelihood(data, alpha, log_phi, 128, True)
    want = _reference_value(data, alpha, log_phi)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_kernel_gradients_match_reference():
    data, dims, alpha, log_phi = _case(S=8, G=64, C=3, seed=1)

    def f_kernel(alpha, log_phi):
        return nb_glm_likelihood(data, alpha, log_phi, 64, True)

    def f_ref(alpha, log_phi):
        return nb_glm_loglik_reference(
            data.X, alpha, log_phi, data.exposure_rate, data.counts, data.like_mask
        )

    ga_k, gp_k = jax.grad(f_kernel, argnums=(0, 1))(alpha, log_phi)
    ga_r, gp_r = jax.grad(f_ref, argnums=(0, 1))(alpha, log_phi)
    np.testing.assert_allclose(np.asarray(ga_k), np.asarray(ga_r), rtol=3e-3, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gp_k), np.asarray(gp_r), rtol=3e-3, atol=3e-2)


def test_kernel_gradient_respects_mask():
    data, dims, alpha, log_phi = _case(S=4, G=16, C=2, seed=2, exclude_frac=0.0)
    # mask out gene 3 entirely
    like = np.asarray(data.like_mask).copy()
    like[:, 3] = 0.0
    data = nb_model.ModelData(**{
        **data.__dict__,
        "like_mask": jnp.asarray(like, jnp.float32),
    })
    ga, gp = jax.grad(
        lambda a, p: nb_glm_likelihood(data, a, p, 16, True), argnums=(0, 1)
    )(alpha, log_phi)
    np.testing.assert_array_equal(np.asarray(ga[:, 3]), 0.0)
    np.testing.assert_array_equal(np.asarray(gp[3]), 0.0)


def test_log_joint_with_kernel_matches_plain():
    from ppcseq_tpu.ops.nb_kernel import make_pallas_likelihood

    data, dims, _, _ = _case(S=6, G=32, n_check=3)
    theta = nb_model.smart_init(data, dims, as_tree=True)
    lp_plain = float(nb_model.log_joint_tree(theta, data, dims))
    lp_kernel = float(
        nb_model.log_joint_tree(
            theta, data, dims, likelihood_fn=make_pallas_likelihood(32, True)
        )
    )
    # kernel computes in float32 internally; the plain path here is float64
    np.testing.assert_allclose(lp_kernel, lp_plain, rtol=3e-4)


# --- fused value+gradient variants (round 4) -------------------------------


def _baseline_case(S=10, G=64, n_check=4, seed=5):
    data, dims, alpha, log_phi = _case(S=S, G=G, n_check=n_check, seed=seed)
    data = nb_model.with_baseline(data, dims)
    theta = jnp.asarray(nb_model.smart_init(data, dims), jnp.float64)
    return data, dims, theta


def test_fused_xla_value_and_grad_match_autodiff():
    """The fused-XLA likelihood ('fused': gradients computed in the forward)
    must match the delta-form autodiff path: identical value, gradients
    within analytic-vs-autodiff tolerance."""
    data, dims, theta = _baseline_case()
    ref = nb_model.flat_logp(dims, "plain")  # delta form via baseline
    fused = nb_model.flat_logp(dims, "fused")
    v0, g0 = jax.value_and_grad(ref)(theta, data)
    v1, g1 = jax.value_and_grad(fused)(theta, data)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-12)
    a0 = np.asarray(g0)
    # analytic-series error is ~1e-9 RELATIVE per point; entries that nearly
    # cancel across samples see it amplified, so bound absolutely against
    # the gradient's scale (counts here reach 1e6)
    np.testing.assert_allclose(
        np.asarray(g1), a0, rtol=1e-4, atol=1e-6 * (1 + np.abs(a0).max())
    )


def test_fused_xla_primal_has_no_grad_work():
    """Outside differentiation the primal computes the value alone and still
    equals the reference."""
    data, dims, theta = _baseline_case()
    ref = nb_model.flat_logp(dims, "plain")
    fused = nb_model.flat_logp(dims, "fused")
    np.testing.assert_allclose(
        float(fused(theta, data)), float(ref(theta, data)), rtol=1e-12
    )


def test_pallas_fused_matches_delta_reference():
    """The one-pass fused Pallas kernel (value + gradients, delta form,
    baselines rebuilt from d0 in VMEM) matches the delta-form autodiff path.
    Kernel computes in float32; tolerances sized accordingly."""
    from ppcseq_tpu.ops.nb_kernel import make_pallas_fused_likelihood

    data, dims, theta = _baseline_case()
    ref = nb_model.flat_logp(dims, "plain")
    fused = lambda th, d: nb_model.log_joint(  # noqa: E731
        th, d, dims, likelihood_fn=make_pallas_fused_likelihood(32, True)
    )
    v0, g0 = jax.value_and_grad(ref)(theta, data)
    v1, g1 = jax.value_and_grad(fused)(theta, data)
    np.testing.assert_allclose(float(v1), float(v0), rtol=3e-4)
    a0, a1 = np.asarray(g0), np.asarray(g1)
    np.testing.assert_allclose(a1, a0, rtol=2e-3, atol=2e-3 * (1 + np.abs(a0).max()))


def test_pallas_fused_requires_baseline():
    from ppcseq_tpu.ops.nb_kernel import nb_glm_likelihood_fused

    data, dims, alpha, log_phi = _case(S=4, G=16)
    with pytest.raises(ValueError, match="baseline"):
        nb_glm_likelihood_fused(data, alpha, log_phi)


def test_pallas_fused_respects_mask():
    from ppcseq_tpu.ops.nb_kernel import nb_glm_likelihood_fused

    data, dims, alpha, log_phi = _case(S=4, G=16, seed=2, exclude_frac=0.0)
    like = np.asarray(data.like_mask).copy()
    like[:, 3] = 0.0
    data = nb_model.ModelData(**{
        **data.__dict__,
        "like_mask": jnp.asarray(like, jnp.float64),
    })
    data = nb_model.with_baseline(data, dims)
    ga, gp = jax.grad(
        lambda a, p: nb_glm_likelihood_fused(data, a, p, 16, True), argnums=(0, 1)
    )(jnp.asarray(alpha, jnp.float32), jnp.asarray(log_phi, jnp.float32))
    np.testing.assert_array_equal(np.asarray(ga[:, 3]), 0.0)
    np.testing.assert_array_equal(np.asarray(gp[3]), 0.0)


def test_pallas_fast_kernel_matches_nb_fast_both_forms():
    """The one-pass nb_fast-math kernel == the XLA fast path (value + grad),
    plain and delta forms, including unaligned gene tiles and masking."""
    from ppcseq_tpu.ops.nb_kernel import nb_glm_likelihood_fast

    data, dims, alpha, log_phi = _case(G=300, seed=5)
    a32 = jnp.asarray(alpha, jnp.float32)
    l32 = jnp.asarray(log_phi, jnp.float32)

    def to_f32(d):
        import dataclasses
        return dataclasses.replace(
            d,
            X=d.X.astype(jnp.float32),
            exposure_rate=d.exposure_rate.astype(jnp.float32),
            like_mask=d.like_mask.astype(jnp.float32),
            gene_mask=d.gene_mask.astype(jnp.float32),
            **{
                f: getattr(d, f).astype(jnp.float32)
                for f in ("alpha0", "sigma_raw0", "d0", "sp_d0", "sig_neg_d0", "y_sp0")
                if getattr(d, f) is not None
            },
        )

    for tag, d in (
        ("plain", to_f32(data)),
        ("delta", to_f32(nb_model.with_baseline(data, dims))),
    ):
        v_k = nb_glm_likelihood_fast(d, a32, l32, gene_tile=128, interpret=True)
        v_x = nb_model.fast_likelihood(d, a32, l32)
        np.testing.assert_allclose(float(v_k), float(v_x), rtol=2e-5, err_msg=tag)
        g_k = jax.grad(
            lambda a, p: nb_glm_likelihood_fast(d, a, p, gene_tile=128, interpret=True),
            (0, 1),
        )(a32, l32)
        g_x = jax.grad(lambda a, p: nb_model.fast_likelihood(d, a, p), (0, 1))(a32, l32)
        for gk, gx in zip(g_k, g_x):
            scale = 1.0 + np.abs(np.asarray(gx, np.float64))
            assert (
                np.abs(np.asarray(gk, np.float64) - np.asarray(gx, np.float64)) / scale
                < 1e-4
            ).all(), tag
