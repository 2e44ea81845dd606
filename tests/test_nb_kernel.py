"""Pallas NB GLM kernel vs the plain-JAX reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppcseq_tpu.ops.nb_kernel import nb_glm_loglik, nb_glm_loglik_reference


def _case(S=21, G=300, C=2, seed=0):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(S)] + [rng.integers(0, 2, S).astype(float) for _ in range(C - 1)])
    alpha = rng.normal(4.0, 1.0, size=(C, G))
    alpha[1:] = rng.normal(0, 0.5, size=(C - 1, G))
    log_phi = rng.normal(0.0, 1.0, size=G)
    exposure = rng.normal(0.0, 0.3, size=S)
    eta = exposure[:, None] + X @ alpha
    counts = rng.poisson(np.minimum(np.exp(eta), 1e6)).astype(np.int32)
    mask = (rng.uniform(size=(S, G)) > 0.05).astype(np.float64)
    return (
        jnp.asarray(X, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(log_phi, jnp.float32),
        jnp.asarray(exposure, jnp.float32),
        jnp.asarray(counts),
        jnp.asarray(mask, jnp.float32),
    )


def test_forward_matches_reference():
    args = _case()
    got = nb_glm_loglik(*args, 128, True)
    want = nb_glm_loglik_reference(*[a.astype(jnp.float64) for a in args[:4]] + [args[4], args[5].astype(jnp.float64)])
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_forward_unaligned_gene_count():
    # G not a multiple of the tile: padding path
    args = _case(G=37)
    got = nb_glm_loglik(*args, 128, True)
    want = nb_glm_loglik_reference(*args)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_gradients_match_reference():
    args = _case(S=8, G=64, C=3, seed=1)
    X, alpha, log_phi, exposure, counts, mask = args

    def f_kernel(alpha, log_phi):
        return nb_glm_loglik(X, alpha, log_phi, exposure, counts, mask, 64, True)

    def f_ref(alpha, log_phi):
        return nb_glm_loglik_reference(X, alpha, log_phi, exposure, counts, mask)

    ga_k, gp_k = jax.grad(f_kernel, argnums=(0, 1))(alpha, log_phi)
    ga_r, gp_r = jax.grad(f_ref, argnums=(0, 1))(alpha, log_phi)
    np.testing.assert_allclose(np.asarray(ga_k), np.asarray(ga_r), rtol=3e-3, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gp_k), np.asarray(gp_r), rtol=3e-3, atol=3e-2)


def test_gradient_respects_mask():
    args = _case(S=4, G=16, C=2, seed=2)
    X, alpha, log_phi, exposure, counts, mask = args
    mask = mask.at[:, 3].set(0.0)

    ga, gp = jax.grad(
        lambda a, p: nb_glm_loglik(X, a, p, exposure, counts, mask, 16, True),
        argnums=(0, 1),
    )(alpha, log_phi)
    np.testing.assert_array_equal(np.asarray(ga[:, 3]), 0.0)
    np.testing.assert_array_equal(np.asarray(gp[3]), 0.0)
