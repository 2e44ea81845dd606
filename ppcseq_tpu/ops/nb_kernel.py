"""Pallas-fused NB GLM log-likelihood (+ gradient) kernel for TPU.

The hot loop of every leapfrog / ELBO-gradient step is the reference Stan
model's likelihood (inst/stan/negBinomial_MPI.stan:97-115):

    sum_{s,g} mask[s,g] * NB2_log_lpmf(counts[s,g] | exposure[s] + (X@alpha)[s,g],
                                        phi[g] = exp(log_phi[g]))

Stan evaluates this in C++ threads with an autodiff tape; here it is one
fused Pallas kernel per direction:

- forward: grid over gene tiles; eta = X @ alpha_tile recomputed in VMEM
  (C is tiny, so fusing the matmul costs nothing and avoids materializing
  [S, G] arrays in HBM — counts/mask are the only large inputs read), then
  the float32-stable lpmf decomposition (ops.nb.nb2_log_lpmf_stable: every
  per-point term is O(|lpmf|)-moderate, which NUTS energy differences
  require in f32) and a masked reduction to one scalar accumulated across
  the grid.
- backward: recomputes eta and contracts the elementwise derivatives into
  dalpha[C, G] and dlog_phi[G] directly — X, counts, exposure and mask are
  constants of the fit, so no [S, G] cotangent ever hits HBM. digamma(phi)
  is evaluated on the [1, T] gene row, not per point.

lgamma/digamma have no Mosaic lowering; the stable lpmf uses only
exp/log/log1p, and the backward's digamma is implemented from elementwise
primitives.

`nb_glm_likelihood(data, alpha, log_phi)` is the public entry: custom-VJP,
differentiable in alpha and log_phi, drop-in for nb_model.masked_likelihood
(which is also its unit-test ground truth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppcseq_tpu.ops.nb import nb2_log_lpmf, nb2_log_lpmf_stable

DEFAULT_GENE_TILE = 512


def _digamma_pos(x):
    """digamma for x > 0: asymptotic series for x >= 6 + recurrence below."""
    small = x < 6.0
    xs = jnp.where(small, x + 6.0, x)
    inv = 1.0 / xs
    inv2 = inv * inv
    asym = (
        jnp.log(xs)
        - 0.5 * inv
        - inv2 * (1.0 / 12.0 + inv2 * (-1.0 / 120.0 + inv2 * (1.0 / 252.0)))
    )
    shift = jnp.zeros_like(x)
    for k in range(6):
        shift = shift + 1.0 / (x + k)
    return jnp.where(small, asym - shift, asym)


def _fwd_kernel(x_ref, expo_ref, counts_ref, alpha_ref, logphi_ref, mask_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

    eta = (
        jnp.dot(x_ref[:, :], alpha_ref[:, :], preferred_element_type=jnp.float32, precision="highest")
        + expo_ref[:, :]
    )
    log_phi = jnp.broadcast_to(logphi_ref[:, :], eta.shape)
    pts = nb2_log_lpmf_stable(counts_ref[:, :], eta, log_phi)
    out_ref[0, 0] += jnp.sum(pts * mask_ref[:, :])


def _bwd_kernel(x_ref, expo_ref, counts_ref, alpha_ref, logphi_ref, mask_ref, dalpha_ref, dlogphi_ref):
    eta = (
        jnp.dot(x_ref[:, :], alpha_ref[:, :], preferred_element_type=jnp.float32, precision="highest")
        + expo_ref[:, :]
    )
    y = counts_ref[:, :].astype(eta.dtype)
    # same phi cap as the forward's nb2_log_lpmf_stable: the capped model's
    # gradient wrt log_phi vanishes beyond the cap
    log_phi = jnp.minimum(logphi_ref[:, :], 80.0)
    phi = jnp.exp(log_phi)
    # p = mu/(mu+phi), q = phi/(mu+phi) via sigmoid (no logaddexp cancellation)
    d = eta - log_phi
    p = jax.nn.sigmoid(d)
    q = jax.nn.sigmoid(-d)
    softplus_d = jnp.where(d > 0, d, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(d)))

    mask = mask_ref[:, :]
    deta = mask * (y - (y + phi) * p)
    dg_phi_row = _digamma_pos(phi)  # [1, T], broadcast below
    # log_phi + 1 - logaddexp(eta, log_phi) == 1 - softplus(d)
    dlogphi_elem = mask * jnp.where(
        logphi_ref[:, :] < 80.0,
        phi * (_digamma_pos(y + phi) - dg_phi_row + 1.0 - softplus_d)
        - (y + phi) * q,
        0.0,
    )
    dalpha_ref[:, :] = jnp.dot(x_ref[:, :].T, deta, preferred_element_type=jnp.float32, precision="highest")
    dlogphi_ref[:, :] = jnp.sum(dlogphi_elem, axis=0, keepdims=True)


def _pad_axis(a, axis, to):
    pad = to - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _prep(X, alpha, log_phi, exposure, counts, mask, gene_tile):
    S, C = X.shape
    G = alpha.shape[1]
    T = min(gene_tile, G)
    G_pad = -(-G // T) * T
    args = (
        X.astype(jnp.float32),
        exposure.reshape(S, 1).astype(jnp.float32),
        _pad_axis(counts, 1, G_pad),
        _pad_axis(alpha, 1, G_pad).astype(jnp.float32),
        _pad_axis(log_phi.reshape(1, -1), 1, G_pad).astype(jnp.float32),
        _pad_axis(mask, 1, G_pad).astype(jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((S, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    return args, in_specs, (G_pad // T,), T, G_pad


def _pallas_forward(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret):
    args, in_specs, grid, T, G_pad = _prep(X, alpha, log_phi, exposure, counts, mask, gene_tile)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[0, 0]


def _pallas_backward(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret):
    S, C = X.shape
    G = alpha.shape[1]
    args, in_specs, grid, T, G_pad = _prep(X, alpha, log_phi, exposure, counts, mask, gene_tile)
    dalpha, dlogphi = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, G_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, G_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return dalpha[:, :G], dlogphi[0, :G]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _masked_loglik(
    X, alpha, log_phi, exposure, counts, mask,
    gene_tile=DEFAULT_GENE_TILE, interpret=False,
):
    return _pallas_forward(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret)


def _vjp_fwd(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret):
    out = _pallas_forward(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret)
    return out, (X, alpha, log_phi, exposure, counts, mask)


def _vjp_bwd(gene_tile, interpret, residuals, g):
    X, alpha, log_phi, exposure, counts, mask = residuals
    dalpha, dlogphi = _pallas_backward(
        X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret
    )
    return (None, g * dalpha, g * dlogphi, None, None, None)


_masked_loglik.defvjp(_vjp_fwd, _vjp_bwd)


def nb_glm_likelihood(data, alpha, log_phi, gene_tile=DEFAULT_GENE_TILE, interpret=False):
    """Drop-in Pallas replacement for nb_model.masked_likelihood.

    `data` is a nb_model.ModelData; differentiable in alpha [C, G] and
    log_phi [G]. Pass as `likelihood_fn` to nb_model.make_log_density.
    """
    return _masked_loglik(
        data.X, alpha, log_phi, data.exposure_rate, data.counts, data.like_mask,
        gene_tile, interpret,
    )


def make_pallas_likelihood(gene_tile=DEFAULT_GENE_TILE, interpret=False):
    return functools.partial(nb_glm_likelihood, gene_tile=gene_tile, interpret=interpret)


def nb_glm_loglik_reference(X, alpha, log_phi, exposure, counts, mask):
    """Plain-JAX unfolded semantic reference (ground truth for kernel tests)."""
    eta = exposure[:, None] + X @ alpha
    return jnp.sum(mask * nb2_log_lpmf(counts, eta, jnp.broadcast_to(log_phi[None, :], eta.shape)))
