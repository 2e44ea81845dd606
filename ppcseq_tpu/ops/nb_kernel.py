"""Pallas-fused NB GLM log-likelihood (+ gradient) kernel for TPU.

The hot loop of every leapfrog / ELBO-gradient step is the reference Stan
model's likelihood (inst/stan/negBinomial_MPI.stan:97-115):

    sum_{s,g} mask[s,g] * NB2_log_lpmf(counts[s,g] | exposure[s] + (X@alpha)[s,g],
                                        phi[g] = exp(log_phi[g]))

Stan evaluates this in C++ threads with autodiff tape; here it is one fused
Pallas kernel per direction:

- forward: grid over gene tiles; eta = X @ alpha_tile (C is tiny, so the
  matmul is negligible FLOPs but fusing it avoids materializing [S, G]
  arrays in HBM — counts/mask are the only large inputs read), then the lpmf
  and a masked reduction to one scalar accumulated across the grid.
- backward: recomputes eta (cheaper than storing it) and contracts the
  elementwise derivatives into dalpha[C, G] and dlog_phi[G] directly —
  X, counts, exposure and mask are constants of the fit, so no [S, G]
  cotangent ever hits HBM.

`nb_glm_loglik` is the public entry: custom-VJP, differentiable in alpha and
log_phi. On non-TPU backends it falls back to the plain-JAX reference
implementation (`ppcseq_tpu.ops.nb`), which is also the ground truth for the
kernel's unit tests (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppcseq_tpu.ops.nb import nb2_log_lpmf

DEFAULT_GENE_TILE = 512

_HALF_LOG_2PI = 0.9189385332046727


def _lgamma_pos(x):
    """lgamma for x > 0 from elementwise primitives (no Mosaic lgamma).

    Stirling's series with 3 correction terms for x >= 8, with the
    recurrence lgamma(x) = lgamma(x+8) - sum log(x+k) below. Relative error
    well under float32 resolution on (0, inf).
    """
    small = x < 8.0
    # shift small arguments up by 8 (value irrelevant for the large branch)
    xs = jnp.where(small, x + 8.0, x)
    inv = 1.0 / xs
    inv2 = inv * inv
    stirling = (
        (xs - 0.5) * jnp.log(xs)
        - xs
        + _HALF_LOG_2PI
        + inv * (1.0 / 12.0 + inv2 * (-1.0 / 360.0 + inv2 * (1.0 / 1260.0)))
    )
    # log(x (x+1) ... (x+7)) as a sum of logs (avoids overflow)
    shift = jnp.zeros_like(x)
    for k in range(8):
        shift = shift + jnp.log(x + k)
    return jnp.where(small, stirling - shift, stirling)


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


def _lpmf_terms(counts, eta, log_phi_row):
    """Elementwise NB2-log lpmf given eta[S,T], log_phi_row[1,T]."""
    y = counts.astype(eta.dtype)
    phi = jnp.exp(log_phi_row)
    log_mu_phi = jnp.logaddexp(eta, log_phi_row)
    return (
        _lgamma_pos(y + phi)
        - _lgamma_pos(phi)
        - _lgamma_pos(y + 1.0)
        + phi * log_phi_row
        + y * eta
        - (y + phi) * log_mu_phi
    )


def _fwd_kernel(x_ref, expo_ref, counts_ref, alpha_ref, logphi_ref, mask_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

    eta = (
        jnp.dot(x_ref[:, :], alpha_ref[:, :], preferred_element_type=jnp.float32)
        + expo_ref[:, :]
    )
    terms = _lpmf_terms(counts_ref[:, :], eta, logphi_ref[:, :])
    out_ref[0, 0] += jnp.sum(terms * mask_ref[:, :])


def _bwd_kernel(
    x_ref, expo_ref, counts_ref, alpha_ref, logphi_ref, mask_ref, dalpha_ref, dlogphi_ref
):
    eta = (
        jnp.dot(x_ref[:, :], alpha_ref[:, :], preferred_element_type=jnp.float32)
        + expo_ref[:, :]
    )
    y = counts_ref[:, :].astype(eta.dtype)
    log_phi = logphi_ref[:, :]
    phi = jnp.exp(log_phi)
    log_mu_phi = jnp.logaddexp(eta, log_phi)
    p = jnp.exp(eta - log_mu_phi)  # mu / (mu + phi)
    q = jnp.exp(log_phi - log_mu_phi)  # phi / (mu + phi)

    mask = mask_ref[:, :]
    # d lpmf / d eta
    deta = mask * (y - (y + phi) * p)
    # d lpmf / d log_phi
    dlogphi_elem = mask * (
        phi
        * (
            _digamma_pos(y + phi)
            - _digamma_pos(phi)
            + log_phi
            + 1.0
            - log_mu_phi
        )
        - (y + phi) * q
    )
    # contract: dalpha[C, T] = X^T @ deta ; dlog_phi[1, T] = col-sums
    dalpha_ref[:, :] = jnp.dot(
        x_ref[:, :].T, deta, preferred_element_type=jnp.float32
    )
    dlogphi_ref[:, :] = jnp.sum(dlogphi_elem, axis=0, keepdims=True)


def _pad_axis(a, axis, to):
    pad = to - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _pallas_forward(X, alpha, log_phi, exposure, counts, mask, *, gene_tile, interpret):
    S, C = X.shape
    G = alpha.shape[1]
    T = min(gene_tile, G)
    G_pad = -(-G // T) * T
    alpha_p = _pad_axis(alpha, 1, G_pad)
    logphi_p = _pad_axis(log_phi.reshape(1, -1), 1, G_pad)
    counts_p = _pad_axis(counts, 1, G_pad)
    mask_p = _pad_axis(mask, 1, G_pad)
    grid = (G_pad // T,)

    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(
        X.astype(jnp.float32),
        exposure.reshape(S, 1).astype(jnp.float32),
        counts_p,
        alpha_p.astype(jnp.float32),
        logphi_p.astype(jnp.float32),
        mask_p.astype(jnp.float32),
    )
    return out[0, 0]


def _pallas_backward(X, alpha, log_phi, exposure, counts, mask, *, gene_tile, interpret):
    S, C = X.shape
    G = alpha.shape[1]
    T = min(gene_tile, G)
    G_pad = -(-G // T) * T
    alpha_p = _pad_axis(alpha, 1, G_pad)
    logphi_p = _pad_axis(log_phi.reshape(1, -1), 1, G_pad)
    counts_p = _pad_axis(counts, 1, G_pad)
    mask_p = _pad_axis(mask, 1, G_pad)
    grid = (G_pad // T,)

    dalpha, dlogphi = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, G_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, G_pad), jnp.float32),
        ],
        interpret=interpret,
    )(
        X.astype(jnp.float32),
        exposure.reshape(S, 1).astype(jnp.float32),
        counts_p,
        alpha_p.astype(jnp.float32),
        logphi_p.astype(jnp.float32),
        mask_p.astype(jnp.float32),
    )
    return dalpha[:, :G], dlogphi[0, :G]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def nb_glm_loglik(
    X, alpha, log_phi, exposure, counts, mask, gene_tile=DEFAULT_GENE_TILE, interpret=False
):
    """Masked NB2-log GLM likelihood, fused on TPU.

    Differentiable in alpha [C, G] and log_phi [G]; X/exposure/counts/mask
    are data. Returns a float32 scalar.
    """
    return _pallas_forward(
        X, alpha, log_phi, exposure, counts, mask, gene_tile=gene_tile, interpret=interpret
    )


def _vjp_fwd(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret):
    out = _pallas_forward(
        X, alpha, log_phi, exposure, counts, mask, gene_tile=gene_tile, interpret=interpret
    )
    return out, (X, alpha, log_phi, exposure, counts, mask)


def _vjp_bwd(gene_tile, interpret, residuals, g):
    X, alpha, log_phi, exposure, counts, mask = residuals
    dalpha, dlogphi = _pallas_backward(
        X, alpha, log_phi, exposure, counts, mask, gene_tile=gene_tile, interpret=interpret
    )
    return (None, g * dalpha, g * dlogphi, None, None, None)


nb_glm_loglik.defvjp(_vjp_fwd, _vjp_bwd)


def nb_glm_loglik_reference(X, alpha, log_phi, exposure, counts, mask):
    """Plain-JAX semantic reference (and non-TPU fallback)."""
    eta = exposure[:, None] + X @ alpha
    return jnp.sum(mask * nb2_log_lpmf(counts, eta, jnp.broadcast_to(log_phi[None, :], eta.shape)))
