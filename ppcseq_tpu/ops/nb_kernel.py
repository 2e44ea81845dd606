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


# ---------------------------------------------------------------------------
# Fused value+gradient kernel (delta-form): ONE VMEM pass computes the
# delta-form log-likelihood (nb_model.delta_likelihood semantics — the
# float32-smooth evaluation the TPU samplers require) TOGETHER with the
# analytic gradients (ops.nb_grad math). The [S, G]-sized HBM reads per
# leapfrog drop to three (counts, mask, d0): the remaining delta-form
# baseline constants (softplus(d0), sigmoid(-d0), y*softplus(-d0)) are
# derived from d0 in VMEM — VPU flops are cheaper than HBM reads — and the
# value/gradient branches share d, sigmoid(-d) and softplus(-d). The
# separate forward/backward kernels above read counts+mask twice and ignore
# the delta baseline; this kernel supersedes them for the production path.


def _fused_dkernel(
    x_ref, counts_ref, mask_ref, d0_ref, alpha_ref, alpha0_ref,
    logphi_ref, sraw0_ref, val_ref, dalpha_ref, dlogphi_ref,
):
    from ppcseq_tpu.ops.nb import (
        _softplus,
        expm1_precise,
        log1p_precise,
        nb2_part1,
    )
    from ppcseq_tpu.ops.nb_grad import (
        phi_digamma_diff,
        phi_softplus_minus_sigmoid,
    )

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        val_ref[0, 0] = jnp.zeros((), val_ref.dtype)

    x = x_ref[:, :]
    y = counts_ref[:, :].astype(jnp.float32)
    mask = mask_ref[:, :]
    d0 = d0_ref[:, :]

    # delta-form geometry (nb_model.delta_likelihood): d = d0 + dlo
    log_phi_raw = logphi_ref[:, :]
    log_phi_c = jnp.minimum(log_phi_raw, 80.0)
    delta_eta = jnp.dot(
        x, alpha_ref[:, :] - alpha0_ref[:, :],
        preferred_element_type=jnp.float32, precision="highest",
    )
    dlo = delta_eta - (log_phi_c + sraw0_ref[:, :])
    d = d0 + dlo
    phi_row = jnp.exp(log_phi_c)
    phi = jnp.broadcast_to(phi_row, d.shape)
    log_phi = jnp.broadcast_to(log_phi_c, d.shape)

    # baseline constants rebuilt from d0 in VMEM (softplus(-d0) = sp_d0 - d0)
    em0 = jnp.exp(-jnp.abs(d0))
    sig_neg_d0 = jnp.where(d0 > 0, em0 / (1.0 + em0), 1.0 / (1.0 + em0))
    sp_d0 = jnp.where(d0 > 0, d0, 0.0) + log1p_precise(em0)
    spn0 = sp_d0 - d0

    # --- value: hybrid delta increments (see nb_model.delta_likelihood) ---
    dlo_m = jnp.clip(dlo, -2.0, 8.0)
    sp_d_mid = sp_d0 + log1p_precise((1.0 - sig_neg_d0) * expm1_precise(dlo_m))
    inc_neg_mid = log1p_precise(sig_neg_d0 * expm1_precise(-dlo_m))
    softplus_neg_d = _softplus(-d)
    phi_sp_far = jnp.where(
        d < -25.0,
        jnp.exp(jnp.clip(log_phi + d, -60.0, 60.0)),
        phi * _softplus(d),
    )
    mid = (dlo > -2.0) & (dlo < 8.0)
    phi_sp = jnp.where(mid, phi * sp_d_mid, phi_sp_far)
    inc_neg = jnp.where(mid, inc_neg_mid, softplus_neg_d - spn0)
    part1 = nb2_part1(y, phi, log_phi)
    pts = part1 - phi_sp - y * inc_neg - y * spn0
    val_ref[0, 0] += jnp.sum(mask * pts)

    # --- gradients: analytic (ops.nb_grad.nb2_grads), sharing d ----------
    em = jnp.exp(-jnp.abs(d))
    q = jnp.where(d > 0, em / (1.0 + em), 1.0 / (1.0 + em))  # sigmoid(-d)
    phi_p = jnp.exp(log_phi - softplus_neg_d)  # phi * sigmoid(d), log-space
    deta = mask * (y * q - phi_p)
    dlogphi_elem = jnp.where(
        jnp.broadcast_to(log_phi_raw, d.shape) < 80.0,
        phi_digamma_diff(y, phi, log_phi)
        - phi_softplus_minus_sigmoid(d, log_phi)
        - y * q,
        0.0,
    )
    dalpha_ref[:, :] = jnp.dot(
        x.T, deta, preferred_element_type=jnp.float32, precision="highest"
    )
    dlogphi_ref[:, :] = jnp.sum(mask * dlogphi_elem, axis=0, keepdims=True)


def _fused_call(X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0,
                gene_tile, interpret):
    S, C = X.shape
    G = alpha.shape[1]
    T = min(gene_tile, G)
    G_pad = -(-G // T) * T
    args = (
        X.astype(jnp.float32),
        _pad_axis(counts, 1, G_pad),
        _pad_axis(mask, 1, G_pad).astype(jnp.float32),
        _pad_axis(d0, 1, G_pad).astype(jnp.float32),
        _pad_axis(alpha, 1, G_pad).astype(jnp.float32),
        _pad_axis(alpha0, 1, G_pad).astype(jnp.float32),
        _pad_axis(log_phi.reshape(1, -1), 1, G_pad).astype(jnp.float32),
        _pad_axis(sigma_raw0.reshape(1, -1), 1, G_pad).astype(jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((S, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    val, dalpha, dlogphi = pl.pallas_call(
        _fused_dkernel,
        grid=(G_pad // T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, G_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, G_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return val[0, 0], dalpha[:, :G], dlogphi[0, :G]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_loglik(
    X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0,
    gene_tile=DEFAULT_GENE_TILE, interpret=False,
):
    val, _, _ = _fused_call(
        X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0,
        gene_tile, interpret,
    )
    return val


def _fused_vjp_fwd(X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0,
                   gene_tile, interpret):
    val, dalpha, dlogphi = _fused_call(
        X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0,
        gene_tile, interpret,
    )
    # kernel computes f32; return cotangents in the primals' dtypes
    return val, (dalpha.astype(alpha.dtype), dlogphi.astype(log_phi.dtype))


def _fused_vjp_bwd(gene_tile, interpret, residuals, g):
    dalpha, dlogphi = residuals
    return (
        None,
        g.astype(dalpha.dtype) * dalpha,
        g.astype(dlogphi.dtype) * dlogphi,
        None, None, None, None, None,
    )


_fused_loglik.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def nb_glm_likelihood_fused(data, alpha, log_phi, gene_tile=DEFAULT_GENE_TILE,
                            interpret=False):
    """One-pass fused value+gradient Pallas likelihood (delta-form).

    Requires delta-form baseline constants on `data`
    (nb_model.with_baseline); only d0 of the four [S, G] baselines is read —
    the rest are rebuilt in VMEM. Drop-in `likelihood_fn`; first-order only.
    """
    if data.d0 is None:
        raise ValueError(
            "nb_glm_likelihood_fused requires baseline constants "
            "(nb_model.with_baseline)"
        )
    return _fused_loglik(
        data.X, alpha, log_phi, data.counts, data.like_mask,
        data.alpha0, data.sigma_raw0, data.d0, gene_tile, interpret,
    )


def make_pallas_fused_likelihood(gene_tile=DEFAULT_GENE_TILE, interpret=False):
    return functools.partial(
        nb_glm_likelihood_fused, gene_tile=gene_tile, interpret=interpret
    )


# ---------------------------------------------------------------------------
# One-pass kernels on the hoisted nb_fast math: per-gene transcendental
# tables on the [1, T] rows, per-point work ~3 exp + 1 log, value + both
# gradients emitted from a single VMEM traversal of each gene tile. These
# share the exact branch structure of ops.nb_fast.glm_plain/glm_delta (which
# are their ground truth), so the XLA and Pallas production paths compute
# bit-comparable densities.


def _fast_common(x_ref, counts_ref, mask_ref, logphi_ref, eta,
                 val_ref, dalpha_ref, dlogphi_ref, i, delta=None):
    from ppcseq_tpu.ops import nb_fast

    @pl.when(i == 0)
    def _():
        val_ref[0, 0] = jnp.zeros((), val_ref.dtype)

    gt = nb_fast._gene_tables(logphi_ref[:, :], jnp.float32)  # [1, T] rows
    dt = nb_fast._data_tables(counts_ref[:, :], jnp.float32)
    mask = mask_ref[:, :]

    if delta is None:
        d = eta - gt["log_phi_c"]
        sp_d, sp_nd, em = nb_fast._softplus_pair(d)
        part1, phi_d = nb_fast._part1_and_digamma(gt, dt, want_grads=True)
        pts = part1 - gt["phi"] * sp_d - dt["yf"] * sp_nd
    else:
        d0, sraw0 = delta
        dlo = eta - (gt["log_phi_c"] + sraw0)  # eta holds delta_eta here
        d = d0 + dlo
        sp_d, sp_nd, em = nb_fast._softplus_pair(d)
        # baseline constants rebuilt in VMEM from d0 (flops < HBM reads)
        em0 = jnp.exp(-jnp.abs(d0))
        l1pem0 = nb_fast._log1p01(em0)
        sp_d0 = jnp.maximum(d0, 0.0) + l1pem0
        sig_neg_d0 = jnp.where(d0 > 0, em0 / (1.0 + em0), 1.0 / (1.0 + em0))
        spn0 = sp_d0 - d0
        phi_sp, inc_neg = nb_fast.delta_increment_terms(
            gt, dlo, d, sp_d, sp_nd, d0, sp_d0, sig_neg_d0
        )
        part1, phi_d = nb_fast._part1_and_digamma(gt, dt, want_grads=True)
        pts = part1 - phi_sp - dt["yf"] * (inc_neg + spn0)

    val_ref[0, 0] += jnp.sum(mask * pts)

    deta, dlogphi = nb_fast._grads_from_d(
        gt, dt, d, sp_d, sp_nd, em, phi_d, logphi_ref[:, :]
    )
    deta = mask * deta
    dalpha_ref[:, :] = jnp.dot(
        x_ref[:, :].T, deta, preferred_element_type=jnp.float32, precision="highest"
    )
    dlogphi_ref[:, :] = jnp.sum(mask * dlogphi, axis=0, keepdims=True)


def _fastk_plain(x_ref, expo_ref, counts_ref, alpha_ref, logphi_ref, mask_ref,
                 val_ref, dalpha_ref, dlogphi_ref):
    i = pl.program_id(0)
    C = x_ref.shape[1]
    eta = jnp.broadcast_to(expo_ref[:, :], (x_ref.shape[0], alpha_ref.shape[1]))
    for c in range(C):
        eta = eta + x_ref[:, c:c + 1] * alpha_ref[c:c + 1, :]
    _fast_common(x_ref, counts_ref, mask_ref, logphi_ref, eta,
                 val_ref, dalpha_ref, dlogphi_ref, i)


def _fastk_delta(x_ref, counts_ref, mask_ref, d0_ref, alpha_ref, alpha0_ref,
                 logphi_ref, sraw0_ref, val_ref, dalpha_ref, dlogphi_ref):
    i = pl.program_id(0)
    C = x_ref.shape[1]
    da = alpha_ref[:, :] - alpha0_ref[:, :]
    delta_eta = jnp.zeros((x_ref.shape[0], alpha_ref.shape[1]), jnp.float32)
    for c in range(C):
        delta_eta = delta_eta + x_ref[:, c:c + 1] * da[c:c + 1, :]
    _fast_common(x_ref, counts_ref, mask_ref, logphi_ref, delta_eta,
                 val_ref, dalpha_ref, dlogphi_ref, i,
                 delta=(d0_ref[:, :], sraw0_ref[:, :]))


def _fastk_plain_call(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret):
    S, C = X.shape
    G = alpha.shape[1]
    args, in_specs, grid, T, G_pad = _prep(X, alpha, log_phi, exposure, counts, mask, gene_tile)
    val, dalpha, dlogphi = pl.pallas_call(
        _fastk_plain,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, G_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, G_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return val[0, 0], dalpha[:, :G], dlogphi[0, :G]


def _fastk_delta_call(X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0,
                      gene_tile, interpret):
    S, C = X.shape
    G = alpha.shape[1]
    T = min(gene_tile, G)
    G_pad = -(-G // T) * T
    args = (
        X.astype(jnp.float32),
        _pad_axis(counts, 1, G_pad),
        _pad_axis(mask, 1, G_pad).astype(jnp.float32),
        _pad_axis(d0, 1, G_pad).astype(jnp.float32),
        _pad_axis(alpha, 1, G_pad).astype(jnp.float32),
        _pad_axis(alpha0, 1, G_pad).astype(jnp.float32),
        _pad_axis(log_phi.reshape(1, -1), 1, G_pad).astype(jnp.float32),
        _pad_axis(sigma_raw0.reshape(1, -1), 1, G_pad).astype(jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((S, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    val, dalpha, dlogphi = pl.pallas_call(
        _fastk_delta,
        grid=(G_pad // T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, G_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, G_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return val[0, 0], dalpha[:, :G], dlogphi[0, :G]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fastk_plain_loglik(X, alpha, log_phi, exposure, counts, mask,
                        gene_tile=DEFAULT_GENE_TILE, interpret=False):
    val, _, _ = _fastk_plain_call(
        X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret
    )
    return val


def _fastk_plain_vjp_fwd(X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret):
    val, dalpha, dlogphi = _fastk_plain_call(
        X, alpha, log_phi, exposure, counts, mask, gene_tile, interpret
    )
    return val, (dalpha.astype(alpha.dtype), dlogphi.astype(log_phi.dtype))


def _fastk_plain_vjp_bwd(gene_tile, interpret, residuals, g):
    dalpha, dlogphi = residuals
    return (None, g * dalpha, g * dlogphi, None, None, None)


_fastk_plain_loglik.defvjp(_fastk_plain_vjp_fwd, _fastk_plain_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fastk_delta_loglik(X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0,
                        gene_tile=DEFAULT_GENE_TILE, interpret=False):
    val, _, _ = _fastk_delta_call(
        X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0, gene_tile, interpret
    )
    return val


def _fastk_delta_vjp_fwd(X, alpha, log_phi, counts, mask, alpha0, sigma_raw0,
                         d0, gene_tile, interpret):
    val, dalpha, dlogphi = _fastk_delta_call(
        X, alpha, log_phi, counts, mask, alpha0, sigma_raw0, d0, gene_tile, interpret
    )
    return val, (dalpha.astype(alpha.dtype), dlogphi.astype(log_phi.dtype))


def _fastk_delta_vjp_bwd(gene_tile, interpret, residuals, g):
    dalpha, dlogphi = residuals
    return (None, g * dalpha, g * dlogphi, None, None, None, None, None)


_fastk_delta_loglik.defvjp(_fastk_delta_vjp_fwd, _fastk_delta_vjp_bwd)


def nb_glm_likelihood_fast(data, alpha, log_phi, gene_tile=DEFAULT_GENE_TILE,
                           interpret=False):
    """One-pass Pallas kernel on the hoisted nb_fast math: value + analytic
    gradients from a single VMEM traversal. Drop-in `likelihood_fn`
    (delta-form when baseline constants are attached); first-order only.

    Test fixture, not production (docs/ARCHITECTURE.md §4): XLA's 'fast'
    path wins because vmap over pallas_call batches chains into outer grid
    steps. Note the primal (value-only) call still runs the full
    value+gradient kernel and discards the gradients — XLA cannot DCE inside
    an opaque pallas_call — so value-only evaluations pay the gradient cost
    here, unlike the XLA paths whose primal computes the value alone."""
    if data.d0 is not None:
        return _fastk_delta_loglik(
            data.X, alpha, log_phi, data.counts, data.like_mask,
            data.alpha0, data.sigma_raw0, data.d0, gene_tile, interpret,
        )
    return _fastk_plain_loglik(
        data.X, alpha, log_phi, data.exposure_rate, data.counts,
        data.like_mask, gene_tile, interpret,
    )


def make_pallas_fast_likelihood(gene_tile=DEFAULT_GENE_TILE, interpret=False):
    return functools.partial(
        nb_glm_likelihood_fast, gene_tile=gene_tile, interpret=interpret
    )
