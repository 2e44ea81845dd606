"""The hierarchical negative-binomial GLM, as a pure JAX log-joint.

Reproduces the statistical model of the reference Stan program
(inst/stan/negBinomial_MPI.stan; see SURVEY.md §2.2) with a dense [S, G]
layout instead of Stan's ragged map_rect shards:

Parameters (stan:180-199) and their unconstrained transforms:
  lambda_mu        real, offset = lambda_mu_mu          (stan:183)
  lambda_sigma     > 0 (exp transform)                  (stan:184)
  lambda_skew      real                                 (stan:185)
  intercept[G]     real                                 (stan:188)
  alpha_sub_1[K]   real, K = n_check                    (stan:189)
  alpha_2[C-2, K]  real (only when C > 2)               (stan:190)
  sigma_raw[G]     real                                 (stan:191)
  sigma_slope      < 0 (negative-exp transform)         (stan:195)
  sigma_intercept  real                                 (stan:196)
  sigma_sigma      > 0 (exp transform)                  (stan:197)

Transformed (stan:200-206): sigma = 1/exp(sigma_raw); alpha[C,G] merges
intercept with zero-padded slope/extra coefficients (control genes get 0);
lambda_log_param = X @ alpha.

Priors (stan:210-223), including the double lambda_mu_mu shift of the
skew-normal intercept prior and the mean-overdispersion trend
sigma_raw ~ N(sigma_slope*intercept + sigma_intercept, sigma_sigma).

Likelihood (stan:97-115): counts ~ NB2_log(exposure + lambda_log_param,
sigma) with excluded (outlier) points masked out — the dense-mask equivalent
of Stan's subtract-the-lpmf-again truncation (stan:105-115).

Gene padding: G may be padded (for sharding / tile alignment); padded genes
carry a standard-normal pseudo-prior on their unconstrained coordinates so
samplers stay well-conditioned, and contribute nothing to the likelihood or
the hierarchical priors.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ppcseq_tpu.ops.nb import (
    double_exponential_lpdf,
    nb2_log_lpmf,
    normal_lpdf,
    skew_normal_lpdf,
)
from ppcseq_tpu.utils.constants import LAMBDA_MU_MU


@dataclass(frozen=True)
class ModelDims:
    """Static dimensions of one fit."""

    S: int  # samples
    G: int  # genes incl. negative controls (possibly padded)
    C: int  # design-matrix columns
    n_check: int  # genes under test; G indices [0, n_check)
    G_unpadded: int  # real genes; [G_unpadded, G) are padding

    @property
    def n_alpha2(self) -> int:
        return max(0, self.C - 2) * self.n_check

    @property
    def dim(self) -> int:
        """Unconstrained parameter dimension."""
        return 6 + 2 * self.G + self.n_check + self.n_alpha2


# Offsets into the flat unconstrained vector
def _offsets(d: ModelDims):
    o = {}
    pos = 0
    for name, size in [
        ("lambda_mu", 1),
        ("lambda_sigma", 1),
        ("lambda_skew", 1),
        ("sigma_slope", 1),
        ("sigma_intercept", 1),
        ("sigma_sigma", 1),
        ("intercept", d.G),
        ("sigma_raw", d.G),
        ("alpha_sub_1", d.n_check),
        ("alpha_2", d.n_alpha2),
    ]:
        o[name] = (pos, pos + size)
        pos += size
    return o


def unpack(theta: jnp.ndarray, dims: ModelDims) -> dict:
    """Split the flat unconstrained vector into named constrained parameters.

    Returns constrained values plus the total log-Jacobian of the transforms.
    """
    o = _offsets(dims)

    def seg(name):
        lo, hi = o[name]
        return theta[lo:hi]

    u_lambda_sigma = seg("lambda_sigma")[0]
    u_sigma_slope = seg("sigma_slope")[0]
    u_sigma_sigma = seg("sigma_sigma")[0]
    params = {
        "lambda_mu": seg("lambda_mu")[0] + LAMBDA_MU_MU,
        "lambda_sigma": jnp.exp(u_lambda_sigma),
        "lambda_skew": seg("lambda_skew")[0],
        "sigma_slope": -jnp.exp(u_sigma_slope),
        "sigma_intercept": seg("sigma_intercept")[0],
        "sigma_sigma": jnp.exp(u_sigma_sigma),
        "intercept": seg("intercept"),
        "sigma_raw": seg("sigma_raw"),
        "alpha_sub_1": seg("alpha_sub_1"),
        "alpha_2": seg("alpha_2").reshape(max(0, dims.C - 2), dims.n_check),
    }
    log_jac = u_lambda_sigma + u_sigma_slope + u_sigma_sigma
    return params, log_jac


def make_alpha(params: dict, dims: ModelDims) -> jnp.ndarray:
    """alpha[C, G]: merge_coefficients with zero-padding (stan:122-139)."""
    G, C, K = dims.G, dims.C, dims.n_check
    rows = [params["intercept"][None, :]]
    if C >= 2:
        slope_row = jnp.zeros((1, G), params["intercept"].dtype)
        slope_row = slope_row.at[0, :K].set(params["alpha_sub_1"])
        rows.append(slope_row)
    if C >= 3:
        extra = jnp.zeros((C - 2, G), params["intercept"].dtype)
        extra = extra.at[:, :K].set(params["alpha_2"])
        rows.append(extra)
    return jnp.concatenate(rows, axis=0)


@dataclass(frozen=True)
class ModelData:
    """Device-side model inputs (all static-shaped)."""

    counts: jnp.ndarray  # [S, G] int32
    X: jnp.ndarray  # [S, C]
    exposure_rate: jnp.ndarray  # [S]
    like_mask: jnp.ndarray  # [S, G] 1.0 = in likelihood (gene real AND not excluded)
    gene_mask: jnp.ndarray  # [G] 1.0 = real gene


def prepare_data(
    counts: np.ndarray,
    X: np.ndarray,
    exposure_rate: np.ndarray,
    n_check: int,
    exclude_mask: np.ndarray | None = None,
    pad_genes_to: int | None = None,
    dtype=jnp.float32,
) -> tuple[ModelData, ModelDims]:
    """Pad + upload model arrays; returns (data, dims)."""
    S, G_real = counts.shape
    G = int(pad_genes_to) if pad_genes_to else G_real
    if G < G_real:
        raise ValueError("pad_genes_to smaller than gene count")
    counts_p = np.zeros((S, G), dtype=np.int32)
    counts_p[:, :G_real] = counts
    gene_mask = np.zeros(G, dtype=np.float64)
    gene_mask[:G_real] = 1.0
    like = np.tile(gene_mask[None, :], (S, 1))
    if exclude_mask is not None:
        like[:, :G_real] *= ~np.asarray(exclude_mask, dtype=bool)
    dims = ModelDims(S=S, G=G, C=X.shape[1], n_check=n_check, G_unpadded=G_real)
    data = ModelData(
        counts=jnp.asarray(counts_p, dtype=jnp.int32),
        X=jnp.asarray(X, dtype=dtype),
        exposure_rate=jnp.asarray(exposure_rate, dtype=dtype),
        like_mask=jnp.asarray(like, dtype=dtype),
        gene_mask=jnp.asarray(gene_mask, dtype=dtype),
    )
    return data, dims


def lambda_log(params: dict, data: ModelData, dims: ModelDims) -> jnp.ndarray:
    """lambda_log_param[S, G] = X @ alpha (stan:205). MXU matmul."""
    alpha = make_alpha(params, dims)
    return jnp.dot(data.X, alpha, preferred_element_type=data.X.dtype)


def log_joint(theta: jnp.ndarray, data: ModelData, dims: ModelDims, *, likelihood_fn=None):
    """Unnormalized log posterior density in unconstrained space.

    `likelihood_fn(counts, eta, log_phi, mask) -> scalar` lets callers swap in
    the Pallas-fused kernel; defaults to the plain-JAX reduction.
    """
    params, log_jac = unpack(theta, dims)
    gm = data.gene_mask

    lp = log_jac
    # Hyperpriors (stan:210-216)
    lp += normal_lpdf(params["lambda_mu"], LAMBDA_MU_MU, 2.0)
    lp += normal_lpdf(params["lambda_sigma"], 0.0, 2.0)
    lp += normal_lpdf(params["lambda_skew"], 0.0, 1.0)
    lp += normal_lpdf(params["sigma_intercept"], 0.0, 2.0)
    lp += normal_lpdf(params["sigma_slope"], 0.0, 2.0)
    lp += normal_lpdf(params["sigma_sigma"], 0.0, 2.0)

    # Gene-wise priors. Note the double lambda_mu_mu shift (stan:219) —
    # lambda_mu already carries the offset, and the prior location adds it again.
    lp += jnp.sum(
        gm
        * skew_normal_lpdf(
            params["intercept"],
            params["lambda_mu"] + LAMBDA_MU_MU,
            params["lambda_sigma"],
            params["lambda_skew"],
        )
    )
    if dims.C >= 2:
        lp += jnp.sum(double_exponential_lpdf(params["alpha_sub_1"], 0.0, 1.0))
    if dims.C >= 3:
        lp += jnp.sum(normal_lpdf(params["alpha_2"], 0.0, 2.5))

    # Mean-overdispersion trend (stan:223) — couples all (real) genes
    lp += jnp.sum(
        gm
        * normal_lpdf(
            params["sigma_raw"],
            params["sigma_slope"] * params["intercept"] + params["sigma_intercept"],
            params["sigma_sigma"],
        )
    )

    # Pseudo-prior keeping padded-gene coordinates well-conditioned
    pad = 1.0 - gm
    lp += jnp.sum(pad * normal_lpdf(params["intercept"], 0.0, 1.0))
    lp += jnp.sum(pad * normal_lpdf(params["sigma_raw"], 0.0, 1.0))

    # Likelihood (stan:97-115): NB2-log with exclusion mask
    eta = data.exposure_rate[:, None] + lambda_log(params, data, dims)
    log_phi = -params["sigma_raw"][None, :]  # log sigma = -sigma_raw (stan:203)
    if likelihood_fn is None:
        lp += jnp.sum(data.like_mask * nb2_log_lpmf(data.counts, eta, log_phi))
    else:
        lp += likelihood_fn(data.counts, eta, jnp.broadcast_to(log_phi, eta.shape), data.like_mask)
    return lp


def make_log_density(data: ModelData, dims: ModelDims, likelihood_fn=None):
    """Bind data: returns theta -> scalar log density (jit/vmap friendly)."""
    return partial(log_joint, data=data, dims=dims, likelihood_fn=likelihood_fn)


def extract_lambda_sigma_draws(thetas: jnp.ndarray, data: ModelData, dims: ModelDims):
    """From unconstrained draws [n, D], compute the posterior arrays the PPC
    needs: lambda_log_param[n, S, n_check] and sigma_raw[n, n_check]
    (the reference always saves these two — R/utilities.R:1373)."""

    def one(theta):
        params, _ = unpack(theta, dims)
        ll = lambda_log(params, data, dims)
        return ll[:, : dims.n_check], params["sigma_raw"][: dims.n_check]

    return jax.vmap(one)(thetas)


def extract_alpha_sub_1_draws(thetas: jnp.ndarray, dims: ModelDims):
    o = _offsets(dims)
    lo, hi = o["alpha_sub_1"]
    return thetas[:, lo:hi]
