"""Negative-binomial (NB2) log-pmf and related densities, plain-JAX reference.

These are the mathematical primitives of the reference's Stan model
(inst/stan/negBinomial_MPI.stan:97-115, 210-223), written as pure JAX
functions. `ppcseq_tpu.ops.nb_kernel` provides the Pallas-fused TPU kernel
for the hot likelihood reduction; this module is the semantic reference and
the path used on CPU.

Stan's NB2 parametrization: mean mu = exp(eta), precision phi;
Var = mu + mu^2 / phi.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

LOG2 = 0.6931471805599453
LOG_SQRT_2PI = 0.9189385332046727  # log(sqrt(2*pi))


def nb2_log_lpmf(y, eta, log_phi):
    """log NegBinomial2(y | mu=exp(eta), phi=exp(log_phi)), elementwise.

    Matches Stan neg_binomial_2_log_lpmf (stan:98-103):
      lgamma(y+phi) - lgamma(phi) - lgamma(y+1)
      + phi*log_phi + y*eta - (y+phi)*logaddexp(eta, log_phi)
    """
    phi = jnp.exp(log_phi)
    yf = y.astype(eta.dtype) if jnp.issubdtype(y.dtype, jnp.integer) else y
    log_mu_phi = jnp.logaddexp(eta, log_phi)
    return (
        gammaln(yf + phi)
        - gammaln(phi)
        - gammaln(yf + 1.0)
        + phi * log_phi
        + yf * eta
        - (yf + phi) * log_mu_phi
    )


def normal_lpdf(x, mu, sigma):
    z = (x - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - LOG_SQRT_2PI


def skew_normal_lpdf(x, xi, omega, alpha):
    """Stan skew_normal_lpdf: log(2) + normal_lpdf(x|xi,omega) + log Phi(alpha*z)."""
    z = (x - xi) / omega
    return LOG2 + normal_lpdf(x, xi, omega) + jax.scipy.special.log_ndtr(alpha * z)


def double_exponential_lpdf(x, mu, sigma):
    return -jnp.abs(x - mu) / sigma - jnp.log(2.0 * sigma)


def nb2_log_rng(key, eta, phi):
    """Sample NegBinomial2(mu=exp(eta), phi) via Gamma-Poisson mixture.

    Matches Stan neg_binomial_2_log_rng semantics (stan:259-265): draw
    rate ~ Gamma(shape=phi, rate=phi/mu), then Poisson(rate). Implemented as
    rate = mu/phi * Gamma(shape=phi, rate=1).
    """
    k_gamma, k_pois = jax.random.split(key)
    g = jax.random.gamma(k_gamma, phi, shape=jnp.broadcast_shapes(jnp.shape(eta), jnp.shape(phi)))
    rate = jnp.exp(eta) / phi * g
    return jax.random.poisson(k_pois, rate)
