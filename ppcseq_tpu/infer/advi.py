"""Meanfield ADVI (automatic differentiation variational inference).

The TPU-native replacement for the reference's `rstan::vb` path
(R/utilities.R:246-278, 1482-1494): a meanfield Gaussian q(theta) =
N(m, diag(s^2)) in unconstrained space, optimized by stochastic gradient
ascent on the reparametrized ELBO, with the reference's convergence rule
(relative ELBO change vs tol_rel_obj, assessed every `eval_every` iterations
over a rolling window, as Stan's ADVI does) and the reference's
retry-until-success wrapper (`vb_iterative`, R/utilities.R:246-278).

Everything inside one optimization chunk is a single jitted lax.scan, so the
whole fit is a handful of XLA executions regardless of iteration count.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class ADVIResult:
    mean: np.ndarray  # [D] variational mean
    log_sd: np.ndarray  # [D] variational log-stddev
    elbo: float
    elbo_trace: np.ndarray
    converged: bool
    iterations: int


def _elbo_estimate(log_density, m, log_s, key, n_samples):
    """Reparametrized ELBO: E_q[logp(theta)] + entropy(q)."""
    D = m.shape[0]
    eps = jax.random.normal(key, (n_samples, D), dtype=m.dtype)
    thetas = m[None, :] + jnp.exp(log_s)[None, :] * eps
    logps = jax.vmap(log_density)(thetas)
    entropy = jnp.sum(log_s) + 0.5 * D * (1.0 + jnp.log(2.0 * jnp.pi))
    return jnp.mean(logps) + entropy


@partial(jax.jit, static_argnums=(0, 1, 5))
def _advi_chunk(log_density, optimizer, opt_state, params, key, n_steps):
    """Run n_steps of stochastic ELBO ascent (1 MC gradient sample, Stan default)."""

    def loss_fn(p, k):
        return -_elbo_estimate(log_density, p["m"], p["log_s"], k, 1)

    def step(carry, k):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, k)
        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    keys = jax.random.split(key, n_steps)
    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, opt_state, losses


def fit_advi(
    log_density,
    dim: int,
    key,
    *,
    max_iter: int = 50000,
    tol_rel_obj: float = 0.005,
    eval_every: int = 100,
    elbo_samples: int = 100,
    learning_rate: float = 0.1,
    window: int = 8,
    dtype=jnp.float32,
) -> ADVIResult:
    """Fit meanfield ADVI; returns the variational parameters.

    Convergence: ELBO estimated with `elbo_samples` draws every `eval_every`
    steps; stop when the mean or the median of the last `window` relative
    changes drops below tol_rel_obj (Stan ADVI's rule).
    """
    params = {
        "m": jnp.zeros(dim, dtype=dtype),
        "log_s": jnp.zeros(dim, dtype=dtype),
    }
    # inverse-sqrt step-size decay, like Stan ADVI's rho_k ~ eta / sqrt(k)
    schedule = lambda step: learning_rate / jnp.sqrt(1.0 + step / 100.0)  # noqa: E731
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)

    elbo_eval = jax.jit(
        lambda p, k: _elbo_estimate(log_density, p["m"], p["log_s"], k, elbo_samples)
    )

    elbos = []
    deltas = []
    converged = False
    it = 0
    while it < max_iter:
        key, k_chunk, k_eval = jax.random.split(key, 3)
        params, opt_state, _ = _advi_chunk(
            log_density, optimizer, opt_state, params, k_chunk, eval_every
        )
        it += eval_every
        elbo = float(elbo_eval(params, k_eval))
        if not np.isfinite(elbo):
            break
        if elbos:
            prev = elbos[-1]
            deltas.append(abs((elbo - prev) / prev) if prev != 0 else np.inf)
            recent = deltas[-window:]
            if len(recent) >= 2 and (
                np.mean(recent) < tol_rel_obj or np.median(recent) < tol_rel_obj
            ):
                elbos.append(elbo)
                converged = True
                break
        elbos.append(elbo)

    final_elbo = elbos[-1] if elbos else float("nan")
    return ADVIResult(
        mean=np.asarray(params["m"]),
        log_sd=np.asarray(params["log_s"]),
        elbo=final_elbo,
        elbo_trace=np.asarray(elbos),
        converged=converged,
        iterations=it,
    )


def advi_sample(result: ADVIResult, key, n_draws: int, dtype=jnp.float32) -> jnp.ndarray:
    """Draw n_draws samples from the fitted meanfield posterior, [n, D]."""
    D = result.mean.shape[0]
    eps = jax.random.normal(key, (n_draws, D), dtype=dtype)
    return jnp.asarray(result.mean, dtype)[None, :] + jnp.asarray(
        np.exp(result.log_sd), dtype
    )[None, :] * eps


def vb_iterative(
    log_density,
    dim: int,
    key,
    *,
    max_attempts: int = 5,
    min_elbo: float = -1e15,
    **advi_kwargs,
) -> ADVIResult:
    """Retry ADVI until it succeeds (reference `vb_iterative`, R/utilities.R:246-278)."""
    last = None
    for attempt in range(max_attempts):
        key, sub = jax.random.split(key)
        res = fit_advi(log_density, dim, sub, **advi_kwargs)
        ok = np.isfinite(res.elbo) and res.elbo > min_elbo and np.isfinite(res.mean).all()
        if ok:
            return res
        last = res
        print(f"Further attempt with Variational Bayes: attempt {attempt + 1} failed")
    if last is None:
        raise RuntimeError("ADVI failed to produce any result")
    raise RuntimeError(f"ADVI failed after {max_attempts} attempts (elbo={last.elbo})")
