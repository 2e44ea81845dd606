"""Vectorized fixed-trajectory jittered HMC — the accelerator-native sampler.

NUTS's dynamic tree building is control-flow heavy: nested while_loops,
U-turn checkpoint scans, and per-leaf select/merge machinery cost ~15x the
raw leapfrog on TPU (measured on the bench model: 147 us/leapfrog raw vs
~2.5 ms inside the tree build). This module is the profile-guided
alternative: plain Hamiltonian Monte Carlo with

- a jittered trajectory length L_t ~ Uniform{ceil(0.4 L), ..., L} shared by
  all chains in a draw. The integrator runs a STATIC-length lax.scan of L
  leapfrogs (XLA pipelines it; a traced-bound loop would lower to a
  while_loop with per-iteration overhead) and snapshots the state at step
  L_t as the proposal — jitter breaks the periodicity pathologies of
  fixed-L HMC (Neal 2011 §5.4.3.3) at the cost of ~30% wasted tail steps,
  far cheaper than dynamic control flow.
- a Metropolis accept per chain (exact MCMC),
- dual-averaged shared step size (target accept 0.8, warmup draws only),
- a fixed diagonal mass matrix, normally the ADVI warm start's variational
  scales (infer.advi) — the same warm start the NUTS path uses.

The state is a flat [chains, D] float32 matrix: every integrator op is ONE
fused XLA op over the whole chain batch, which is what makes the sampler run
at raw-leapfrog speed. This replaces the reference's forked-process rstan
NUTS chains (R/utilities.R:1497-1512) as the fast path; infer.nuts remains
for robustness checks and gene-sharded multi-chip states.

Compiled-runner caching: the jitted program is cached per (log-density
function, static config), with the model data, init point, mass matrix and
seed as operands — repeated fits (the pipeline's two passes, warm/timed
bench runs) reuse one compile. Pass `data=` and a stable function (e.g.
nb_model.flat_logp(dims)) to benefit across different datasets of one shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

MAX_DELTA_ENERGY = 1000.0

_RUNNER_CACHE: dict = {}


@dataclass
class HMCResult:
    draws: np.ndarray  # [chains, num_draws, D]
    accept_prob: np.ndarray  # [chains, num_draws]
    divergences: np.ndarray  # [chains] count in sampling phase
    step_size: float
    num_leapfrog: int  # total leapfrog steps (all chains, warmup + sampling)


def _build_runner(
    log_density, has_data, D, num_chains, num_warmup, num_draws,
    num_leapfrog, L_min, target_accept, dtype,
):
    gamma, t0_da, kappa = 0.05, 10.0, 0.75

    def logp_grad_batch(z, data):
        if has_data:
            lp, g = jax.vmap(jax.value_and_grad(log_density), in_axes=(0, None))(z, data)
        else:
            lp, g = jax.vmap(jax.value_and_grad(log_density))(z)
        bad = ~jnp.isfinite(lp)
        lp = jnp.where(bad, -jnp.inf, lp).astype(dtype)
        g = jnp.where(jnp.isfinite(g), g, 0.0).astype(dtype)
        return lp, g

    def runner(data, z0, inv_mass, mu, key):
        sqrt_inv_mass = jnp.sqrt(inv_mass)

        def kinetic(r):
            return 0.5 * jnp.sum(r * r * inv_mass[None, :], axis=1)

        def transition(z, lp, g, eps, key):
            k_mom, k_len, k_acc = jax.random.split(key, 3)
            L_t = jax.random.randint(k_len, (), L_min, num_leapfrog + 1)
            r0 = jax.random.normal(k_mom, z.shape, dtype) / sqrt_inv_mass[None, :]
            energy0 = -lp + kinetic(r0)

            def step(carry, i):
                z, r, g, lp, prop = carry
                r_half = r + 0.5 * eps * g
                z1 = z + eps * (r_half * inv_mass[None, :])
                lp1, g1 = logp_grad_batch(z1, data)
                r1 = r_half + 0.5 * eps * g1
                sel = (i + 1) == L_t
                zp, rp, gp, lpp = prop
                prop = (
                    jnp.where(sel, z1, zp),
                    jnp.where(sel, r1, rp),
                    jnp.where(sel, g1, gp),
                    jnp.where(sel, lp1, lpp),
                )
                return (z1, r1, g1, lp1, prop), None

            init = (z, r0, g, lp, (z, r0, g, lp))
            (zf, rf, gf, lpf, (zp, rp, gp, lpp)), _ = jax.lax.scan(
                step, init, jnp.arange(num_leapfrog)
            )
            energy1 = -lpp + kinetic(rp)
            delta = energy1 - energy0
            delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
            diverging = delta > MAX_DELTA_ENERGY
            accept_prob = jnp.minimum(1.0, jnp.exp(-delta))
            u = jax.random.uniform(k_acc, (num_chains,), dtype)
            take = (u < accept_prob) & ~diverging
            z_new = jnp.where(take[:, None], zp, z)
            lp_new = jnp.where(take, lpp, lp)
            g_new = jnp.where(take[:, None], gp, g)
            return z_new, lp_new, g_new, accept_prob, diverging

        def warmup_step(carry, args):
            z, lp, g, log_eps, log_eps_avg, h_sum = carry
            i, k = args
            eps = jnp.exp(log_eps).astype(dtype)
            z, lp, g, accept, _ = transition(z, lp, g, eps, k)
            a_mean = jnp.mean(accept)
            count = i + 1.0
            w = 1.0 / (count + t0_da)
            h_sum = (1 - w) * h_sum + w * (target_accept - a_mean)
            log_eps = mu - jnp.sqrt(count) / gamma * h_sum
            eta = count ** (-kappa)
            log_eps_avg = eta * log_eps + (1 - eta) * log_eps_avg
            return (z, lp, g, log_eps, log_eps_avg, h_sum), a_mean

        def sample_step(carry, k):
            z, lp, g, eps = carry
            z, lp, g, accept, div = transition(z, lp, g, eps, k)
            return (z, lp, g, eps), (z, accept, div)

        lp, g = logp_grad_batch(z0, data)
        k_warm, k_samp = jax.random.split(key)
        wkeys = jax.random.split(k_warm, num_warmup)
        idx = jnp.arange(num_warmup, dtype=dtype)
        le0 = mu - jnp.log(10.0).astype(dtype)  # mu = log(10*eps0)
        (z, lp, g, _, log_eps_avg, _), _ = jax.lax.scan(
            warmup_step, (z0, lp, g, le0, le0, jnp.asarray(0.0, dtype)), (idx, wkeys)
        )
        eps = jnp.exp(log_eps_avg).astype(dtype)
        skeys = jax.random.split(k_samp, num_draws)
        (_, _, _, _), (draws, accept, div) = jax.lax.scan(
            sample_step, (z, lp, g, eps), skeys
        )
        # [num_draws, chains, D] -> [chains, num_draws, D]
        return (
            jnp.swapaxes(draws, 0, 1),
            jnp.swapaxes(accept, 0, 1),
            jnp.swapaxes(div, 0, 1),
            eps,
        )

    return jax.jit(runner)


def run_hmc(
    log_density,
    dim: int,
    key,
    *,
    data=None,
    num_chains: int = 128,
    num_warmup: int = 100,
    num_draws: int = 100,
    num_leapfrog: int = 32,
    jitter_low: float = 0.4,
    target_accept: float = 0.8,
    init_theta=None,
    init_jitter: float = 0.1,
    inv_mass=None,
    step_size0: float = 0.05,
    mesh=None,
    dtype=jnp.float32,
) -> HMCResult:
    """Run jittered-trajectory HMC on a flat [D] unconstrained state.

    `log_density` maps a [D] vector (plus `data`, when given) to a scalar.
    `inv_mass` is the diagonal inverse mass (posterior variance estimate,
    e.g. exp(2*log_sd) from ADVI). Returns post-warmup draws stacked
    [chains, num_draws, D].

    With `mesh` (a jax.sharding.Mesh with a "chains" axis), the chain batch
    is sharded across devices: pure data-parallel scaling of the flagship
    sampler over ICI — every integrator op stays local per device, the only
    cross-device collective is the scalar mean-accept psum in warmup (the
    TPU analog of the reference's chain-per-process parallelism,
    R/utilities.R:1497-1502). `data` and the mass matrix are replicated.
    """
    D = int(dim)
    L_min = max(1, int(np.ceil(jitter_low * num_leapfrog)))
    cache_key = (
        log_density, data is not None, D, num_chains, num_warmup, num_draws,
        int(num_leapfrog), L_min, float(target_accept), jnp.dtype(dtype).name,
        mesh,
    )
    runner = _RUNNER_CACHE.get(cache_key)
    if runner is None:
        runner = _build_runner(
            log_density, data is not None, D, num_chains, num_warmup,
            num_draws, int(num_leapfrog), L_min, float(target_accept), dtype,
        )
        _RUNNER_CACHE[cache_key] = runner

    if inv_mass is None:
        inv_mass = jnp.ones(D, dtype)
    inv_mass = jnp.asarray(inv_mass, dtype)

    key, k_init = jax.random.split(key)
    if init_theta is None:
        z0 = jax.random.uniform(k_init, (num_chains, D), dtype, -2.0, 2.0)
    else:
        base = jnp.asarray(init_theta, dtype)
        z0 = base[None, :] + init_jitter * jax.random.normal(k_init, (num_chains, D), dtype)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        chain_sh = NamedSharding(mesh, P("chains", None))
        rep = NamedSharding(mesh, P())
        z0 = jax.device_put(z0, chain_sh)
        inv_mass = jax.device_put(inv_mass, rep)
        if data is not None:
            data = jax.tree.map(
                lambda x: jax.device_put(x, rep) if x is not None else None, data
            )

    mu = jnp.asarray(np.log(10.0 * step_size0), dtype)
    draws, accept, div, eps = runner(data, z0, inv_mass, mu, key)
    draws = np.asarray(draws)
    # total leapfrogs: the static scan always runs num_leapfrog per draw
    total_lf = (num_warmup + num_draws) * num_leapfrog * num_chains
    return HMCResult(
        draws=draws,
        accept_prob=np.asarray(accept),
        divergences=np.asarray(np.asarray(div).sum(axis=1)),
        step_size=float(eps),
        num_leapfrog=total_lf,
    )
