"""Vectorized multi-chain NUTS for TPU.

The TPU-native replacement for the reference's `rstan::sampling` NUTS path
(R/utilities.R:1497-1512). Instead of forked CPU processes per chain, chains
are vmapped into one XLA program; the tree build is the iterative
(non-recursive) formulation of multinomial NUTS with the generalized U-turn
criterion and O(max_depth) momentum checkpoints, so it is a fixed-shape
lax.while_loop the compiler can schedule.

Warmup follows Stan's windowed adaptation: dual-averaged step size
(target accept 0.8) plus a diagonal (Welford) mass matrix adapted over
expanding windows (init=75, term=50, base window=25).

References: Hoffman & Gelman (2014); Betancourt (2017) for multinomial
sampling and the generalized U-turn criterion; the iterative checkpointing
scheme follows Phan et al. (NumPyro, arXiv:1912.11554).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_DELTA_ENERGY = 1000.0  # Stan's divergence threshold


class TreeState(NamedTuple):
    """State of the trajectory being built (one chain)."""

    z_left: jnp.ndarray
    r_left: jnp.ndarray
    grad_left: jnp.ndarray
    z_right: jnp.ndarray
    r_right: jnp.ndarray
    grad_right: jnp.ndarray
    z_proposal: jnp.ndarray
    logp_proposal: jnp.ndarray
    grad_proposal: jnp.ndarray
    depth: jnp.ndarray
    weight: jnp.ndarray  # log of total multinomial weight
    r_sum: jnp.ndarray  # momentum sum over the whole trajectory
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    num_steps: jnp.ndarray


def _leapfrog(logp_grad, z, r, grad, eps, inv_mass):
    r_half = r + 0.5 * eps * grad
    z_new = z + eps * inv_mass * r_half
    logp_new, grad_new = logp_grad(z_new)
    r_new = r_half + 0.5 * eps * grad_new
    return z_new, r_new, logp_new, grad_new


def _energy(logp, r, inv_mass):
    return -logp + 0.5 * jnp.sum(inv_mass * r * r)


def _is_turning(r_sum, r_first, r_last, inv_mass):
    """Generalized U-turn: rho against velocities at both subtree ends."""
    v_first = inv_mass * r_first
    v_last = inv_mass * r_last
    return (jnp.dot(r_sum, v_first) <= 0) | (jnp.dot(r_sum, v_last) <= 0)


def _leaf_to_ckpt(leaf_idx):
    """Checkpoint index range touched when adding leaf `leaf_idx` (0-based).

    idx_max = popcount(leaf_idx >> 1): the checkpoint slot this leaf stores
    into (when even) or the highest closed-block slot to check (when odd);
    idx_min = idx_max - trailing_ones(leaf_idx) + 1. This is the iterative
    NUTS checkpoint scheme (Phan et al.).
    """
    n = leaf_idx.astype(jnp.uint32)
    idx_max = jax.lax.population_count(n >> 1).astype(jnp.int32)

    def trailing_ones(n):
        def body(c):
            n, t = c
            return n >> 1, t + 1

        def cond(c):
            return (c[0] & 1) == 1

        _, t = jax.lax.while_loop(cond, body, (n, jnp.int32(0)))
        return t

    t = trailing_ones(n)
    return idx_max - t + 1, idx_max


def _build_subtree(
    logp_grad, z0, r0, grad0, eps_signed, inv_mass, depth, energy0, key, max_depth
):
    """Build a subtree of 2^depth leapfrog steps from (z0, r0) in one direction.

    Returns (z_end, r_end, grad_end, z_prop, logp_prop, grad_prop, log_weight,
    r_sum, turning, diverging, sum_accept, num_steps).
    """
    D = z0.shape[0]
    n_leaves = jnp.int32(1) << depth

    class Carry(NamedTuple):
        i: jnp.ndarray
        z: jnp.ndarray
        r: jnp.ndarray
        grad: jnp.ndarray
        z_prop: jnp.ndarray
        logp_prop: jnp.ndarray
        grad_prop: jnp.ndarray
        log_weight: jnp.ndarray
        r_sum: jnp.ndarray
        turning: jnp.ndarray
        diverging: jnp.ndarray
        sum_accept: jnp.ndarray
        r_ckpts: jnp.ndarray
        r_sum_ckpts: jnp.ndarray
        key: jnp.ndarray

    def cond(c: Carry):
        return (c.i < n_leaves) & ~c.turning & ~c.diverging

    def body(c: Carry):
        z, r, logp, grad = _leapfrog(logp_grad, c.z, c.r, c.grad, eps_signed, inv_mass)
        energy = _energy(logp, r, inv_mass)
        delta = energy - energy0
        diverging = delta > MAX_DELTA_ENERGY
        log_w = -delta  # multinomial weight of this leaf
        accept = jnp.minimum(1.0, jnp.exp(-delta))
        accept = jnp.where(jnp.isnan(accept), 0.0, accept)

        # multinomial-sample the proposal among leaves seen so far
        key, k_accept = jax.random.split(c.key)
        new_total = jnp.logaddexp(c.log_weight, log_w)
        p_take = jnp.exp(log_w - new_total)
        take = jax.random.uniform(k_accept) < p_take
        z_prop = jnp.where(take, z, c.z_prop)
        logp_prop = jnp.where(take, logp, c.logp_prop)
        grad_prop = jnp.where(take, grad, c.grad_prop)

        r_sum = c.r_sum + r

        # checkpoint bookkeeping for within-subtree U-turn checks
        ckpt_min, ckpt_max = _leaf_to_ckpt(c.i)
        is_even = (c.i % 2) == 0
        r_ckpts = jnp.where(is_even, c.r_ckpts.at[ckpt_max].set(r), c.r_ckpts)
        r_sum_ckpts = jnp.where(
            is_even, c.r_sum_ckpts.at[ckpt_max].set(r_sum), c.r_sum_ckpts
        )

        def check_turning(_):
            def scan_body(carry, j):
                turning = carry
                # blocks close at odd leaves; check block [ckpt j .. current]
                subtree_r_sum = r_sum - r_sum_ckpts[j] + r_ckpts[j]
                t = _is_turning(subtree_r_sum, r_ckpts[j], r, inv_mass)
                in_range = (j >= ckpt_min) & (j <= ckpt_max)
                return turning | (t & in_range), None

            turning, _ = jax.lax.scan(
                scan_body, jnp.bool_(False), jnp.arange(max_depth + 1)
            )
            return turning

        turning = jax.lax.cond(
            (c.i % 2) == 1, check_turning, lambda _: jnp.bool_(False), None
        )

        return Carry(
            i=c.i + 1,
            z=z,
            r=r,
            grad=grad,
            z_prop=z_prop,
            logp_prop=logp_prop,
            grad_prop=grad_prop,
            log_weight=new_total,
            r_sum=r_sum,
            turning=turning,
            diverging=diverging,
            sum_accept=c.sum_accept + accept,
            r_ckpts=r_ckpts,
            r_sum_ckpts=r_sum_ckpts,
            key=key,
        )

    init = Carry(
        i=jnp.int32(0),
        z=z0,
        r=r0,
        grad=grad0,
        z_prop=z0,
        logp_prop=jnp.array(-jnp.inf, z0.dtype),
        grad_prop=grad0,
        log_weight=jnp.array(-jnp.inf, z0.dtype),
        r_sum=jnp.zeros(D, z0.dtype),
        turning=jnp.bool_(False),
        diverging=jnp.bool_(False),
        sum_accept=jnp.array(0.0, z0.dtype),
        r_ckpts=jnp.zeros((max_depth + 1, D), z0.dtype),
        r_sum_ckpts=jnp.zeros((max_depth + 1, D), z0.dtype),
        key=key,
    )
    out = jax.lax.while_loop(cond, body, init)
    return out


def _nuts_transition(logp_grad, z, logp, grad, eps, inv_mass, key, max_depth):
    """One NUTS draw for one chain. Returns new (z, logp, grad, stats)."""
    D = z.shape[0]
    key, k_mom, k_build = jax.random.split(key, 3)
    r0 = jax.random.normal(k_mom, (D,), z.dtype) / jnp.sqrt(inv_mass)
    energy0 = _energy(logp, r0, inv_mass)

    tree = TreeState(
        z_left=z,
        r_left=r0,
        grad_left=grad,
        z_right=z,
        r_right=r0,
        grad_right=grad,
        z_proposal=z,
        logp_proposal=logp,
        grad_proposal=grad,
        depth=jnp.int32(0),
        weight=jnp.array(0.0, z.dtype),  # log-weight of initial point = -0 = exp(0)=1? see below
        r_sum=r0,
        turning=jnp.bool_(False),
        diverging=jnp.bool_(False),
        sum_accept=jnp.array(0.0, z.dtype),
        num_steps=jnp.int32(0),
    )
    # initial point weight: exp(-(H0 - H0)) = 1 -> log weight 0
    carry_key = k_build

    def cond(carry):
        tree, _ = carry
        return (tree.depth < max_depth) & ~tree.turning & ~tree.diverging

    def body(carry):
        tree, key = carry
        key, k_dir, k_sub, k_merge = jax.random.split(key, 4)
        go_right = jax.random.uniform(k_dir) < 0.5
        eps_signed = jnp.where(go_right, eps, -eps)
        z0 = jnp.where(go_right, tree.z_right, tree.z_left)
        r0_ = jnp.where(go_right, tree.r_right, tree.r_left)
        g0 = jnp.where(go_right, tree.grad_right, tree.grad_left)

        sub = _build_subtree(
            logp_grad, z0, r0_, g0, eps_signed, inv_mass, tree.depth, energy0, k_sub, max_depth
        )

        # new endpoints
        z_left = jnp.where(go_right, tree.z_left, sub.z)
        r_left = jnp.where(go_right, tree.r_left, sub.r)
        grad_left = jnp.where(go_right, tree.grad_left, sub.grad)
        z_right = jnp.where(go_right, sub.z, tree.z_right)
        r_right = jnp.where(go_right, sub.r, tree.r_right)
        grad_right = jnp.where(go_right, sub.grad, tree.grad_right)

        # biased progressive sampling across the doubling (Stan/Betancourt)
        log_ratio = sub.log_weight - tree.weight
        p_new = jnp.minimum(1.0, jnp.exp(log_ratio))
        take = (jax.random.uniform(k_merge) < p_new) & ~sub.turning & ~sub.diverging
        z_prop = jnp.where(take, sub.z_prop, tree.z_proposal)
        logp_prop = jnp.where(take, sub.logp_prop, tree.logp_proposal)
        grad_prop = jnp.where(take, sub.grad_prop, tree.grad_proposal)

        r_sum = tree.r_sum + sub.r_sum
        # U-turn across the full trajectory
        turning_full = _is_turning(r_sum, r_left, r_right, inv_mass)
        turning = sub.turning | turning_full

        new_tree = TreeState(
            z_left=z_left,
            r_left=r_left,
            grad_left=grad_left,
            z_right=z_right,
            r_right=r_right,
            grad_right=grad_right,
            z_proposal=z_prop,
            logp_proposal=logp_prop,
            grad_proposal=grad_prop,
            depth=tree.depth + 1,
            weight=jnp.logaddexp(tree.weight, sub.log_weight),
            r_sum=r_sum,
            turning=turning,
            diverging=sub.diverging,
            sum_accept=tree.sum_accept + sub.sum_accept,
            num_steps=tree.num_steps + sub.i,
        )
        return new_tree, key

    tree, _ = jax.lax.while_loop(cond, body, (tree, carry_key))

    accept_prob = tree.sum_accept / jnp.maximum(1, tree.num_steps)
    stats = {
        "accept_prob": accept_prob,
        "diverging": tree.diverging,
        "num_steps": tree.num_steps,
        "depth": tree.depth,
        "energy": energy0,
    }
    return tree.z_proposal, tree.logp_proposal, tree.grad_proposal, stats


# ----------------------------------------------------------------------------
# Warmup adaptation (Stan-style)
# ----------------------------------------------------------------------------


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_sum: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def _da_init(eps0):
    return DualAveragingState(
        log_eps=jnp.log(eps0),
        log_eps_avg=jnp.log(eps0),
        h_sum=jnp.zeros_like(eps0),
        mu=jnp.log(10.0 * eps0),
        count=jnp.zeros_like(eps0, dtype=jnp.int32),
    )


def _da_update(state: DualAveragingState, accept_prob, target=0.8):
    gamma, t0, kappa = 0.05, 10.0, 0.75
    count = state.count + 1
    w = 1.0 / (count + t0)
    h_sum = (1 - w) * state.h_sum + w * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(count.astype(h_sum.dtype)) / gamma * h_sum
    eta = count.astype(h_sum.dtype) ** (-kappa)
    log_eps_avg = eta * log_eps + (1 - eta) * state.log_eps_avg
    return DualAveragingState(log_eps, log_eps_avg, h_sum, state.mu, count)


class WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def _welford_init(D, dtype):
    return WelfordState(jnp.zeros((), jnp.int32), jnp.zeros(D, dtype), jnp.zeros(D, dtype))


def _welford_update(state: WelfordState, x):
    count = state.count + 1
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def _welford_variance(state: WelfordState):
    # Stan regularizes the estimate toward unity
    n = state.count.astype(state.mean.dtype)
    var = state.m2 / jnp.maximum(n - 1, 1)
    return (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))


def build_warmup_schedule(num_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Stan's windowed schedule: list of iteration indices where the metric
    window closes (mass matrix update + step-size reset)."""
    if num_warmup < 20:
        return []
    if init_buffer + term_buffer + base_window > num_warmup:
        # Stan rescales the buffers proportionally
        total = init_buffer + term_buffer + base_window
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.10 * num_warmup)
        base_window = num_warmup - init_buffer - term_buffer
    ends = []
    pos = init_buffer
    w = base_window
    while pos + w <= num_warmup - term_buffer:
        if pos + 2 * w > num_warmup - term_buffer:
            # last window absorbs the remainder
            w = num_warmup - term_buffer - pos
        ends.append(pos + w)
        pos += w
        w *= 2
    return ends


@dataclass
class NUTSResult:
    draws: np.ndarray  # [chains, num_draws, D] unconstrained
    accept_prob: np.ndarray
    divergences: np.ndarray  # [chains] count in sampling phase
    step_size: np.ndarray  # [chains]
    inv_mass: np.ndarray  # [chains, D]
    num_leapfrog: int  # total leapfrog steps, warmup + sampling


def run_nuts(
    log_density,
    dim: int,
    key,
    *,
    num_chains: int = 4,
    num_warmup: int = 150,
    num_draws: int = 250,
    max_depth: int = 10,
    target_accept: float = 0.8,
    init_theta: np.ndarray | None = None,
    init_scale: float = 2.0,
    dtype=jnp.float32,
) -> NUTSResult:
    """Run vectorized multi-chain NUTS; returns post-warmup draws.

    Chains are vmapped: one compiled program advances all chains in lockstep
    (the reference forks one OS process per chain, R/utilities.R:1497-1502).
    """
    logp_grad = jax.value_and_grad(log_density)

    def logp_grad_safe(z):
        lp, g = logp_grad(z)
        bad = ~jnp.isfinite(lp)
        lp = jnp.where(bad, -jnp.inf, lp)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return lp, g

    key, k_init = jax.random.split(key)
    if init_theta is None:
        # Stan inits uniform(-2, 2) on the unconstrained scale
        z0 = jax.random.uniform(
            k_init, (num_chains, dim), dtype, minval=-init_scale, maxval=init_scale
        )
    else:
        z0 = jnp.broadcast_to(jnp.asarray(init_theta, dtype), (num_chains, dim))

    schedule = tuple(build_warmup_schedule(num_warmup))

    def chain_warmup(z, key):
        lp, g = logp_grad_safe(z)

        # crude reasonable-epsilon: scale so first-step accept prob ~ 0.8
        def find_eps(eps, _):
            r = jax.random.normal(jax.random.fold_in(key, 7), (dim,), dtype)
            e0 = _energy(lp, r, jnp.ones(dim, dtype))
            _, r1, lp1, _ = _leapfrog(logp_grad_safe, z, r, g, eps, jnp.ones(dim, dtype))
            e1 = _energy(lp1, r1, jnp.ones(dim, dtype))
            delta = e0 - e1
            eps = jnp.where(delta > jnp.log(0.8), eps * 2.0, eps * 0.5)
            return eps, None

        eps0, _ = jax.lax.scan(find_eps, jnp.asarray(0.1, dtype), None, length=8)
        eps0 = jnp.clip(eps0, 1e-6, 10.0)

        da = _da_init(eps0)
        wf = _welford_init(dim, dtype)
        inv_mass = jnp.ones(dim, dtype)

        def warmup_step(carry, args):
            z, lp, g, da, wf, inv_mass, key = carry
            i, is_window_end = args
            key, k = jax.random.split(key)
            eps = jnp.exp(da.log_eps)
            z, lp, g, stats = _nuts_transition(
                logp_grad_safe, z, lp, g, eps, inv_mass, k, max_depth
            )
            da = _da_update(da, stats["accept_prob"], target_accept)
            in_metric_phase = (i >= 75) & (i < num_warmup - 50)
            wf = jax.lax.cond(
                in_metric_phase, lambda w: _welford_update(w, z), lambda w: w, wf
            )

            def close_window(args):
                da, wf, inv_mass = args
                new_inv_mass = _welford_variance(wf)
                # reset dual averaging around current eps (Stan restarts)
                new_da = _da_init(jnp.exp(da.log_eps))
                return new_da, _welford_init(dim, dtype), new_inv_mass

            da, wf, inv_mass = jax.lax.cond(
                is_window_end, close_window, lambda a: a, (da, wf, inv_mass)
            )
            return (z, lp, g, da, wf, inv_mass, key), stats["num_steps"]

        idx = jnp.arange(num_warmup)
        window_end = jnp.zeros(num_warmup, bool)
        for e in schedule:
            window_end = window_end.at[e - 1].set(True)
        (z, lp, g, da, wf, inv_mass, key), steps = jax.lax.scan(
            warmup_step, (z, lp, g, da, wf, inv_mass, key), (idx, window_end)
        )
        eps_final = jnp.exp(da.log_eps_avg)
        return z, lp, g, eps_final, inv_mass, jnp.sum(steps)

    def chain_sample(z, lp, g, eps, inv_mass, key):
        def step(carry, k):
            z, lp, g = carry
            z, lp, g, stats = _nuts_transition(
                logp_grad_safe, z, lp, g, eps, inv_mass, k, max_depth
            )
            return (z, lp, g), (z, stats["accept_prob"], stats["diverging"], stats["num_steps"])

        keys = jax.random.split(key, num_draws)
        (_, _, _), (draws, accept, div, steps) = jax.lax.scan(step, (z, lp, g), keys)
        return draws, accept, div, jnp.sum(steps)

    keys = jax.random.split(key, num_chains)
    warm = jax.jit(jax.vmap(chain_warmup))
    samp = jax.jit(jax.vmap(chain_sample))

    z, lp, g, eps, inv_mass, warm_steps = warm(z0, keys)
    keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    draws, accept, div, samp_steps = samp(z, lp, g, eps, inv_mass, keys2)

    return NUTSResult(
        draws=np.asarray(draws),
        accept_prob=np.asarray(accept),
        divergences=np.asarray(div.sum(axis=1)),
        step_size=np.asarray(eps),
        inv_mass=np.asarray(inv_mass),
        num_leapfrog=int(np.asarray(warm_steps).sum() + np.asarray(samp_steps).sum()),
    )
