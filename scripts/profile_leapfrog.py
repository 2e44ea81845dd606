"""Isolate per-leapfrog cost: raw value_and_grad scans without NUTS machinery.

Times N sequential leapfrogs (the irreducible serial core of any HMC) for:
- plain XLA likelihood, flat state
- delta-form (baseline) likelihood, flat state
- Pallas fused likelihood, flat state
at several chain counts. The gap between this and NUTS lf/s is sampler
control-flow overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from ppcseq_tpu.model import nb_model
from ppcseq_tpu.ops.nb_kernel import make_pallas_likelihood
from profile_bench import setup

N_STEPS = 512


def time_scan(logp_grad, theta0, num_chains, dtype=jnp.float32):
    D = theta0.shape[0]
    z = jnp.tile(theta0[None, :], (num_chains, 1))
    r = jnp.zeros_like(z)
    eps = jnp.asarray(1e-3, dtype)

    @jax.jit
    def run(z, r):
        def step(carry, _):
            z, r, g = carry
            r_half = r + 0.5 * eps * g
            z_new = z + eps * r_half
            lp, g_new = jax.vmap(logp_grad)(z_new)
            r_new = r_half + 0.5 * eps * g_new
            return (z_new, r_new, g_new), lp

        _, g0 = jax.vmap(logp_grad)(z)
        (zf, rf, _), lps = jax.lax.scan(step, (z, r, g0), None, length=N_STEPS)
        return zf, lps

    zf, lps = run(z, r)  # compile
    jax.block_until_ready(zf)
    t0 = time.time()
    zf, lps = run(z, r)
    jax.block_until_ready(zf)
    dt = time.time() - t0
    return dt / N_STEPS


def main():
    data, dims = setup()
    data_base = nb_model.with_baseline(data, dims)
    theta0 = jnp.asarray(nb_model.smart_init(data, dims), jnp.float32)

    variants = {
        "plain": nb_model.make_log_density(data, dims),
        "delta": nb_model.make_log_density(data_base, dims),
        "pallas": nb_model.make_log_density(data, dims, likelihood_fn=make_pallas_likelihood()),
    }
    for name, logp in variants.items():
        logp_grad = jax.value_and_grad(logp)
        for num_chains in [32, 128, 512]:
            try:
                per_lf = time_scan(logp_grad, theta0, num_chains)
            except Exception as e:  # pallas may fail on some backends
                print(f"{name:6s} chains={num_chains:4d}: FAILED {type(e).__name__}: {e}", flush=True)
                break
            print(
                f"{name:6s} chains={num_chains:4d}: {per_lf*1e6:8.1f} us/leapfrog "
                f"({num_chains/per_lf:10.0f} chain-lf/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
