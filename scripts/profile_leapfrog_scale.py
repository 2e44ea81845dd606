"""Raw leapfrog cost at 50k x 100 scale: plain XLA vs Pallas fused likelihood."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ppcseq_tpu.model import nb_model
from ppcseq_tpu.ops.nb_kernel import make_pallas_likelihood
from ppcseq_tpu.utils.synthetic import synthetic_cohort

N_STEPS = 32


def time_scan(logp_grad, theta0, num_chains):
    z = jnp.tile(theta0[None, :], (num_chains, 1))
    r = jnp.zeros_like(z)
    eps = jnp.asarray(1e-4, jnp.float32)

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

    zf, lps = run(z, r)
    jax.block_until_ready(zf)
    t0 = time.time()
    zf, lps = run(z, r)
    jax.block_until_ready(zf)
    return (time.time() - t0) / N_STEPS


def main():
    n_genes, n_samples = 50000, 100
    counts, X, exposure, _ = synthetic_cohort(n_genes, n_samples, n_check=100, seed=0)
    data, dims = nb_model.prepare_data(counts, X, exposure, 100, dtype=jnp.float32)
    theta0 = jnp.asarray(nb_model.smart_init(data, dims), jnp.float32)

    for name, lf in [
        ("plain", None),
        ("analytic", nb_model.analytic_likelihood),
        ("pallas", make_pallas_likelihood(gene_tile=2048)),
        ("pallas512", make_pallas_likelihood(gene_tile=512)),
    ]:
        logp = nb_model.make_log_density(data, dims, likelihood_fn=lf)
        logp_grad = jax.value_and_grad(logp)
        for chains in [4, 8]:
            try:
                per_lf = time_scan(logp_grad, theta0, chains)
            except Exception as e:
                print(f"{name:10s} chains={chains}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
                break
            pts = chains * n_genes * n_samples / per_lf
            print(
                f"{name:10s} chains={chains}: {per_lf*1e3:8.2f} ms/leapfrog "
                f"({pts/1e9:6.2f} G point-grads/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
