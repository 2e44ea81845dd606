"""Gene-sharding scaling harness: draws/sec at 1..N devices.

Runs vectorized-chain NUTS on a synthetic cohort with the gene axis sharded
over a 1-D mesh of K devices, for K in {1, N}, and reports throughput and
scaling efficiency. On real multi-chip hardware this measures ICI scaling;
on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
it validates the sharded program end-to-end and reports the (meaningless for
perf, useful for CI) relative numbers.

Usage: python scripts/bench_scaling.py [n_genes] [n_samples] [chains]
       python scripts/bench_scaling.py --hmc [n_genes] [n_samples] [chains]

--hmc measures the flagship chain-sharded jittered-HMC path instead of
gene-sharded NUTS (chains split across devices; compiles fast enough for
virtual-CPU-mesh validation, which the gene-sharded NUTS program does not).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor JAX_PLATFORMS=cpu even where a sitecustomize force-sets the platform
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(n_genes=4096, n_samples=50, chains=8, warmup=50, draws=50):
    import jax
    import jax.numpy as jnp

    from ppcseq_tpu.infer.nuts import run_nuts
    from ppcseq_tpu.model import nb_model
    from ppcseq_tpu.model.params import zeros_tree
    from ppcseq_tpu.parallel.sharding import gene_mesh, pad_genes, shard_data, shard_params
    from ppcseq_tpu.utils.synthetic import synthetic_cohort

    counts, X, exposure, _ = synthetic_cohort(n_genes, n_samples, n_check=64, seed=0)
    n_devices = len(jax.devices())
    results = {}
    for k in sorted({1, n_devices}):
        mesh = gene_mesh(k)
        G_pad = pad_genes(n_genes, mesh)
        data, dims = nb_model.prepare_data(
            counts, X, exposure, 64, pad_genes_to=G_pad, dtype=jnp.float32
        )
        data = shard_data(data, mesh)
        ld = nb_model.make_log_density(data, dims, tree=True)
        init = nb_model.smart_init(data, dims, as_tree=True)
        init = shard_params(init, mesh, dims)

        def go(seed):
            return run_nuts(
                ld, zeros_tree(dims), jax.random.PRNGKey(seed),
                num_chains=chains, num_warmup=warmup, num_draws=draws,
                init_theta=init, max_depth=8,
            )

        _ = go(1)  # compile
        t0 = time.time()
        res = go(0)
        dt = time.time() - t0
        results[k] = {
            "devices": k,
            "elapsed_s": round(dt, 2),
            "draws_per_sec": round(chains * draws / dt, 2),
            "leapfrogs_per_sec": round(res.num_leapfrog / dt, 1),
        }
        print(json.dumps(results[k]), flush=True)

    if len(results) > 1:
        base = results[1]["leapfrogs_per_sec"]
        top = results[n_devices]["leapfrogs_per_sec"]
        eff = top / (base * n_devices)
        print(json.dumps({
            "metric": "gene_sharding_scaling_efficiency",
            "value": round(eff, 3),
            "unit": f"x{n_devices}_devices",
        }))


def run_hmc_scaling(n_genes=2048, n_samples=50, chains=64, warmup=40, draws=60):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ppcseq_tpu.infer.hmc import run_hmc
    from ppcseq_tpu.model import nb_model
    from ppcseq_tpu.utils.synthetic import synthetic_cohort

    counts, X, exposure, _ = synthetic_cohort(n_genes, n_samples, n_check=64, seed=0)
    data, dims = nb_model.prepare_data(counts, X, exposure, 64, dtype=jnp.float32)
    logp = nb_model.flat_logp(dims)
    init = jnp.asarray(nb_model.smart_init(data, dims), jnp.float32)

    n_devices = len(jax.devices())
    results = {}
    for k in sorted({1, n_devices}):
        mesh = Mesh(np.array(jax.devices()[:k]), ("chains",)) if k > 1 else None
        kw = dict(
            num_chains=chains, num_warmup=warmup, num_draws=draws,
            num_leapfrog=16, init_theta=init, mesh=mesh,
        )
        r = run_hmc(logp, dims.dim, jax.random.PRNGKey(1), data=data, **kw)
        t0 = time.time()
        r = run_hmc(logp, dims.dim, jax.random.PRNGKey(2), data=data, **kw)
        dt = time.time() - t0
        results[k] = {
            "devices": k,
            "elapsed_s": round(dt, 2),
            "draws_per_sec": round(chains * draws / dt, 2),
            "leapfrogs_per_sec": round(r.num_leapfrog / dt, 1),
            "accept": round(float(r.accept_prob.mean()), 3),
        }
        print(json.dumps(results[k]), flush=True)

    if len(results) > 1:
        base = results[1]["leapfrogs_per_sec"]
        top = results[n_devices]["leapfrogs_per_sec"]
        print(json.dumps({
            "metric": "chain_sharding_scaling_efficiency",
            "value": round(top / (base * n_devices), 3),
            "unit": f"x{n_devices}_devices",
        }))


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--hmc":
        run_hmc_scaling(*[int(a) for a in argv[1:]])
    else:
        run(*[int(a) for a in argv])
