"""Sharding scaling harness: gene-axis and chain-axis efficiency at 1..N devices.

Measures the two parallel axes of the framework (the map_rect/MPI analog of
stan:226-240 and the chain-per-process analog of R/utilities.R:1497-1502):

- gene-sharded: tree-state jittered HMC (infer.hmc.run_hmc_tree) with the
  per-gene parameter/data leaves sharded over a 1-D `genes` mesh. Strong
  scaling: fixed G, K devices, leapfrogs/sec should grow ~K-fold.
- chain-sharded: flat jittered HMC (infer.hmc.run_hmc) with the chain batch
  sharded over a 1-D `chains` mesh. Embarrassingly parallel.

On real multi-chip hardware this measures ICI scaling; on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu) it
validates both sharded programs end-to-end and records relative efficiency
(CPU "devices" are host threads sharing cores, so virtual-mesh efficiency is
a lower bound, not a perf claim).

Usage:
    python scripts/bench_scaling.py                    # both axes, default sizes
    python scripts/bench_scaling.py --genes [G S ch]   # gene axis only
    python scripts/bench_scaling.py --hmc   [G S ch]   # chain axis only
    python scripts/bench_scaling.py --nuts  [G S ch]   # gene-sharded NUTS (slow compile)
    python scripts/bench_scaling.py --json OUT.json    # both axes -> JSON file
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


def run_gene_sharded(n_genes=4096, n_samples=50, chains=8, warmup=40, draws=60):
    """Gene-sharded tree-state jittered HMC at K in {1, N} devices."""
    import jax
    import jax.numpy as jnp

    from ppcseq_tpu.infer.hmc import run_hmc_tree
    from ppcseq_tpu.model import nb_model
    from ppcseq_tpu.model.params import zeros_tree
    from ppcseq_tpu.parallel.sharding import gene_mesh, pad_genes
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
        logp = nb_model.tree_logp(dims, likelihood="plain")
        init = nb_model.smart_init(data, dims, as_tree=True)

        kw = dict(
            num_chains=chains, num_warmup=warmup, num_draws=draws,
            num_leapfrog=16, init_theta=init, mesh=mesh, dims=dims,
        )
        t0 = time.time()
        r = run_hmc_tree(logp, zeros_tree(dims), jax.random.PRNGKey(1), data=data, **kw)
        compile_s = time.time() - t0
        t0 = time.time()
        r = run_hmc_tree(logp, zeros_tree(dims), jax.random.PRNGKey(2), data=data, **kw)
        dt = time.time() - t0
        results[k] = {
            "axis": "genes",
            "devices": k,
            "G": G_pad,
            "compile_s": round(compile_s, 1),
            "elapsed_s": round(dt, 2),
            "draws_per_sec": round(chains * draws / dt, 2),
            "leapfrogs_per_sec": round(r.num_leapfrog / dt, 1),
            "accept": round(float(r.accept_prob.mean()), 3),
        }
        print(json.dumps(results[k]), flush=True)

    out = {"runs": list(results.values())}
    if len(results) > 1:
        base = results[1]["leapfrogs_per_sec"]
        top = results[n_devices]["leapfrogs_per_sec"]
        out["efficiency"] = {
            "metric": "gene_sharding_scaling_efficiency",
            "value": round(top / (base * n_devices), 3),
            "unit": f"x{n_devices}_devices",
        }
        print(json.dumps(out["efficiency"]), flush=True)
    return out


def run_gene_sharded_nuts(n_genes=4096, n_samples=50, chains=8, warmup=50,
                          draws=50, max_depth=8, top_only=0, json_out=None):
    """Gene-sharded NUTS (the reference's exact at-scale combination: NUTS
    over map_rect gene shards, stan:226-240 under rstan sampling). Records
    first-call wall (compile + one run) per device count — the open round-4
    question was whether GSPMD partitioning of the while_loop-heavy tree
    build stays bounded at large G."""
    import jax
    import jax.numpy as jnp

    from ppcseq_tpu.infer.nuts import run_nuts
    from ppcseq_tpu.model import nb_model
    from ppcseq_tpu.model.params import zeros_tree
    from ppcseq_tpu.parallel.sharding import gene_mesh, pad_genes
    from ppcseq_tpu.utils.synthetic import synthetic_cohort

    counts, X, exposure, _ = synthetic_cohort(n_genes, n_samples, n_check=64, seed=0)
    n_devices = len(jax.devices())
    results = {}
    # top_only: skip the 1-device baseline — on a virtual CPU mesh the
    # baseline costs the same total compute on the same shared cores (the
    # round-4 question is compile boundedness at the full mesh, not
    # virtual-mesh "efficiency", which the module docstring already
    # disclaims as a lower bound)
    ks = [n_devices] if top_only else sorted({1, n_devices})
    for k in ks:
        mesh = gene_mesh(k)
        G_pad = pad_genes(n_genes, mesh)
        data, dims = nb_model.prepare_data(
            counts, X, exposure, 64, pad_genes_to=G_pad, dtype=jnp.float32
        )
        logp = nb_model.tree_logp(dims, likelihood="plain")
        init = nb_model.smart_init(data, dims, as_tree=True)

        def go(seed):
            return run_nuts(
                logp, zeros_tree(dims), jax.random.PRNGKey(seed), data=data,
                num_chains=chains, num_warmup=warmup, num_draws=draws,
                init_theta=init, max_depth=max_depth, mesh=mesh, dims=dims,
            )

        t0 = time.time()
        res = go(1)  # compile + first run
        first_call_s = time.time() - t0
        t0 = time.time()
        res = go(0)
        dt = time.time() - t0
        results[k] = {
            "axis": "genes(nuts)",
            "devices": k,
            "G": G_pad,
            "S": n_samples,
            "max_depth": max_depth,
            "first_call_s": round(first_call_s, 1),
            "elapsed_s": round(dt, 2),
            "draws_per_sec": round(chains * draws / dt, 2),
            "leapfrogs_per_sec": round(res.num_leapfrog / dt, 1),
            "accept": round(float(res.accept_prob.mean()), 3),
            "divergence_frac": round(float(res.divergences.sum()) / (chains * draws), 4),
        }
        print(json.dumps(results[k]), flush=True)

    out = {"runs": list(results.values())}
    if len(results) > 1:
        base = results[1]["leapfrogs_per_sec"]
        top = results[n_devices]["leapfrogs_per_sec"]
        out["efficiency"] = {
            "metric": "gene_sharding_nuts_scaling_efficiency",
            "value": round(top / (base * n_devices), 3),
            "unit": f"x{n_devices}_devices",
        }
        print(json.dumps(out["efficiency"]), flush=True)
    if json_out:
        import jax as _jax

        out["platform"] = _jax.default_backend()
        out["n_devices"] = n_devices
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {json_out}")
    return out


def run_chain_sharded(n_genes=2048, n_samples=50, chains=64, warmup=40, draws=60):
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
            "axis": "chains",
            "devices": k,
            "elapsed_s": round(dt, 2),
            "draws_per_sec": round(chains * draws / dt, 2),
            "leapfrogs_per_sec": round(r.num_leapfrog / dt, 1),
            "accept": round(float(r.accept_prob.mean()), 3),
        }
        print(json.dumps(results[k]), flush=True)

    out = {"runs": list(results.values())}
    if len(results) > 1:
        base = results[1]["leapfrogs_per_sec"]
        top = results[n_devices]["leapfrogs_per_sec"]
        out["efficiency"] = {
            "metric": "chain_sharding_scaling_efficiency",
            "value": round(top / (base * n_devices), 3),
            "unit": f"x{n_devices}_devices",
        }
        print(json.dumps(out["efficiency"]), flush=True)
    return out


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if argv and argv[0] == "--hmc":
        run_chain_sharded(*[int(a) for a in argv[1:]])
    elif argv and argv[0] == "--nuts":
        run_gene_sharded_nuts(*[int(a) for a in argv[1:]], json_out=json_out)
    elif argv and argv[0] == "--genes":
        run_gene_sharded(*[int(a) for a in argv[1:]])
    else:
        import jax

        combined = {
            "n_devices": len(jax.devices()),
            "platform": jax.default_backend(),
            "gene_axis": run_gene_sharded(*[int(a) for a in argv]),
            "chain_axis": run_chain_sharded(),
        }
        if json_out:
            with open(json_out, "w") as f:
                json.dump(combined, f, indent=1)
            print(f"wrote {json_out}")
