"""TPU diagnostic: log-density roughness + short NUTS on the counts model."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ppcseq_tpu import load_counts
from ppcseq_tpu.data import ingest
from ppcseq_tpu.formula.design import create_design_matrix
from ppcseq_tpu.infer.nuts import run_nuts
from ppcseq_tpu.model import nb_model
from ppcseq_tpu.model.params import tree_axpy, tree_normal_like, zeros_tree
from ppcseq_tpu.norm.tmm import sample_scaling


def main():
    counts = load_counts()
    counts["is_significant"] = counts.FDR < 0.01
    work = counts.assign(do_check___=counts.is_significant)
    my_df = ingest.format_input(
        work, "~ Label", "sample", "symbol", "value", "do_check___", "PValue", 500
    )
    X, _, xr = create_design_matrix(my_df, "~ Label", "sample")
    scal = sample_scaling(my_df, "sample", "symbol", "value")
    md = ingest.build_model_data(
        my_df, "sample", "symbol", "value", "do_check___",
        X, list(xr["sample"]), dict(zip(scal["sample"], scal.exposure_rate)),
    )
    data, dims = nb_model.prepare_data(
        md.counts, md.X, md.exposure_rate, md.n_check, dtype=jnp.float32
    )
    datab = nb_model.with_baseline(data, dims)
    init = nb_model.smart_init(data, dims, as_tree=True)
    v = tree_normal_like(jax.random.PRNGKey(3), init)
    ts = np.linspace(0, 0.02, 41)

    for name, d in [("plain", data), ("delta", datab)]:
        ld = nb_model.make_log_density(d, dims, tree=True)
        f = jax.jit(ld)
        ys = np.array([float(f(tree_axpy(float(t), v, init))) for t in ts])
        resid = ys - np.polyval(np.polyfit(ts, ys, 3), ts)
        print(
            f"{jax.default_backend()} {name}: roughness std {resid.std():.5f} "
            f"max {np.abs(resid).max():.5f}",
            flush=True,
        )

    ld = nb_model.make_log_density(datab, dims, tree=True)
    t0 = time.time()
    res = run_nuts(
        ld, zeros_tree(dims), jax.random.PRNGKey(0),
        num_chains=8, num_warmup=150, num_draws=20, init_theta=init,
    )
    print(
        f"delta NUTS: time={time.time()-t0:.0f}s "
        f"lf/draw={res.num_leapfrog/(8*170):.0f} eps={res.step_size.round(4)} "
        f"accept={res.accept_prob.mean(axis=1).round(2)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
