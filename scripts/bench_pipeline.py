"""End-to-end wall-clock benchmark of identify_outliers — the product, not
just the sampler.

The reference's only runnable workload is its own test/README configuration
(tests/testthat/test-ppcSeq.R: 3 check genes + 50 negative controls, VB;
README.md:58-74: 15 FDR<0.01 genes + 500 controls). This times the full
two-pass pipeline — ingest, TMM, design, ADVI/HMC fits, PPC simulation,
extraction, merge — for those configurations on the current JAX platform,
cold (includes compilation) and warm (compiled executables cached; the
steady-state cost of repeated cohort analyses, e.g. across contrasts).

Writes one JSON line per configuration. Run on TPU (default platform) for
the committed PIPELINE_BENCH artifact; on CPU it doubles as a regression
guard for compile-cache behavior (warm must be several times faster).

Usage: python scripts/bench_pipeline.py [--quick]  (--quick: 3-gene only)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_config(tag, counts, kwargs):
    from ppcseq_tpu import identify_outliers

    t0 = time.time()
    res = identify_outliers(counts, **kwargs)
    cold = time.time() - t0
    t0 = time.time()
    res = identify_outliers(counts, **kwargs)
    warm = time.time() - t0
    calls = (
        res["tot_deleterious_outliers"].tolist()
        if "tot_deleterious_outliers" in res
        else None
    )
    return {
        "config": tag,
        "cold_s": round(cold, 2),
        "warm_s": round(warm, 2),
        "genes_checked": len(res),
        "tot_deleterious_outliers": calls,
    }


def main(quick=False):
    import jax

    from ppcseq_tpu import load_counts

    counts = load_counts()
    base = dict(
        formula="~ Label", sample="sample", transcript="symbol",
        abundance="value", significance="PValue", do_check="is_significant",
        seed=42,
    )

    rows = []
    three = counts.assign(
        is_significant=counts.symbol.isin(["SLC16A12", "CYP1A1", "ART3"])
    )
    rows.append(run_config(
        "3gene_vb_approx (reference test config)", three,
        dict(base, percent_false_positive_genes=5, how_many_negative_controls=50),
    ))
    if not quick:
        rows.append(run_config(
            "3gene_hmc_full", three,
            dict(base, percent_false_positive_genes=5,
                 how_many_negative_controls=50,
                 approximate_posterior_inference=False,
                 approximate_posterior_analysis=False),
        ))
        readme = counts.assign(is_significant=counts.FDR < 0.01)
        rows.append(run_config(
            "15gene_vb_approx (reference README config)", readme,
            dict(base, percent_false_positive_genes=5,
                 how_many_negative_controls=500),
        ))

    out = {
        "metric": "identify_outliers_wall_clock",
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "rows": rows,
        "note": (
            "cold includes XLA compilation; warm reuses the compiled "
            "executables (data rides as a jit operand). The reference "
            "publishes no end-to-end timings and the R/rstan stack is not "
            "runnable here; BASELINE_MEASURED.json carries the measured "
            "sampler-level CPU proxy used by bench.py."
        ),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    main(quick=args.quick)
