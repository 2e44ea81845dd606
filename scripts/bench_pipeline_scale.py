"""The PRODUCT at 50k genes: one `identify_outliers` end to end on TPU.

The 50k-gene figure in the README was previously sampler-level only
(scripts/bench_scale.py); this runs the real two-pass product — threshold
math, TMM, both fits, PPC chunking, result assembly — on a synthetic
50,000-transcript x 100-sample cohort (reference product surface
R/methods.R:74-367). The fit covers ALL 50k genes: 100 checked +
49,900 negative controls (the reference caps controls at 500 by default;
here the control count is raised so the fitted model really is the
at-scale configuration the README advertises).

Records wall clock (cold + warm via checkpoint-free rerun), peak device
memory, and calls-sanity against the injected outlier truth.

    python scripts/bench_pipeline_scale.py [--json PIPELINE_SCALE_r5.json]
        [--genes 50000 --samples 100 --check 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--genes", type=int, default=50000)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--check", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from ppcseq_tpu.pipeline.identify import identify_outliers
    from ppcseq_tpu.utils.synthetic import synthetic_cohort, synthetic_tidy

    df = synthetic_tidy(
        n_genes=args.genes, n_samples=args.samples, n_check=args.check,
        outlier_frac=0.002, seed=0,
    )
    _, _, _, truth = synthetic_cohort(
        n_genes=args.genes, n_samples=args.samples, n_check=args.check,
        outlier_frac=0.002, seed=0,
    )
    spiked = set(map(tuple, truth["outliers"]))
    print(f"cohort: {args.genes} genes x {args.samples} samples, "
          f"{args.check} checked, {len(spiked)} injected outlier cells", flush=True)

    dev = jax.local_devices()[0]

    def run():
        t0 = time.time()
        res = identify_outliers(
            df, formula="~ Label",
            sample="sample", transcript="transcript", abundance="count",
            significance="PValue", do_check="do_check",
            percent_false_positive_genes=1.0,
            how_many_negative_controls=args.genes - args.check,
            approximate_posterior_inference=True,   # VB default
            approximate_posterior_analysis=True,    # approximated CI
            seed=42,
        )
        return res, time.time() - t0

    res_cold, wall_cold = run()
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")  # None where the backend has no stats
    res_warm, wall_warm = run()

    calls = int(res_cold.tot_deleterious_outliers.sum())
    ppc_failed = int(res_cold.ppc_samples_failed.sum())
    # which injected spiked cells were flagged (S,G cells of checked genes)
    flagged = set()
    tcol = "transcript"
    for _, row in res_cold.iterrows():
        swd = row["sample_wise_data"]
        bad = swd[~swd["posterior_predictive_check_succeded"].astype(bool)]
        for _, r in bad.iterrows():
            flagged.add((int(r["S"]), int(r["G"])))
    hits = len(spiked & flagged)

    out = {
        "what": ("identify_outliers END TO END at 50k-gene scale on "
                 f"{dev.device_kind}: two passes, VB + approximated CI, fit "
                 "covers all genes (100 checked + rest as controls)"),
        "script": "scripts/bench_pipeline_scale.py",
        "platform": jax.default_backend(),
        "device": str(dev),
        "genes": args.genes,
        "samples": args.samples,
        "checked": args.check,
        "wall_cold_s": round(wall_cold, 1),
        "wall_warm_s": round(wall_warm, 1),
        "peak_device_bytes": None if peak is None else int(peak),
        "peak_device_gib": None if peak is None else round(peak / 2**30, 2),
        "total_deleterious_calls": calls,
        "total_ppc_failed": ppc_failed,
        "injected_outlier_cells": len(spiked),
        "injected_cells_flagged": hits,
        "result_rows": int(len(res_cold)),
        "calls_match_across_runs": (
            res_cold.tot_deleterious_outliers.tolist()
            == res_warm.tot_deleterious_outliers.tolist()
        ),
    }
    print(json.dumps(out, indent=1), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
