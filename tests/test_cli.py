"""CLI + additional_parameters_to_save coverage (small configs for speed)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from ppcseq_tpu import identify_outliers, load_counts
from ppcseq_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def tiny_counts():
    counts = load_counts()
    return counts.assign(
        is_significant=counts.symbol.isin(["SLC16A12", "CYP1A1", "ART3"])
    )


def test_additional_parameters_to_save(tiny_counts):
    res = identify_outliers(
        tiny_counts,
        formula="~ Label",
        sample="sample", transcript="symbol", abundance="value",
        significance="PValue", do_check="is_significant",
        percent_false_positive_genes=1,
        how_many_negative_controls=20,
        additional_parameters_to_save=("lambda_mu", "sigma_raw", "sigma"),
        seed=3,
    )
    extra = res.attrs["additional_parameters"]
    assert set(extra) == {"lambda_mu", "sigma_raw", "sigma"}
    n_draws = extra["lambda_mu"].shape[0]
    assert n_draws >= 1000
    assert extra["sigma_raw"].shape == (n_draws, 23)  # 3 check + 20 controls
    np.testing.assert_allclose(
        extra["sigma"], np.exp(-extra["sigma_raw"]), rtol=1e-5
    )


def test_additional_parameters_unknown_name(tiny_counts):
    with pytest.raises(ValueError, match="unknown parameter"):
        identify_outliers(
            tiny_counts,
            formula="~ Label",
            sample="sample", transcript="symbol", abundance="value",
            significance="PValue", do_check="is_significant",
            how_many_negative_controls=20,
            additional_parameters_to_save=("not_a_param",),
            seed=3,
        )


def test_cli_sampler_flag_reaches_do_inference(tiny_counts, tmp_path, monkeypatch):
    """--full-posterior --mcmc-sampler nuts must select MCMC + NUTS in the
    inference driver (cli.py round-3 bug: the flag didn't exist and the help
    text claimed NUTS while HMC ran)."""
    import ppcseq_tpu.pipeline.identify as pid

    seen = {}

    class _Stop(Exception):
        pass

    def spy(*args, **kwargs):
        seen["mcmc_sampler"] = kwargs.get("mcmc_sampler")
        seen["approximate_posterior_inference"] = kwargs.get("approximate_posterior_inference")
        raise _Stop

    monkeypatch.setattr(pid, "do_inference", spy)
    inp = tmp_path / "input.csv"
    tiny_counts.to_csv(inp, index=False)
    with pytest.raises(_Stop):
        cli_main([
            str(inp), "-o", str(tmp_path / "r"),
            "--formula", "~ Label",
            "--sample", "sample", "--transcript", "symbol",
            "--abundance", "value", "--significance", "PValue",
            "--do-check", "is_significant", "--negative-controls", "20",
            "--full-posterior", "--mcmc-sampler", "nuts",
        ])
    assert seen == {"mcmc_sampler": "nuts", "approximate_posterior_inference": False}


def test_cli_end_to_end(tiny_counts, tmp_path):
    inp = tmp_path / "input.csv"
    tiny_counts.to_csv(inp, index=False)
    out = tmp_path / "results"
    rc = cli_main([
        str(inp), "-o", str(out),
        "--formula", "~ Label",
        "--sample", "sample", "--transcript", "symbol",
        "--abundance", "value", "--significance", "PValue",
        "--do-check", "is_significant",
        "--negative-controls", "20",
        "--seed", "5", "--json",
    ])
    assert rc == 0
    summary = pd.read_csv(out / "result.csv")
    assert set(summary.symbol) == {"SLC16A12", "CYP1A1", "ART3"}
    assert "tot_deleterious_outliers" in summary.columns
    flat = pd.read_csv(out / "sample_wise_data.csv")
    assert len(flat) == 3 * 21
    assert {".lower", ".upper", "posterior_predictive_check_succeded"} <= set(flat.columns)


def test_cli_mesh_spec_parsing():
    """--mesh maps to a jax.sharding.Mesh over jax.devices() (8 virtual CPU
    devices in the suite); bad specs exit with a message."""
    from ppcseq_tpu.cli import parse_mesh_spec

    assert parse_mesh_spec(None) is None
    m = parse_mesh_spec("genes=4")
    assert m.axis_names == ("genes",) and m.shape["genes"] == 4
    m2 = parse_mesh_spec("chains=2,genes=4")
    assert m2.axis_names == ("chains", "genes")
    assert dict(m2.shape) == {"chains": 2, "genes": 4}
    with pytest.raises(SystemExit, match="bad axis"):
        parse_mesh_spec("rows=2")
    with pytest.raises(SystemExit, match="duplicate"):
        parse_mesh_spec("genes=2,genes=4")
    with pytest.raises(SystemExit, match="available"):
        parse_mesh_spec("genes=4096")


def test_cli_mesh_flag_reaches_do_inference(tiny_counts, tmp_path, monkeypatch):
    """--mesh genes=2 must hand identify_outliers a real 2-device Mesh
    (round-4 finding: multi-device runs were unreachable from the CLI)."""
    import ppcseq_tpu.pipeline.identify as pid

    seen = {}

    class _Stop(Exception):
        pass

    def spy(*args, **kwargs):
        seen["mesh"] = kwargs.get("mesh")
        raise _Stop

    monkeypatch.setattr(pid, "do_inference", spy)
    inp = tmp_path / "input.csv"
    tiny_counts.to_csv(inp, index=False)
    with pytest.raises(_Stop):
        cli_main([
            str(inp), "-o", str(tmp_path / "r"),
            "--formula", "~ Label",
            "--sample", "sample", "--transcript", "symbol",
            "--abundance", "value", "--significance", "PValue",
            "--do-check", "is_significant", "--negative-controls", "20",
            "--mesh", "genes=2",
        ])
    mesh = seen["mesh"]
    assert mesh is not None and mesh.axis_names == ("genes",)
    assert mesh.shape["genes"] == 2
