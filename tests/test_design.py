"""Formula parsing and model.matrix semantics (reference R/utilities.R:220-225, 887-900)."""

import numpy as np
import pandas as pd
import pytest

from ppcseq_tpu.formula.design import create_design_matrix, model_matrix, parse_formula


def test_parse_formula():
    assert parse_formula("~ Label") == ["Label"]
    assert parse_formula("~Label + batch") == ["Label", "batch"]
    assert parse_formula("~ 1") == []
    assert parse_formula("~1") == []
    with pytest.raises(ValueError, match="~ covariates"):
        parse_formula("y ~ x")
    with pytest.raises(ValueError, match="main effects"):
        parse_formula("~ a * b")


def test_model_matrix_treatment_contrasts():
    df = pd.DataFrame({"Label": ["Neoadjuvant", "High", "High", "Neoadjuvant"]})
    X, names = model_matrix(df, ["Label"])
    # R factor levels sorted: High baseline, Neoadjuvant indicator
    assert names == ["(Intercept)", "LabelNeoadjuvant"]
    np.testing.assert_array_equal(X[:, 0], 1.0)
    np.testing.assert_array_equal(X[:, 1], [1.0, 0.0, 0.0, 1.0])


def test_model_matrix_multilevel_and_numeric():
    df = pd.DataFrame({"grp": ["c", "a", "b", "c"], "age": [1.5, 2.0, 3.0, 4.0]})
    X, names = model_matrix(df, ["grp", "age"])
    assert names == ["(Intercept)", "grpb", "grpc", "age"]
    np.testing.assert_array_equal(X[:, 1], [0, 0, 1, 0])
    np.testing.assert_array_equal(X[:, 2], [1, 0, 0, 1])
    np.testing.assert_array_equal(X[:, 3], df.age)


def test_create_design_matrix_orders_by_sample():
    df = pd.DataFrame(
        {
            "sample": ["s2", "s1", "s3", "s2", "s1", "s3"],
            "Label": ["B", "A", "B", "B", "A", "B"],
        }
    )
    X, names, rows = create_design_matrix(df, "~ Label", "sample")
    assert list(rows["sample"]) == ["s1", "s2", "s3"]
    np.testing.assert_array_equal(X[:, 1], [0.0, 1.0, 1.0])


def test_create_design_matrix_intercept_only(counts_df):
    sub = counts_df.head(1000)
    X, names, rows = create_design_matrix(sub, "~ 1", "sample")
    assert X.shape[1] == 1
    assert names == ["(Intercept)"]


def test_inconsistent_covariate_errors():
    df = pd.DataFrame({"sample": ["s1", "s1"], "Label": ["A", "B"]})
    with pytest.raises(ValueError, match="more than one covariate"):
        create_design_matrix(df, "~ Label", "sample")
