"""R-formula parsing and design-matrix construction.

Reproduces the semantics the reference relies on:
- `parse_formula` (reference R/utilities.R:220-225): "~ covariates" only, a
  response on the LHS is an error; returns the covariate names.
- `create_design_matrix` (reference R/utilities.R:887-900): R
  `stats::model.matrix` over the distinct (sample, covariates) rows arranged
  by sample id — treatment contrasts, intercept first, factor levels sorted.

Only main-effect formulas (`~ 1`, `~ a`, `~ a + b`, ...) are supported, which
covers the reference's entire exercised surface (its own tests/vignette use
`~ Label`). Interactions raise a clear error.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def parse_formula(formula: str) -> list[str]:
    """Return covariate names of a "~ covariates" formula.

    Mirrors reference R/utilities.R:220-225: a left-hand side (response) is
    rejected; `~ 1` yields an empty list.
    """
    if not isinstance(formula, str):
        raise TypeError("formula must be a string like '~ Label'")
    s = formula.strip()
    if "~" not in s:
        raise ValueError('The formula must be of the kind "~ covariates"')
    lhs, rhs = s.split("~", 1)
    if lhs.strip():
        raise ValueError('The formula must be of the kind "~ covariates"')
    rhs = rhs.strip()
    if rhs in ("", "1"):
        return []
    terms = [t.strip() for t in rhs.split("+")]
    out = []
    for t in terms:
        if t in ("", "1"):
            continue
        if t == "0" or t == "-1":
            raise ValueError("intercept removal is not supported (reference always keeps it)")
        if any(op in t for op in (":", "*", "^", "I(")):
            raise ValueError(f"unsupported formula term {t!r}: only main effects are supported")
        if not re.fullmatch(r"[A-Za-z.][A-Za-z0-9._]*|`[^`]+`", t):
            raise ValueError(f"unsupported formula term {t!r}")
        out.append(t.strip("`"))
    return out


def _is_numeric(col: pd.Series) -> bool:
    return pd.api.types.is_numeric_dtype(col) and not pd.api.types.is_bool_dtype(col)


def model_matrix(data: pd.DataFrame, covariates: list[str]) -> tuple[np.ndarray, list[str]]:
    """Build an R `model.matrix(~ covariates, data)` equivalent.

    Treatment contrasts; factor levels are sorted (R `factor()` default);
    intercept column first. Returns (X, column_names).
    """
    n = len(data)
    cols = [np.ones(n)]
    names = ["(Intercept)"]
    for cov in covariates:
        col = data[cov]
        if _is_numeric(col):
            cols.append(col.to_numpy(dtype=np.float64))
            names.append(cov)
        else:
            if pd.api.types.is_bool_dtype(col):
                levels = [False, True]
                vals = col.to_numpy()
            else:
                vals = col.astype(str).to_numpy()
                levels = sorted(set(vals))
            # treatment contrasts: first level is the baseline
            for lev in levels[1:]:
                cols.append((vals == lev).astype(np.float64))
                names.append(f"{cov}{lev}")
    return np.column_stack(cols), names


def create_design_matrix(
    df: pd.DataFrame, formula: str, sample_col: str
) -> tuple[np.ndarray, list[str], pd.DataFrame]:
    """Design matrix over distinct samples arranged by sample id.

    Mirrors reference R/utilities.R:887-900. Returns (X, colnames,
    sample_rows) where sample_rows is the distinct-sample frame in design-row
    order.
    """
    covariates = parse_formula(formula)
    sub = df[[sample_col] + covariates].drop_duplicates().sort_values(sample_col, kind="stable")
    if sub[sample_col].duplicated().any():
        dup = sub[sample_col][sub[sample_col].duplicated()].iloc[0]
        raise ValueError(
            f"sample {dup!r} maps to more than one covariate combination; "
            "covariates must be constant within a sample"
        )
    sub = sub.reset_index(drop=True)
    X, names = model_matrix(sub, covariates)
    return X, names, sub
