"""Credible-interval plots (reference R/methods.R:408-432, R/utilities.R:408-490)."""

from __future__ import annotations


def plot_credible_intervals(result):
    raise NotImplementedError("plotting under construction")
