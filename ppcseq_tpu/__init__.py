"""ppcseq_tpu — TPU-native posterior-predictive-check outlier detection for RNA-seq.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
R/Stan package ppcseq (posterior predictive checks for bulk RNA-seq
differential expression): a hierarchical negative-binomial GLM fit with
meanfield ADVI or vectorized multi-chain NUTS, on-device posterior-predictive
credible intervals, and a two-pass truncation-refit procedure that calls
deleterious outlier observations per transcript.
"""

from ppcseq_tpu.data.datasets import load_counts
from ppcseq_tpu.pipeline.identify import identify_outliers
from ppcseq_tpu.viz.plots import plot_credible_intervals

__version__ = "0.1.0"

__all__ = [
    "identify_outliers",
    "plot_credible_intervals",
    "load_counts",
]
