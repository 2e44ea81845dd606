"""Roofline / utilization accounting for the sampler hot op.

The perf story needs an ABSOLUTE scale, not only a ratio to a CPU proxy:
what fraction of the chip does the hot loop use, and which ceiling binds it?
XLA's own HLO cost model supplies flops / bytes-accessed for the compiled
program (`compiled.cost_analysis()`); this module pairs those with the
chip's published peaks to produce flops/s, HBM GB/s, and
fraction-of-roofline numbers for bench.py and the at-scale benches.

Peaks: HBM bandwidth and bf16 matmul peak are published (TPU v5e: 819 GB/s,
197 TFLOP/s bf16). There is no published f32 VPU peak; the estimate below is
4 SIMD ALUs x (8x128) lanes x ~940 MHz = ~3.9 T elementwise f32 op/s per
chip — the relevant ceiling for this workload, whose hot op is
transcendental-heavy elementwise math (exp/log/sigmoid per NB point), not
matmul (the design matmul is [S, C] @ [C, G] with C = 2: negligible MXU
work). Transcendentals lower to multi-op polynomials, which the XLA flop
count already includes (it counts the expanded HLO ops), so flops/s vs the
VPU estimate is a like-for-like fraction.
"""

from __future__ import annotations

from typing import Any

# device_kind (jax.Device.device_kind) -> peaks
PEAKS = {
    "TPU v5 lite": {
        "hbm_bytes_per_sec": 819e9,  # published v5e HBM BW
        "mxu_bf16_flops": 197e12,  # published v5e bf16 matmul peak
        "vpu_f32_flops_est": 3.9e12,  # 4 ALUs x 1024 lanes x ~940 MHz (estimate)
    },
    # conservative fallbacks for unknown chips: report absolute numbers only
}


def cost_of(fn, *args, **kwargs) -> dict:
    """flops / bytes-accessed of one jitted call, from XLA's HLO cost model.

    Returns {"flops": float | None, "bytes": float | None}; None when the
    backend exposes no cost analysis (e.g. some CPU paths).
    """
    import jax

    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if ca is None:
            return {"flops": None, "bytes": None}
        return {
            "flops": float(ca.get("flops", 0.0)) or None,
            "bytes": float(ca.get("bytes accessed", 0.0)) or None,
        }
    except Exception:  # cost analysis is best-effort diagnostics
        return {"flops": None, "bytes": None}


def utilization(
    flops_per_sec: float | None,
    bytes_per_sec: float | None,
    device: Any,
) -> dict:
    """Fractions of the device's rooflines + a one-line human note."""
    kind = getattr(device, "device_kind", str(device))
    peaks = PEAKS.get(kind)
    out: dict[str, Any] = {
        "flops_per_sec": None if flops_per_sec is None else round(flops_per_sec, -6),
        "hbm_bytes_per_sec": None if bytes_per_sec is None else round(bytes_per_sec, -6),
    }
    if peaks is None or flops_per_sec is None:
        out["utilization_note"] = (
            f"no roofline peaks recorded for device kind {kind!r}; "
            "absolute numbers only"
        )
        return out
    vpu_frac = flops_per_sec / peaks["vpu_f32_flops_est"]
    mxu_frac = flops_per_sec / peaks["mxu_bf16_flops"]
    out["vpu_roofline_frac_est"] = round(vpu_frac, 3)
    out["mxu_peak_frac"] = round(mxu_frac, 4)
    note = (
        f"{flops_per_sec / 1e12:.2f} TFLOP/s (XLA HLO count) = "
        f"{100 * vpu_frac:.0f}% of the ~{peaks['vpu_f32_flops_est'] / 1e12:.1f} "
        "TFLOP/s VPU f32 estimate — the binding ceiling for this "
        "transcendental-heavy elementwise op (MXU is idle: C=2 design matmul)"
    )
    if bytes_per_sec is not None:
        hbm_frac = bytes_per_sec / peaks["hbm_bytes_per_sec"]
        out["hbm_peak_frac"] = round(hbm_frac, 3)
        note += (
            f"; {bytes_per_sec / 1e9:.0f} GB/s = {100 * hbm_frac:.0f}% of the "
            f"{peaks['hbm_bytes_per_sec'] / 1e9:.0f} GB/s HBM peak"
        )
    out["utilization_note"] = note
    return out
