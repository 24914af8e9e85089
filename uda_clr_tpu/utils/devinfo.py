"""Per-chip peak numbers and the baseline denominator shared by every
benchmark tool (bench.py, tools/bench_*), so a corrected peak value or a
new TPU generation lands in exactly one place instead of drifting across
copies.
"""

# The reference's estimated A100 throughput for the flagship configuration
# (documented estimate — derivation and caveats in bench.py's docstring and
# BASELINE.md). All "vs_baseline" ratios divide by this.
A100_REFERENCE_IMG_PER_SEC = 20.0

# bf16 peak TFLOP/s per chip, keyed by device_kind substring.
PEAK_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,
    "v6e": 918.0,
}


def peak_tflops(device_kind: str):
    """Peak bf16 TFLOP/s for a jax ``device_kind`` string, or None if the
    generation isn't in the table (MFU is then skipped, not wrong)."""
    kind = device_kind.lower()
    return next((v for k, v in PEAK_TFLOPS.items() if k in kind), None)


# HBM bandwidth GB/s per chip, keyed like PEAK_TFLOPS (public spec sheets;
# used by tools/roofline_closure.py to place memory-bound fusions).
PEAK_HBM_GBS = {
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


def peak_hbm_gbs(device_kind: str):
    """Peak HBM GB/s for a jax ``device_kind`` string, or None."""
    kind = device_kind.lower()
    return next((v for k, v in PEAK_HBM_GBS.items() if k in kind), None)
