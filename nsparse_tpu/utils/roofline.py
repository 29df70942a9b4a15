"""Chip specs and roofline models.

The reference reports raw GFLOPS (``spmv_amb.cu:62``, ``spgemm_hash.cu:52``)
and leaves roofline context to the papers.  Here the roofline is first-class
(BASELINE.md target: >=70% of HBM roofline): both SpMV and SpGEMM are
memory-bound, so the model is bytes-moved / bandwidth.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float          # HBM bandwidth, GB/s
    peak_bf16_tflops: float  # MXU peak
    peak_f32_tflops: float
    vmem_mb: float


_SPECS = {
    # public numbers
    "v5p": ChipSpec("TPU v5p", 2765.0, 459.0, 229.0, 128.0),
    "v5e": ChipSpec("TPU v5e", 819.0, 197.0, 98.5, 128.0),
    "v4": ChipSpec("TPU v4", 1228.0, 275.0, 137.0, 128.0),
    "v6e": ChipSpec("TPU v6e", 1640.0, 918.0, 459.0, 128.0),
    "cpu": ChipSpec("host CPU", 50.0, 1.0, 1.0, 0.0),
}


def chip_specs() -> ChipSpec:
    """Best-effort spec for the current default device."""
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, spec in _SPECS.items():
        if key in kind.replace(" ", ""):
            return spec
    if "lite" in kind and "v5" in kind:
        return _SPECS["v5e"]
    if "v5" in kind:
        return _SPECS["v5p"]
    if "tpu" in kind:
        return _SPECS["v4"]
    return _SPECS["cpu"]


def spmv_bytes(nnz: int, m: int, n: int, val_bytes: int = 4,
               idx_bytes: int = 4, padded_nnz: int | None = None) -> int:
    """Minimum HBM traffic for one SpMV: read vals + indices + x, write y.

    ``padded_nnz`` accounts for explicit-zero fill in ELL/BSR layouts.
    """
    stored = padded_nnz if padded_nnz is not None else nnz
    return stored * (val_bytes + idx_bytes) + n * val_bytes + m * val_bytes


def spmv_roofline_gflops(nnz: int, m: int, n: int, val_bytes: int = 4,
                         idx_bytes: int = 4,
                         padded_nnz: int | None = None,
                         spec: ChipSpec | None = None) -> float:
    """Bandwidth-bound GFLOPS ceiling for y = A @ x (useful flops = 2*nnz)."""
    spec = spec or chip_specs()
    bytes_moved = spmv_bytes(nnz, m, n, val_bytes, idx_bytes, padded_nnz)
    seconds_per_op = bytes_moved / (spec.hbm_gbps * 1e9)
    return 2.0 * nnz / seconds_per_op / 1e9


def spgemm_bytes(nnz_a: int, nnz_b: int, nnz_c: int, n_products: int,
                 val_bytes: int = 4, idx_bytes: int = 4) -> int:
    """Approximate minimum HBM traffic for C = A @ B (hash-style ideal):
    read A and B once, write C once, touch each intermediate product once."""
    per_nnz = val_bytes + idx_bytes
    return (nnz_a + nnz_b + nnz_c) * per_nnz + n_products * per_nnz


def spgemm_roofline_gflops(nnz_a: int, nnz_b: int, nnz_c: int,
                           n_products: int, val_bytes: int = 4,
                           idx_bytes: int = 4,
                           spec: ChipSpec | None = None) -> float:
    spec = spec or chip_specs()
    bytes_moved = spgemm_bytes(nnz_a, nnz_b, nnz_c, n_products, val_bytes,
                               idx_bytes)
    seconds = bytes_moved / (spec.hbm_gbps * 1e9)
    return 2.0 * n_products / seconds / 1e9
