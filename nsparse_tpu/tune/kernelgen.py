"""Kernel-config generator — the TPU analog of the reference's kernel
generators (``cuda-c/src/kernel/spgemm_hash_kernel_gen.c:14-318`` and
``amb_kernel_gen.sh``).

The reference derives, from five GPU hardware parameters (shared memory per
block / per SM, max threads per block / per SM, blocks per SM), the number
of SpGEMM bins, each bin's hash-table size and thread-block geometry, and
emits the tuned kernel source that gets committed.  The TPU equivalent
derives, from the chip's vector geometry and memory system, the gather
class ladder (band/window parameters), tile geometry, and format defaults —
and can emit a generated config module (the committed-artifact workflow of
the reference) or serve the derivation at runtime.

Usage::

    python -m nsparse_tpu.tune.kernelgen            # emit for this chip
    python -m nsparse_tpu.tune.kernelgen --chip v5e # emit for a named chip

emits ``nsparse_tpu/tune/_generated_<chip>.py``; ``kernel_config()`` loads
the generated module when present, else derives on the fly.
"""

from __future__ import annotations

import dataclasses
import importlib
import os
from typing import Tuple

# Chip parameter table (public specs).  The reference keeps the same kind of
# table in spgemm_hash_kernel_gen.c:40-44.
CHIP_PARAMS = {
    # name: (vmem_bytes, lanes, sublanes, hbm_gbps, vpu_ops_per_cycle, mhz)
    "v5e": (128 * 2**20, 128, 8, 819, 4 * 8 * 128, 940),
    "v5p": (128 * 2**20, 128, 8, 2765, 4 * 8 * 128, 1750),
    "v4": (128 * 2**20, 128, 8, 1228, 4 * 8 * 128, 1050),
    "v6e": (128 * 2**20, 128, 8, 1600, 4 * 8 * 128, 940),
    "cpu": (128 * 2**20, 128, 8, 100, 4 * 8 * 128, 2000),
}


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Derived kernel parameters for one chip.

    Attributes:
      chip: chip name.
      gather_classes: cost-ordered (kind, param) ladder for the flat-gather
        planner (the analog of the reference's bin table-size ladder).
      band_tile_rows: supertile rows for the banded gather class.
      win_tile_rows: tile rows for the windowed gather class.
      ell_levels: geometric ELL slab width ladder.
      ell_sigma: default sigma sort window.
      bsr_blocks: candidate BSR tile shapes.
      spgemm_bins: number of geometric row bins (parity: BIN_NUM == 7).
    """

    chip: str
    gather_classes: Tuple[Tuple[str, int], ...]
    band_tile_rows: int
    win_tile_rows: int
    ell_levels: Tuple[int, ...]
    ell_sigma: int
    bsr_blocks: Tuple[Tuple[int, int], ...]
    spgemm_bins: int
    # SpGEMM path cost model (choose_spgemm_path): both sides are
    # bandwidth-derived, so they scale with the chip's HBM
    esc_ns_per_product: float = 15.0
    bsr_us_per_pair: float = 2.5
    bsr_bs: int = 256
    bsr_pairs_per_step: int = 1


def derive(chip: str = "v5e") -> KernelConfig:
    """Derive the config from chip parameters.

    Ladder construction mirrors the reference generator's logic
    (``spgemm_hash_kernel_gen.c:50-95``: largest table = biggest pow2 that
    fits shared memory, halving down to a floor): the largest *window* is
    the biggest span the roll-scan can cover while staying cheaper than
    XLA's fallback gather (~12 cycles/element measured), halving down; the
    banded ladder starts at 1 (pure aligned copy) because banded cost is
    O(D) in the *jitter*, not the stride.
    """
    vmem, lanes, sublanes, hbm, vpu_ops, mhz = CHIP_PARAMS[chip]

    # roll-scan costs ~4 VPU ops per (8,128) tile per window step; XLA's
    # scalar gather costs ~12 cycles/element.  Window W costs ~4*W/1024
    # ops/element -> break-even near W = 12/4 * 1024 / sublanes ... clamp to
    # the pow2 ladder [128, 1024].
    xla_gather_cycles = 12
    max_window = 128
    while (4 * max_window * 2) / (sublanes * lanes) < xla_gather_cycles:
        max_window *= 2
    max_window = min(max_window, 1024)

    # two window classes keep compile count down: a cheap one and the
    # break-even-sized one
    win_ladder = [("win", 128)]
    if max_window > 128:
        win_ladder.append(("win", max_window))

    band_ladder = [("band", 1), ("band", 16), ("band", 128)]

    # banded supertiles: large enough to amortize per-grid-step DMA setup
    # (~0.5 us) against HBM time; bounded by VMEM for the 2x-coverage DMA
    band_tile_rows = 128
    while band_tile_rows * lanes * 4 * 8 > vmem // 8:
        band_tile_rows //= 2

    # SpGEMM cost model, scaled from v5e measurements by bandwidth:
    # ESC numeric measured ~15 ns/intermediate product at 819 GB/s
    # (gather/shuffle-bound); the block path measured ~2.5 us per 256^3
    # block pair (dynamic-block DMA bound, ~25% of peak HBM on 512 KB
    # fetches).  Both are bandwidth-limited, so they scale with hbm.
    esc_ns = 15.0 * 819.0 / hbm
    bsr_bs = 2 * lanes  # 2x the MXU tile: same bytes, 4x fewer grid steps
    pair_bytes = 2 * bsr_bs * bsr_bs * 4
    bsr_us = pair_bytes / (0.25 * hbm * 1e9) * 1e6

    return KernelConfig(
        chip=chip,
        gather_classes=tuple(band_ladder + win_ladder),
        band_tile_rows=band_tile_rows,
        win_tile_rows=sublanes,
        ell_levels=tuple(sublanes * (1 << j) for j in range(8)),
        ell_sigma=1024,
        bsr_blocks=((sublanes, lanes), (sublanes, 2 * lanes)),
        spgemm_bins=7,
        esc_ns_per_product=round(esc_ns, 2),
        bsr_us_per_pair=round(bsr_us, 2),
        bsr_bs=bsr_bs,
        bsr_pairs_per_step=1,
    )


def _gen_path(chip: str) -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"_generated_{chip}.py"
    )


def emit(chip: str = "v5e") -> str:
    """Emit the generated config module (committed artifact, mirroring the
    reference's committed kernel_spgemm_hash_{s,d}.cu)."""
    cfg = derive(chip)
    path = _gen_path(chip)
    with open(path, "w") as f:
        f.write(
            '"""GENERATED by nsparse_tpu.tune.kernelgen — do not edit.\n\n'
            f"Kernel configuration derived for {chip} "
            "(analog of the reference's generated kernel sources).\n"
            '"""\n\n'
        )
        f.write("CONFIG = dict(\n")
        for field in dataclasses.fields(cfg):
            f.write(f"    {field.name}={getattr(cfg, field.name)!r},\n")
        f.write(")\n")
    return path


def detect_chip() -> str:
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return "cpu"
    for name in ("v6e", "v5p", "v5e", "v4"):
        if name in kind.replace(" lite", "e").replace("tpu ", "v"):
            return name
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "cpu" in kind or "interpreter" in kind:
        return "cpu"
    return "v5e"


import functools


@functools.lru_cache(maxsize=None)
def kernel_config(chip: str | None = None) -> KernelConfig:
    """Load the generated config for ``chip`` (or the detected one), falling
    back to on-the-fly derivation."""
    chip = chip or detect_chip()
    try:
        mod = importlib.import_module(
            f"nsparse_tpu.tune._generated_{chip}"
        )
        return KernelConfig(**mod.CONFIG)
    except (ImportError, TypeError):
        return derive(chip)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="nsparse_tpu.tune.kernelgen")
    ap.add_argument("--chip", default=None, choices=list(CHIP_PARAMS))
    args = ap.parse_args(argv)
    chip = args.chip or detect_chip()
    path = emit(chip)
    print(f"emitted {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
