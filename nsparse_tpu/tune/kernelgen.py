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
# table in spgemm_hash_kernel_gen.c:40-44.  vmem is the per-core Pallas
# working set (~16 MB on current TPUs), the budget every kernel geometry
# below is derived against.
CHIP_PARAMS = {
    # name: (vmem_bytes, lanes, sublanes, hbm_gbps, vpu_ops_per_cycle, mhz)
    "v5e": (16 * 2**20, 128, 8, 819, 4 * 8 * 128, 940),
    "v5p": (16 * 2**20, 128, 8, 2765, 4 * 8 * 128, 1750),
    "v4": (16 * 2**20, 128, 8, 1228, 4 * 8 * 128, 1050),
    "v6e": (16 * 2**20, 128, 8, 1600, 4 * 8 * 128, 940),
    "cpu": (16 * 2**20, 128, 8, 100, 4 * 8 * 128, 2000),
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
    # --- load-bearing kernel geometry (the reference generator's committed
    # bin/table/TB analog, spgemm_hash_kernel_gen.c:40-95).  Derivations in
    # derive(); consumed at import by ops/kernels/{runcopy,piecewise}.py
    # and ops/spgemm_window.py.
    win_min: int = 1024            # smallest window-arena width (slots)
    n_win_classes: int = 6         # widths win_min << j
    bank_k: int = 16               # pre-rolled B-table copies
    bank_rows_max: int = 1600      # bank rows cap (VMEM share)
    pw_j_classes: Tuple[int, ...] = (2, 4, 8, 16, 32, 64, 128)
    runcopy_spans: Tuple[int, ...] = (80, 384)     # span-class block rows
    runcopy_span_lcm: int = 1920
    runcopy_fixed_classes: Tuple[tuple, ...] = ()  # see runcopy.py


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

    # --- window-arena ladder (ops/spgemm_window.py) ---------------------
    # Smallest width = one (sublanes, lanes) vreg worth of slots: the
    # split-Benes outer stages move whole vregs, so narrower windows waste
    # lane occupancy.
    win_min = sublanes * lanes
    # Widest width: the fused per-class kernel co-residences the B-value
    # bank (bank cap below, ~13/16 of VMEM) with ~10 W-slot f32/i32
    # buffers (expansion scratch, fold pyramid ~2W, 4 mask planes, entry
    # scratch, output), double-buffered by the pipeline: W_MAX =
    # pow2_floor((vmem - bank_cap) / (10 * 4 B * 2)).
    bank_k = lanes // sublanes  # one copy per sublane phase of a lane row
    bank_cap = 13 * vmem // 16
    bank_rows_max = bank_cap // (bank_k * lanes * 4)
    bank_rows_max -= bank_rows_max % 160  # span-bucket granularity
    w_max = 1
    while w_max * 2 * 10 * 4 * 2 <= vmem - bank_cap:
        w_max *= 2
    n_win_classes = max((w_max // win_min).bit_length(), 1)

    # piecewise expansion budgets: pow2 pieces per 1024-slot subtile, up
    # to one piece per lane column
    pw_j = []
    j = 2
    while j <= lanes:
        pw_j.append(j)
        j *= 2

    # run-copy span buckets (rows of the one-DMA-pair source block): a
    # small bucket ~10 sublane rows (most extraction steps span < 2
    # windows) and a big one grown from 3 * sublanes while the
    # double-buffered block pair stays within vmem / 16.
    span_small = 10 * sublanes
    span_big = 3 * sublanes
    while span_big * 2 * lanes * 4 * 2 * 2 <= vmem // 16:
        span_big *= 2
    import math

    span_lcm = math.lcm(span_small, span_big, 2 * sublanes)

    # fixed-destination class ladder (runcopy CLASS_LIST_FIXED): stream
    # counts S x block rows R in measured preference order (tight blocks
    # first within equal stream counts), filtered by scratch budget
    # S * R * 2 blocks * lanes * 4 B <= vmem / 12; then the unaligned
    # per-piece classes as fallbacks.
    # J (pieces unrolled per subtile) ascends OUTERMOST: the kernel's
    # select count is 8*J per step, and measured merges live at ~1.4
    # pieces/subtile, so a low-J class that fits is ~J/8 the VPU work of
    # the full-width one.  Within equal J, prefer the better DMA shapes.
    fixed = []
    for J in (2, 4, sublanes):
        for S, R in ((1, 20 * sublanes), (sublanes, 2 * sublanes),
                     (sublanes, 5 * sublanes), (2 * sublanes, 2 * sublanes),
                     (sublanes, 20 * sublanes)):
            if S * R * 2 * lanes * 4 <= vmem // 12:
                fixed.append(("mspan", S, R, J))
    fixed += [("ualign", 2, sublanes), ("ualign", sublanes, 2),
              ("ualign", 2 * sublanes, 1)]

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
        win_min=win_min,
        n_win_classes=n_win_classes,
        bank_k=bank_k,
        bank_rows_max=int(bank_rows_max),
        pw_j_classes=tuple(pw_j),
        runcopy_spans=(span_small, span_big),
        runcopy_span_lcm=int(span_lcm),
        runcopy_fixed_classes=tuple(fixed),
    )


def plan_chip() -> str:
    """Chip whose geometry plan builders must use: ``NSPARSE_CHIP``
    overrides; ``NSPARSE_PLAN_TARGET=tpu`` (host-side build for a TPU
    consumer, see runcopy._build_for_tpu) targets the default TPU; else
    the detected device."""
    env = os.environ.get("NSPARSE_CHIP", "").lower()
    if env in CHIP_PARAMS:
        return env
    if os.environ.get("NSPARSE_PLAN_TARGET", "").lower() == "tpu":
        return "v5e"
    return detect_chip()


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
