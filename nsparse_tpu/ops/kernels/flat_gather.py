"""Planned flat gather: banded / windowed Pallas fast paths + XLA fallback.

The host planner inspects the (static) gather indices tile by tile and
routes each (8, 128) tile to the cheapest eligible kernel class:

- ``("band", D)``: ``idx - position`` spans < D — quasi-diagonal access (the
  SELL/banded-matrix case, identity-like permutations).  Cost O(D)
  regardless of how far the tile strides.  D == 1 is a pure shifted copy.
- ``("win", W)``: ``idx`` spans < W — localized random access (e.g. the
  row-local A-value expansion of SpGEMM).  Cost O(W).
- fallback: XLA's general gather, patched in tile-granularly.

This is the direct TPU analog of the reference's bin dispatch: rows whose
hash tables fit shared memory take the fast kernels sized to them, the rest
fail over to global-memory tables (``set_row_nz_bin_each_gl``,
``kernel_spgemm_hash_template.cu:545-611``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsparse_tpu.ops.kernels.gather_pallas import (
    BAND_TILE_ROWS,
    LANES,
    TILE,
    TILE_ROWS,
    WIN_SUB,
    gather_subset_band,
    gather_subset_window,
    scatter_tiles,
)

SUPER = BAND_TILE_ROWS * LANES  # banded supertile: 16384 elements

# Class ladders come from the chip kernel config (tune/kernelgen.py);
# banded classes route (BAND_TILE_ROWS, 128) supertiles (coarse tiles
# amortize grid-step DMA setup; the d-span bound tolerates them), window
# classes route (8, 128) tiles (index locality is local).
FORCE_PALLAS = False  # tests set this to exercise the kernels off-TPU


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatGatherPlan:
    """Precomputed routing for ``flat_gather`` over a fixed index array.

    Attributes:
      idx2d: (T, 128) int32 — indices (tail padded with the last valid one).
      ids: per-class tile-id arrays (parallel to ``classes``).
      bases: per-class base arrays.
      fb_ids: tile subset taking XLA's gather.
      classes: static tuple of (kind, param) per subset.
      n: static true index count.
    """

    idx2d: jax.Array
    ids: Tuple[jax.Array, ...]
    bases: Tuple[jax.Array, ...]
    fb_ids: jax.Array
    classes: Tuple[Tuple[str, int], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return int(self.idx2d.shape[0]) // TILE_ROWS

    @property
    def fallback_frac(self) -> float:
        return int(self.fb_ids.shape[0]) / max(self.n_tiles, 1)

    @property
    def class_fracs(self):
        t = max(self.n_tiles, 1)
        tiles_per_super = SUPER // TILE
        out = {}
        for (k, p), i in zip(self.classes, self.ids):
            mult = tiles_per_super if k == "band" else WIN_SUB
            out[f"{k}{p}"] = int(i.shape[0]) * mult / t
        out["fallback"] = int(self.fb_ids.shape[0]) / t
        return out


def build_flat_gather_plan(
    idx: np.ndarray, classes=None, window: int | None = None
) -> FlatGatherPlan:
    """Host-side: route each (8, 128) tile of ``idx`` to its cheapest class.

    ``classes`` defaults to the chip's generated kernel config (see
    ``nsparse_tpu.tune.kernelgen``).  ``window`` is accepted for backwards
    compatibility and ignored (the class list subsumes it).
    """
    del window
    if classes is None:
        from nsparse_tpu.tune.kernelgen import kernel_config

        classes = kernel_config().gather_classes
    for kind, param in classes:
        # the roll-scan kernel scans groups of 128 lanes; windows below 128
        # or not a multiple of 128 would silently drop gathers
        if kind != "band" and (param < LANES or param % LANES):
            raise ValueError(
                f"window class {param} must be a multiple of {LANES}"
            )
    idx = np.asarray(idx, dtype=np.int32).reshape(-1)
    n = idx.size
    np_pad = _round_up(max(n, 1), SUPER)
    idxp = np.full(np_pad, -1, dtype=np.int32)
    idxp[:n] = idx

    # sentinel slots (idx == -1) contribute zero: excluded from the span
    # analysis here; the roll-scan kernels produce 0 for them (no shift
    # matches) and the fallback path masks them.
    valid = (np.arange(np_pad, dtype=np.int64) < n) & (idxp >= 0)

    def masked_span(arr2d, mask2d):
        big = np.int64(1) << 60
        lo = np.where(mask2d, arr2d, big).min(axis=1)
        hi = np.where(mask2d, arr2d, -big).max(axis=1)
        return lo, hi

    # band classes at supertile granularity: d = idx - flat position
    # (pad slots are excluded from the span; their gathered value is never
    # selected — d matches no shift — and gets sliced off anyway)
    s2 = idxp.reshape(-1, SUPER).astype(np.int64)
    v2 = valid.reshape(-1, SUPER)
    n_super = s2.shape[0]
    p_super = np.arange(SUPER, dtype=np.int64)[None, :]
    dlo, dhi = masked_span(s2 - p_super, v2)
    any_valid_super = v2.any(axis=1)

    super_assigned = ~any_valid_super  # fully-pad supertiles: skip entirely
    ids, bases = [], []
    band_classes = [(k, p) for k, p in classes if k == "band"]
    win_classes = [(k, p) for k, p in classes if k != "band"]
    for _, param in band_classes:
        ok = (
            (~super_assigned)
            & any_valid_super
            & (dhi - dlo < param)
            & (dlo >= 0)
        )
        super_assigned |= ok
        ids.append(jnp.asarray(np.nonzero(ok)[0].astype(np.int32)))
        bases.append(jnp.asarray(dlo[ok].astype(np.int32)))

    # window classes at WIN_SUB-tile supertile granularity (batched grid
    # steps amortize the ~1us/step cost); every subtile carries its own
    # base, and a supertile qualifies for the smallest class covering ALL
    # its valid subtiles
    t3 = idxp.reshape(-1, TILE).astype(np.int64)
    v3 = valid.reshape(-1, TILE)
    tiles_per_super = SUPER // TILE
    tile_open = np.repeat(~super_assigned & any_valid_super, tiles_per_super)
    tile_has = v3.any(axis=1)
    lo, hi = masked_span(t3, v3)
    span = np.where(tile_has, hi - lo, 0)
    base_tile = np.where(tile_has, lo, 0).astype(np.int64)

    ws2 = span.reshape(-1, WIN_SUB)
    wopen2 = tile_open.reshape(-1, WIN_SUB)
    whas2 = tile_has.reshape(-1, WIN_SUB)
    # band routing is 16-tile granular and WIN_SUB divides that, so
    # open-ness is uniform within a window supertile; content-free
    # subtiles ride along (their sentinel indices yield zeros)
    w_open = wopen2.any(axis=1) & whas2.any(axis=1)
    w_span = np.where(whas2, ws2, 0).max(axis=1)
    w_assigned = ~w_open
    for _, param in win_classes:
        ok = (~w_assigned) & (w_span < param)
        w_assigned |= ok
        sids = np.nonzero(ok)[0].astype(np.int32)
        ids.append(jnp.asarray(sids))
        bases.append(
            jnp.asarray(
                base_tile.reshape(-1, WIN_SUB)[ok].reshape(-1).astype(
                    np.int32
                )
            )
        )
    # tiles not covered by any class take XLA's gather
    covered = np.repeat(w_assigned & w_open, WIN_SUB) | ~tile_open
    fb_ids = np.nonzero(~covered & tile_has)[0].astype(np.int32)

    ordered = tuple(band_classes) + tuple(win_classes)
    return FlatGatherPlan(
        idx2d=jnp.asarray(idxp.reshape(-1, LANES).astype(np.int32)),
        ids=tuple(ids),
        bases=tuple(bases),
        fb_ids=jnp.asarray(fb_ids),
        classes=tuple((k, int(p)) for k, p in ordered),
        n=n,
    )


def flat_gather(
    plan: FlatGatherPlan, src: jax.Array, other: jax.Array | None = None
) -> jax.Array:
    """out[i] = src[idx[i]] (optionally * other[i]); returns flat (n,)."""
    t = plan.idx2d.shape[0]
    on_tpu = FORCE_PALLAS or jax.default_backend() == "tpu"
    if src.dtype == jnp.float64 and on_tpu:
        # pure movement: ride the f32-width kernels as two uint32 bit
        # planes (ops/kernels/planes.py); the optional multiply happens
        # in XLA f64 afterwards
        from nsparse_tpu.ops.kernels import planes

        out = planes.moved(lambda p: flat_gather(plan, p), src)
        if other is not None:
            out = out * other[: plan.n].astype(out.dtype)
        return out
    use_pallas = on_tpu and src.dtype in (
        jnp.float32, jnp.int32, jnp.uint32
    )
    if not use_pallas:
        # off-TPU, or f64 (pallas custom calls cannot carry f64 on TPU);
        # sentinel indices (-1) contribute zero
        flat_idx = plan.idx2d.reshape(-1)
        out = jnp.where(
            flat_idx >= 0, src[jnp.clip(flat_idx, 0)], 0
        )[: plan.n].astype(src.dtype)
        if other is not None:
            out = out * other[: plan.n]
        return out

    # pad src so every source block the kernels touch is in range: the
    # banded kernel DMAs 4 x (64,128) blocks starting at base//8192, i.e.
    # up to base + 32768 elements past the window start
    pad = (
        _round_up(int(src.shape[0]), 8192) + 4 * 8192 - int(src.shape[0])
    )
    src_p = jnp.pad(src, (0, pad))
    src2 = src_p.reshape(-1, LANES)
    oth2d = None
    if other is not None:
        opad = t * LANES - int(other.shape[0])
        oth2d = jnp.pad(other, (0, opad)).reshape(t, LANES)

    # scalar-prefetch operands live in SMEM (~1 MB); chunk large subsets
    max_tiles = 65536
    out = jnp.zeros((t, LANES), src.dtype)
    for (kind, param), ids, bases in zip(plan.classes, plan.ids, plan.bases):
        n_sub = int(ids.shape[0])
        if not n_sub:
            continue
        if kind == "band":
            for s in range(0, n_sub, max_tiles):
                out = gather_subset_band(
                    src2, ids[s : s + max_tiles], bases[s : s + max_tiles],
                    plan.idx2d, oth2d, out, param,
                )
        else:
            for s in range(0, n_sub, max_tiles):
                out = gather_subset_window(
                    src2, ids[s : s + max_tiles],
                    bases[s * WIN_SUB : (s + max_tiles) * WIN_SUB],
                    plan.idx2d, oth2d, out, param,
                )
    if int(plan.fb_ids.shape[0]):
        rows = (
            plan.fb_ids[:, None] * TILE_ROWS
            + jnp.arange(TILE_ROWS, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        fb_idx = jnp.take(plan.idx2d, rows, axis=0)
        fb_vals = jnp.where(
            fb_idx >= 0, src_p[jnp.clip(fb_idx, 0)], 0
        ).astype(src.dtype)
        if oth2d is not None:
            fb_vals = fb_vals * jnp.take(oth2d, rows, axis=0)
        out = scatter_tiles(out, plan.fb_ids, fb_vals, tile_rows=TILE_ROWS)
    return out.reshape(-1)[: plan.n]
