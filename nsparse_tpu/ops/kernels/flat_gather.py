"""Planned flat gather: windowed Pallas fast path + XLA fallback tiles.

The host planner inspects the (static) gather indices tile by tile: tiles
whose indices fit one ``window``-aligned window take the roll-scan Pallas
kernel (``gather_from_flat``, ~20x XLA's gather); the rest fall back to
XLA's general gather and are patched in with a tile-granular scatter.

This is the direct TPU analog of the reference's bin dispatch: rows whose
hash tables fit shared memory take the fast kernels, the rest fail over to
global-memory tables (``set_row_nz_bin_each_gl``,
``kernel_spgemm_hash_template.cu:545-611``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsparse_tpu.ops.kernels.gather_pallas import (
    LANES,
    gather_from_flat,
    scatter_tiles,
)

TILE_ROWS = 8
TILE = TILE_ROWS * LANES  # 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatGatherPlan:
    """Precomputed routing for ``flat_gather`` over a fixed index array.

    Attributes:
      idx2d: (T, 128) int32 — indices, fallback tiles zeroed (in-bounds).
      bases: (T // 8,) int32 — window-aligned base per tile (0 for fallback).
      fb_ids: (n_fb,) int32 — tile ids taking the XLA fallback.
      fb_idx: (n_fb * 8, 128) int32 — their true indices.
      window: static window width (multiple of 128).
      n: static true index count (idx flattened length before padding).
    """

    idx2d: jax.Array
    bases: jax.Array
    fb_ids: jax.Array
    fb_idx: jax.Array
    window: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return int(self.bases.shape[0])

    @property
    def fallback_frac(self) -> float:
        return self.fb_ids.shape[0] / max(self.n_tiles, 1)


def build_flat_gather_plan(
    idx: np.ndarray, window: int = 1024
) -> FlatGatherPlan:
    """Host-side: classify (8, 128) tiles of ``idx`` by window fit."""
    assert window % LANES == 0
    idx = np.asarray(idx, dtype=np.int32).reshape(-1)
    n = idx.size
    np_pad = _round_up(max(n, 1), TILE)
    idxp = np.zeros(np_pad, dtype=np.int32)
    idxp[:n] = idx
    if n:
        idxp[n:] = idx[n - 1]  # pad with a valid index
    t3 = idxp.reshape(-1, TILE_ROWS, LANES)
    lo = t3.min(axis=(1, 2))
    hi = t3.max(axis=(1, 2))
    base_cand = (lo // LANES) * LANES  # 128-aligned window start
    ok = hi < base_cand + window
    bases = np.where(ok, base_cand, 0).astype(np.int32)
    fb_ids = np.nonzero(~ok)[0].astype(np.int32)
    fb_idx = t3[~ok].reshape(-1, LANES)
    safe = t3.copy()
    safe[~ok] = 0
    return FlatGatherPlan(
        idx2d=jnp.asarray(safe.reshape(-1, LANES)),
        bases=jnp.asarray(bases),
        fb_ids=jnp.asarray(fb_ids),
        fb_idx=jnp.asarray(fb_idx if fb_idx.size else fb_idx.reshape(0, LANES)),
        window=window,
        n=n,
    )


FORCE_PALLAS = False  # tests set this to exercise the kernels off-TPU


def _fb_rows(plan: "FlatGatherPlan") -> jax.Array:
    """Flat element indices covered by fallback tiles."""
    rows = (
        plan.fb_ids[:, None] * TILE_ROWS
        + jnp.arange(TILE_ROWS, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    return (
        rows[:, None] * LANES + jnp.arange(LANES, dtype=jnp.int32)[None, :]
    ).reshape(-1)


def flat_gather(
    plan: FlatGatherPlan, src: jax.Array, other: jax.Array | None = None
) -> jax.Array:
    """out[i] = src[idx[i]] (optionally * other[i]); returns flat (n,).

    ``other``, when given, must be flat of length >= plan padded size or
    exactly plan.n (it is padded with zeros).
    """
    if jax.default_backend() != "tpu" and not FORCE_PALLAS:
        # off-TPU the roll-scan has no hardware to exploit (and interpret
        # mode is orders of magnitude slower) — XLA's gather is the fast path
        full = plan.idx2d.reshape(-1)
        if int(plan.fb_ids.shape[0]):
            full = full.at[_fb_rows(plan)].set(plan.fb_idx.reshape(-1))
        out = src[full][: plan.n]
        if other is not None:
            out = out * other[: plan.n]
        return out
    t = plan.idx2d.shape[0]
    src_p = jnp.pad(
        src, (0, _round_up(int(src.shape[0]), 1024) + 2048 - int(src.shape[0]))
    )
    oth2d = None
    if other is not None:
        pad = t * LANES - int(other.shape[0])
        oth2d = jnp.pad(other, (0, pad)).reshape(t, LANES)
    out = gather_from_flat(
        src_p, plan.bases, plan.idx2d, plan.window,
        tile_rows=TILE_ROWS, other=oth2d,
    )
    if int(plan.fb_ids.shape[0]):
        fb_vals = src_p[plan.fb_idx]
        if oth2d is not None:
            rows = (
                plan.fb_ids[:, None] * TILE_ROWS
                + jnp.arange(TILE_ROWS, dtype=jnp.int32)[None, :]
            ).reshape(-1)
            fb_vals = fb_vals * jnp.take(oth2d, rows, axis=0)
        out = scatter_tiles(out, plan.fb_ids, fb_vals, tile_rows=TILE_ROWS)
    return out.reshape(-1)[: plan.n]
