"""Planned-shuffle primitive: slack-Clos routing + Benes stage kernels.

The router lives in native/shuffle.cpp; the device stages in
ops/kernels/shuffle_pallas.py (run here in pallas interpret mode on the
forced-CPU backend).  This is the TPU substitute for the reference's
Thrust sort_by_key data movement
(cuda-c/src/kernel/kernel_spgemm_hash_template.cu:805-815).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nsparse_tpu.native import benes_route, clos_route_slack, get_lib
import nsparse_tpu.ops.kernels.shuffle_pallas as sp

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native router unavailable"
)


def _benes_dists(w_width):
    w = w_width.bit_length() - 1
    return [w_width >> (t + 1) for t in range(w)] + [
        1 << (t + 1) for t in range(w - 1)
    ]


def _apply_benes_np(x, mask, width):
    idx = np.arange(width)
    for t, d in enumerate(_benes_dists(width)):
        bit = (mask >> t) & 1
        x = np.where(bit == 1, x[idx ^ d], x)
    return x


def test_benes_route_random_widths():
    rng = np.random.default_rng(0)
    for width in (2, 8, 64, 256, 1024):
        for _ in range(5):
            perm = rng.permutation(width).astype(np.int32)
            mask = benes_route(perm, width)[0]
            out = _apply_benes_np(np.arange(width), mask, width)
            assert (out == np.arange(width)[perm]).all()


def test_benes_route_identity_regions():
    # identity tails exercise the fast path that must still localize
    # child sub-permutations (round-2 regression)
    rng = np.random.default_rng(1)
    width = 128
    perm = np.arange(width, dtype=np.int32)
    perm[:40] = rng.permutation(40)
    mask = benes_route(perm, width)[0]
    out = _apply_benes_np(np.arange(width), mask, width)
    assert (out == np.arange(width)[perm]).all()


def test_clos_route_slack_stages_compose():
    rng = np.random.default_rng(2)
    for r, cu, cs in ((128, 32, 64), (64, 512, 1024), (128, 96, 128)):
        n = r * cu
        src = rng.permutation(n).astype(np.int32)
        s1, s2, s3 = clos_route_slack(src, r, cu, cs)
        for s, width in ((s1, cs), (s2, r), (s3, cs)):
            assert (np.sort(s, axis=1) == np.arange(width)).all()
        x = np.arange(n, dtype=np.int64).reshape(r, cu)
        v = np.concatenate([x, np.full((r, cs - cu), -7, np.int64)], axis=1)
        y1 = np.take_along_axis(v, s1, axis=1)
        y3 = np.take_along_axis(y1.T.copy(), s2, axis=1)
        out = np.take_along_axis(y3.T.copy(), s3, axis=1)[:, :cu]
        assert (out.reshape(-1) == np.arange(n)[src]).all()


def test_planned_shuffle_end_to_end(monkeypatch):
    monkeypatch.setattr(sp, "_FALLBACK_N", 1)
    monkeypatch.setattr(sp, "_CPU_GATHER", False)
    rng = np.random.default_rng(3)
    for n, cu in ((128 * 128, 128), (128 * 128 - 37, 128), (200000, 192)):
        src = rng.permutation(n).astype(np.int32)
        plan = sp.build_shuffle_plan(src, cu=cu)
        assert not plan.uses_fallback
        x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        out = np.asarray(jax.jit(sp.planned_shuffle)(plan, x))
        np.testing.assert_array_equal(out, np.asarray(x)[src])


def test_planned_shuffle_repair_path(monkeypatch):
    # occupancy > 0.5 exercises Paull rearrangement in the router
    monkeypatch.setattr(sp, "_FALLBACK_N", 1)
    monkeypatch.setattr(sp, "_CPU_GATHER", False)
    rng = np.random.default_rng(4)
    n = 128 * 1500  # cu=1500, cs=2048 -> occ 0.73
    src = rng.permutation(n).astype(np.int32)
    plan = sp.build_shuffle_plan(src)
    assert not plan.uses_fallback and plan.cu > plan.cs // 2
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    out = np.asarray(jax.jit(sp.planned_shuffle)(plan, x))
    np.testing.assert_array_equal(out, np.asarray(x)[src])


def test_planned_shuffle_fallback_small():
    src = np.random.default_rng(5).permutation(512).astype(np.int32)
    plan = sp.build_shuffle_plan(src)
    assert plan.uses_fallback
    x = jnp.arange(512, dtype=jnp.float32)
    out = np.asarray(sp.planned_shuffle(plan, x))
    np.testing.assert_array_equal(out, np.arange(512)[src])


def test_tile_benes_batch(monkeypatch):
    """Independent per-tile permutations via one Benes pass (the
    row-localized arena shuffle)."""
    monkeypatch.setattr(sp, "_FALLBACK_N", 1)
    monkeypatch.setattr(sp, "_CPU_GATHER", False)
    rng = np.random.default_rng(7)
    for width, n_tiles in ((512, 32), (2048, 8), (16384, 1)):
        n = width * n_tiles
        perms = np.concatenate(
            [rng.permutation(width) for _ in range(n_tiles)]
        ).astype(np.int32)
        plan = sp.build_tile_benes(perms, width, force=True)
        assert not plan.uses_fallback, (width, n_tiles)
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        out = np.asarray(jax.jit(sp.tile_benes_apply)(plan, x))
        ref = np.asarray(x).reshape(n_tiles, width)
        ref = np.take_along_axis(
            ref, perms.reshape(n_tiles, width), axis=1
        ).reshape(-1)
        np.testing.assert_array_equal(out, ref)


def test_tile_benes_fallback_small():
    perms = np.concatenate(
        [np.random.default_rng(1).permutation(256) for _ in range(2)]
    )
    plan = sp.build_tile_benes(perms, 256)
    assert plan.uses_fallback
    x = jnp.arange(512, dtype=jnp.float32)
    out = np.asarray(sp.tile_benes_apply(plan, x))
    ref = np.asarray(x).reshape(2, 256)
    ref = np.take_along_axis(ref, perms.reshape(2, 256), axis=1).reshape(-1)
    np.testing.assert_array_equal(out, ref)
