"""Pallas kernel tests (interpret mode on the CPU mesh) + flat_gather."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nsparse_tpu.ops.kernels import flat_gather as fg
from nsparse_tpu.ops.kernels.flat_gather import (
    build_flat_gather_plan,
    flat_gather,
)
from nsparse_tpu.ops.kernels.gather_pallas import (
    scatter_tiles,
    windowed_gather,
)


@pytest.mark.parametrize("window", [32, 128, 256])
def test_windowed_gather(rng, window):
    t = 16
    wl = max(window, 128)
    win = rng.standard_normal((t, wl)).astype(np.float32)
    idx = rng.integers(0, window, (t, 128)).astype(np.int32)
    out = np.asarray(
        windowed_gather(jnp.asarray(win), jnp.asarray(idx), window, tile_rows=8)
    )
    np.testing.assert_array_equal(out, np.take_along_axis(win, idx, 1))


def test_scatter_tiles(rng):
    dst = rng.standard_normal((32, 128)).astype(np.float32)
    vals = rng.standard_normal((2, 8, 128)).astype(np.float32)
    ids = np.array([1, 3], np.int32)
    out = np.asarray(
        scatter_tiles(jnp.asarray(dst.copy()), jnp.asarray(ids),
                      jnp.asarray(vals))
    )
    want = dst.copy()
    want[8:16] = vals[0]
    want[24:32] = vals[1]
    np.testing.assert_array_equal(out, want)


def _mixed_indices(rng, s, n):
    """Indices mixing banded, windowed, and wild tiles.

    The banded region must span whole supertiles (16384 elements) since the
    banded class routes at supertile granularity."""
    idx = np.empty(n, dtype=np.int32)
    nb = 16384  # supertile-aligned so the next region is tile-aligned
    idx[:nb] = np.arange(nb) + rng.integers(0, 100, nb) + 7
    # windowed region: random within one 1024 window per 1024-tile
    nw = 10240
    idx[nb : nb + nw] = (
        (rng.integers(0, 8, nw // 1024).repeat(1024)) * 2048
        + rng.integers(0, 1000, nw)
    )
    # wild region
    idx[nb + nw :] = rng.integers(0, s, n - nb - nw)
    return np.minimum(idx, s - 1)


@pytest.mark.parametrize("force_pallas", [False, True])
def test_flat_gather_mixed(rng, force_pallas, monkeypatch):
    monkeypatch.setattr(fg, "FORCE_PALLAS", force_pallas)
    s = 40000
    src = rng.standard_normal(s).astype(np.float32)
    n = 36000
    idx = _mixed_indices(rng, s, n)
    plan = build_flat_gather_plan(idx)
    if force_pallas:
        fr = plan.class_fracs
        assert sum(v for k, v in fr.items() if k.startswith("band")) > 0, fr
        assert sum(v for k, v in fr.items() if k.startswith("win")) > 0, fr
        assert fr["fallback"] > 0, fr
    out = np.asarray(flat_gather(plan, jnp.asarray(src)))
    np.testing.assert_array_equal(out, src[idx])
    oth = rng.standard_normal(n).astype(np.float32)
    out2 = np.asarray(flat_gather(plan, jnp.asarray(src), jnp.asarray(oth)))
    np.testing.assert_allclose(out2, src[idx] * oth, rtol=1e-6)


@pytest.mark.parametrize("force_pallas", [False, True])
def test_flat_gather_identity(rng, force_pallas, monkeypatch):
    monkeypatch.setattr(fg, "FORCE_PALLAS", force_pallas)
    n = 4096
    src = rng.standard_normal(n + 64).astype(np.float32)
    idx = np.arange(n, dtype=np.int32) + 3
    plan = build_flat_gather_plan(idx)
    if force_pallas:
        assert plan.class_fracs["band1"] == 1.0
    out = np.asarray(flat_gather(plan, jnp.asarray(src)))
    np.testing.assert_array_equal(out, src[idx])


def test_flat_gather_all_fallback(rng):
    src = rng.standard_normal(65536).astype(np.float32)
    idx = rng.integers(0, 65536, 2048).astype(np.int32)
    plan = build_flat_gather_plan(idx)
    out = np.asarray(flat_gather(plan, jnp.asarray(src)))
    np.testing.assert_array_equal(out, src[idx])
