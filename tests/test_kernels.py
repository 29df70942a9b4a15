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
    gather_from_flat,
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


def test_gather_from_flat(rng):
    s = 4096
    window = 256
    src = rng.standard_normal(s).astype(np.float32)
    n_tiles = 4
    base = (rng.integers(0, s // window, n_tiles) * window).astype(np.int32)
    idx = (
        base.repeat(8)[:, None] + rng.integers(0, window, (n_tiles * 8, 128))
    ).astype(np.int32)
    oth = rng.standard_normal((n_tiles * 8, 128)).astype(np.float32)
    out = np.asarray(
        gather_from_flat(
            jnp.asarray(src), jnp.asarray(base), jnp.asarray(idx), window,
            other=jnp.asarray(oth),
        )
    )
    np.testing.assert_allclose(out, src[idx] * oth, rtol=1e-6)


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


@pytest.mark.parametrize("force_pallas", [False, True])
def test_flat_gather_mixed(rng, force_pallas, monkeypatch):
    monkeypatch.setattr(fg, "FORCE_PALLAS", force_pallas)
    s = 8192
    src = rng.standard_normal(s).astype(np.float32)
    n = 5000
    idx = (rng.integers(0, 7, n) * 1024 + rng.integers(0, 900, n)).astype(
        np.int32
    )
    idx[1200:1300] = rng.integers(0, s, 100)  # wild tile -> fallback
    plan = build_flat_gather_plan(idx, window=1024)
    out = np.asarray(flat_gather(plan, jnp.asarray(src)))
    np.testing.assert_array_equal(out, src[idx])
    oth = rng.standard_normal(n).astype(np.float32)
    out2 = np.asarray(flat_gather(plan, jnp.asarray(src), jnp.asarray(oth)))
    np.testing.assert_allclose(out2, src[idx] * oth, rtol=1e-6)


def test_flat_gather_all_fallback(rng):
    src = rng.standard_normal(4096).astype(np.float32)
    idx = rng.integers(0, 4096, 2048).astype(np.int32)
    plan = build_flat_gather_plan(idx, window=128)
    out = np.asarray(flat_gather(plan, jnp.asarray(src)))
    np.testing.assert_array_equal(out, src[idx])
