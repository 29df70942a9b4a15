"""Distributed fused-window SpGEMM on the virtual CPU mesh.

Round-4 review: ``parallel/spgemm_window.py`` shipped unwired and crashed
on first use (shard_map x pallas vma).  These tests run the stacked-plan
SPMD numeric end to end: basic, uneven shards (empty/light tails),
fallback rows (hub columns), value-only plan reuse, and the device-side
R·A·P chain that must not materialize A·P on the host between products.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsparse_tpu.formats.csr import CSR
from nsparse_tpu.io.generate import rmat_csr, random_csr, stencil_csr
from nsparse_tpu.parallel.mesh import make_mesh
from nsparse_tpu.parallel.partition import partition_rows
from nsparse_tpu.parallel.spgemm import (
    gather_partitioned,
    rap_dist,
    rap_dist_parts,
)
from nsparse_tpu.parallel.spgemm_window import (
    spgemm_numeric_dist_window,
    spgemm_plan_dist_window,
)
from nsparse_tpu.utils.checking import (
    check_spgemm_answer,
    spgemm_abs_oracle,
    spgemm_oracle,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs multi-device mesh"
)


def _run(a, n_shards=4):
    mesh = make_mesh(n_shards)
    ap = partition_rows(a, n_shards)
    dp = spgemm_plan_dist_window(ap, a)
    c = spgemm_numeric_dist_window(dp, ap, a, mesh)
    got = gather_partitioned(c)
    ok = check_spgemm_answer(
        got, spgemm_oracle(a, a), verbose=True,
        abs_ref=spgemm_abs_oracle(a, a),
    )
    return ok, dp, ap, mesh


def test_dist_window_basic():
    a = rmat_csr(9, edge_factor=6, dtype=np.float32, seed=3)
    ok, _, _, _ = _run(a)
    assert ok


def test_dist_window_uneven_shards():
    # 100 rows over 4 shards: the last shard is row-padded, and the
    # skewed density leaves some shards window-light
    a = random_csr(100, 100, 0.15, seed=11)
    ok, _, _, _ = _run(a)
    assert ok


def test_dist_window_fallback_rows():
    # a dense hub column block forces heavyweight rows into the
    # fallback (segmented-scan side channel) on some shards
    rng = np.random.default_rng(5)
    import scipy.sparse as sp

    base = sp.random(128, 128, 0.1, random_state=7, format="lil")
    base[3, :] = rng.standard_normal(128)      # heavy row
    base[:, 5] = rng.standard_normal(128)[:, None]  # hub column
    a = CSR.from_scipy(sp.csr_matrix(base).astype(np.float32))
    ok, _, _, _ = _run(a)
    assert ok


def test_dist_window_plan_reuse():
    a = rmat_csr(9, edge_factor=6, dtype=np.float32, seed=4)
    ok, dp, ap, mesh = _run(a)
    assert ok
    # new values, same pattern: numeric-only rerun on the stacked plan
    rng = np.random.default_rng(9)
    new_val = np.asarray(ap.val).copy()
    mask = new_val != 0
    new_val[mask] = rng.uniform(0.5, 1.5, int(mask.sum()))
    ap2 = dataclasses.replace(ap, val=jnp.asarray(new_val))
    a2 = gather_partitioned(ap2)
    c2 = spgemm_numeric_dist_window(dp, ap2, a2, mesh)
    got2 = gather_partitioned(c2)
    assert check_spgemm_answer(
        got2, spgemm_oracle(a2, a2), verbose=True,
        abs_ref=spgemm_abs_oracle(a2, a2),
    )


@pytest.mark.parametrize("numeric", ["esc", "window"])
def test_rap_dist_no_host_roundtrip(monkeypatch, numeric):
    """The A·P intermediate must stay on device: gather_partitioned (the
    host materialization) must NOT run inside rap_dist_parts."""
    import nsparse_tpu.parallel.spgemm as ps

    def _boom(*a, **k):
        raise AssertionError("A·P materialized on host mid-R·A·P")

    monkeypatch.setattr(ps, "gather_partitioned", _boom)
    mesh = make_mesh(4)
    n, nc = 64, 24
    a = stencil_csr(8, 8)
    rng = np.random.default_rng(8)
    import scipy.sparse as sp

    p_dense = np.zeros((n, nc))
    p_dense[np.arange(n), rng.integers(0, nc, n)] = 1.0
    p = CSR.from_scipy(sp.csr_matrix(p_dense))
    r = CSR.from_scipy(sp.csr_matrix(p_dense.T))
    parts = rap_dist_parts(r, a, p, mesh, numeric=numeric)
    monkeypatch.undo()
    got = gather_partitioned(parts)
    ref = (r.to_scipy() @ a.to_scipy() @ p.to_scipy()).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    assert check_spgemm_answer(got, ref, verbose=True)
