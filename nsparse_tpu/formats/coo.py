"""COO container (host-constructed, device-resident pytree).

Plays the role of the reference's intermediate COO arrays in
``convert_file_csr`` (reference ``cuda-c/src/nsparse.cu:14-136``), but as a
first-class, jit-compatible format.  All arrays may be padded beyond ``nnz``
to a static capacity so shapes stay static under ``jax.jit``; padded slots
carry ``row == col == 0`` and ``val == 0`` so they are additive no-ops.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class COO:
    """Coordinate-format sparse matrix.

    ``row``/``col`` are int32, ``val`` any float dtype; all three share one
    padded length.  ``shape`` and ``nnz`` are static (Python ints) so they
    can steer trace-time control flow.
    """

    row: jax.Array
    col: jax.Array
    val: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.val.dtype

    @property
    def capacity(self) -> int:
        return int(self.val.shape[0])

    @classmethod
    def from_arrays(cls, row, col, val, shape, pad_to: int | None = None) -> "COO":
        row = np.asarray(row, dtype=np.int32)
        col = np.asarray(col, dtype=np.int32)
        val = np.asarray(val)
        nnz = int(row.shape[0])
        cap = int(pad_to) if pad_to is not None else nnz
        if cap < nnz:
            raise ValueError(f"pad_to={cap} < nnz={nnz}")
        pr = np.zeros(cap, dtype=np.int32)
        pc = np.zeros(cap, dtype=np.int32)
        pv = np.zeros(cap, dtype=val.dtype)
        pr[:nnz], pc[:nnz], pv[:nnz] = row, col, val
        return cls(
            row=jnp.asarray(pr),
            col=jnp.asarray(pc),
            val=jnp.asarray(pv),
            shape=(int(shape[0]), int(shape[1])),
            nnz=nnz,
        )

    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.nnz

    def to_dense(self) -> jax.Array:
        m, n = self.shape
        out = jnp.zeros((m, n), dtype=self.val.dtype)
        mask = self.valid_mask()
        return out.at[self.row, self.col].add(jnp.where(mask, self.val, 0))

    def to_scipy(self):
        import scipy.sparse as sp

        nnz = self.nnz
        return sp.coo_matrix(
            (
                np.asarray(self.val)[:nnz],
                (np.asarray(self.row)[:nnz], np.asarray(self.col)[:nnz]),
            ),
            shape=self.shape,
        )
