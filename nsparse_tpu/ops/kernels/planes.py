"""fp64 as two 32-bit planes through the movement kernels.

TPU Pallas custom calls cannot carry f64 operands, and XLA emulates f64
arithmetic — but every hot *movement* kernel in this package (flat
gather, routed Benes/Clos shuffles, run-copy, tile permutations) is a
pure PERMUTATION with zero-fill: it never does arithmetic on the values.
A permutation of f64 data is exactly the same permutation applied to its
two 32-bit halves.  So f64 rides the existing f32-width kernels as two
``uint32`` bit planes: bitcast -> de-interleave -> move each plane ->
re-interleave -> bitcast back.  Zero-filled slots combine to f64 +0.0
(both planes zero), preserving the "sentinel contributes zero" contract.

This is the TPU-native answer to the reference's double build
(``cuda-c/inc/nsparse.h:3-11`` compiles every kernel twice): movement is
dtype-width-agnostic, and the arithmetic that remains (products, fold
adds, segment reductions) runs in plain XLA f64 between movements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_f64(x: jax.Array) -> bool:
    return x.dtype == jnp.float64


def split(x: jax.Array):
    """(n,) f64 -> two (n,) uint32 bit planes (lo, hi)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)  # (n, 2)
    return u[..., 0], u[..., 1]


def combine(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Inverse of :func:`split`."""
    return jax.lax.bitcast_convert_type(
        jnp.stack([lo.astype(jnp.uint32), hi.astype(jnp.uint32)], axis=-1),
        jnp.float64,
    )


def moved(move, x: jax.Array) -> jax.Array:
    """Apply the pure-movement function ``move`` to f64 ``x`` via its two
    uint32 planes (``move`` must be value-semantics-free: permutation +
    zero fill only)."""
    lo, hi = split(x)
    return combine(move(lo), move(hi))
