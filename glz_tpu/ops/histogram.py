"""Device byte histograms.

Replaces the reference's serial 64 KB fread histogram loop
(encoder.h:136-150) with device-wide reductions.  Two strategies:

  * histogram_scatter — one scatter-add; simplest, XLA-lowered.
  * histogram_matmul  — one-hot compare + MXU matmul per chunk; counts are
    exact because 0/1 values accumulate in f32 (< 2^24 per chunk).

Both are jit-compiled; `histogram` picks the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

N_BINS = 256


@jax.jit
def histogram_scatter(data: jax.Array) -> jax.Array:
    d = data.astype(jnp.int32)
    return jnp.zeros(N_BINS, jnp.int32).at[d].add(1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def histogram_matmul(data: jax.Array, chunk: int = 1 << 19) -> jax.Array:
    """Histogram as a sum of one-hot matmuls (MXU-friendly).

    data must be u8 with size % chunk == 0 (callers pad; padding bytes can
    be subtracted by the caller since they land in a known bin).
    """
    n = data.shape[0]
    n_chunks = max(1, n // chunk)
    d = data.reshape(n_chunks, chunk)

    def body(carry, row):
        onehot = (row[:, None] == jnp.arange(N_BINS, dtype=row.dtype)[None, :])
        counts = jnp.sum(onehot.astype(jnp.bfloat16), axis=0, dtype=jnp.float32)
        return carry + counts, None

    acc, _ = jax.lax.scan(body, jnp.zeros(N_BINS, jnp.float32), d)
    return acc.astype(jnp.int32)


def histogram(data: jax.Array) -> jax.Array:
    return histogram_scatter(data)
