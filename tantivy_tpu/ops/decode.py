"""Device posting-block decode kernels (jnp/XLA; see also `ops/pallas_decode`).

The width-b packed matrix `[n_blocks_b, 128*b/32]` decodes with zero gathers
inside a block: each u32 word holds `32/b` aligned values, so

    values = (words[:, :, None] >> shifts[None, None, :]) & mask  -> reshape

is a pure VPU reshape/shift/and. Doc ids then come from the strict-delta scan
`docs = base + cumsum(delta) + iota` (associative scan — the TPU-natural form
of the reference's SIMD prefix-sum, `compression/mod.rs:105`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..postings.format import COMPRESSION_BLOCK_SIZE, TERMINATED

BLOCK = COMPRESSION_BLOCK_SIZE


def unpack_rows(words: jax.Array, bits: int) -> jax.Array:
    """[n, words_per_block] uint32 -> [n, 128] uint32 values of width `bits`."""
    n = words.shape[0]
    if bits == 0:
        return jnp.zeros((n, BLOCK), dtype=jnp.uint32)
    if bits == 32:
        return words
    per = 32 // bits
    shifts = (jnp.arange(per, dtype=jnp.uint32) * np.uint32(bits))[None, None, :]
    mask = jnp.uint32((1 << bits) - 1)
    vals = (words[:, :, None] >> shifts) & mask
    return vals.reshape(n, BLOCK)


def deltas_to_docs(deltas: jax.Array, bases: jax.Array) -> jax.Array:
    """Strict-delta decode: docs[i] = base + cumsum(delta)[i] + i.

    `deltas` [n, 128] uint32, `bases` [n] uint32 -> docs [n, 128] uint32.
    Padding lanes keep increasing past the last real doc; callers mask with
    the block length.
    """
    csum = jnp.cumsum(deltas.astype(jnp.uint32), axis=1, dtype=jnp.uint32)
    iota = jnp.arange(BLOCK, dtype=jnp.uint32)[None, :]
    return bases[:, None] + csum + iota


def mask_docs(docs: jax.Array, lengths: jax.Array) -> jax.Array:
    """Set padding lanes (lane >= block length) to TERMINATED."""
    lane = jnp.arange(BLOCK, dtype=jnp.int32)[None, :]
    return jnp.where(lane < lengths[:, None], docs, jnp.uint32(TERMINATED))


@functools.partial(jax.jit, static_argnames=("bits",))
def decode_doc_rows(words: jax.Array, bases: jax.Array, lengths: jax.Array,
                    bits: int) -> jax.Array:
    """Packed doc rows -> masked absolute doc ids [n, 128]."""
    deltas = unpack_rows(words, bits)
    docs = deltas_to_docs(deltas, bases)
    return mask_docs(docs, lengths)


@functools.partial(jax.jit, static_argnames=("bits",))
def decode_tf_rows(words: jax.Array, bits: int) -> jax.Array:
    """Packed tf rows -> term frequencies [n, 128] (stored minus-one)."""
    return unpack_rows(words, bits) + jnp.uint32(1)
