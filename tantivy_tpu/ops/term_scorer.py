"""Batched device term-query top-k — the benchmark hot path.

A batch of term queries over one segment becomes:
  gather blocks [Q, B, 128] -> fieldnorm gather -> BM25 VPU math -> lax.top_k
Queries are bucketed by power-of-two block count so each (Q, B, k) shape
compiles once. Scores are f32 with the same op sequence as the host engine
(`weight * tf / (tf + cache[norm])`), so results match bit-for-bit; ties
resolve to ascending doc id because docs are laid out ascending within a row
and lax.top_k prefers lower flat indices on ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from .fmath import exact_div

from ..postings.format import TERMINATED
NEG_INF = np.float32(-np.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_kernel(docs, tfs, valid, norm_ids, weights, caches, alive, k: int):
    """docs/tfs: [Q, B, 128]; valid: [Q, B] bool; norm_ids: [max_doc] u8;
    weights: [Q] f32; caches: [Q, 256] f32; alive: [max_doc] bool or None.
    Returns (scores [Q, k] f32, docs [Q, k] u32)."""
    q, b, _ = docs.shape
    max_doc = norm_ids.shape[0]
    safe = jnp.minimum(docs, jnp.uint32(max(max_doc - 1, 0)))
    nid = norm_ids[safe].astype(jnp.int32)  # [Q, B, 128]
    norm = jnp.take_along_axis(
        caches[:, None, :], nid.reshape(q, b * 128)[:, None, :], axis=2
    ).reshape(q, b, 128)
    tf = tfs.astype(jnp.float32)
    scores = weights[:, None, None] * exact_div(tf, tf + norm)
    mask = (docs != jnp.uint32(TERMINATED)) & valid[:, :, None]
    if alive is not None:
        mask = mask & alive[safe]
    scores = jnp.where(mask, scores, NEG_INF)
    flat_scores = scores.reshape(q, b * 128)
    top_vals, top_idx = jax.lax.top_k(flat_scores, k)
    flat_docs = docs.reshape(q, b * 128)
    top_docs = jnp.take_along_axis(flat_docs, top_idx, axis=1)
    return top_vals, top_docs
