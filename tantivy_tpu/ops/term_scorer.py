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

from ..postings.format import TERMINATED
from .device_index import DeviceFieldPostings, DeviceSegment

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
    scores = weights[:, None, None] * (tf / (tf + norm))
    mask = (docs != jnp.uint32(TERMINATED)) & valid[:, :, None]
    if alive is not None:
        mask = mask & alive[safe]
    scores = jnp.where(mask, scores, NEG_INF)
    flat_scores = scores.reshape(q, b * 128)
    top_vals, top_idx = jax.lax.top_k(flat_scores, k)
    flat_docs = docs.reshape(q, b * 128)
    top_docs = jnp.take_along_axis(flat_docs, top_idx, axis=1)
    return top_vals, top_docs


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def dispatch_term_topk(
    segment: DeviceSegment,
    field: str,
    term_ords: np.ndarray,
    weights: np.ndarray,
    caches: np.ndarray,
    k: int,
) -> list[tuple[np.ndarray, int, object, object]]:
    """Asynchronously dispatch a batch of term queries over one segment.

    Returns a list of (qids, kk, vals_device, docs_device) — device arrays are
    NOT materialized, so callers can overlap dispatch across
    segments/buckets and sync once (critical when device round-trips are
    expensive).
    """
    dfp = segment.field_postings(field)
    Q = len(term_ords)

    n_blocks = np.where(
        term_ords >= 0, dfp.term_num_blocks[np.maximum(term_ords, 0)], 0
    )
    starts = np.where(
        term_ords >= 0, dfp.term_block_start[np.maximum(term_ords, 0)], 0
    )
    # bucket queries by padded block count
    buckets: dict[int, list[int]] = {}
    for qi in range(Q):
        if n_blocks[qi] == 0:
            continue
        buckets.setdefault(_bucket(int(n_blocks[qi])), []).append(qi)

    pending = []
    for B, qids in buckets.items():
        # pad the per-bucket query count to a power of two so the jit cache
        # sees a bounded set of (Qb, B, k) shapes across batches
        qb = _bucket(len(qids))
        qids_arr = np.asarray(qids)
        block_ids = np.zeros((qb, B), dtype=np.int64)
        valid = np.zeros((qb, B), dtype=bool)
        for row, qi in enumerate(qids):
            s, n = int(starts[qi]), int(n_blocks[qi])
            block_ids[row, :n] = np.arange(s, s + n)
            valid[row, :n] = True
        w_pad = np.zeros(qb, dtype=np.float32)
        w_pad[: len(qids)] = weights[qids_arr]
        c_pad = np.ones((qb, 256), dtype=np.float32)
        c_pad[: len(qids)] = caches[qids_arr]
        docs, tfs = dfp.gather_blocks(block_ids.reshape(-1))
        docs = docs.reshape(qb, B, 128)
        tfs = tfs.reshape(qb, B, 128)
        kk = min(k, B * 128)
        vals, docsel = _topk_kernel(
            docs,
            tfs,
            jnp.asarray(valid),
            dfp.norm_ids,
            jnp.asarray(w_pad),
            jnp.asarray(c_pad),
            segment.alive,
            kk,
        )
        pending.append((qids_arr, kk, vals, docsel))
    return pending


def topk_term_batch(
    segment: DeviceSegment,
    field: str,
    term_ords: np.ndarray,
    weights: np.ndarray,
    caches: np.ndarray,
    k: int,
):
    """Synchronous wrapper: top-k for a batch of term queries over one
    segment. Returns (scores f32[Q, k], docs u32[Q, k]); missing entries have
    score -inf."""
    Q = len(term_ords)
    out_scores = np.full((Q, k), NEG_INF, dtype=np.float32)
    out_docs = np.zeros((Q, k), dtype=np.uint32)
    for qids_arr, kk, vals, docsel in dispatch_term_topk(
        segment, field, term_ords, weights, caches, k
    ):
        nq = len(qids_arr)
        out_scores[qids_arr, :kk] = np.asarray(vals)[:nq]
        out_docs[qids_arr, :kk] = np.asarray(docsel)[:nq]
    return out_scores, out_docs
