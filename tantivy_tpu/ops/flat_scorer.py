"""Flat batched scorer + tensorized Block-WAND pruning.

One device launch scores an arbitrary mixed work-list of (query, block) pairs
and returns per-query top-k — the shape-stable kernel the batch executor
feeds. Per-query top-k over the ragged work-list is computed with a stable
multi-key sort ((qid asc, score desc, doc asc)) + segment-boundary gather,
which matches TopNComputer's tie-break exactly (reference
`top_score_collector.rs:503-507`).

Block-max pruning happens host-side before dispatch: each block's
`(fieldnorm_id, tf)` skip pair (reference `skip.rs:175-184`) upper-bounds its
score under the query's BM25 weight, so blocks that cannot beat the running
k-th score are never shipped to the device. Phase 1 scores each query's
best-bmax blocks to establish a threshold; phase 2 scores only survivors.
Like the reference, the stored pair is chosen under the *segment's* average
fieldnorm, so pruning inherits the same rare-inexactness caveat
(`term_scorer.rs:58-68`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..postings.format import TERMINATED
from .fmath import exact_div

NEG_INF = np.float32(-np.inf)


def _sortable_desc(score: jax.Array) -> jax.Array:
    """f32 -> uint32 key whose ascending order == score descending."""
    bits = jax.lax.bitcast_convert_type(score, jnp.uint32)
    flipped = jnp.where(
        (bits >> 31) == 1, bits ^ jnp.uint32(0xFFFFFFFF), bits | jnp.uint32(0x80000000)
    )
    return ~flipped  # invert for descending


@functools.partial(jax.jit, static_argnames=("k", "num_queries"))
def flat_topk_kernel(
    docs,        # [W, 128] u32 (TERMINATED padded)
    tfs,         # [W, 128] u32
    qid,         # [W] i32 (num_queries for padding rows)
    valid,       # [W] bool
    norm_ids,    # [max_doc] u8
    alive,       # [max_doc] bool
    weights,     # [Qp] f32  (Qp = num_queries + 1, last = padding)
    caches,      # [Qp, 256] f32
    k: int,
    num_queries: int,
):
    """Returns (scores [Q, k] f32, docs [Q, k] u32)."""
    w, lanes = docs.shape
    max_doc = norm_ids.shape[0]
    safe = jnp.minimum(docs, jnp.uint32(max(max_doc - 1, 0)))
    nid = norm_ids[safe].astype(jnp.int32)                       # [W, 128]
    norm = caches[qid[:, None], nid]                             # [W, 128]
    tf = tfs.astype(jnp.float32)
    scores = weights[qid][:, None] * exact_div(tf, tf + norm)
    mask = (docs != jnp.uint32(TERMINATED)) & valid[:, None] & alive[safe]
    scores = jnp.where(mask, scores, NEG_INF)

    # per-block top-k prefilter: a query's global top-k is contained in the
    # union of its blocks' per-block top-k, so only W*k lanes reach the sort
    kk = min(k, lanes)
    row_sc, row_idx = jax.lax.top_k(scores, kk)              # [W, kk]
    row_doc = jnp.take_along_axis(docs, row_idx, axis=1)

    flat_scores = row_sc.reshape(-1)
    flat_docs = row_doc.reshape(-1)
    flat_qid = jnp.repeat(qid, kk)
    flat_qid = jnp.where(flat_scores == NEG_INF, jnp.int32(num_queries), flat_qid)

    # 3-key sort on the reduced W*k set: qid asc, score desc, doc asc
    skey = _sortable_desc(flat_scores)
    sq, _, sdoc, ssc = jax.lax.sort(
        (flat_qid, skey, flat_docs, flat_scores), num_keys=3, is_stable=False
    )
    firsts = jnp.searchsorted(sq, jnp.arange(num_queries, dtype=jnp.int32))
    nexts = jnp.searchsorted(sq, jnp.arange(1, num_queries + 1, dtype=jnp.int32))
    n = w * kk
    idx = firsts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    ok = idx < nexts[:, None]
    idx = jnp.minimum(idx, n - 1)
    out_sc = jnp.where(ok, ssc[idx], NEG_INF)
    out_doc = jnp.where(ok, sdoc[idx], jnp.uint32(0))
    # one packed output -> one result fetch per launch (the remoted backend
    # charges a fixed ~28ms per fetch)
    return jnp.stack(
        [jax.lax.bitcast_convert_type(out_sc, jnp.uint32), out_doc]
    )


#: fixed work-list sizes: bounded shape set -> bounded compile count; larger
#: work lists are chunked at the top size (big: the backend charges ~26ms
#: per launch regardless of size, so fewer launches win)
_W_LADDER = (512, 8192, 32768)


def _w_bucket(n: int) -> int:
    for w in _W_LADDER:
        if n <= w:
            return w
    return _W_LADDER[-1]


class FlatBatchScorer:
    """Executes one segment-field's share of a query batch with block-max
    pruning. Host planning is all vectorized numpy."""

    def __init__(self, dfp, alive, max_phase1_blocks: int = 2):
        self.dfp = dfp
        self.alive = alive
        self.m1 = max_phase1_blocks

    def block_max_scores(self, term_ord: int, weight: np.float32,
                         cache: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(block_ids, bmax_scores) for a term (host, vectorized)."""
        dfp = self.dfp
        s = int(dfp.term_block_start[term_ord])
        n = int(dfp.term_num_blocks[term_ord])
        ids = np.arange(s, s + n)
        tf = dfp.blk_max_tf[ids].astype(np.float32)
        norm = cache[dfp.blk_max_fnid[ids]]
        bmax = (weight * (tf / (tf + norm))).astype(np.float32)
        return ids, bmax

    def dispatch(self, work_blocks: np.ndarray, work_qid: np.ndarray,
                 weights_pad: np.ndarray, caches_pad: np.ndarray,
                 k: int, num_queries: int) -> list:
        """Launch flat kernels over (block, qid) work items (async). Returns
        a list of (vals, docs) device-array pairs (one per chunk)."""
        dfp = self.dfp
        alive = self.alive
        if alive is None:
            alive = jnp.ones(dfp.norm_ids.shape[0], dtype=bool)
        w_dev = jnp.asarray(weights_pad)
        c_dev = jnp.asarray(caches_pad)
        outs = []
        top = _W_LADDER[-1]
        for lo in range(0, max(len(work_blocks), 1), top):
            chunk_blocks = work_blocks[lo : lo + top]
            chunk_qid = work_qid[lo : lo + top]
            W = _w_bucket(max(len(chunk_blocks), 1))
            blocks = np.zeros(W, dtype=np.int64)
            qid = np.full(W, num_queries, dtype=np.int32)
            valid = np.zeros(W, dtype=bool)
            blocks[: len(chunk_blocks)] = chunk_blocks
            qid[: len(chunk_qid)] = chunk_qid
            valid[: len(chunk_blocks)] = True
            docs, tfs = dfp.gather_blocks(blocks)
            outs.append(
                flat_topk_kernel(
                    docs, tfs, jnp.asarray(qid), jnp.asarray(valid),
                    dfp.norm_ids, alive, w_dev, c_dev,
                    k, num_queries,
                )
            )
        return outs
