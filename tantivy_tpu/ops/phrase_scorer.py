"""Probe-based batched phrase (slop=0) device scorer.

A phrase query is an intersection (every term MUST appear) whose tf is the
number of aligned position matches (reference `phrase_scorer.rs:46-120`).
The device plan mirrors the boolean probe kernel (`ops/probe_scorer.py`):
ship only the rarest term's blocks as candidate lanes, probe every term's
flat posting region for (presence, tf, posting index), then count aligned
positions straight out of the flat positions array in HBM:

* the probe's hit index inside a term's region IS the posting index (real
  postings are contiguous; padding only trails the last block), so the
  doc's position slice is `term_pos_start + pos_cum[hit] - pos_cum[region]`
  — the device analogue of the reference's tf-sum skip offsets
  (`positions/mod.rs:22-28`);
* counting anchors on the leader's positions (an n-way sorted intersection
  has the same size whichever list enumerates it) — the leader's in-doc tf
  is bounded by MAX_P, enforced host-side via the block-max tf skip entry;
* each inner membership test is a static-depth binary search over the
  other term's position slice.

Block-max pruning: phrase score <= w_phrase * bfac[leader block] (phrase tf
<= leader tf), so the term-path two-phase threshold scheme applies verbatim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..postings.format import TERMINATED
from .probe_scorer import per_query_topk_from_rows

NEG_INF = np.float32(-np.inf)

#: max phrase terms on the device path
T_MAX = 8
#: leader in-doc tf cap — blocks whose block-max tf exceeds this are resolved
#: on host (freak case: the *rarest* phrase term repeating >MAX_P times in
#: one doc)
MAX_P = 16
#: static binary-search depth over another term's in-doc position slice —
#: covers tf < 2^(POS_ITERS-1); enforced host-side via per-term max block tf
POS_ITERS = 15


@functools.partial(
    jax.jit, static_argnames=("k", "num_queries", "n_terms", "n_iters")
)
def probe_phrase_topk(
    docs,         # [W, 128] u32 — leader candidate blocks
    qid,          # [W] i32
    lane_term,    # [W] i32 — which phrase term the block belongs to
    valid,        # [W] bool
    store_docs,   # [NB, 128] u32
    store_tfs,    # [NB, 128] u32
    blk_last,     # [NB] u32
    pos_cum,      # [NB*128] u32 — exclusive cumsum of real tfs
    positions,    # [P] u32 — flat in-doc token positions
    norm_ids,     # [max_doc] u8
    alive,        # [max_doc] bool
    cache,        # [256] f32
    q_weight,     # [Qp] f32 — phrase BM25 weight (idf-sum)
    cl_start,     # [Qp, T] i32 — term_block_start (block units)
    cl_len,       # [Qp, T] i32 — term_num_blocks
    cl_pos_start, # [Qp, T] i32 — positions array offset of the term
    cl_shift,     # [Qp, T] i32 — alignment shift (max_offset - offset_t)
    k: int,
    num_queries: int,
    n_terms: int,
    n_iters: int,
):
    """Returns (scores [Q, k] f32, docs [Q, k] u32)."""
    w, lanes = docs.shape
    max_doc = norm_ids.shape[0]
    npos = positions.shape[0]

    fq = jnp.repeat(qid, lanes)
    fdoc = docs.reshape(-1)
    fterm = jnp.repeat(lane_term, lanes)
    safe = jnp.minimum(fdoc, jnp.uint32(max(max_doc - 1, 0)))
    lane_ok = (
        (fdoc != jnp.uint32(TERMINATED))
        & jnp.repeat(valid, lanes)
        & alive[safe]
        & (fq < jnp.int32(num_queries))
    )
    norm = cache[norm_ids[safe].astype(jnp.int32)]

    # probe every term: presence, tf, position-slice base
    from .probe_scorer import binsearch_flat, probe_term

    all_found = lane_ok
    tf_t = []
    pbase_t = []
    for t in range(n_terms):
        s = cl_start[fq, t]
        found, tf, flatpos = probe_term(
            store_docs, store_tfs, blk_last, fdoc, s, cl_len[fq, t], n_iters,
        )
        all_found = all_found & found & (cl_len[fq, t] > 0)
        tf_t.append(tf.astype(jnp.int32))
        pbase_t.append(
            cl_pos_start[fq, t]
            + (
                pos_cum[flatpos]
                - pos_cum[jnp.minimum(s * 128, pos_cum.shape[0] - 1)]
            ).astype(jnp.int32)
        )

    # anchor on the lane's own (leader) term
    anchor_tf = jnp.zeros_like(tf_t[0])
    anchor_pbase = jnp.zeros_like(pbase_t[0])
    anchor_shift = jnp.zeros_like(pbase_t[0])
    for t in range(n_terms):
        own = fterm == t
        anchor_tf = jnp.where(own, tf_t[t], anchor_tf)
        anchor_pbase = jnp.where(own, pbase_t[t], anchor_pbase)
        anchor_shift = jnp.where(own, cl_shift[fq, t], anchor_shift)

    pos_safe = positions if npos else jnp.zeros((1,), dtype=jnp.uint32)
    npos_safe = max(npos, 1)

    def count_body(j, count):
        in_range = (j < anchor_tf) & all_found
        pidx = jnp.clip(anchor_pbase + j, 0, npos_safe - 1)
        p = pos_safe[pidx].astype(jnp.int32) + anchor_shift
        match = in_range
        for t in range(n_terms):
            target = p - cl_shift[fq, t]
            neg = target < 0
            target_u = jnp.where(neg, 0, target).astype(jnp.uint32)
            lo = binsearch_flat(
                pos_safe, target_u, pbase_t[t], pbase_t[t] + tf_t[t], POS_ITERS
            )
            ppos = jnp.clip(lo, 0, npos_safe - 1)
            found_p = (
                (lo < pbase_t[t] + tf_t[t])
                & (pos_safe[ppos] == target_u)
                & ~neg
            )
            match = match & found_p
        return count + match.astype(jnp.int32)

    count = jax.lax.fori_loop(
        0, MAX_P, count_body, jnp.zeros(fq.shape, dtype=jnp.int32)
    )

    tf = count.astype(jnp.float32)
    score = q_weight[fq] * (tf / (tf + norm))
    ok = all_found & (count > 0)
    lane_scores = jnp.where(ok, score, NEG_INF).reshape(w, lanes)

    kk = min(k, lanes)
    row_sc, row_idx = jax.lax.top_k(lane_scores, kk)
    row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
    return per_query_topk_from_rows(row_sc, row_doc, qid, k, num_queries)


_W_LADDER = (256, 4096)
_T_LADDER = (2, 3, 4, T_MAX)
_ITER_LADDER = (9, 15, 21)


def _w_bucket(n: int) -> int:
    for w in _W_LADDER:
        if n <= w:
            return w
    return _W_LADDER[-1]


def t_bucket(n: int) -> int:
    for t in _T_LADDER:
        if n <= t:
            return t
    raise ValueError(f"too many phrase terms for device path: {n}")


def _iter_bucket(max_region_len: int) -> int:
    for it in _ITER_LADDER:
        if max_region_len <= (1 << (it - 1)):
            return it
    raise AssertionError(f"posting region too long: {max_region_len}")


def dispatch_phrase(
    dfp,
    alive,
    cache,
    work_blocks: np.ndarray,
    work_qid: np.ndarray,
    work_term: np.ndarray,
    tables: dict,
    k: int,
    num_queries: int,
) -> list:
    """Chunk + pad the leader-block work list and launch phrase kernels
    (async). Returns a list of (scores, docs) device-array pairs."""
    import jax.numpy as jnp

    if dfp.docs is None:
        raise RuntimeError("phrase scorer requires dense-mode DeviceSegment")
    assert dfp.num_blocks * 128 < 2**31
    positions, pos_cum = dfp.ensure_positions()
    blk_last = dfp.ensure_blk_last()
    T = tables["cl_start"].shape[1]
    n_iters = _iter_bucket(int(tables["cl_len"].max(initial=1)))
    if alive is None:
        alive = jnp.ones(dfp.norm_ids.shape[0], dtype=bool)
    targs = (
        jnp.asarray(tables["q_weight"]),
        jnp.asarray(tables["cl_start"]),
        jnp.asarray(tables["cl_len"]),
        jnp.asarray(tables["cl_pos_start"]),
        jnp.asarray(tables["cl_shift"]),
    )
    cache_dev = jnp.asarray(cache)
    outs = []
    top = _W_LADDER[-1]
    for lo in range(0, max(len(work_blocks), 1), top):
        chunk_b = work_blocks[lo : lo + top]
        chunk_q = work_qid[lo : lo + top]
        chunk_t = work_term[lo : lo + top]
        W = _w_bucket(max(len(chunk_b), 1))
        b_pad = np.zeros(W, dtype=np.int64)
        q_pad = np.full(W, num_queries, dtype=np.int32)
        t_pad = np.zeros(W, dtype=np.int32)
        v_pad = np.zeros(W, dtype=bool)
        b_pad[: len(chunk_b)] = chunk_b
        q_pad[: len(chunk_q)] = chunk_q
        t_pad[: len(chunk_t)] = chunk_t
        v_pad[: len(chunk_b)] = True
        docs, _ = dfp.gather_blocks(b_pad)
        outs.append(
            probe_phrase_topk(
                docs, jnp.asarray(q_pad), jnp.asarray(t_pad),
                jnp.asarray(v_pad),
                dfp.docs, dfp.tfs, blk_last, pos_cum, positions,
                dfp.norm_ids, alive, cache_dev,
                *targs,
                k=k, num_queries=num_queries, n_terms=T, n_iters=n_iters,
            )
        )
    return outs
