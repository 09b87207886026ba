"""Probe-based batched phrase (slop=0) device scorer.

A phrase query is an intersection (every term MUST appear) whose tf is the
number of aligned position matches (reference `phrase_scorer.rs:46-120`).
The device plan mirrors the boolean probe kernel (`ops/probe_scorer.py`):
ship only the rarest term's blocks as candidate lanes, windowed-probe every
term's region for (presence, tf, posting index), then count aligned
positions with dense window compares:

* the probe's hit index inside a term's region IS the posting index (real
  postings are contiguous; padding only trails the last block), so the
  doc's position slice is `term_pos_start + pos_cum[hit] - pos_cum[region]`
  — the device analogue of the reference's tf-sum skip offsets
  (`positions/mod.rs:22-28`);
* each term's in-doc positions are gathered once as a PW-wide window
  [W, 128, PW]; counting anchors on the leader's positions (an n-way
  sorted intersection has the same size whichever list enumerates it) and
  every membership test is a vectorized compare over the window — no
  per-lane gather chains (TPU gathers are slow; VPU compares are ~free);
* PW bounds every term's in-doc tf and MAX_P bounds the leader's, both
  enforced host-side from block-max tf skip entries; out-of-bounds cases
  resolve exactly on the host per (query, segment).

Block-max pruning: phrase score <= w_phrase * bfac[leader block] (phrase tf
<= leader tf), so the term-path two-phase threshold scheme applies verbatim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from .fmath import exact_div

from ..postings.format import TERMINATED
from .probe_scorer import (
    pack_results,
    per_query_topk_from_rows,
    probe_term_window,
)

NEG_INF = np.float32(-np.inf)

#: max phrase terms on the device path
T_MAX = 8
#: leader in-doc tf cap — blocks whose block-max tf exceeds this are resolved
#: on host (freak case: the *rarest* phrase term repeating >MAX_P times in
#: one doc)
MAX_P = 16
#: position-window rungs (any term's in-doc tf cap), paired with a W cap so
#: the gathered window stays bounded
_PW_LADDER = ((16, 16384), (32, 8192), (64, 4096), (256, 1024))
#: beyond the widest rung the (query, segment) resolves on host
MAX_OTHER_TF = _PW_LADDER[-1][0]
#: doc-probe window rungs (W cap, kw) — see probe_scorer._WKW_LADDER
_WKW_LADDER = ((32768, 8), (4096, 64))
#: widest device probe window; wider items (a near-singleton leader block
#: spanning a dense partner's whole region) resolve on host
MAX_KW = 1024
_W_LADDER = (256, 4096)
_T_LADDER = (2, 3, 4, T_MAX)
_ITER_LADDER = (9, 15, 21)


@functools.partial(
    jax.jit,
    static_argnames=("k", "num_queries", "n_terms", "kw", "n_iters", "pw"),
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
    kw: int,
    n_iters: int,
    pw: int,
):
    """Returns (scores [Q, k] f32, docs [Q, k] u32)."""
    w, lanes = docs.shape
    max_doc = norm_ids.shape[0]
    npos = positions.shape[0]
    pos_safe = positions if npos else jnp.zeros((1,), dtype=jnp.uint32)
    npos_safe = max(npos, 1)

    safe = jnp.minimum(docs, jnp.uint32(max(max_doc - 1, 0)))
    lane_ok = (
        (docs != jnp.uint32(TERMINATED))
        & valid[:, None]
        & alive[safe]
        & (qid < jnp.int32(num_queries))[:, None]
    )
    norm = cache[norm_ids[safe].astype(jnp.int32)]

    all_found = lane_ok
    tf_t = []
    pwin_t = []  # [W, 128, pw] i32 position windows per term
    shift_t = []
    for t in range(n_terms):
        s = cl_start[:, t][qid]
        found, tf, flatpos = probe_term_window(
            store_docs, store_tfs, blk_last, docs, qid,
            cl_start[:, t], cl_len[:, t], kw, n_iters,
        )
        all_found = all_found & found & (cl_len[qid, t] > 0)[:, None]
        tfi = tf.astype(jnp.int32)
        tf_t.append(tfi)
        pbase = (
            cl_pos_start[qid, t][:, None]
            + (
                pos_cum[flatpos]
                - pos_cum[jnp.minimum(s * 128, pos_cum.shape[0] - 1)][:, None]
            ).astype(jnp.int32)
        )                                                   # [W, 128]
        pidx = jnp.clip(
            pbase[:, :, None] + jnp.arange(pw, dtype=jnp.int32), 0,
            npos_safe - 1,
        )
        win = pos_safe[pidx].astype(jnp.int32)              # [W, 128, pw]
        in_tf = jnp.arange(pw, dtype=jnp.int32) < tfi[:, :, None]
        pwin_t.append(jnp.where(in_tf, win, jnp.int32(-(1 << 30))))
        shift_t.append(cl_shift[qid, t][:, None])

    # anchor on the lane's own (leader) term
    anchor_tf = jnp.zeros_like(tf_t[0])
    anchor_win = jnp.zeros_like(pwin_t[0])
    anchor_shift = jnp.zeros_like(shift_t[0])
    for t in range(n_terms):
        own = (lane_term == t)[:, None]
        anchor_tf = jnp.where(own, tf_t[t], anchor_tf)
        anchor_win = jnp.where(own[:, :, None], pwin_t[t], anchor_win)
        anchor_shift = jnp.where(own, shift_t[t], anchor_shift)

    count = jnp.zeros(docs.shape, dtype=jnp.int32)
    for j in range(MAX_P):
        in_range = (j < anchor_tf) & all_found
        p = anchor_win[:, :, j] + anchor_shift              # aligned target
        match = in_range
        for t in range(n_terms):
            target = (p - shift_t[t])[:, :, None]
            match = match & jnp.any(pwin_t[t] == target, axis=2)
        count = count + match.astype(jnp.int32)

    tf = count.astype(jnp.float32)
    score = q_weight[qid][:, None] * exact_div(tf, tf + norm)
    ok = all_found & (count > 0)
    lane_scores = jnp.where(ok, score, NEG_INF)

    kk = min(k, lanes)
    row_sc, row_idx = jax.lax.top_k(lane_scores, kk)
    row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
    return pack_results(
        *per_query_topk_from_rows(row_sc, row_doc, qid, k, num_queries)
    )


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


def _pw_bucket(max_tf: int):
    for pw, wcap in _PW_LADDER:
        if max_tf <= pw:
            return pw, wcap
    raise AssertionError(f"in-doc tf beyond device cap: {max_tf}")


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
    work_width: np.ndarray | None = None,
) -> list:
    """Bucket leader-block work items by probe-window width, chunk + pad,
    and launch phrase kernels (async). Returns (scores, docs) device pairs.
    The position-window rung comes from the group's max in-doc tf
    (tables["max_tf"], host-derived from block-max tf skip entries)."""
    import jax.numpy as jnp

    if dfp.docs is None:
        raise RuntimeError("phrase scorer requires dense-mode DeviceSegment")
    assert dfp.num_blocks * 128 < 2**31
    positions, pos_cum = dfp.ensure_positions()
    blk_last = dfp.ensure_blk_last()
    T = tables["cl_start"].shape[1]
    n_iters = _iter_bucket(int(tables["cl_len"].max(initial=1)))
    n_items = len(work_blocks)
    if work_width is None:
        work_width = np.full(n_items, 1 << 30, dtype=np.int64)
    # per-item position-window rung: each work item carries its QUERY's max
    # in-doc tf (work_ptf), so a single high-tf term elsewhere in the batch
    # doesn't force wide position windows on everyone
    work_ptf = tables.get("q_max_tf")
    if work_ptf is not None:
        work_ptf = work_ptf[work_qid]
    else:
        work_ptf = np.full(n_items, int(tables.get("max_tf", MAX_OTHER_TF)),
                           dtype=np.int64)
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

    def launch(bsel, qsel, tsel, kw, wcap, pw, pw_wcap):
        top = min(wcap, pw_wcap)
        for lo in range(0, max(len(bsel), 1), top):
            chunk_b = bsel[lo : lo + top]
            chunk_q = qsel[lo : lo + top]
            chunk_t = tsel[lo : lo + top]
            n_chunk = max(len(chunk_b), 1)
            # clamp the bucket to the rung cap: padding may go up to `top`
            # but never beyond, else the [W, 128, pw] position windows blow
            # past the memory budget the _PW_LADDER pairing enforces
            W = _w_bucket(n_chunk) if n_chunk <= _W_LADDER[-1] else top
            W = min(W, top)
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
                    k=k, num_queries=num_queries, n_terms=T, kw=kw,
                    n_iters=n_iters, pw=pw,
                )
            )

    if n_items == 0:
        launch(work_blocks, work_qid, work_term, _WKW_LADDER[0][1],
               _WKW_LADDER[0][0], *_pw_bucket(1))
        return outs
    for pwb, pw_wcap in _PW_LADDER:
        prev_pw = 0 if pwb == _PW_LADDER[0][0] else prev_pwb
        psel = (work_ptf > prev_pw) & (work_ptf <= pwb)
        prev_pwb = pwb
        if not psel.any():
            continue
        prev_kw = -1
        for wcap, kwb in _WKW_LADDER:
            sel = psel & (work_width > prev_kw) & (work_width <= kwb)
            if sel.any():
                launch(work_blocks[sel], work_qid[sel], work_term[sel], kwb,
                       wcap, pwb, pw_wcap)
            prev_kw = kwb
        sel = psel & (work_width > _WKW_LADDER[-1][1])
        if sel.any():
            # very wide doc windows: widen kw to the per-item max. Items
            # beyond MAX_KW never reach here — planning resolves those
            # (query, segment) pairs on the host.
            kw_needed = 1 << int(
                np.ceil(np.log2(max(int(work_width[sel].max()), 2)))
            )
            assert kw_needed <= MAX_KW, "planner must host-fallback wide phrases"
            launch(work_blocks[sel], work_qid[sel], work_term[sel],
                   kw_needed, 64, pwb, pw_wcap)
    return outs
