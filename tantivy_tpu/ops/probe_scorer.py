"""Probe-based batched boolean(term) device scorer.

The previous boolean kernel shipped *every block of every clause* and
group-reduced lanes with a giant multi-key sort. This kernel inverts the
design around one observation: in the dense device layout a term's postings
are a contiguous, sorted region of the flattened `[n_blocks*128]` doc array
(TERMINATED padding sorts last), so the tf of ANY (term, doc) pair is one
vectorized binary search away.

So a boolean query ships only *candidate-enumerating* blocks:

* >=1 MUST clause: only the rarest MUST clause ("leader") ships — every
  match must appear there (reference block-wand intersection's leader,
  `block_wand_intersection.rs:19-150`).
* pure SHOULD: every positive clause ships (reference union).

and each candidate lane computes its FULL score by probing all other clauses
(presence + tf) straight out of HBM. Consequences:

* scores are complete per lane → per-block top-k prefilter applies → no
  giant sort;
* MUST/MUST_NOT/minimum_should_match checks come from probe presence counts,
  so MUST_NOT and unshipped SHOULD clauses cost probes, not blocks;
* pruning any shipped block is safe whenever its score upper bound is below
  the running threshold: a doc whose primary block is pruned has true score
  <= that block's UB (see `parallel/__init__.py` planning), exactly the
  block-max argument of reference `block_wand_union.rs:148-216`;
* each doc is reported at most once: a lane is "primary" iff its clause is
  the doc's lowest *shipped* clause, and the phase-1/phase-2 shipped block
  sets are disjoint.

f32 summation is in clause order (t = 0..T-1), bit-matching the host
engine's clause-order summation (`query/__init__.py` BooleanWeight).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from .fmath import exact_div

from ..postings.format import TERMINATED
from .flat_scorer import _sortable_desc

NEG_INF = np.float32(-np.inf)

#: max clauses per boolean query on the device path (wider queries use the
#: host engine; 9..16-clause queries ride narrower fused window rungs — see
#: `pallas_probe.fused_rungs` — because VMEM caps window_bytes x clauses)
T_MAX = 16


def binsearch_flat(flat, target, lo0, hi0, iters: int):
    """Vectorized lower-bound binary search of `target` [L] in the sorted
    slices flat[lo0[i]:hi0[i]]. Returns the insertion index [L]. Uses a
    fori_loop so the compiled graph stays small regardless of depth."""
    nflat = flat.shape[0]

    def body(_, lh):
        lo, hi = lh
        mid = lo + ((hi - lo) >> 1)
        v = flat[jnp.minimum(mid, nflat - 1)]
        go = v < target
        return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    return lo


def probe_term(store_docs, store_tfs, blk_last, fdoc, blk_start, n_blk,
               blk_iters: int):
    """Vectorized (presence, tf, flat position) of doc `fdoc` [L] in the
    term region [blk_start, blk_start + n_blk) of the block store.

    Two-level: a binary search over the *small* per-block `blk_last` skip
    column finds the one candidate block (cache-friendly dependent loads),
    then one contiguous 128-lane row gather + a vectorized rank finishes —
    the tensorized form of the reference's skip-then-block-search
    (`block_segment_postings.rs:305`, `block_search.rs:38`).
    """
    nb = blk_last.shape[0]
    blk = binsearch_flat(blk_last, fdoc, blk_start, blk_start + n_blk,
                         blk_iters)
    in_region = blk < blk_start + n_blk
    blk_safe = jnp.minimum(blk, nb - 1)
    drow = store_docs[blk_safe]                       # [L, 128]
    trow = store_tfs[blk_safe]
    p = jnp.sum(drow < fdoc[:, None], axis=1).astype(jnp.int32)
    p_safe = jnp.minimum(p, 127)[:, None]
    found = in_region & (
        jnp.take_along_axis(drow, p_safe, axis=1)[:, 0] == fdoc
    )
    tf = jnp.take_along_axis(trow, p_safe, axis=1)[:, 0]
    flatpos = blk_safe * 128 + jnp.minimum(p, 127)
    return found, tf, flatpos

KIND_MUST = 0
KIND_SHOULD = 1
KIND_MUST_NOT = 2
KIND_ABSENT = 3


def pack_results(scores, docs):
    """(scores f32 [Q,k], docs u32 [Q,k]) -> one u32 [2,Q,k] array so each
    launch costs ONE result fetch (the remoted backend charges ~28ms per
    fetch regardless of size)."""
    return jnp.stack(
        [jax.lax.bitcast_convert_type(scores, jnp.uint32), docs]
    )


def unpack_results(packed_np):
    """Inverse of pack_results on the fetched numpy array."""
    return packed_np[0].view(np.float32), packed_np[1]


def per_query_topk_from_rows(row_sc, row_doc, qid, k: int, num_queries: int):
    """[W, kk] per-row top-k candidates -> per-query (scores [Q,k], docs
    [Q,k]) via one 3-key sort ((qid asc, score desc, doc asc)) — matches
    TopNComputer's tie-break (reference `top_score_collector.rs:503-507`)."""
    w, kk = row_sc.shape
    flat_scores = row_sc.reshape(-1)
    flat_docs = row_doc.reshape(-1)
    flat_qid = jnp.repeat(qid, kk)
    flat_qid = jnp.where(flat_scores == NEG_INF, jnp.int32(num_queries), flat_qid)
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
    return out_sc, out_doc


def _desc_key_to_f32(key):
    """Exact inverse of `_sortable_desc` (pure bit manipulation)."""
    flipped = ~key
    bits = jnp.where(
        (flipped >> 31) == 1,
        flipped ^ jnp.uint32(0x80000000),
        flipped ^ jnp.uint32(0xFFFFFFFF),
    )
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def group_topk_rows(scores, docs, k: int):
    """[W*8, 128] member-row kernel output -> [W, kg] per-GROUP candidates.

    A masked 8-run group's member rows share one (query, segment) and hold
    DISTINCT docs (members are distinct blocks of one clause region), so
    keeping only the group's top-kg (kg = min(k, 8*128), i.e. everything
    that could reach a final top-k) preserves the per-query exact top-k
    through the flat merge while shrinking its input up to 8x — the flat
    multi-key sort was the dominant device cost per launch. Tie-break is
    preserved exactly: `top_k` keeps index order on equal scores, member
    rows ascend by block (disjoint ascending doc ranges) and lanes ascend
    by doc, so equal scores stay doc-ascending at both stages."""
    w8 = scores.shape[0]
    kk = min(k, 128)
    sc, idx = jax.lax.top_k(scores, kk)
    dc = jnp.take_along_axis(docs, idx, axis=1)
    sc2 = sc.reshape(w8 // 8, 8 * kk)
    dc2 = dc.reshape(w8 // 8, 8 * kk)
    kg = min(k, 8 * kk)
    sc3, i3 = jax.lax.top_k(sc2, kg)
    return sc3, jnp.take_along_axis(dc2, i3, axis=1)


def per_query_topk_rows_seg(row_sc, row_doc, row_seg, qid, k: int,
                            num_queries: int, pack_addr: bool = False):
    """Cross-segment variant of `per_query_topk_from_rows`: each work row
    carries its segment ordinal, and the merge sorts
    (qid asc, score desc, seg asc, doc asc) — the exact (score, DocAddress)
    tie-break of the host fruit-merge (reference
    `sort_key_top_collector.rs:76-97`). Returns (scores, docs, segs).

    DUPLICATE ADDRESSES of one query are DEDUPED KEEP-MAX *before* the
    top-k cut (one pre-sort on (qid, addr, score desc) + first-of-run
    mask). Dual-report plans (boolean skip/slice lanes, phrase re-anchor)
    and union-max expansions (phrase-prefix: many plan rows sharing one
    qid) therefore cannot crowd true top-k entries out of the k_eff
    window — the per-(launch, query) result IS the exact max-per-address
    top-k, matching the host finalize's dedup semantics.

    With `pack_addr` (callers assert seg <= 15 and doc < 2^28), the sorts
    run on 3 u32 arrays — (qid, score key, seg<<28|doc) — instead of 5
    mixed arrays; scores are recovered exactly from the invertible
    descending key."""
    w, kk = row_sc.shape
    flat_scores = row_sc.reshape(-1)
    flat_docs = row_doc.reshape(-1)
    flat_seg = jnp.repeat(row_seg, kk)
    flat_qid = jnp.repeat(qid, kk)
    flat_qid = jnp.where(
        flat_scores == NEG_INF, jnp.int32(num_queries), flat_qid
    )
    skey = _sortable_desc(flat_scores)
    if pack_addr:
        flat_sd = (
            flat_seg.astype(jnp.uint32) << jnp.uint32(28)
        ) | flat_docs
        # dedup pass: group (qid, addr), best score first in each run
        q1, sd1, k1 = jax.lax.sort(
            (flat_qid, flat_sd, skey), num_keys=3, is_stable=False
        )
        dup = (q1 == jnp.roll(q1, 1)) & (sd1 == jnp.roll(sd1, 1))
        dup = dup.at[0].set(False)
        q1 = jnp.where(dup, jnp.int32(num_queries), q1)
        sq, skey_s, ssd = jax.lax.sort(
            (q1, k1, sd1), num_keys=3, is_stable=False
        )
        ssc = _desc_key_to_f32(skey_s)
        sdoc = ssd & jnp.uint32(0x0FFFFFFF)
        sseg = (ssd >> jnp.uint32(28)).astype(jnp.int32)
    else:
        q1, sg1, d1, k1, sc1 = jax.lax.sort(
            (flat_qid, flat_seg, flat_docs, skey, flat_scores),
            num_keys=4, is_stable=False,
        )
        dup = (
            (q1 == jnp.roll(q1, 1))
            & (sg1 == jnp.roll(sg1, 1))
            & (d1 == jnp.roll(d1, 1))
        )
        dup = dup.at[0].set(False)
        q1 = jnp.where(dup, jnp.int32(num_queries), q1)
        sq, _, sseg, sdoc, ssc = jax.lax.sort(
            (q1, k1, sg1, d1, sc1), num_keys=4, is_stable=False,
        )
    firsts = jnp.searchsorted(sq, jnp.arange(num_queries, dtype=jnp.int32))
    nexts = jnp.searchsorted(sq, jnp.arange(1, num_queries + 1, dtype=jnp.int32))
    n = w * kk
    idx = firsts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    ok = idx < nexts[:, None]
    idx = jnp.minimum(idx, n - 1)
    out_sc = jnp.where(ok, ssc[idx], NEG_INF)
    out_doc = jnp.where(ok, sdoc[idx], jnp.uint32(0))
    out_seg = jnp.where(ok, sseg[idx], jnp.int32(0))
    return out_sc, out_doc, out_seg


def pack_results_seg(scores, docs, segs):
    """[3, Q, k] u32 packed (score bits | doc | seg) -> one result fetch."""
    return jnp.stack(
        [
            jax.lax.bitcast_convert_type(scores, jnp.uint32),
            docs,
            segs.astype(jnp.uint32),
        ]
    )


def unpack_results_seg(packed_np):
    return packed_np[0].view(np.float32), packed_np[1], packed_np[2]


def probe_term_window(store_docs, store_tfs, blk_last, docs2d, qid,
                      cl_start_t, cl_len_t, kw: int, n_iters: int):
    """Windowed probe: (found [W,128], tf [W,128], flatpos [W,128]) of every
    lane doc in the clause region given per-BLOCK window location.

    One binary search per work-item *block* (not per lane) finds where the
    clause's blocks overlap the lane block's doc range; a `kw`-block window
    is gathered contiguously and each lane resolves by a dense vectorized
    rank over the window — compares on the VPU instead of per-lane gather
    chains (TPU gathers are ~100M elem/s; compares are ~free). `kw` must
    bound the true overlap width (host planning guarantees it via
    `FieldWand.clause_blocks_ub`).
    """
    nb = blk_last.shape[0]
    w = docs2d.shape[0]
    s = cl_start_t[qid]                           # [W]
    n = cl_len_t[qid]
    first_doc = docs2d[:, 0]
    jlo = binsearch_flat(blk_last, first_doc, s, s + n, n_iters)  # [W]
    rows = jlo[:, None] + jnp.arange(kw)[None, :]                  # [W, kw]
    row_ok = rows < s[:, None] + n[:, None]
    rows_safe = jnp.minimum(rows, nb - 1)
    win_docs = jnp.where(
        row_ok[:, :, None], store_docs[rows_safe], jnp.uint32(0xFFFFFFFF)
    ).reshape(w, kw * 128)
    win_tfs = store_tfs[rows_safe].reshape(w, kw * 128)
    # dense rank: the window is sorted ascending (pads and invalid rows sort
    # last); the compare fuses into the sum reduce on the VPU. The hit/tf
    # lookups are take_along gathers — free inside an already-launched
    # kernel (the backend's cost is per LAUNCH, not per gather op).
    p = jnp.sum(
        win_docs[:, None, :] < docs2d[:, :, None], axis=2
    ).astype(jnp.int32)                                            # [W, 128]
    p_safe = jnp.minimum(p, kw * 128 - 1)
    hit = jnp.take_along_axis(win_docs, p_safe, axis=1)
    found = hit == docs2d
    tf = jnp.take_along_axis(win_tfs, p_safe, axis=1)
    flatpos = (jlo[:, None] * 128 + p_safe).astype(jnp.int32)
    return found, tf, flatpos


@functools.partial(
    jax.jit, static_argnames=("k", "num_queries", "n_clauses", "kw", "n_iters")
)
def probe_bool_topk_window(
    docs,        # [W, 128] u32 — shipped candidate blocks, TERMINATED-padded
    tfs,         # [W, 128] u32
    qid,         # [W] i32 (num_queries = padding row)
    lane_clause, # [W] i32 — clause index the block belongs to
    valid,       # [W] bool
    store_docs,  # [NB, 128] u32
    store_tfs,   # [NB, 128] u32
    blk_last,    # [NB] u32
    norm_ids,    # [max_doc] u8
    alive,       # [max_doc] bool
    cache,       # [256] f32
    cl_weight,   # [Qp, T] f32
    cl_kind,     # [Qp, T] i32
    cl_start,    # [Qp, T] i32 — term_block_start (block units)
    cl_len,      # [Qp, T] i32 — term_num_blocks
    cl_shipped,  # [Qp, T] bool
    req_must,    # [Qp] i32
    req_should,  # [Qp] i32
    k: int,
    num_queries: int,
    n_clauses: int,
    kw: int,
    n_iters: int,
):
    """Windowed-probe boolean scorer: same contract as probe_bool_topk but
    with per-block window probes (see probe_term_window)."""
    w, lanes = docs.shape
    max_doc = norm_ids.shape[0]
    safe = jnp.minimum(docs, jnp.uint32(max(max_doc - 1, 0)))
    lane_ok = (
        (docs != jnp.uint32(TERMINATED))
        & valid[:, None]
        & alive[safe]
        & (qid < jnp.int32(num_queries))[:, None]
    )
    norm = cache[norm_ids[safe].astype(jnp.int32)]                # [W, 128]

    score = jnp.zeros_like(norm)
    cnt_must = jnp.zeros(docs.shape, dtype=jnp.int32)
    cnt_should = jnp.zeros(docs.shape, dtype=jnp.int32)
    has_not = jnp.zeros(docs.shape, dtype=jnp.bool_)
    primary = jnp.full(docs.shape, T_MAX + 1, dtype=jnp.int32)

    for t in range(n_clauses):
        own = (lane_clause == t)[:, None]
        found, tf_probe, _ = probe_term_window(
            store_docs, store_tfs, blk_last, docs, qid,
            cl_start[:, t], cl_len[:, t], kw, n_iters,
        )
        presence = jnp.where(own, True, found)
        tf_t = jnp.where(own, tfs, tf_probe).astype(jnp.float32)
        kind_t = cl_kind[qid, t][:, None]
        contrib = cl_weight[qid, t][:, None] * exact_div(tf_t, tf_t + norm)
        positive = presence & (
            (kind_t == KIND_MUST) | (kind_t == KIND_SHOULD)
        )
        score = score + jnp.where(positive, contrib, jnp.float32(0.0))
        cnt_must = cnt_must + (presence & (kind_t == KIND_MUST)).astype(
            jnp.int32
        )
        cnt_should = cnt_should + (
            presence & (kind_t == KIND_SHOULD)
        ).astype(jnp.int32)
        has_not = has_not | (presence & (kind_t == KIND_MUST_NOT))
        is_prim = presence & cl_shipped[qid, t][:, None] & (primary > T_MAX)
        primary = jnp.where(is_prim, jnp.int32(t), primary)

    ok = (
        lane_ok
        & (lane_clause[:, None] <= primary)
        & (cnt_must >= req_must[qid][:, None])
        & (cnt_should >= req_should[qid][:, None])
        & ~has_not
    )
    lane_scores = jnp.where(ok, score, NEG_INF)

    kk = min(k, lanes)
    row_sc, row_idx = jax.lax.top_k(lane_scores, kk)
    row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
    return pack_results(
        *per_query_topk_from_rows(row_sc, row_doc, qid, k, num_queries)
    )


@functools.partial(
    jax.jit, static_argnames=("k", "num_queries", "n_clauses", "n_iters")
)
def probe_bool_topk(
    docs,        # [W, 128] u32 — shipped candidate blocks, TERMINATED-padded
    tfs,         # [W, 128] u32
    qid,         # [W] i32 (num_queries = padding row)
    lane_clause, # [W] i32 — clause index the block belongs to
    valid,       # [W] bool
    store_docs,  # [NB, 128] u32 — the field's full dense block store
    store_tfs,   # [NB, 128] u32
    blk_last,    # [NB] u32 — per-block last doc (the skip column)
    norm_ids,    # [max_doc] u8
    alive,       # [max_doc] bool
    cache,       # [256] f32 — the field's BM25 tf-denominator cache
    cl_weight,   # [Qp, T] f32 (0 for MUST_NOT / absent)
    cl_kind,     # [Qp, T] i32 (KIND_*)
    cl_start,    # [Qp, T] i32 — term_block_start (block units)
    cl_len,      # [Qp, T] i32 — term_num_blocks
    cl_shipped,  # [Qp, T] bool — clause enumerates candidates for this query
    req_must,    # [Qp] i32
    req_should,  # [Qp] i32
    k: int,
    num_queries: int,
    n_clauses: int,
    n_iters: int,
):
    """Returns (scores [Q, k] f32, docs [Q, k] u32)."""
    w, lanes = docs.shape
    max_doc = norm_ids.shape[0]

    fq = jnp.repeat(qid, lanes)                                   # [L]
    fdoc = docs.reshape(-1)
    ftf = tfs.reshape(-1)
    fcl = jnp.repeat(lane_clause, lanes)
    safe = jnp.minimum(fdoc, jnp.uint32(max(max_doc - 1, 0)))
    lane_ok = (
        (fdoc != jnp.uint32(TERMINATED))
        & jnp.repeat(valid, lanes)
        & alive[safe]
        & (fq < jnp.int32(num_queries))
    )
    norm = cache[norm_ids[safe].astype(jnp.int32)]                # [L]

    score = jnp.zeros_like(norm)
    cnt_must = jnp.zeros(fq.shape, dtype=jnp.int32)
    cnt_should = jnp.zeros(fq.shape, dtype=jnp.int32)
    has_not = jnp.zeros(fq.shape, dtype=jnp.bool_)
    primary = jnp.full(fq.shape, T_MAX + 1, dtype=jnp.int32)

    for t in range(n_clauses):
        own = fcl == t
        found, tf_probe, _ = probe_term(
            store_docs, store_tfs, blk_last, fdoc,
            cl_start[fq, t], cl_len[fq, t], n_iters,
        )
        # own lane: presence and tf are already in hand (skips a fetch and
        # keeps exactness independent of the search when n_iters is tight)
        presence = jnp.where(own, True, found)
        tf_t = jnp.where(own, ftf, tf_probe).astype(jnp.float32)
        kind_t = cl_kind[fq, t]
        contrib = cl_weight[fq, t] * exact_div(tf_t, tf_t + norm)
        positive = presence & (
            (kind_t == KIND_MUST) | (kind_t == KIND_SHOULD)
        )
        score = score + jnp.where(positive, contrib, jnp.float32(0.0))
        cnt_must = cnt_must + (presence & (kind_t == KIND_MUST)).astype(jnp.int32)
        cnt_should = cnt_should + (
            presence & (kind_t == KIND_SHOULD)
        ).astype(jnp.int32)
        has_not = has_not | (presence & (kind_t == KIND_MUST_NOT))
        is_prim_cand = presence & cl_shipped[fq, t] & (primary > T_MAX)
        primary = jnp.where(is_prim_cand, jnp.int32(t), primary)

    ok = (
        lane_ok
        & (fcl <= primary)
        & (cnt_must >= req_must[fq])
        & (cnt_should >= req_should[fq])
        & ~has_not
    )
    lane_scores = jnp.where(ok, score, NEG_INF).reshape(w, lanes)

    kk = min(k, lanes)
    row_sc, row_idx = jax.lax.top_k(lane_scores, kk)
    row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
    return pack_results(
        *per_query_topk_from_rows(row_sc, row_doc, qid, k, num_queries)
    )


#: (work-list size, probe window blocks) buckets for the windowed kernel.
#: The backend charges a fixed ~26ms per kernel invocation containing
#: gathers and ~28ms per result fetch regardless of size (remoted TPU), so
#: big W rungs that minimize launch count dominate every other concern;
#: wide windows pair with smaller W to bound the compare volume.
_WKW_LADDER = ((65536, 2), (65536, 8), (8192, 64))
#: deep-probe fallback work-list ladder (per-lane binary search; used when
#: a clause window exceeds the widest bucket)
_W_LADDER = (256, 4096)
#: clause-count buckets
_T_LADDER = (2, 4, 8, T_MAX)
#: block-index search depth buckets (covers <= 2^(n_iters-1) blocks/term)
_ITER_LADDER = (9, 15, 21)


def _w_bucket(n: int) -> int:
    for w in _W_LADDER:
        if n <= w:
            return w
    return _W_LADDER[-1]


def _wkw_bucket(max_window: int):
    for w, kw in _WKW_LADDER:
        if max_window <= kw:
            return w, kw
    return None  # fall back to the deep per-lane search kernel


def _pallas_mode():
    """'tpu' = compiled pallas, 'interpret' = interpreter (CPU testing),
    None = use the XLA kernels. Default: pallas on real TPU backends, XLA
    elsewhere; TANTIVY_TPU_PALLAS=1 forces pallas (interpreted off-TPU),
    =0 disables it."""
    import os

    flag = os.environ.get("TANTIVY_TPU_PALLAS", "")
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu", "gpu")
    if flag == "0":
        return None
    if on_tpu:
        return "tpu"
    if flag == "1":
        return "interpret"
    return None


def t_bucket(n: int) -> int:
    for t in _T_LADDER:
        if n <= t:
            return t
    raise ValueError(f"too many clauses for device path: {n}")


def _iter_bucket(max_region_len: int) -> int:
    for it in _ITER_LADDER:
        if max_region_len <= (1 << (it - 1)):
            return it
    raise AssertionError(f"posting region too long: {max_region_len}")


def dispatch_probe(
    dfp,
    alive,
    cache,
    work_blocks: np.ndarray,   # [N] block ids
    work_qid: np.ndarray,      # [N]
    work_clause: np.ndarray,   # [N]
    tables: dict,              # cl_* [Qp, T] + req_must/req_should [Qp]
    k: int,
    num_queries: int,
    work_width: np.ndarray | None = None,  # [N] per-item max probe window
) -> list:
    """Bucket work items by probe-window width, chunk + pad each bucket, and
    launch probe kernels (async). Returns a list of (scores, docs) device
    pairs. Narrow-window items (the dense clause's blocks — the vast
    majority) ride the cheap windowed kernel; wide-window items (rare-clause
    blocks over dense partners) use wider windows with smaller W; pathological
    widths fall back to the per-lane binary-search kernel."""
    if dfp.docs is None:
        raise RuntimeError("probe scorer requires dense-mode DeviceSegment")
    assert dfp.num_blocks * 128 < 2**31, "flat region offsets must fit in i32"
    n_items = len(work_blocks)
    T = tables["cl_weight"].shape[1]
    n_iters = _iter_bucket(int(tables["cl_len"].max(initial=1)))
    blk_last = dfp.ensure_blk_last()
    if alive is None:
        alive = jnp.ones(dfp.norm_ids.shape[0], dtype=bool)
    if work_width is None:
        work_width = np.full(n_items, 1 << 30, dtype=np.int64)
    targs = (
        jnp.asarray(tables["cl_weight"]),
        jnp.asarray(tables["cl_kind"]),
        jnp.asarray(tables["cl_start"]),
        jnp.asarray(tables["cl_len"]),
        jnp.asarray(tables["cl_shipped"]),
        jnp.asarray(tables["req_must"]),
        jnp.asarray(tables["req_should"]),
    )
    cache_dev = jnp.asarray(cache)
    outs = []

    pallas = _pallas_mode()

    def launch(bsel, qsel, csel, wkw):
        top = wkw[0] if wkw is not None else _W_LADDER[-1]
        for lo in range(0, max(len(bsel), 1), top):
            chunk_b = bsel[lo : lo + top]
            chunk_q = qsel[lo : lo + top]
            chunk_c = csel[lo : lo + top]
            # small chunks pad to the small rung (tiny corpora / tails)
            n_chunk = max(len(chunk_b), 1)
            W = _w_bucket(n_chunk) if n_chunk <= _W_LADDER[-1] else top
            b_pad = np.zeros(W, dtype=np.int64)
            q_pad = np.full(W, num_queries, dtype=np.int32)
            c_pad = np.zeros(W, dtype=np.int32)
            v_pad = np.zeros(W, dtype=bool)
            b_pad[: len(chunk_b)] = chunk_b
            q_pad[: len(chunk_q)] = chunk_q
            c_pad[: len(chunk_c)] = chunk_c
            v_pad[: len(chunk_b)] = True
            if wkw is not None and pallas is not None:
                from .pallas_probe import (
                    compute_jlo,
                    ensure_cstore,
                    pallas_bool_topk,
                )

                kw = wkw[1]
                jlo = compute_jlo(
                    dfp, b_pad.astype(np.int64), q_pad,
                    tables["cl_start"], tables["cl_len"], kw,
                )
                cstore = ensure_cstore(dfp, alive, cache)
                kw8 = ((kw + 7) & ~7) + 8
                outs.append(
                    pallas_bool_topk(
                        jnp.asarray(b_pad.astype(np.int32)),
                        jnp.asarray(q_pad), jnp.asarray(c_pad),
                        jnp.asarray(jlo),
                        # this legacy path has no per-clause widths; the
                        # full window preserves its old behavior
                        jnp.full((W, T), kw8, dtype=jnp.int32),
                        targs[0], targs[1], targs[2], targs[3],
                        jnp.asarray(
                            tables["cl_shipped"].astype(np.int32)
                        ),
                        targs[5], targs[6],
                        cstore,
                        k=k, num_queries=num_queries, n_clauses=T,
                        kw=kw, interpret=(pallas == "interpret"),
                    )
                )
                continue
            docs, tfs = dfp.gather_blocks(b_pad)
            if wkw is not None:
                outs.append(
                    probe_bool_topk_window(
                        docs, tfs, jnp.asarray(q_pad), jnp.asarray(c_pad),
                        jnp.asarray(v_pad),
                        dfp.docs, dfp.tfs, blk_last, dfp.norm_ids, alive,
                        cache_dev, *targs,
                        k=k, num_queries=num_queries, n_clauses=T,
                        kw=wkw[1], n_iters=n_iters,
                    )
                )
            else:
                outs.append(
                    probe_bool_topk(
                        docs, tfs, jnp.asarray(q_pad), jnp.asarray(c_pad),
                        jnp.asarray(v_pad),
                        dfp.docs, dfp.tfs, blk_last, dfp.norm_ids, alive,
                        cache_dev, *targs,
                        k=k, num_queries=num_queries, n_clauses=T,
                        n_iters=n_iters,
                    )
                )

    if n_items == 0:
        launch(work_blocks, work_qid, work_clause, _WKW_LADDER[0])
        return outs
    prev_kw = -1  # width 0 (no partner clauses) lands in the first bucket
    for wb, kwb in _WKW_LADDER:
        sel = (work_width > prev_kw) & (work_width <= kwb)
        if sel.any():
            launch(work_blocks[sel], work_qid[sel], work_clause[sel],
                   (wb, kwb))
        prev_kw = kwb
    sel = work_width > _WKW_LADDER[-1][1]
    if sel.any():
        launch(work_blocks[sel], work_qid[sel], work_clause[sel], None)
    return outs
