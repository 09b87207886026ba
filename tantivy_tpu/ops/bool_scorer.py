"""Batched device boolean scorer (term clauses): union / intersection /
m-of-n / must-not in ONE kernel.

Work items are (query, clause, block) triples over one field's block store.
The kernel:
  1. scores every lane (BM25, clause weight),
  2. stable-sorts lanes by (query, doc) — so lanes of the same doc land
     adjacent *in clause order* (work list is laid out clause-major),
  3. reduces each (query, doc) group with T_MAX shifted adds — a strict
     left-to-right f32 sum, bit-matching the host engine's clause-order
     summation (reference BufferedUnionScorer adds clause scores in clause
     order; absent clauses contribute exact +0.0),
  4. filters groups by must-count / should-count / must-not rules
     (reference `boolean_weight.rs` semantics incl.
     minimum_number_should_match),
  5. selects per-query top-k by (score desc, doc asc) via a second 3-key sort.

No scatters: group reduction uses static shifts, which the VPU loves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..postings.format import TERMINATED
from .flat_scorer import _sortable_desc

NEG_INF = np.float32(-np.inf)

#: max clauses per boolean query in the device path (host engine handles more)
T_MAX = 8

KIND_MUST = 0
KIND_SHOULD = 1
KIND_MUST_NOT = 2


@functools.partial(jax.jit, static_argnames=("k", "num_queries"))
def flat_bool_topk(
    docs,        # [W, 128] u32
    tfs,         # [W, 128] u32
    qid,         # [W] i32 (num_queries = padding)
    weight,      # [W] f32 (0 for must_not)
    kind,        # [W] i32 (KIND_*)
    clause,      # [W] i32 (clause index within its query, < T_MAX)
    valid,       # [W] bool
    norm_ids,    # [max_doc] u8
    alive,       # [max_doc] bool
    cache,       # [256] f32 (single-field batch: one tf-denominator cache)
    req_must,    # [Qp] i32 — required must-match count per query
    req_should,  # [Qp] i32 — required should-match count per query
    k: int,
    num_queries: int,
):
    w, lanes = docs.shape
    n = w * lanes
    max_doc = norm_ids.shape[0]
    safe = jnp.minimum(docs, jnp.uint32(max(max_doc - 1, 0)))
    nid = norm_ids[safe].astype(jnp.int32)
    norm = cache[nid]
    tf = tfs.astype(jnp.float32)
    scores = weight[:, None] * (tf / (tf + norm))
    lane_ok = (docs != jnp.uint32(TERMINATED)) & valid[:, None] & alive[safe]

    fq = jnp.repeat(qid, lanes)
    fdoc = docs.reshape(-1)
    fscore = jnp.where(lane_ok.reshape(-1), scores.reshape(-1), jnp.float32(0.0))
    fkind = jnp.repeat(kind, lanes)
    fclause = jnp.repeat(clause, lanes)
    dead = ~lane_ok.reshape(-1)
    # dead lanes become singleton groups of the padding query
    iota = jnp.arange(n, dtype=jnp.uint32)
    fq = jnp.where(dead, jnp.int32(num_queries), fq)
    fdoc = jnp.where(dead, iota, fdoc)

    # group lanes by (query, doc) with the clause index packed into the doc
    # key's low 3 bits: composite (qid, doc<<3|clause) is UNIQUE, so an
    # unstable 2-key sort is exact and clause order within each group is
    # preserved by the packed bits. Constraint: doc ids < 2^29 per segment.
    packed = (fdoc << jnp.uint32(3)) | fclause.astype(jnp.uint32)
    fq, _, fdoc, fscore, fkind = jax.lax.sort(
        (fq, packed, fdoc, fscore, fkind), num_keys=2, is_stable=False
    )

    prev_q = jnp.concatenate([jnp.full((1,), -1, jnp.int32), fq[:-1]])
    prev_d = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32), fdoc[:-1]])
    is_start = (fq != prev_q) | (fdoc != prev_d)
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, jnp.arange(n, dtype=jnp.int32), -1)
    )
    r = jnp.arange(n, dtype=jnp.int32) - start_pos  # rank within group

    # group reduction with static shifts: strict left-to-right f32 sum
    acc = fscore
    cnt_must = (fkind == KIND_MUST).astype(jnp.int32)
    cnt_should = (fkind == KIND_SHOULD).astype(jnp.int32)
    cnt_not = (fkind == KIND_MUST_NOT).astype(jnp.int32)
    for t in range(1, T_MAX):
        sc_t = jnp.concatenate([fscore[t:], jnp.zeros((t,), jnp.float32)])
        r_t = jnp.concatenate([r[t:], jnp.full((t,), -1, jnp.int32)])
        k_t = jnp.concatenate([fkind[t:], jnp.full((t,), -1, jnp.int32)])
        same = r_t == t
        acc = acc + jnp.where(same, sc_t, jnp.float32(0.0))
        cnt_must = cnt_must + jnp.where(same & (k_t == KIND_MUST), 1, 0)
        cnt_should = cnt_should + jnp.where(same & (k_t == KIND_SHOULD), 1, 0)
        cnt_not = cnt_not + jnp.where(same & (k_t == KIND_MUST_NOT), 1, 0)

    ok = (
        is_start
        & (fq < jnp.int32(num_queries))
        & (cnt_must >= req_must[jnp.minimum(fq, num_queries)])
        & (cnt_should >= req_should[jnp.minimum(fq, num_queries)])
        & (cnt_not == 0)
    )
    sel_score = jnp.where(ok, acc, NEG_INF)
    sel_q = jnp.where(ok, fq, jnp.int32(num_queries))

    # rows are already doc-ascending per query from the group sort, so a
    # STABLE (qid, score-desc) sort preserves the doc tie-break
    skey = _sortable_desc(sel_score)
    sq, _, sdoc, ssc = jax.lax.sort(
        (sel_q, skey, fdoc, sel_score), num_keys=2, is_stable=True
    )
    firsts = jnp.searchsorted(sq, jnp.arange(num_queries, dtype=jnp.int32))
    nexts = jnp.searchsorted(sq, jnp.arange(1, num_queries + 1, dtype=jnp.int32))
    idx = firsts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    sel = idx < nexts[:, None]
    idx = jnp.minimum(idx, n - 1)
    out_sc = jnp.where(sel, ssc[idx], NEG_INF)
    out_doc = jnp.where(sel, sdoc[idx], jnp.uint32(0))
    return out_sc, out_doc
