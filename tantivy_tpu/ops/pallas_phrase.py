"""Pallas TPU phrase (slop=0) kernel — masked 8-run GROUP position-slab
design.

The XLA phrase kernel (`ops/phrase_scorer.py`) gathers [W, 128, pw]
position windows per term through XLA gathers that execute at ~0.5 GB/s on
this backend. This kernel never gathers positions, and amortizes every DMA
across up to 8 anchor blocks:

* positions are re-laid out once per store as ONE 2D row-DMA-able array
  `postore [NPr, 256]` — row r holds positions 128r..128r+127 in columns
  0:128 and each position's OWNER DOC id in columns 128:256
  (`fused_store.ensure_positions`), so a single DMA serves both the
  alignment compare and the doc-membership compare;
* a work item = up to 8 consecutive blocks (one cstore super-row) of the
  item's ANCHOR term, gated by an 8-bit member mask. The members' position
  slabs are CONTIGUOUS in the postore (positions are serialized in
  (term, block) order), so one slab DMA covers all of them; each partner
  term's slab covering the union of the members' doc ranges is one more
  DMA. Per-member sub-ranges ride per-row scalars, so the compare loops
  scan exactly the rows a single-block item would have scanned — grouping
  divides DMA issue/wait and scalar-setup overhead by up to 8 at equal
  compute;
* the aligned-position count is a dense VPU compare: anchor position u
  (owner d) matches partner s iff the partner slab contains
  (owner == d, pos == pos_u + delta_s).

Scores are `q_weight * tf/(tf + norm)` with tf = aligned count, exactly the
host engine's phrase BM25 (reference `phrase_scorer.rs:46-120`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..postings.format import TERMINATED
from .fmath import exact_div
from .probe_scorer import (
    pack_results_seg,
    per_query_topk_rows_seg,
)

NEG_INF = np.float32(-np.inf)

#: slab rungs: (rows, W tiers in GROUP items). `rows` bounds BOTH the anchor
#: slab and each partner slab fetched per item; a rung admits a group when
#: every slab's aligned row need fits. Oversized groups split into singleton
#: groups, which always fit the widest rung (see the per-block caps below).
_PHRASE_RUNGS = (
    (24, (256, 8192, 32768)),
    (136, (256, 2048, 8192)),
)

#: per-BLOCK caps enforced by the planner's bad-check: a single block's
#: anchor slab / partner span must fit the widest rung even after the 8-row
#: DMA alignment slack, so singleton-group fallback is always possible.
ANCHOR_POS_CAP = (_PHRASE_RUNGS[-1][0] - 8) * 128
PARTNER_POS_CAP = (_PHRASE_RUNGS[-1][0] - 8) * 128


def max_slab_rows() -> int:
    return _PHRASE_RUNGS[-1][0]


def _g_items_phrase(rows: int, n_partners: int) -> int:
    """Group items per grid program under a ~3.5MB VMEM budget: per item
    lane_buf 8x384 + (1 + S) slabs of rows x 256 u32 words."""
    words = 8 * 384 + rows * 256 * (1 + n_partners)
    budget = 3_500_000
    g = budget // (words * 4)
    for cand in (32, 16, 8, 4, 2):
        if cand <= g:
            return cand
    return 1


def _phrase_scal_layout(n_partners: int, G: int):
    """Per-item contiguous scalar slots (pow2 stride; slot k of item g lives
    at flat index g*STRIDE + k of the [R, 128] page). Shared slots:
    0=row_base (8-aligned cstore row), 1=prow, 2=member mask, 3=arow0
    (anchor slab DMA row, host-clamped), then per partner s:
    4+2s=crow0_s, 5+2s=delta_s. Per-row slots (r in 0..8): A+r=loff_r,
    A+8+r=llen_r, then per partner s: A+16+16s+r=off_rs, A+24+16s+r=len_rs,
    where A = 4 + 2*n_partners."""
    slots = 20 + 18 * n_partners
    stride = 8
    while stride < slots:
        stride *= 2
    rows = -(-(G * stride) // 128)
    return stride, rows


def _phrase_kernel_body(n_partners: int, rows: int, num_prows: int, G: int,
                        kk: int):
    S = n_partners
    RR = rows
    STRIDE, R = _phrase_scal_layout(S, G)
    A = 4 + 2 * S

    def kernel(
        qw_ref,       # [Pp] f32 — phrase BM25 weight per plan row
        row_th_ref,   # [Pp] f32 — per-row score threshold (NEG_INF = none)
        scal_hbm,     # [P, R, 128] i32 — per-item scalars (see layout)
        cstore_ref,   # [NB, 384] u32 (HBM)
        postore_ref,  # [NPr, 256] u32 positions | owner docs (HBM)
        scores_ref,   # out [G, 128] f32 — per-GROUP top-kk lanes
        docs_ref,     # out [G, 128] u32
        lane_buf,     # scratch VMEM [G, 8, 384] u32
        apos_buf,     # scratch VMEM [G, RR, 256] u32
        ppos_buf,     # scratch VMEM [G, S, RR, 256] u32
        rs_buf,       # scratch VMEM [8, 128] f32 — member-row scores
        rd_buf,       # scratch VMEM [8, 128] i32 — member-row docs
        scal_ref,     # scratch SMEM [1, R, 128] i32
        sems,         # DMA sems [G, 2 + S]
        scal_sem,
    ):
        cp = pltpu.make_async_copy(
            scal_hbm.at[pl.ds(pl.program_id(0), 1)], scal_ref, scal_sem
        )
        cp.start()
        # ONE block-wide memset covers every padding / masked group row;
        # real groups overwrite their row with the in-kernel per-group
        # top-kk reduction (see pallas_probe._grp_kernel_body — the XLA
        # group_topk_rows pass over padded member rows dominated launches)
        scores_ref[...] = jnp.full((G, 128), NEG_INF, dtype=jnp.float32)
        docs_ref[...] = jnp.full(
            (G, 128), jnp.uint32(TERMINATED), dtype=jnp.uint32
        )
        cp.wait()

        def it(g, k):
            flat = g * STRIDE + k
            return scal_ref[0, flat // 128, flat % 128]

        def dmas(g):
            b8 = pl.multiple_of(it(g, 0), 8)
            a0 = pl.multiple_of(it(g, 3), 8)
            out = [
                pltpu.make_async_copy(
                    cstore_ref.at[pl.ds(b8, 8)], lane_buf.at[g], sems.at[g, 0]
                ),
                pltpu.make_async_copy(
                    postore_ref.at[pl.ds(a0, RR)],
                    apos_buf.at[g],
                    sems.at[g, 1],
                ),
            ]
            for s in range(S):
                c8 = pl.multiple_of(it(g, 4 + 2 * s), 8)
                out.append(
                    pltpu.make_async_copy(
                        postore_ref.at[pl.ds(c8, RR)],
                        ppos_buf.at[g, s],
                        sems.at[g, 2 + s],
                    )
                )
            return out

        def start_g(g, _):
            @pl.when(it(g, 2) != 0)  # fully-masked items are list padding
            def _():
                for d in dmas(g):
                    d.start()
            return 0

        jax.lax.fori_loop(0, G, start_g, 0)

        C8 = 8 * 128

        def compute_g(g, _):
            q = it(g, 1)
            mask = it(g, 2)
            deltas = [it(g, 5 + 2 * s) for s in range(S)]

            # fully-masked groups are list padding: the block-wide memset
            # already wrote their rows
            @pl.when(mask != 0)
            def _(g=g):
                for d in dmas(g):
                    d.wait()
                # member-row scratch: rows whose mask bit is 0 keep -inf
                rs_buf[...] = jnp.full((8, 128), NEG_INF, dtype=jnp.float32)
                rd_buf[...] = jnp.full(
                    (8, 128), jnp.int32(TERMINATED), dtype=jnp.int32
                )

                # dynamic row loop (a static 8x unroll of the whole anchor /
                # partner machinery multiplies Mosaic compile time; see
                # pallas_probe._grp_kernel_body). i32 reduce: Mosaic has no
                # unsigned reductions; every cstore word is < 2^31.
                rows_all = pltpu.bitcast(lane_buf[g], jnp.int32)  # [8, 384]

                def row_body(r8, _):
                    bit = (mask >> r8) & 1

                    @pl.when(bit != 0)
                    def _(g=g, r8=r8):
                        sel_r = jax.lax.broadcasted_iota(
                            jnp.int32, (8, 1), 0
                        ) == r8
                        row = pltpu.bitcast(
                            jnp.sum(
                                jnp.where(sel_r, rows_all, 0),
                                axis=0, keepdims=True, dtype=jnp.int32,
                            ),
                            jnp.uint32,
                        )                                        # [1, 384]
                        docs_row = row[:, 0:128]
                        cachev = pltpu.bitcast(row[:, 256:384], jnp.float32)
                        lane_ok = (
                            (docs_row != jnp.uint32(TERMINATED))
                            & jnp.logical_not(jnp.isnan(cachev))
                            & (q < num_prows)
                        )
                        docs_col = docs_row.astype(jnp.int32).reshape(128, 1)

                        loff = it(g, A + r8)
                        llen = it(g, A + 8 + r8)
                        poffs = [it(g, A + 16 + 16 * s + r8) for s in range(S)]
                        plens = [it(g, A + 24 + 16 * s + r8) for s in range(S)]

                        # The hot loops run over only the slab rows holding THIS
                        # member block's data (dynamic fori_loop start AND end
                        # from the per-row scalars): grouping fetches a bigger
                        # slab but scans exactly what a single-block item would.
                        # Mosaic constraints: dynamic VMEM loads step in 8-row
                        # chunks from 8-aligned starts; loop carries are i32.

                        def anchor_row(ar, count, g=g):
                            # ar = absolute anchor slab row; dynamic loop (a
                            # static 8x unroll of the partner machinery
                            # multiplies compile time). The 8-row chunk holding
                            # the row loads 8-aligned; the row extracts by a
                            # masked reduce.
                            a0 = pl.multiple_of((ar // 8) * 8, 8)
                            lp8 = apos_buf[g, pl.ds(a0, 8), 0:128].astype(
                                jnp.int32
                            )
                            lo8 = apos_buf[g, pl.ds(a0, 8), 128:256].astype(
                                jnp.int32
                            )
                            sel_a = jax.lax.broadcasted_iota(
                                jnp.int32, (8, 1), 0
                            ) == (ar % 8)
                            lp = jnp.sum(
                                jnp.where(sel_a, lp8, 0), axis=0, keepdims=True
                            )
                            lo = jnp.sum(
                                jnp.where(sel_a, lo8, 0), axis=0, keepdims=True
                            )
                            riota = jax.lax.broadcasted_iota(
                                jnp.int32, (1, 128), 1
                            ) + ar * 128
                            m = (riota >= loff) & (riota < loff + llen)
                            lp_c = lp.reshape(128, 1)
                            lo_c = lo.reshape(128, 1)
                            for s in range(S):
                                tgt = lp_c + deltas[s]
                                pc_lo = poffs[s] // C8
                                pc_hi = (poffs[s] + plens[s] + C8 - 1) // C8

                                def partner_chunk(
                                    pc, hit, s=s, lo_c=lo_c, tgt=tgt
                                ):
                                    c0 = pl.multiple_of(pc * 8, 8)
                                    po = ppos_buf[
                                        g, s, pl.ds(c0, 8), 128:256
                                    ].astype(jnp.int32).reshape(1, C8)
                                    pp = ppos_buf[
                                        g, s, pl.ds(c0, 8), 0:128
                                    ].astype(jnp.int32).reshape(1, C8)
                                    citer = jax.lax.broadcasted_iota(
                                        jnp.int32, (1, C8), 1
                                    ) + pc * C8
                                    vp = (citer >= poffs[s]) & (
                                        citer < poffs[s] + plens[s]
                                    )
                                    return hit | jnp.any(
                                        vp & (po == lo_c) & (pp == tgt),
                                        axis=1,
                                    ).reshape(1, 128).astype(jnp.int32)

                                hit = jax.lax.fori_loop(
                                    pc_lo, pc_hi, partner_chunk,
                                    jnp.zeros((1, 128), dtype=jnp.int32),
                                )
                                m = m & ((hit > 0) | (plens[s] <= 0))
                            return count + jnp.sum(
                                (docs_col == lo) & m, axis=1
                            ).reshape(1, 128)

                        count = jax.lax.fori_loop(
                            loff // 128,
                            jnp.minimum((loff + llen + 127) // 128, RR),
                            anchor_row,
                            jnp.zeros((1, 128), dtype=jnp.int32),
                        )

                        tf = count.astype(jnp.float32)
                        score = qw_ref[q] * exact_div(tf, tf + cachev)
                        ok = lane_ok & (count > 0)
                        rs_buf[pl.ds(r8, 1), :] = jnp.where(
                            ok, score, NEG_INF
                        )
                        rd_buf[pl.ds(r8, 1), :] = docs_row.astype(jnp.int32)
                    return 0

                jax.lax.fori_loop(0, 8, row_body, 0)

                # in-kernel per-group top-kk (bitwise the group_topk_rows
                # selection: flat (member row, lane) order on ties — rows
                # ascend by block, lanes by doc)
                sc = rs_buf[...]
                dci = rd_buf[...]
                flat = (
                    jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                )
                lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

                def extract(j, carry):
                    s, b_sc, b_dc = carry
                    m = jnp.max(
                        jnp.max(s, axis=0, keepdims=True),
                        axis=1, keepdims=True,
                    )
                    eq = s == m
                    pick = jnp.min(
                        jnp.min(
                            jnp.where(eq, flat, jnp.int32(8 * 128)),
                            axis=0, keepdims=True,
                        ),
                        axis=1, keepdims=True,
                    )
                    hit = flat == pick
                    d = jnp.sum(
                        jnp.sum(
                            jnp.where(hit, dci, 0),
                            axis=0, keepdims=True, dtype=jnp.int32,
                        ),
                        axis=1, keepdims=True, dtype=jnp.int32,
                    )
                    sel = lane_j == j
                    b_sc = jnp.where(sel, m, b_sc)
                    b_dc = jnp.where(sel, d, b_dc)
                    s = jnp.where(hit, NEG_INF, s)
                    return s, b_sc, b_dc

                # threshold-bounded extraction (see
                # pallas_probe._grp_kernel_body): phase-2 rows carry the
                # query's current kth score; survivors are typically 0-3,
                # so the loop runs far below its blind kk trip count
                th_q = row_th_ref[q]
                n_sur = jnp.sum(
                    ((sc >= th_q) & (sc != NEG_INF)).astype(jnp.int32)
                )
                _, best_sc, best_dc = jax.lax.fori_loop(
                    0, jnp.minimum(n_sur, kk), extract,
                    (
                        sc,
                        jnp.full((1, 128), NEG_INF, dtype=jnp.float32),
                        jnp.full(
                            (1, 128), jnp.int32(TERMINATED), dtype=jnp.int32
                        ),
                    ),
                )
                scores_ref[pl.ds(g, 1), :] = best_sc
                docs_ref[pl.ds(g, 1), :] = pltpu.bitcast(
                    best_dc, jnp.uint32
                )
            return 0

        jax.lax.fori_loop(0, G, compute_g, 0)

    return kernel


def _phrase_rows(scal, qw, row_th, cstore, postore, *, n_partners, rows,
                 num_prows, G, W, kk, interpret):
    kernel = _phrase_kernel_body(n_partners, rows, num_prows, G, kk)
    P = W // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((G, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, 8, 384), jnp.uint32),
            pltpu.VMEM((G, rows, 256), jnp.uint32),
            pltpu.VMEM((G, n_partners, rows, 256), jnp.uint32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SMEM(
                (1, _phrase_scal_layout(n_partners, G)[1], 128), jnp.int32
            ),
            pltpu.SemaphoreType.DMA((G, 2 + n_partners)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((W, 128), jnp.float32),
            jax.ShapeDtypeStruct((W, 128), jnp.uint32),
        ],
        interpret=interpret,
    )(qw, row_th, scal, cstore, postore)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "num_queries", "num_prows", "n_partners", "rungs", "interpret",
        "pack_addr",
    ),
)
def fused_phrase_topk(
    rung_scal, rung_qid, rung_seg,
    qw,         # [Pp] f32
    row_th,     # [Pp] f32 — per-row extraction threshold (NEG_INF = none)
    cstore, postore,
    k: int,
    num_queries: int,
    num_prows: int,
    n_partners: int,
    rungs: tuple,   # ((W, rows, G), ...)
    interpret: bool = False,
    pack_addr: bool = False,
):
    """One launch for a phrase batch phase; packed [3, Q, k] result.

    The merge tail mirrors `pallas_probe.fused_bool_topk`: a per-GROUP
    top-kk reduction first (a group's 8 member rows share one
    (query, segment) and hold distinct docs — anchor blocks of one clause
    region have disjoint doc ranges), then one flat cross-rung sort,
    3-key-packed when `pack_addr` holds."""
    row_sc, row_doc, row_qid, row_seg = [], [], [], []
    kk = min(k, 128)
    token = None
    for (W, rows, G), scal, qid, seg in zip(
        rungs, rung_scal, rung_qid, rung_seg
    ):
        if token is not None:
            scal = scal + token
        scores, docs = _phrase_rows(
            scal, qw, row_th, cstore, postore, n_partners=n_partners,
            rows=rows, num_prows=num_prows, G=G, W=W, kk=kk,
            interpret=interpret,
        )
        token = (docs[0, 0] & jnp.uint32(0)).astype(jnp.int32)
        row_sc.append(scores[:, :kk])
        row_doc.append(docs[:, :kk])
        row_qid.append(qid)
        row_seg.append(seg)
    return pack_results_seg(
        *per_query_topk_rows_seg(
            jnp.concatenate(row_sc),
            jnp.concatenate(row_doc),
            jnp.concatenate(row_seg),
            jnp.concatenate(row_qid),
            k,
            num_queries,
            pack_addr=pack_addr,
        )
    )


def _phrase_groups(ids, prow, anchor, lpos, llen, cpos, clen, npr: int):
    """Collapse per-block phrase work into masked 8-run groups keyed by
    (prow, anchor term, block//8). Returns per-group arrays:
    base, mask, prow_g, row-major member scatter (lpos8/llen8 [n,8],
    cpos8/clen8 [n,8,S]), slab spans, and the member->group index map."""
    S = cpos.shape[1]
    key = (prow.astype(np.int64) * 64 + anchor) * (1 << 28) + ids // 8
    order = np.argsort(key, kind="stable")
    ukey, starts, counts = np.unique(
        key[order], return_index=True, return_counts=True
    )
    n_g = len(starts)
    io = order[starts]
    gidx = np.repeat(np.arange(n_g), counts)
    r = (ids[order] % 8).astype(np.int64)
    base = (ids[io] // 8) * 8
    mask = np.bitwise_or.reduceat(np.int64(1) << r, starts)
    lpos8 = np.zeros((n_g, 8), dtype=np.int64)
    llen8 = np.zeros((n_g, 8), dtype=np.int64)
    lpos8[gidx, r] = lpos[order]
    llen8[gidx, r] = llen[order]
    cpos8 = np.zeros((n_g, 8, S), dtype=np.int64)
    clen8 = np.zeros((n_g, 8, S), dtype=np.int64)
    cpos8[gidx, r] = cpos[order]
    clen8[gidx, r] = clen[order]
    amin = np.minimum.reduceat(lpos[order], starts)
    amax = np.maximum.reduceat(lpos[order] + llen[order], starts)
    i64max = np.iinfo(np.int64).max
    cmin = np.empty((n_g, S), dtype=np.int64)
    cmax = np.empty((n_g, S), dtype=np.int64)
    for s in range(S):
        cs, ce = cpos[order, s], cpos[order, s] + clen[order, s]
        has = clen[order, s] > 0
        cmin[:, s] = np.minimum.reduceat(np.where(has, cs, i64max), starts)
        cmax[:, s] = np.maximum.reduceat(np.where(has, ce, -1), starts)
    cmin = np.where(cmin == i64max, 0, cmin)
    cmax = np.maximum(cmax, cmin)
    return base, mask, prow[io], amin, amax, cmin, cmax, \
        lpos8, llen8, cpos8, clen8, io, order, starts, gidx


def launch_fused_phrase(
    fused, work, qw_table, n_partners: int, k: int, num_queries: int,
    interpret: bool, row_th=None,
) -> list:
    """Group per-block phrase work items into masked 8-runs, assemble rung
    chunks, and launch. `work` columns (numpy, per BLOCK): blocks [N],
    prow [N], qid [N], seg [N], lpos [N], llen [N], cpos [N, S], clen [N, S],
    delta [N, S], anchor [N] (anchor term index, group key only). `row_th`
    [Pp] f32 (optional) carries each plan row's current kth score for
    threshold-bounded in-kernel extraction."""
    blocks, prow, qid, seg, lpos, llen, cpos, clen, delta, anchor = work
    if len(blocks) == 0:
        return []
    num_prows = len(qw_table) - 1
    S = n_partners
    npr = fused.pos_rows

    (base, mask, prow_g, amin, amax, cmin, cmax, lpos8, llen8, cpos8,
     clen8, io, order, starts, gidx) = _phrase_groups(
        blocks, prow, anchor, lpos, llen, cpos, clen, npr
    )
    qid_g, seg_g = qid[io], seg[io]
    delta_g = delta[io]  # same query per group => same deltas

    # rung need: aligned slab rows for the anchor span and each partner span
    def rows_needed(lo, hi):
        r0 = (lo // 128) & ~7
        return -(-(hi - r0 * 128) // 128)

    need = rows_needed(amin, amax)
    for s in range(S):
        need = np.maximum(need, rows_needed(cmin[:, s], cmax[:, s]))

    # groups too fat for the widest rung split into singleton groups (each
    # block fits the widest rung by the planner's per-block caps)
    max_rows = _PHRASE_RUNGS[-1][0]
    fat = need > max_rows
    if fat.any():
        fat_members = fat[gidx]  # in `order` order
        sel = order[fat_members]
        s_base = (blocks[sel] // 8) * 8
        s_mask = np.int64(1) << (blocks[sel] % 8)
        keep = ~fat
        base = np.concatenate([base[keep], s_base])
        mask = np.concatenate([mask[keep], s_mask])
        prow_g = np.concatenate([prow_g[keep], prow[sel]])
        qid_g = np.concatenate([qid_g[keep], qid[sel]])
        seg_g = np.concatenate([seg_g[keep], seg[sel]])
        delta_g = np.concatenate([delta_g[keep], delta[sel]])
        r = (blocks[sel] % 8).astype(np.int64)
        n_s = len(sel)
        sl_lpos8 = np.zeros((n_s, 8), dtype=np.int64)
        sl_llen8 = np.zeros((n_s, 8), dtype=np.int64)
        sl_lpos8[np.arange(n_s), r] = lpos[sel]
        sl_llen8[np.arange(n_s), r] = llen[sel]
        sl_cpos8 = np.zeros((n_s, 8, S), dtype=np.int64)
        sl_clen8 = np.zeros((n_s, 8, S), dtype=np.int64)
        sl_cpos8[np.arange(n_s), r] = cpos[sel]
        sl_clen8[np.arange(n_s), r] = clen[sel]
        lpos8 = np.concatenate([lpos8[keep], sl_lpos8])
        llen8 = np.concatenate([llen8[keep], sl_llen8])
        cpos8 = np.concatenate([cpos8[keep], sl_cpos8])
        clen8 = np.concatenate([clen8[keep], sl_clen8])
        amin = np.concatenate([amin[keep], lpos[sel]])
        amax = np.concatenate([amax[keep], lpos[sel] + llen[sel]])
        cmin = np.concatenate([cmin[keep], cpos[sel]])
        cmax = np.concatenate([cmax[keep], cpos[sel] + clen[sel]])
        need = np.concatenate(
            [need[keep],
         np.maximum(
                rows_needed(lpos[sel], lpos[sel] + llen[sel]),
                np.max(
                    rows_needed(cpos[sel], cpos[sel] + clen[sel]),
                    axis=1, initial=1,
                ),
            )]
        )

    # ONE SHARED tier level across rungs (see pallas_probe.launch_fused_bool:
    # the signature set is the ladder DIAGONAL, fully prewarmable)
    per_rung = []
    prev = 0
    for rows, tiers in _PHRASE_RUNGS:
        sel = np.nonzero((need > prev) & (need <= rows))[0]
        prev = rows
        per_rung.append([rows, tiers, sel, 0])
    lvl_shared = max(
        next((i for i, w in enumerate(tiers) if len(sel) <= w),
             len(tiers) - 1)
        for rows, tiers, sel, _ in per_rung
    )

    def make_chunk(rows, tiers, sel_idx, lo, level):
        RR = rows
        W = tiers[min(level, len(tiers) - 1)]
        hi = min(lo + W, len(sel_idx))
        n = hi - lo
        idx = sel_idx[lo:hi]
        G = _g_items_phrase(RR, S)
        if n == 0:
            # fully-masked filler rung (overflow rounds): one cached
            # device-resident page per shape — zero host build or transfer
            return _empty_chunk(RR, W, G, S, num_prows, num_queries), hi
        STRIDE, R = _phrase_scal_layout(S, G)
        A = 4 + 2 * S
        rows_sc = np.zeros((W, STRIDE), dtype=np.int64)
        rows_sc[:, 1] = num_prows
        arow0 = np.clip((amin[idx] // 128) & ~7, 0, npr - RR)
        rows_sc[:n, 0] = base[idx]
        rows_sc[:n, 1] = prow_g[idx]
        rows_sc[:n, 2] = mask[idx]
        rows_sc[:n, 3] = arow0
        loff = lpos8[idx] - arow0[:, None] * 128
        rows_sc[:n, A:A + 8] = np.where(llen8[idx] > 0, loff, 0)
        rows_sc[:n, A + 8:A + 16] = llen8[idx]
        for s in range(S):
            crow0 = np.clip((cmin[idx, s] // 128) & ~7, 0, npr - RR)
            rows_sc[:n, 4 + 2 * s] = crow0
            rows_sc[:n, 5 + 2 * s] = delta_g[idx, s]
            poff = cpos8[idx, :, s] - crow0[:, None] * 128
            rows_sc[:n, A + 16 + 16 * s:A + 24 + 16 * s] = np.where(
                clen8[idx, :, s] > 0, poff, 0
            )
            rows_sc[:n, A + 24 + 16 * s:A + 32 + 16 * s] = \
                clen8[idx, :, s]
        q_pad = np.full(W, num_queries, dtype=np.int32)
        s_pad = np.zeros(W, dtype=np.int32)
        q_pad[:n] = qid_g[idx]
        s_pad[:n] = seg_g[idx]
        P = W // G
        flat = rows_sc.astype(np.int32).reshape(P, G * STRIDE)
        flat = np.pad(flat, ((0, 0), (0, R * 128 - G * STRIDE)))
        scal = flat.reshape(P, R, 128)
        return ((W, RR, G), jnp.asarray(scal), jnp.asarray(q_pad),
                jnp.asarray(s_pad)), hi

    qw_dev = jnp.asarray(qw_table)
    if row_th is None:
        row_th = np.full(num_prows + 1, NEG_INF, dtype=np.float32)
    th_dev = jnp.asarray(row_th)
    pack_addr = bool(getattr(fused, "pack_addr_ok", False))

    def launch(chunks):
        return fused_phrase_topk(
            tuple(c[1] for c in chunks),
            tuple(c[2] for c in chunks),
            tuple(c[3] for c in chunks),
            qw_dev, th_dev, fused.cstore, fused.postore,
            k=k, num_queries=num_queries, num_prows=num_prows,
            n_partners=S, rungs=tuple(c[0] for c in chunks),
            interpret=interpret, pack_addr=pack_addr,
        )

    # every launch carries ALL rungs at the shared level (exhausted rungs
    # ride as fully-masked cached filler) so overflow rounds reuse the same
    # compiled signature — see pallas_probe.launch_fused_bool
    outs = []
    while True:
        chunks = []
        progressed = False
        for r in per_rung:
            chunk, hi = make_chunk(r[0], r[1], r[2], r[3], lvl_shared)
            if hi > r[3]:
                progressed = True
            r[3] = hi
            chunks.append(chunk)
        if not progressed and outs:
            break
        outs.append(launch(chunks))
        if all(r[3] >= len(r[2]) for r in per_rung):
            break
    return outs


_EMPTY_CHUNKS: dict = {}


def _empty_chunk(RR, W, G, S, num_prows, num_queries):
    """Cached fully-masked scalar pages for exhausted phrase rungs (member
    mask 0 => the kernel elides every DMA and reports nothing)."""
    key = (RR, W, G, S, num_prows, num_queries)
    c = _EMPTY_CHUNKS.get(key)
    if c is None:
        STRIDE, R = _phrase_scal_layout(S, G)
        rows_sc = np.zeros((W, STRIDE), dtype=np.int32)
        rows_sc[:, 1] = num_prows
        P = W // G
        flat = rows_sc.reshape(P, G * STRIDE)
        flat = np.pad(flat, ((0, 0), (0, R * 128 - G * STRIDE)))
        c = (
            (W, RR, G),
            jnp.asarray(flat.reshape(P, R, 128)),
            jnp.asarray(np.full(W, num_queries, dtype=np.int32)),
            jnp.asarray(np.zeros(W, dtype=np.int32)),
        )
        _EMPTY_CHUNKS[key] = c
    return c
