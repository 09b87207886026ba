"""Pallas TPU phrase (slop=0) kernel — position-slab design.

The XLA phrase kernel (`ops/phrase_scorer.py`) gathers [W, 128, pw]
position windows per term through XLA gathers that execute at ~0.5 GB/s on
this backend — the round-2 bench's dominant cost (phrase ~63 QPS). This
kernel never gathers positions:

* positions are re-laid out once per store as 2D row-DMA-able arrays
  `pstore [NPr, 128]` plus `ostore [NPr, 128]` holding each position's
  OWNER DOC id (`fused_store.ensure_positions`);
* a work item = one candidate block of the item's ANCHOR term. Its whole
  position slab (<= 2048 positions, host-checked via `blk_pos`) is one
  contiguous DMA, and each partner term's slab covering the anchor block's
  doc range (host-computed span) is another;
* the aligned-position count is a dense VPU compare: anchor position u
  (owner d) matches partner s iff the partner slab contains
  (owner == d, pos == pos_u + delta_s). No per-lane gathers, no in-doc tf
  caps — the round-2 MAX_P / MAX_OTHER_TF host-fallback cliffs are gone
  (replaced by exact host-computed slab-size rungs).

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
from .probe_scorer import pack_results_seg, per_query_topk_rows_seg
from .fmath import exact_div

NEG_INF = np.float32(-np.inf)

#: anchor slab rows: covers <= 2048 positions per anchor block (+ 8-align
#: slack). Blocks with more positions are re-anchored through a partner
#: term by the planner.
LROWS = 24
ANCHOR_POS_CAP = (LROWS - 8) * 128

#: partner slab rungs: (position cap, partner slab rows, W tiers, G)
_PHRASE_RUNGS = (
    (2048, 24, (256, 4096, 32768), 32),
    (16384, 136, (256, 2048), 8),
)
PARTNER_POS_CAP = _PHRASE_RUNGS[-1][0]


def phrase_w_tier(tiers, n: int) -> int:
    for w in tiers:
        if n <= w:
            return w
    return tiers[-1]


def _phrase_scal_layout(n_partners: int, G: int):
    """Per-item contiguous scalar slots (pow2 stride: addressing lowers to
    shifts/masks — see `pallas_probe._bool_scal_layout` for why). Slots:
    0=b, 1=prow, 2=lpos, 3=llen, then (cpos, clen, delta) per partner."""
    slots = 4 + 3 * n_partners
    stride = 8
    while stride < slots:
        stride *= 2
    spr = 128 // stride
    rows = -(-G // spr)
    return stride, spr, rows


def _phrase_kernel_body(n_partners: int, crows: int, num_prows: int, G: int,
                        npr: int):
    S = n_partners
    STRIDE, SPR, R = _phrase_scal_layout(S, G)

    def kernel(
        qw_ref,       # [Pp] f32 — phrase BM25 weight per plan row
        scal_hbm,     # [P, R, 128] i32 — per-item scalars (see layout)
        cstore_ref,   # [NB, 384] u32 (HBM)
        pstore_ref,   # [NPr, 128] u32 positions (HBM)
        ostore_ref,   # [NPr, 128] u32 owner docs (HBM)
        scores_ref,   # out [G, 128] f32
        docs_ref,     # out [G, 128] u32
        lane_buf,     # scratch VMEM [G, 8, 384] u32
        lpos_buf,     # scratch VMEM [G, LROWS, 128] u32
        lown_buf,     # scratch VMEM [G, LROWS, 128] u32
        ppos_buf,     # scratch VMEM [G, S, crows, 128] u32
        pown_buf,     # scratch VMEM [G, S, crows, 128] u32
        scal_ref,     # scratch SMEM [1, R, 128] i32
        sems,         # DMA sems [G, 3 + 2*S]
        scal_sem,
    ):
        cp = pltpu.make_async_copy(
            scal_hbm.at[pl.ds(pl.program_id(0), 1)], scal_ref, scal_sem
        )
        cp.start()
        cp.wait()

        def it(g, k):
            return scal_ref[0, g // SPR, (g % SPR) * STRIDE + k]

        def f_b(g):
            return it(g, 0)

        def f_prow(g):
            return it(g, 1)

        def f_lpos(g):
            return it(g, 2)

        def f_llen(g):
            return it(g, 3)

        def f_cpos(g, s):
            return it(g, 4 + 3 * s)

        def f_clen(g, s):
            return it(g, 5 + 3 * s)

        def f_delta(g, s):
            return it(g, 6 + 3 * s)

        def lrow0(g):
            r = (f_lpos(g) // 128) & ~7
            return jnp.minimum(r, npr - LROWS)

        def crow0(g, s):
            r = (f_cpos(g, s) // 128) & ~7
            return jnp.minimum(r, npr - crows)

        def dmas(g):
            b8 = pl.multiple_of((f_b(g) // 8) * 8, 8)
            out = [
                pltpu.make_async_copy(
                    cstore_ref.at[pl.ds(b8, 8)], lane_buf.at[g], sems.at[g, 0]
                ),
                pltpu.make_async_copy(
                    pstore_ref.at[pl.ds(pl.multiple_of(lrow0(g), 8), LROWS)],
                    lpos_buf.at[g],
                    sems.at[g, 1],
                ),
                pltpu.make_async_copy(
                    ostore_ref.at[pl.ds(pl.multiple_of(lrow0(g), 8), LROWS)],
                    lown_buf.at[g],
                    sems.at[g, 2],
                ),
            ]
            for s in range(S):
                c8 = pl.multiple_of(crow0(g, s), 8)
                out.append(
                    pltpu.make_async_copy(
                        pstore_ref.at[pl.ds(c8, crows)],
                        ppos_buf.at[g, s],
                        sems.at[g, 3 + 2 * s],
                    )
                )
                out.append(
                    pltpu.make_async_copy(
                        ostore_ref.at[pl.ds(c8, crows)],
                        pown_buf.at[g, s],
                        sems.at[g, 4 + 2 * s],
                    )
                )
            return out

        def start_g(g, _):
            for d in dmas(g):
                d.start()
            return 0

        jax.lax.fori_loop(0, G, start_g, 0)

        def compute_g(g, _):
            for d in dmas(g):
                d.wait()

            b_off = f_b(g) % 8
            row = lane_buf[g, pl.ds(b_off, 1), :]       # [1, 384]
            docs_row = row[:, 0:128]
            cachev = pltpu.bitcast(row[:, 256:384], jnp.float32)
            q = f_prow(g)
            lane_ok = (
                (docs_row != jnp.uint32(TERMINATED))
                & jnp.logical_not(jnp.isnan(cachev))
                & (q < num_prows)
            )
            docs_col = docs_row.astype(jnp.int32).reshape(128, 1)

            loff = f_lpos(g) - lrow0(g) * 128
            llen = f_llen(g)
            # The hot loops run over only the anchor/partner rows that hold
            # REAL data (dynamic fori_loop bounds driven by the slab
            # lengths), not the full static rung: a typical anchor block has
            # 1-3 position rows and a typical partner span a handful, while
            # the rungs pad to 24/136 rows — unrolled static loops burned
            # ~10-60x the necessary VPU compares. DMAs still fetch the full
            # static rung (DMA lengths must be static); only compute is
            # length-bounded.
            lrows_used = jnp.minimum((loff + llen + 127) // 128, LROWS)

            coffs = [f_cpos(g, s) - crow0(g, s) * 128 for s in range(S)]
            clens = [f_clen(g, s) for s in range(S)]
            crows_used = [
                jnp.minimum((coffs[s] + clens[s] + 127) // 128, crows)
                for s in range(S)
            ]

            # Mosaic constraints shape the loop nest: dynamic VMEM loads
            # must start at 8-aligned sublanes, so the dynamic loops step in
            # 8-row chunks (pl.multiple_of marks the alignment), and loop
            # carries are i32 (scf.for with vector<i1> carries fails to
            # legalize). Rows inside a chunk are processed by a static
            # 8-iteration loop.
            C8 = 8 * 128

            def anchor_chunk(ac, count):
                a0 = pl.multiple_of(ac * 8, 8)
                lp8 = lpos_buf[g, pl.ds(a0, 8), :].astype(jnp.int32)
                lo8 = lown_buf[g, pl.ds(a0, 8), :].astype(jnp.int32)
                for r8 in range(8):
                    lp = lp8[r8:r8 + 1, :]
                    lo = lo8[r8:r8 + 1, :]
                    riota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, 128), 1
                    ) + (ac * 8 + r8) * 128
                    m = (riota >= loff) & (riota < loff + llen)
                    lp_c = lp.reshape(128, 1)
                    lo_c = lo.reshape(128, 1)
                    for s in range(S):
                        tgt = lp_c + f_delta(g, s)

                        def partner_chunk(pc, hit, s=s, lo_c=lo_c, tgt=tgt):
                            c0 = pl.multiple_of(pc * 8, 8)
                            po = pown_buf[
                                g, s, pl.ds(c0, 8), :
                            ].astype(jnp.int32).reshape(1, C8)
                            pp = ppos_buf[
                                g, s, pl.ds(c0, 8), :
                            ].astype(jnp.int32).reshape(1, C8)
                            citer = jax.lax.broadcasted_iota(
                                jnp.int32, (1, C8), 1
                            ) + pc * C8
                            vp = (citer >= coffs[s]) & (
                                citer < coffs[s] + clens[s]
                            )
                            return hit | jnp.any(
                                vp & (po == lo_c) & (pp == tgt), axis=1
                            ).reshape(1, 128).astype(jnp.int32)

                        hit = jax.lax.fori_loop(
                            0, (crows_used[s] + 7) // 8, partner_chunk,
                            jnp.zeros((1, 128), dtype=jnp.int32),
                        )
                        m = m & ((hit > 0) | (clens[s] <= 0))
                    # attribute matched anchor positions to their lanes:
                    # [lanes, positions] eq matrix masked by the
                    # per-position match vector, summed over positions
                    count = count + jnp.sum(
                        (docs_col == lo) & m, axis=1
                    ).reshape(1, 128)
                return count

            count = jax.lax.fori_loop(
                0, (lrows_used + 7) // 8, anchor_chunk,
                jnp.zeros((1, 128), dtype=jnp.int32),
            )

            tf = count.astype(jnp.float32)
            score = qw_ref[q] * exact_div(tf, tf + cachev)
            ok = lane_ok & (count > 0)
            scores_ref[pl.ds(g, 1), :] = jnp.where(ok, score, NEG_INF)
            docs_ref[pl.ds(g, 1), :] = docs_row
            return 0

        jax.lax.fori_loop(0, G, compute_g, 0)

    return kernel


def _phrase_rows(scal, qw, cstore, pstore, ostore, *, n_partners, crows,
                 num_prows, G, W, interpret):
    npr = pstore.shape[0]
    kernel = _phrase_kernel_body(n_partners, crows, num_prows, G, npr)
    P = W // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((G, LROWS, 128), jnp.uint32),
            pltpu.VMEM((G, LROWS, 128), jnp.uint32),
            pltpu.VMEM((G, n_partners, crows, 128), jnp.uint32),
            pltpu.VMEM((G, n_partners, crows, 128), jnp.uint32),
            pltpu.SMEM(
                (1, _phrase_scal_layout(n_partners, G)[2], 128), jnp.int32
            ),
            pltpu.SemaphoreType.DMA((G, 3 + 2 * n_partners)),
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
    )(qw, scal, cstore, pstore, ostore)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "num_queries", "num_prows", "n_partners", "rungs", "interpret",
    ),
)
def fused_phrase_topk(
    rung_scal, rung_qid, rung_seg,
    qw,         # [Pp] f32
    cstore, pstore, ostore,
    k: int,
    num_queries: int,
    num_prows: int,
    n_partners: int,
    rungs: tuple,   # ((W, crows, G), ...)
    interpret: bool = False,
):
    """One launch for a phrase batch phase; packed [3, Q, k] result."""
    row_sc, row_doc, row_qid, row_seg = [], [], [], []
    kk = min(k, 128)
    token = None
    for (W, crows, G), scal, qid, seg in zip(
        rungs, rung_scal, rung_qid, rung_seg
    ):
        if token is not None:
            scal = scal + token
        scores, docs = _phrase_rows(
            scal, qw, cstore, pstore, ostore, n_partners=n_partners,
            crows=crows, num_prows=num_prows, G=G, W=W, interpret=interpret,
        )
        token = (docs[0, 0] & jnp.uint32(0)).astype(jnp.int32)
        sc, idx = jax.lax.top_k(scores, kk)
        row_sc.append(sc)
        row_doc.append(jnp.take_along_axis(docs, idx, axis=1))
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
        )
    )


def launch_fused_phrase(
    fused, work, qw_table, n_partners: int, k: int, num_queries: int,
    interpret: bool,
) -> list:
    """Assemble rung chunks and launch. `work` columns (numpy):
    blocks [N], prow [N], qid [N], seg [N], lpos [N], llen [N],
    cpos [N, S], clen [N, S], delta [N, S], span [N] (max partner slab
    positions, picks the rung)."""
    blocks, prow, qid, seg, lpos, llen, cpos, clen, delta, span = work
    if len(blocks) == 0:
        return []
    num_prows = len(qw_table) - 1
    S = n_partners

    def make_chunk(rung, sel_idx, lo):
        cap_pos, crows, tiers, G = rung
        hi = min(lo + tiers[-1], len(sel_idx))
        n = hi - lo
        W = phrase_w_tier(tiers, max(n, 1))
        idx = sel_idx[lo:hi]
        b_pad = np.zeros(W, dtype=np.int32)
        p_pad = np.full(W, num_prows, dtype=np.int32)
        q_pad = np.full(W, num_queries, dtype=np.int32)
        s_pad = np.zeros(W, dtype=np.int32)
        lp_pad = np.zeros(W, dtype=np.int32)
        ll_pad = np.zeros(W, dtype=np.int32)
        cp_pad = np.zeros((W, S), dtype=np.int32)
        cl_pad = np.zeros((W, S), dtype=np.int32)
        dl_pad = np.zeros((W, S), dtype=np.int32)
        b_pad[:n] = blocks[idx]
        p_pad[:n] = prow[idx]
        q_pad[:n] = qid[idx]
        s_pad[:n] = seg[idx]
        lp_pad[:n] = lpos[idx]
        ll_pad[:n] = llen[idx]
        cp_pad[:n] = cpos[idx]
        cl_pad[:n] = clen[idx]
        dl_pad[:n] = delta[idx]
        G_ = G
        P = W // G_
        STRIDE, SPR, R = _phrase_scal_layout(S, G_)
        rows = np.zeros((W, STRIDE), dtype=np.int32)
        rows[:, 0] = b_pad
        rows[:, 1] = p_pad
        rows[:, 2] = lp_pad
        rows[:, 3] = ll_pad
        for s in range(S):
            rows[:, 4 + 3 * s] = cp_pad[:, s]
            rows[:, 5 + 3 * s] = cl_pad[:, s]
            rows[:, 6 + 3 * s] = dl_pad[:, s]
        flat = rows.reshape(P, G_ * STRIDE)
        flat = np.pad(flat, ((0, 0), (0, R * 128 - G_ * STRIDE)))
        scal = flat.reshape(P, R, 128)
        return (W, crows, G_), jnp.asarray(scal), jnp.asarray(q_pad), \
            jnp.asarray(s_pad), hi

    qw_dev = jnp.asarray(qw_table)

    def launch(chunks):
        return fused_phrase_topk(
            tuple(c[1] for c in chunks),
            tuple(c[2] for c in chunks),
            tuple(c[3] for c in chunks),
            qw_dev, fused.cstore, fused.pstore, fused.ostore,
            k=k, num_queries=num_queries, num_prows=num_prows,
            n_partners=S, rungs=tuple(c[0] for c in chunks),
            interpret=interpret,
        )

    outs = []
    first = []
    leftovers = []
    prev_cap = -1
    for rung in _PHRASE_RUNGS:
        sel = np.nonzero((span > prev_cap) & (span <= rung[0]))[0]
        prev_cap = rung[0]
        chunk = make_chunk(rung, sel, 0)
        first.append(chunk)
        leftovers.append((rung, sel, chunk[4]))
    outs.append(launch(first))
    for rung, sel, done in leftovers:
        while done < len(sel):
            chunk = make_chunk(rung, sel, done)
            done = chunk[4]
            outs.append(launch([chunk]))
    return outs
