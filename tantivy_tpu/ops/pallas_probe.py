"""Pallas TPU kernel for the windowed boolean probe scorer.

Why this exists: the remoted TPU backend executes XLA gather ops at an
effective ~0.5 GB/s with a fixed per-launch tax, which caps the XLA probe
kernel (`ops/probe_scorer.py`) at ~80ns/lane of pure data movement. This
kernel moves the same data with manual async DMA — real HBM bandwidth —
and does all probe compute in VMEM:

* one combined row store `cstore [NB, 384] u32` holds, per posting block,
  `docs | tfs | bitcast(cache_value)` where cache_value is the BM25
  tf-denominator for the posting's doc (NaN marks deleted/padding lanes) —
  one DMA fetches everything a lane needs;
* window locations are computed on the HOST during planning (the same
  searchsorted the UB pass already does), arriving as scalar-prefetch
  arrays, so the kernel issues `kw`-row window DMAs directly;
* presence/tf resolve by dense equality sums over the VMEM window —
  pure VPU work.

Scoring semantics are identical to `probe_bool_topk_window` (clause-order
f32 summation, MUST/SHOULD/MUST_NOT counts, minimum_should_match, primary
lane dedup); the XLA tail (row top-k + per-query merge) is shared.
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
    KIND_MUST,
    KIND_MUST_NOT,
    KIND_SHOULD,
    T_MAX,
    pack_results,
    pack_results_seg,
    per_query_topk_from_rows,
    per_query_topk_rows_seg,
)

NEG_INF = np.float32(-np.inf)

#: dev-only kernel ablation knob for perf diagnostics (scripts/diag_*):
#: None (production) | "nodma" | "noprobe2" | "nocombine" | "noextract".
#: Read at TRACE time — diagnostic scripts must build a fresh jit wrapper
#: per mode. Never set in production paths.
_ABLATE = None


def _kw8(kw: int) -> int:
    """Fetched window rows for rung kw: rounded to the 8-row DMA
    granularity, plus 8 slack rows on wide rungs only (slice plans overlap
    adjacent slices by 8 rows — `stride_cov` in the planner; narrow rungs
    measure width from the 8-aligned window start, so the roundup alone
    covers the whole overlap and fetching 16 rows where 8 suffice doubled
    both window DMA traffic and the per-item compare loop)."""
    r = (kw + 7) & ~7
    return r + 8 if kw > 8 else max(r, 8)


def _g_items(kw: int, n_clauses: int = 2) -> int:
    """Work items per grid program, sized to a ~3.5MB VMEM window budget:
    win_buf = G * n_clauses * kw8 * 384 * 4 bytes."""
    kw8 = _kw8(kw)
    budget = 3_500_000
    g = budget // (max(n_clauses, 1) * kw8 * 384 * 4)
    for cand in (64, 32, 16):
        if cand <= g:
            return cand
    # floor: pallas output blocks need 8-divisible rows
    return 8


def build_cstore(docs, tfs, norm_ids, alive, cache):
    """[NBp, 384] u32 combined row store: docs | tfs | bitcast(cachev) with
    NaN marking deleted/pad lanes; rows padded to a multiple of 8 (Mosaic
    tiles HBM memrefs (8, 128), so DMA row slices must be 8-aligned).
    Built once per (segment, field)."""
    max_doc = norm_ids.shape[0]
    safe = jnp.minimum(docs, jnp.uint32(max(max_doc - 1, 0)))
    cachev = cache[norm_ids[safe].astype(jnp.int32)]
    dead = (docs == jnp.uint32(TERMINATED)) | ~alive[safe]
    cachev = jnp.where(dead, jnp.float32(jnp.nan), cachev)
    out = jnp.concatenate(
        [docs, tfs, jax.lax.bitcast_convert_type(cachev, jnp.uint32)], axis=1
    )
    nb = out.shape[0]
    pad = (-nb) % 8
    if pad:
        filler = jnp.full((pad, 384), jnp.uint32(TERMINATED), dtype=jnp.uint32)
        out = jnp.concatenate([out, filler], axis=0)
    return out


def ensure_cstore(dfp, alive, cache):
    """Cached combined row store for a (segment, field)."""
    if getattr(dfp, "_cstore", None) is None:
        dfp._cstore = build_cstore(
            dfp.docs, dfp.tfs, dfp.norm_ids, alive, jnp.asarray(cache)
        )
    return dfp._cstore


def _bool_scal_layout(n_clauses: int, G: int):
    """Per-item contiguous scalar layout: item g's slots live at
    [g // SPR, (g % SPR) * STRIDE + k] of the [R, 128] page — pow2 STRIDE
    makes the addressing shifts/masks instead of the per-read div/mod the
    old column-major pack needed (~40 dynamic div/mods per item dominated
    the scalar core at ~1M items/batch). Slots: 0=bid, 1=qid, 2=lcl,
    3+t=jlo_t, 3+T+t=wid_t."""
    slots = 3 + 2 * n_clauses
    stride = 8
    while stride < slots:
        stride *= 2
    spr = 128 // stride
    rows = -(-G // spr)
    return stride, spr, rows


def _bool_kernel_body(n_clauses: int, kw: int, num_queries: int, G: int):
    STRIDE, SPR, R = _bool_scal_layout(n_clauses, G)

    def kernel(
        cl_w_ref,      # [Qp * T] f32 (scalar prefetch, FLATTENED — SMEM
        cl_kind_ref,   # [Qp * T] i32  tiles 2D arrays to (8,128) pages, a
        cl_start_ref,  # [Qp * T] i32  64x blowup; 1D stays compact. SMEM is
        cl_len_ref,    # [Qp * T] i32  ~1MB; per-item scalars are DMA'd per
        cl_ship_ref,   # [Qp * T] i32  program from HBM)
        req_m_ref,     # [Qp] i32
        req_s_ref,     # [Qp] i32
        scal_hbm,      # [P, R, 128] i32 (HBM) — per-item packed scalars,
                       #   see _bool_scal_layout
        cstore_ref,    # [NB, 384] u32 (HBM)
        scores_ref,    # out [G, 128] f32 (VMEM)
        docs_ref,      # out [G, 128] u32 (VMEM)
        lane_buf,      # scratch VMEM [G, 8, 384] u32
        win_buf,       # scratch VMEM [G, T, kw8, 384] u32
        scal_ref,      # scratch SMEM [1, R, 128] i32 — this program's page
        sems,          # DMA sems [G, 1 + T]
        scal_sem,      # DMA sem for the scalar page
    ):
        kw8 = _kw8(kw)  # fetched window rows

        # per-item scalars would blow the ~1MB SMEM budget as a prefetched
        # operand at big work-list sizes (P pages x 4KB, x2 buffers, x rungs
        # in a fused program); stream this program's single page instead
        cp = pltpu.make_async_copy(
            scal_hbm.at[pl.ds(pl.program_id(0), 1)], scal_ref, scal_sem
        )
        cp.start()
        cp.wait()

        def it(g, k):
            return scal_ref[0, g // SPR, (g % SPR) * STRIDE + k]

        def lane_dma(g, b):
            # 8-aligned super-row fetch; the target row selects in VMEM
            b8 = pl.multiple_of((b // 8) * 8, 8)
            return pltpu.make_async_copy(
                cstore_ref.at[pl.ds(b8, 8)],
                lane_buf.at[g],
                sems.at[g, 0],
            )

        def win_dma(g, t, j):
            # jlo is pre-aligned host-side; extra leading rows only add
            # smaller docs of the same region (harmless for presence/tf).
            # jlo < 0 marks a probe with no window — a SKIPPED clause
            # (wide-window dual-report plan), the item's OWN clause
            # (presence by construction), an absent clause, or list
            # padding — and its DMA is elided entirely.
            j8 = pl.multiple_of(jnp.maximum(j, 0), 8)
            return pltpu.make_async_copy(
                cstore_ref.at[pl.ds(j8, kw8)],
                win_buf.at[g, t],
                sems.at[g, 1 + t],
            )

        def start_g(g, _):
            lane_dma(g, it(g, 0)).start()
            for t in range(n_clauses):
                j = it(g, 3 + t)

                @pl.when(j >= 0)
                def _(j=j):
                    win_dma(g, t, j).start()
            return 0

        jax.lax.fori_loop(0, G, start_g, 0)

        def compute_g(g, _):
            b = it(g, 0)
            q = it(g, 1)
            cl = it(g, 2)
            js = [it(g, 3 + t) for t in range(n_clauses)]
            wids = [it(g, 3 + n_clauses + t) for t in range(n_clauses)]
            lane_dma(g, b).wait()
            for t in range(n_clauses):
                @pl.when(js[t] >= 0)
                def _(t=t):
                    win_dma(g, t, js[t]).wait()

            b_off = b % 8
            row = lane_buf[g, pl.ds(b_off, 1), :]      # [1, 384] u32
            docs_row = row[:, 0:128]                   # [1, 128]
            tfs_row = row[:, 128:256]
            cachev = pltpu.bitcast(row[:, 256:384], jnp.float32)
            lane_ok = (
                (docs_row != jnp.uint32(TERMINATED))
                & jnp.logical_not(jnp.isnan(cachev))
                & (q < num_queries)
            )

            score = jnp.zeros((1, 128), dtype=jnp.float32)
            cnt_must = jnp.zeros((1, 128), dtype=jnp.int32)
            cnt_should = jnp.zeros((1, 128), dtype=jnp.int32)
            has_not = jnp.zeros((1, 128), dtype=jnp.bool_)
            primary = jnp.full((1, 128), T_MAX + 1, dtype=jnp.int32)
            docs_col = docs_row.reshape(128, 1)
            for t in range(n_clauses):
                s = cl_start_ref[q * n_clauses + t]
                n = cl_len_ref[q * n_clauses + t]
                j = js[t]
                if kw <= 8:
                    # narrow rung: width <= kw is measured from the
                    # 8-aligned window start, which IS buffer row 0 (the
                    # bounds clamp can never shift a narrow window: jlo is
                    # an in-store aligned row <= nbp - 8 = hi), so the
                    # whole overlap sits statically in rows [0, kw) — one
                    # branchless [128, kw*128] compare, no loop machinery.
                    # Rows past the overlap hold same-region blocks with
                    # strictly larger docs (never equal) or are masked by
                    # the region bounds.
                    RW = kw if kw >= 2 else 2
                    wd_c = win_buf[g, t, 0:RW, 0:128]       # [RW, 128]
                    wt_c = win_buf[g, t, 0:RW, 128:256]
                    roff = jax.lax.broadcasted_iota(
                        jnp.int32, (RW, 1), 0
                    ) + j
                    row_ok = (j >= 0) & (roff >= s) & (roff < s + n)
                    wd = jnp.where(
                        row_ok, wd_c, jnp.uint32(0xFFFFFFFF)
                    ).reshape(1, RW * 128)
                    wt = wt_c.reshape(1, RW * 128).astype(jnp.int32)
                    eq = wd == docs_col                # [128, RW*128]
                    found = jnp.any(eq, axis=1).reshape(1, 128)
                    tf_probe = jnp.sum(
                        jnp.where(
                            eq,
                            jnp.broadcast_to(wt, (128, RW * 128)),
                            jnp.int32(0),
                        ),
                        axis=1,
                    ).reshape(1, 128)
                else:
                    # wide rung: probe only the window rows that can
                    # overlap the lane block — a dynamic fori_loop bound
                    # from the planner's per-(item, clause) overlap width
                    # (blocks past it have base > the lane block's last
                    # doc, so they cannot match) and the region end;
                    # j < 0 = no probe, zero rows. Typical overlaps span
                    # a few rows while the rung pads to kw8. Mosaic
                    # constraints: dynamic VMEM loads need 8-aligned
                    # sublane starts (the loop steps in 8-row chunks) and
                    # scf.for cannot carry vector<i1> (carries are i32).
                    rows_used = jnp.where(
                        j >= 0,
                        jnp.clip(jnp.minimum(s + n - j, wids[t]), 0, kw8),
                        0,
                    )

                    def win_chunk(cc, carry, t=t, s=s, n=n, j=j):
                        found, tf_probe = carry
                        c0 = pl.multiple_of(cc * 8, 8)
                        wd_c = win_buf[g, t, pl.ds(c0, 8), 0:128]
                        wt_c = win_buf[g, t, pl.ds(c0, 8), 128:256]
                        roff = jax.lax.broadcasted_iota(
                            jnp.int32, (8, 1), 0
                        ) + (j + cc * 8)
                        row_ok = (roff >= s) & (roff < s + n)
                        wd = jnp.where(
                            row_ok, wd_c, jnp.uint32(0xFFFFFFFF)
                        ).reshape(1, 8 * 128)
                        wt = wt_c.reshape(1, 8 * 128).astype(jnp.int32)
                        eq = wd == docs_col            # [128, 8*128]
                        found = found | jnp.any(eq, axis=1).reshape(
                            1, 128
                        ).astype(jnp.int32)
                        tf_probe = tf_probe + jnp.sum(
                            jnp.where(
                                eq,
                                jnp.broadcast_to(wt, (128, 8 * 128)),
                                jnp.int32(0),
                            ),
                            axis=1,
                        ).reshape(1, 128)
                        return found, tf_probe

                    found_i, tf_probe = jax.lax.fori_loop(
                        0, (rows_used + 7) // 8, win_chunk,
                        (
                            jnp.zeros((1, 128), dtype=jnp.int32),
                            jnp.zeros((1, 128), dtype=jnp.int32),
                        ),
                    )
                    found = found_i > 0
                own = cl == t
                presence = found | own  # own lane: presence by construction
                tf_t = jnp.where(
                    own, tfs_row.astype(jnp.int32), tf_probe
                ).astype(jnp.float32)
                kind = cl_kind_ref[q * n_clauses + t]
                contrib = cl_w_ref[q * n_clauses + t] * exact_div(tf_t, tf_t + cachev)
                positive = presence & (
                    (kind == KIND_MUST) | (kind == KIND_SHOULD)
                )
                score = score + jnp.where(positive, contrib, jnp.float32(0.0))
                cnt_must = cnt_must + (
                    presence & (kind == KIND_MUST)
                ).astype(jnp.int32)
                cnt_should = cnt_should + (
                    presence & (kind == KIND_SHOULD)
                ).astype(jnp.int32)
                has_not = has_not | (presence & (kind == KIND_MUST_NOT))
                is_prim = (
                    presence & (cl_ship_ref[q * n_clauses + t] > 0) & (primary > T_MAX)
                )
                primary = jnp.where(is_prim, jnp.int32(t), primary)

            # `primary` = lowest FULL-PROBING present clause (cl_ship_ref
            # carries the planner's fullprobe flags). A lane reports iff no
            # earlier full-probing clause covers the doc (cl <= primary):
            # with no skipped probes this is exactly the old single-reporter
            # rule; with skips, partial-score lanes may double-report and
            # the host dedups by (seg, doc) keeping the max — which some
            # full-probing lane always supplies (see parallel planner).
            ok = (
                lane_ok
                & (cl <= primary)
                & (cnt_must >= req_m_ref[q])
                & (cnt_should >= req_s_ref[q])
                & jnp.logical_not(has_not)
            )
            scores_ref[pl.ds(g, 1), :] = jnp.where(ok, score, NEG_INF)
            docs_ref[pl.ds(g, 1), :] = docs_row
            return 0

        jax.lax.fori_loop(0, G, compute_g, 0)

    return kernel


def _probe_rows(
    scal, cl_weight, cl_kind, cl_start, cl_len, cl_shipped, req_must,
    req_should, cstore, *, n_clauses: int, kw: int, num_prows: int, G: int,
    W: int, interpret: bool,
):
    """Run the probe kernel over one rung's packed scalars; returns raw
    (scores [W, 128], docs [W, 128])."""
    kernel = _bool_kernel_body(n_clauses, kw, num_prows, G)
    # flatten the plan tables: SMEM tiles 2D operands to (8,128) pages (a
    # 64x footprint blowup); 1D scalar-prefetch arrays stay compact
    cl_weight = cl_weight.reshape(-1)
    cl_kind = cl_kind.reshape(-1)
    cl_start = cl_start.reshape(-1)
    cl_len = cl_len.reshape(-1)
    cl_shipped = cl_shipped.reshape(-1)
    P = W // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(P,),
        in_specs=[
            # per-item scalars stay in HBM (a prefetched-SMEM operand costs
            # P x 4KB of the ~1MB SMEM budget; the kernel streams one page
            # per program instead)
            pl.BlockSpec(memory_space=pltpu.HBM),
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
            pltpu.VMEM(
                (G, n_clauses, _kw8(kw), 384), jnp.uint32
            ),
            pltpu.SMEM(
                (1, _bool_scal_layout(n_clauses, G)[2], 128), jnp.int32
            ),
            pltpu.SemaphoreType.DMA((G, 1 + n_clauses)),
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
    )(
        cl_weight, cl_kind, cl_start, cl_len, cl_shipped, req_must,
        req_should, scal, cstore,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "num_queries", "n_clauses", "kw", "interpret"),
)
def pallas_bool_topk(
    bids,        # [W] i32 — lane block ids
    qid,         # [W] i32
    lcl,         # [W] i32
    jlo,         # [W, T] i32 — host-computed window starts (clamped)
    wid,         # [W, T] i32 — per-clause overlap widths (rows to probe)
    cl_weight,   # [Qp, T] f32
    cl_kind,     # [Qp, T] i32
    cl_start,    # [Qp, T] i32
    cl_len,      # [Qp, T] i32
    cl_shipped,  # [Qp, T] i32
    req_must,    # [Qp] i32
    req_should,  # [Qp] i32
    cstore,      # [NB, 384] u32
    k: int,
    num_queries: int,
    n_clauses: int,
    kw: int,
    interpret: bool = False,
):
    w = bids.shape[0]
    G = _g_items(kw, n_clauses)
    P = w // G
    STRIDE, SPR, R = _bool_scal_layout(n_clauses, G)
    # per-item contiguous slot pack (see _bool_scal_layout)
    rows = jnp.concatenate(
        [
            bids[:, None],
            qid[:, None],
            lcl[:, None],
            jlo,
            wid,
        ],
        axis=1,
    ).astype(jnp.int32)
    rows = jnp.pad(rows, ((0, 0), (0, STRIDE - rows.shape[1])))
    flat = rows.reshape(P, G * STRIDE)
    flat = jnp.pad(flat, ((0, 0), (0, R * 128 - G * STRIDE)))
    scal = flat.reshape(P, R, 128)
    scores, docs = _probe_rows(
        scal, cl_weight, cl_kind, cl_start, cl_len, cl_shipped, req_must,
        req_should, cstore, n_clauses=n_clauses, kw=kw,
        num_prows=num_queries, G=G, W=w, interpret=interpret,
    )
    kk = min(k, 128)
    row_sc, row_idx = jax.lax.top_k(scores, kk)
    row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
    return pack_results(
        *per_query_topk_from_rows(row_sc, row_doc, qid, k, num_queries)
    )


# ---------------------------------------------------------------------------
# masked 8-run GROUP kernel: one work item covers up to 8 consecutive cstore
# rows (the lane DMA's natural granularity) of ONE clause region, with an
# 8-bit member mask gating which rows may report. One lane DMA + one unioned
# window DMA per clause serves all members, cutting the fixed per-item cost
# (DMA issue/wait + scalar setup, ~2us/item on this backend) by up to 8x —
# the round-3 OR/phrase bottleneck was ~900k single-block items/batch.
#
# Exactness: a group's per-clause window is the UNION of its members' planned
# windows, so every member row probes a superset of its single-item window
# (probe windows only need to COVER the member's overlap — extra leading or
# trailing rows hold same-region blocks with disjoint doc ranges that can
# never spuriously match). Masked-off rows are never reported, so grouping
# introduces no new duplicate-report sources and k_eff accounting is
# unchanged from the single-block plan.


def _grp_scal_layout(n_clauses: int, G: int):
    """Per-item contiguous scalar slots for the group kernel (pow2 stride so
    addressing lowers to shifts): 0=row_base (8-aligned), 1=prow, 2=lcl,
    3=member mask, 4+t=jlo_t (unioned window DMA start, -1 = no probe),
    then per clause t a per-member packed sub-window block at A + t*8:
    slot r holds (off_r << 8) | len_r — member r's TRUE (unaligned) first
    overlapping window row relative to jlo_t and its TRUE overlap row
    count (0 = no probe). Each lane row probes exactly its own overlap
    (typically 1-2 rows extracted by masked reduce, not an 8-row-aligned
    super-chunk), which is what keeps group compute equal to — and ~4x
    below the aligned-chunk version of — the sum of single-block compute.
    A = 4 + n_clauses."""
    slots = 4 + n_clauses + 8 * n_clauses
    stride = 8
    while stride < slots:
        stride *= 2
    spr = max(128 // stride, 1)
    rows = -(-(G * stride) // 128)
    return stride, spr, rows


def _grp_kw8(kw: int) -> int:
    """Fetched window rows for a group rung: exactly kw (no +8 slack —
    group widths are measured from the 8-aligned unioned window start, and
    the store-end clamp keeps width' = i1 - j_clamped <= kw because region
    ends never exceed the padded store: i1 <= nbp and j_clamped = nbp - kw)."""
    return max((kw + 7) & ~7, 8)


def _g_items_grp(kw: int, n_clauses: int) -> int:
    """Group items per grid program under a ~3.5MB VMEM window budget
    (win_buf = G * T * kw8 * 256 * 4 bytes — windows fetch docs|tfs only).
    G=128 under a 7MB budget was measured SLOWER (VMEM pressure defeats
    double buffering); 64 is the sweet spot."""
    kw8 = _grp_kw8(kw)
    budget = 3_500_000
    g = budget // (max(n_clauses, 1) * kw8 * 256 * 4)
    for cand in (64, 32, 16, 8):
        if cand <= g:
            return cand
    return 4


def _grp_kernel_body(n_clauses: int, kw: int, num_prows: int, G: int,
                     kk: int):
    STRIDE, SPR, R = _grp_scal_layout(n_clauses, G)
    kw8 = _grp_kw8(kw)
    A = 4 + n_clauses

    def kernel(
        cl_w_ref,      # [Pp * T] f32 (scalar prefetch, flattened)
        cl_kind_ref,   # [Pp * T] i32
        cl_start_ref,  # [Pp * T] i32
        cl_len_ref,    # [Pp * T] i32
        cl_ship_ref,   # [Pp * T] i32
        req_m_ref,     # [Pp] i32
        req_s_ref,     # [Pp] i32
        row_th_ref,    # [Pp] f32 — per-row score threshold (NEG_INF = none)
        scal_hbm,      # [P, R, 128] i32 (HBM) per-item packed scalars
        cstore_ref,    # [NB, 384] u32 (HBM)
        scores_ref,    # out [G, 128] f32 (VMEM) — per-GROUP top-kk lanes
        docs_ref,      # out [G, 128] u32 (VMEM)
        lane_buf,      # scratch VMEM [G, 8, 384] u32
        win_buf,       # scratch VMEM [G, T, kw8, 256] u32
        probe_buf,     # scratch VMEM [T*16, 128] i32 — per clause t, rows
                       # t*16..t*16+7 hold found, t*16+8.. hold tf
        scal_ref,      # scratch SMEM [1, R, 128] i32
        sems,          # DMA sems [G, 1 + T]
        scal_sem,
    ):
        cp = pltpu.make_async_copy(
            scal_hbm.at[pl.ds(pl.program_id(0), 1)], scal_ref, scal_sem
        )
        cp.start()
        # ONE block-wide memset covers every padding / masked group row;
        # real groups overwrite their row in the per-group top-kk store.
        # The output is [G, 128] (one row per group, lanes 0..kk-1 = the
        # group's top-kk), NOT [G*8, 128] member rows: the in-kernel
        # reduction below replaces the XLA group_topk_rows pass, whose
        # lax.top_k over the PADDED member-row matrix dominated launch
        # time (~500ms at the 65536-group tier, measured masked).
        scores_ref[...] = jnp.full((G, 128), NEG_INF, dtype=jnp.float32)
        docs_ref[...] = jnp.full(
            (G, 128), jnp.uint32(TERMINATED), dtype=jnp.uint32
        )
        cp.wait()

        def it(g, k):
            flat = g * STRIDE + k
            return scal_ref[0, flat // 128, flat % 128]

        def lane_dma(g):
            b8 = pl.multiple_of(it(g, 0), 8)
            return pltpu.make_async_copy(
                cstore_ref.at[pl.ds(b8, 8)], lane_buf.at[g], sems.at[g, 0]
            )

        def win_dma(g, t, j):
            j8 = pl.multiple_of(jnp.maximum(j, 0), 8)
            return pltpu.make_async_copy(
                cstore_ref.at[pl.ds(j8, kw8), pl.ds(0, 256)],
                win_buf.at[g, t],
                sems.at[g, 1 + t],
            )

        def start_g(g, _):
            mask = it(g, 3)

            @pl.when(mask != 0)  # fully-masked items are list padding
            def _():
                lane_dma(g).start()
                for t in range(n_clauses):
                    j = it(g, 4 + t)

                    @pl.when(j >= 0)
                    def _(j=j):
                        win_dma(g, t, j).start()
            return 0

        if _ABLATE != "nodma":
            jax.lax.fori_loop(0, G, start_g, 0)

        def compute_g(g, _):
            q = it(g, 1)
            cl = it(g, 2)
            mask = it(g, 3)
            js = [it(g, 4 + t) for t in range(n_clauses)]

            # fully-masked groups are list padding: the block-wide memset
            # below already wrote their -inf/TERMINATED rows, so they cost
            # nothing beyond the scalar mask read (the old per-row -inf
            # writes for padding dominated overflow launches)
            @pl.when(mask != 0)
            def _(g=g):
                if _ABLATE != "nodma":
                    lane_dma(g).wait()
                    for t in range(n_clauses):
                        @pl.when(js[t] >= 0)
                        def _(t=t):
                            win_dma(g, t, js[t]).wait()

                req_m = req_m_ref[q]
                req_s = req_s_ref[q]
                rows_all = pltpu.bitcast(lane_buf[g], jnp.int32)  # [8, 384]
                docs8i = rows_all[:, 0:128]

                # -- probe phase: per (member row, clause), resolve the
                # partner presence/tf into probe_buf. The row loop is a
                # DYNAMIC fori_loop (a static 8x unroll of the probe
                # machinery blew Mosaic compile time to minutes); rows are
                # extracted from the [8, *] lane buffer by a masked reduce
                # (dynamic single-row VMEM loads need 8-aligned starts; the
                # reduce rides i32 — Mosaic has no unsigned reductions —
                # which is lossless: every cstore word is < 2^31).
                def row_probe(r8, _):
                    bit = (mask >> r8) & 1
                    sel = jax.lax.broadcasted_iota(
                        jnp.int32, (8, 1), 0
                    ) == r8
                    docs_row = pltpu.bitcast(
                        jnp.sum(
                            jnp.where(sel, docs8i, 0),
                            axis=0, keepdims=True, dtype=jnp.int32,
                        ),
                        jnp.uint32,
                    )                                       # [1, 128]
                    docs_col = docs_row.reshape(128, 1)
                    for t in range(n_clauses):
                        # EXACT-row probe: the host packs member r's true
                        # (unaligned) window sub-range as (off << 8) | len;
                        # specific window rows are extracted by masked i32
                        # reduce and compared [128, 128] against the lane
                        # docs — no region masking needed because the host
                        # clips [off, off+len) to the clause region, and
                        # rows of one region can never spuriously match
                        # (sorted, disjoint doc ranges). 99% of members
                        # overlap <= 2 window rows, so the common case is
                        # the straight-line two-row compare; wider members
                        # take the pair loop.
                        v = it(g, A + 8 * t + r8)
                        off = v >> 8
                        ln = v & 255

                        def pair(r0, two):
                            rows_i = jax.lax.broadcasted_iota(
                                jnp.int32, (kw8, 1), 0
                            )
                            win_i = pltpu.bitcast(
                                win_buf[g, t, 0:kw8, 0:256], jnp.int32
                            )
                            rowA = jnp.sum(
                                jnp.where(rows_i == r0, win_i, 0),
                                axis=0, keepdims=True, dtype=jnp.int32,
                            )                               # [1, 256]
                            rowB = jnp.sum(
                                jnp.where(
                                    (rows_i == r0 + 1) & two, win_i, 0
                                ),
                                axis=0, keepdims=True, dtype=jnp.int32,
                            )
                            dA = pltpu.bitcast(rowA[:, 0:128], jnp.uint32)
                            dB = pltpu.bitcast(rowB[:, 0:128], jnp.uint32)
                            # poison the absent second row: an all-zero
                            # reduce would equal doc id 0
                            dB = jnp.where(
                                two, dB, jnp.uint32(0xFFFFFFFF)
                            )
                            tA = rowA[:, 128:256]
                            tB = rowB[:, 128:256]
                            eqA = dA == docs_col            # [128, 128]
                            eqB = dB == docs_col
                            found = (
                                jnp.any(eqA, axis=1).reshape(
                                    1, 128
                                ).astype(jnp.int32)
                                | jnp.any(eqB, axis=1).reshape(
                                    1, 128
                                ).astype(jnp.int32)
                            )
                            tf = jnp.sum(
                                jnp.where(
                                    eqA,
                                    jnp.broadcast_to(tA, (128, 128)),
                                    jnp.int32(0),
                                ),
                                axis=1,
                            ).reshape(1, 128) + jnp.sum(
                                jnp.where(
                                    eqB,
                                    jnp.broadcast_to(tB, (128, 128)),
                                    jnp.int32(0),
                                ),
                                axis=1,
                            ).reshape(1, 128)
                            return found, tf

                        def fast(_):
                            # ln 1-2: one straight-line two-row compare
                            return pair(off, ln > 1)

                        def slow(_):
                            def pair_step(i, carry):
                                f0, t0 = carry
                                f1, t1 = pair(
                                    off + 2 * i, (2 * i + 1) < ln
                                )
                                return f0 | f1, t0 + t1

                            return jax.lax.fori_loop(
                                0, (ln + 1) // 2, pair_step,
                                (
                                    jnp.zeros((1, 128), dtype=jnp.int32),
                                    jnp.zeros((1, 128), dtype=jnp.int32),
                                ),
                            )

                        @pl.when((bit != 0) & (ln > 0))
                        def _(t=t, r8=r8, fast=fast, slow=slow):
                            found, tf = jax.lax.cond(ln > 2, slow, fast, 0)
                            probe_buf[pl.ds(t * 16 + r8, 1), :] = found
                            probe_buf[pl.ds(t * 16 + 8 + r8, 1), :] = tf
                    return 0

                # zero the probe scratch once per group (only probed
                # (row, clause) slots are overwritten)
                probe_buf[...] = jnp.zeros(
                    (n_clauses * 16, 128), dtype=jnp.int32
                )
                if _ABLATE not in ("noprobe2", "nocombine"):
                    jax.lax.fori_loop(0, 8, row_probe, 0)
                if _ABLATE == "nocombine":
                    return

                # -- combine phase: all 8 member rows at once ([8, 128]
                # vector ops). Elementwise f32 ops and the clause-order
                # summation are identical to the per-row version, so scores
                # stay bitwise-exact vs the host.
                docs8 = pltpu.bitcast(docs8i, jnp.uint32)
                tfs8 = rows_all[:, 128:256]
                cachev8 = pltpu.bitcast(rows_all[:, 256:384], jnp.float32)
                bits8 = (
                    jax.lax.shift_right_logical(
                        jnp.full((8, 1), mask, dtype=jnp.int32),
                        jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0),
                    ) & 1
                ) > 0
                lane_ok = (
                    (docs8 != jnp.uint32(TERMINATED))
                    & jnp.logical_not(jnp.isnan(cachev8))
                    & (q < num_prows)
                    & bits8
                )
                score = jnp.zeros((8, 128), dtype=jnp.float32)
                cnt_must = jnp.zeros((8, 128), dtype=jnp.int32)
                cnt_should = jnp.zeros((8, 128), dtype=jnp.int32)
                has_not = jnp.zeros((8, 128), dtype=jnp.bool_)
                primary = jnp.full((8, 128), T_MAX + 1, dtype=jnp.int32)
                for t in range(n_clauses):
                    found = probe_buf[t * 16 : t * 16 + 8, :] > 0  # [8,128]
                    tf_probe = probe_buf[t * 16 + 8 : t * 16 + 16, :]
                    own = cl == t
                    presence = found | own
                    tf_t = jnp.where(own, tfs8, tf_probe).astype(
                        jnp.float32
                    )
                    kind = cl_kind_ref[q * n_clauses + t]
                    contrib = cl_w_ref[q * n_clauses + t] * exact_div(
                        tf_t, tf_t + cachev8
                    )
                    positive = presence & (
                        (kind == KIND_MUST) | (kind == KIND_SHOULD)
                    )
                    score = score + jnp.where(
                        positive, contrib, jnp.float32(0.0)
                    )
                    cnt_must = cnt_must + (
                        presence & (kind == KIND_MUST)
                    ).astype(jnp.int32)
                    cnt_should = cnt_should + (
                        presence & (kind == KIND_SHOULD)
                    ).astype(jnp.int32)
                    has_not = has_not | (
                        presence & (kind == KIND_MUST_NOT)
                    )
                    is_prim = (
                        presence
                        & (cl_ship_ref[q * n_clauses + t] > 0)
                        & (primary > T_MAX)
                    )
                    primary = jnp.where(is_prim, jnp.int32(t), primary)

                ok = (
                    lane_ok
                    & (cl <= primary)
                    & (cnt_must >= req_m)
                    & (cnt_should >= req_s)
                    & jnp.logical_not(has_not)
                )
                sc = jnp.where(ok, score, NEG_INF)          # [8, 128]

                # in-kernel per-group top-kk: iterative first-argmax
                # extraction in FLAT (member row, lane) order — bitwise the
                # same selection as group_topk_rows' two-stage lax.top_k
                # (ties keep flat index order; member rows ascend by block
                # and lanes by doc, so equal scores stay doc-ascending).
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
                    )                                        # [1, 1]
                    eq = s == m
                    pick = jnp.min(
                        jnp.min(
                            jnp.where(eq, flat, jnp.int32(8 * 128)),
                            axis=0, keepdims=True,
                        ),
                        axis=1, keepdims=True,
                    )                                        # [1, 1]
                    hit = flat == pick
                    d = jnp.sum(
                        jnp.sum(
                            jnp.where(hit, docs8i, 0),
                            axis=0, keepdims=True, dtype=jnp.int32,
                        ),
                        axis=1, keepdims=True, dtype=jnp.int32,
                    )                                        # [1, 1]
                    sel = lane_j == j
                    b_sc = jnp.where(sel, m, b_sc)
                    b_dc = jnp.where(sel, d, b_dc)
                    s = jnp.where(hit, NEG_INF, s)
                    return s, b_sc, b_dc

                if _ABLATE == "noextract":
                    scores_ref[pl.ds(g, 1), :] = jnp.max(
                        sc, axis=0, keepdims=True
                    )
                    docs_ref[pl.ds(g, 1), :] = pltpu.bitcast(
                        jnp.max(docs8i, axis=0, keepdims=True), jnp.uint32
                    )
                    return
                # threshold-bounded extraction: phase-2 launches carry each
                # plan row's CURRENT kth score (thresholds only rise, so a
                # lane scoring < th can never enter the final top-k; == th
                # ties are kept for the merge's address tie-break). Typical
                # survivor counts are 0-3, so the loop runs ~kk/10 of its
                # blind trip count — the extract loop was 62% of kernel
                # time (scripts/diag_kernel_ablate.py). Extraction is in
                # descending score order, so the top-n_sur ARE exactly the
                # lanes >= th; output lanes past n_sur keep the carry's
                # -inf/TERMINATED fill, which the merge tail ignores.
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
                docs_ref[pl.ds(g, 1), :] = pltpu.bitcast(best_dc, jnp.uint32)
            return 0

        jax.lax.fori_loop(0, G, compute_g, 0)

    return kernel


def _grp_rows(
    scal, cl_weight, cl_kind, cl_start, cl_len, cl_shipped, req_must,
    req_should, row_th, cstore, *, n_clauses: int, kw: int, num_prows: int,
    G: int, W: int, kk: int, interpret: bool,
):
    """Run the GROUP probe kernel over one rung's packed scalars; returns
    per-GROUP top-kk candidates (scores [W, 128], docs [W, 128]; lanes
    kk.. hold -inf padding). `row_th` [Pp] f32 holds each plan row's
    current kth-score threshold (NEG_INF = extract blindly)."""
    kernel = _grp_kernel_body(n_clauses, kw, num_prows, G, kk)
    cl_weight = cl_weight.reshape(-1)
    cl_kind = cl_kind.reshape(-1)
    cl_start = cl_start.reshape(-1)
    cl_len = cl_len.reshape(-1)
    cl_shipped = cl_shipped.reshape(-1)
    P = W // G
    kw8 = _grp_kw8(kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
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
            pltpu.VMEM((G, n_clauses, kw8, 256), jnp.uint32),
            pltpu.VMEM((n_clauses * 16, 128), jnp.int32),
            pltpu.SMEM(
                (1, _grp_scal_layout(n_clauses, G)[2], 128), jnp.int32
            ),
            pltpu.SemaphoreType.DMA((G, 1 + n_clauses)),
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
    )(
        cl_weight, cl_kind, cl_start, cl_len, cl_shipped, req_must,
        req_should, row_th, scal, cstore,
    )


# ---------------------------------------------------------------------------
# fused multi-rung launch: every (segment, field) x every window rung of a
# batch phase in ONE jit program -> one launch + one fetch (the remoted
# backend charges ~26ms/launch + ~28ms/fetch regardless of size)

#: window rungs (fetched rows per clause window) for the fused GROUP path.
#: W tiers are in GROUP items (a group = up to 8 blocks); the tier LEVEL is
#: canonicalized per launch (one level for all rungs) so the compiled
#: rungs-tuple set stays tiny across batch compositions.
#: NOTE: no 8-row rung — Mosaic compiles the (otherwise identical) kernel
#: with an 8-row window buffer pathologically (50-500s, nondeterministic,
#: defeats the persistent cache) while 16-row compiles in ~1s. The dynamic
#: chunk loop bounds COMPUTE by the true overlap, so the narrow-window case
#: only pays double window-DMA bytes, not double compares.
_GRP_RUNGS = (16, 64)            # T <= 8
_GRP_RUNGS_WIDE = (16, 32)       # T <= 16 (VMEM: win_buf scales with T)
#: per-program overhead (~70-150us — scal-page DMA + G-loop scalar
#: control) dominates padded launches, so each rung picks its OWN tier
#: level (product signature set, bounded at n_levels^n_rungs per k_eff):
#: small/empty rungs ride tiny grids while dense phase-2 rounds use the
#: 65536 tier (half the rounds of 32768).
_GRP_W_TIERS = {
    16: (256, 8192, 65536),
    32: (256, 2048, 8192),
    64: (256, 2048, 8192),
}


def fused_rungs(n_clauses: int) -> tuple:
    return _GRP_RUNGS if n_clauses <= 8 else _GRP_RUNGS_WIDE


def fused_kw_max(n_clauses: int) -> int:
    """Widest fused probe window for a clause bucket; wider work items are
    re-enumerated through a denser clause by the planner ("window
    explosion"), not host-fallbacked."""
    return fused_rungs(n_clauses)[-1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "num_queries", "num_prows", "n_clauses", "rungs", "interpret",
        "pack_addr",
    ),
)
def fused_bool_topk(
    rung_scal,   # tuple of [P, R, 128] i32 packed per-group scalars
    rung_qid,    # tuple of [W] i32 (query id per GROUP, for the merge tail)
    rung_seg,    # tuple of [W] i32 (segment ord per group)
    cl_weight,   # [Pp, T] f32 — plan-row tables (one row per (query, seg))
    cl_kind,     # [Pp, T] i32
    cl_start,    # [Pp, T] i32 — GLOBAL fused block units
    cl_len,      # [Pp, T] i32
    cl_shipped,  # [Pp, T] i32
    req_must,    # [Pp] i32
    req_should,  # [Pp] i32
    row_th,      # [Pp] f32 — per-row extraction threshold (NEG_INF = none)
    cstore,      # [NB, 384] u32 — the fused store
    k: int,
    num_queries: int,
    num_prows: int,
    n_clauses: int,
    rungs: tuple,    # ((W, kw, G), ...)
    interpret: bool = False,
    pack_addr: bool = False,
):
    """One launch for a whole batch phase: one GROUP probe pallas_call per
    rung emitting per-GROUP top-kk candidates IN-KERNEL (8 member rows
    share one (query, segment); the old XLA group_topk_rows pass over the
    padded member-row matrix was the dominant launch cost), then a single
    cross-rung cross-segment top-k merge tail. Returns packed [3, Q, k]
    (score bits | doc | seg)."""
    row_sc, row_doc, row_qid, row_seg = [], [], [], []
    kk = min(k, 128)
    token = None  # chains rung kernels so their scoped SMEM doesn't overlap
    for (W, kw, G), scal, qid, seg in zip(
        rungs, rung_scal, rung_qid, rung_seg
    ):
        if token is not None:
            scal = scal + token
        scores, docs = _grp_rows(
            scal, cl_weight, cl_kind, cl_start, cl_len, cl_shipped,
            req_must, req_should, row_th, cstore, n_clauses=n_clauses,
            kw=kw, num_prows=num_prows, G=G, W=W, kk=kk,
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


_I64MAX = np.iinfo(np.int64).max

#: sentinel: the grouping key was already sorted, no order-gather needed
_SORTED = object()


def _group_work(blocks, prow, clause, qid, seg, jlo_all, wid_all, frc_all,
                groupable, kw_max: int):
    """Collapse per-block work items into masked 8-run GROUP items.

    Groupable items sharing (prow, clause, block//8) merge: member mask ORs,
    per-clause window DMAs union, and each member's own TRUE sub-range
    within the union — (jlo + frc) - jlo_group rows in, (wid - frc) rows
    long, where `frc` is the planner's alignment fraction (true first
    overlapping row minus the 8-aligned DMA start) — rides per-row scalars
    packed (off << 8) | len so kernel compute probes exactly the member's
    overlap. Non-groupable items (slice plans with intentionally partial
    windows) and groups whose unioned width exceeds `kw_max` are emitted as
    singleton groups (their per-item windows fit a rung by planner
    construction). Returns (base, mask, prow, clause, qid, seg, jlo [N,T],
    pk [N,T,8] packed member windows, eff)."""
    from ..native_probe import group_work_sorted

    native = group_work_sorted(
        blocks, prow, clause, qid, seg, jlo_all, wid_all, frc_all,
        groupable, kw_max,
    )
    if native is not None:
        return native

    T = jlo_all.shape[1]

    _I32MAX = np.iinfo(np.int32).max

    def emit(b_g, mask, p, c, q, s, jlo_m8, wid_m8, frc_m8):
        """jlo_m8/wid_m8/frc_m8: [n, 8, T] per-member windows (-1 = none).
        int32 throughout: store rows < 2^31, widths <= kw_max, frc < 8."""
        n = len(b_g)
        has = jlo_m8 >= 0
        jmin = np.where(has, jlo_m8, _I32MAX).min(axis=1)      # [n, T]
        jlo_g = np.where(jmin == _I32MAX, np.int32(-1), jmin)
        i1 = np.where(has, jlo_m8 + wid_m8, np.int32(-1)).max(axis=1)
        wid_g = np.where(jlo_g >= 0, i1 - jlo_g, 0)
        off8 = np.where(
            has, jlo_m8 - jlo_g[:, None, :] + frc_m8, 0
        )                                                       # [n, 8, T]
        len8 = np.maximum(np.where(has, wid_m8 - frc_m8, 0), 0)
        pk = np.where(len8 > 0, (off8 << 8) | len8, 0)
        eff = wid_g.max(axis=1) if T else np.zeros(n, dtype=np.int32)
        return (b_g, mask, p, c, q, s, jlo_g, pk.transpose(0, 2, 1), eff)

    def member_windows(sel, order=None, starts=None, gidx=None, r=None):
        """Scatter per-item windows into [n, 8, T] member slots."""
        jlo = jlo_all[sel].astype(np.int32)
        wid = np.where(jlo >= 0, wid_all[sel].astype(np.int32), 0)
        frc = np.where(jlo >= 0, frc_all[sel].astype(np.int32), 0)
        if order is None:  # singletons
            n = len(jlo)
            j8 = np.full((n, 8, T), -1, dtype=np.int32)
            w8 = np.zeros((n, 8, T), dtype=np.int32)
            f8 = np.zeros((n, 8, T), dtype=np.int32)
            rr = (blocks[sel] % 8).astype(np.int64)
            j8[np.arange(n), rr] = jlo
            w8[np.arange(n), rr] = wid
            f8[np.arange(n), rr] = frc
            return j8, w8, f8
        n = len(starts)
        j8 = np.full((n, 8, T), -1, dtype=np.int32)
        w8 = np.zeros((n, 8, T), dtype=np.int32)
        f8 = np.zeros((n, 8, T), dtype=np.int32)
        if order is _SORTED:
            j8[gidx, r] = jlo
            w8[gidx, r] = wid
            f8[gidx, r] = frc
        else:
            j8[gidx, r] = jlo[order]
            w8[gidx, r] = wid[order]
            f8[gidx, r] = frc[order]
        return j8, w8, f8

    def singles(sel):
        b = blocks[sel]
        j8, w8, f8 = member_windows(sel)
        return emit(
            (b // 8) * 8, np.int64(1) << (b % 8), prow[sel], clause[sel],
            qid[sel], seg[sel], j8, w8, f8,
        )

    parts = []
    ng = ~groupable
    if ng.any():
        parts.append(singles(ng))
    gsel = groupable
    if gsel.any():
        b = blocks[gsel]
        run = b // 8
        key = (
            prow[gsel].astype(np.int64) * (T_MAX + 1) + clause[gsel]
        ) * (1 << 28) + run
        # the planner emits items in (prow, clause, block) order, so the
        # grouping key is almost always pre-sorted — skip the O(n log n)
        # argsort and the order-gather in that case
        if len(key) < 2 or bool((np.diff(key) >= 0).all()):
            order = _SORTED
            sorted_key, bo = key, b
        else:
            order = np.argsort(key, kind="stable")
            sorted_key, bo = key[order], b[order]
        _, starts, counts = np.unique(
            sorted_key, return_index=True, return_counts=True
        )
        n_g = len(starts)
        gidx = np.repeat(np.arange(n_g), counts)
        r = (bo % 8).astype(np.int64)
        mask = np.bitwise_or.reduceat(np.int64(1) << r, starts)
        base = (bo[starts] // 8) * 8
        io = starts if order is _SORTED else order[starts]
        j8, w8, f8 = member_windows(gsel, order, starts, gidx, r)
        g = emit(base, mask, prow[gsel][io], clause[gsel][io], qid[gsel][io],
                 seg[gsel][io], j8, w8, f8)
        # unioned window busts the widest rung -> demote to singletons
        wide = g[-1] > kw_max
        if wide.any():
            wide_keys = sorted_key[starts[wide]]
            item_wide = np.isin(key, wide_keys)
            idx_w = np.nonzero(gsel)[0][item_wide]
            selw = np.zeros(len(blocks), dtype=bool)
            selw[idx_w] = True
            parts.append(singles(selw))
            keep = ~wide
            parts.append(tuple(v[keep] for v in g))
        else:
            parts.append(g)
    return tuple(
        np.concatenate([p[i] for p in parts]) for i in range(9)
    )


def launch_fused_bool(
    fused, work, tables, k: int, num_queries: int, interpret: bool,
) -> list:
    """Assemble per-rung GROUP scalar packs from the planner's work list and
    issue ONE fused launch.

    `work` = (blocks [N], prow [N], clause [N], width [N], qid [N], seg [N],
    jlo [N, T], wid [N, T], frc [N, T], groupable [N]) numpy arrays — the
    planner supplies each item's per-clause window start (8-aligned; -1 =
    skip that clause's probe), overlap width measured from that aligned
    start, and the alignment fraction `frc` (true first overlapping row
    minus the aligned start, 0..7; the kernel probes the TRUE range
    [jlo+frc, jlo+wid)). Consecutive groupable items collapse
    into masked 8-run groups (see `_group_work`); slice-plan items keep their
    intentionally partial windows as singleton groups. `tables` = dict of
    plan-row tables (cl_* [P+1, T], req_*). `k` may be inflated by the
    planner (k_eff) when skipped probes / slice overlap can double-report
    docs. Returns [packed [3, Q, k]] or [] if empty."""
    from ..utils.trace import debug_time

    (blocks, prow, clause, width, qid, seg, jlo_all, wid_all, frc_all,
     groupable) = work
    n_items = len(blocks)
    if n_items == 0:
        return []
    T = tables["cl_weight"].shape[1]
    num_prows = tables["cl_weight"].shape[0] - 1
    nbp = -(-fused.num_blocks // 8) * 8
    rungs_t = fused_rungs(T)

    with debug_time("launch.group_work", n=n_items):
        base, mask, g_prow, g_cl, g_qid, g_seg, g_jlo, g_pk, eff = \
            _group_work(
                blocks, prow, clause, qid, seg, jlo_all, wid_all, frc_all,
                groupable, rungs_t[-1],
            )

    # bucket per rung, clamping window starts so the kw8-row DMA stays in
    # bounds (8-aligned; -1 skip sentinels pass through). A clamp shifts
    # member offsets deeper into the window; shifted ends stay <= kw8
    # because region ends never exceed the padded store.
    per_rung = []
    prev_kw = -1
    _bucket_span = debug_time("launch.bucket", n=len(base))
    _bucket_span.__enter__()
    for kw in rungs_t:
        sel = (eff > prev_kw) & (eff <= kw)
        prev_kw = kw
        kw8 = _grp_kw8(kw)
        hi = (max(nbp - kw8, 0) // 8) * 8
        j_orig = g_jlo[sel].astype(np.int32)
        j_s = np.where(j_orig < 0, np.int32(-1), np.minimum(j_orig, hi))
        shift = np.where(j_orig < 0, np.int32(0), j_orig - j_s)
        pk = g_pk[sel].astype(np.int32)
        pk_s = np.where(pk > 0, pk + (shift[:, :, None] << 8), 0)
        assert not pk_s.size or int(
            ((pk_s >> 8) + (pk_s & 255)).max()
        ) <= kw8, "member window beyond the rung's fetched rows"
        per_rung.append(
            [kw, base[sel], mask[sel], g_prow[sel], g_cl[sel], g_qid[sel],
             g_seg[sel], j_s, pk_s, 0]
        )
    _bucket_span.__exit__(None, None, None)
    assert sum(len(r[1]) for r in per_rung) == len(base), \
        "group item wider than the widest rung reached the launcher"

    import os
    if os.environ.get("TANTIVY_TPU_LAUNCH_DEBUG"):
        print(
            f"[launch_fused_bool] T={T} items={n_items} groups={len(base)} "
            + " ".join(
                f"rung{r[0]}:{len(r[1])}" for r in per_rung
            ),
            flush=True,
        )

    # ONE SHARED tier level across rungs (the max any rung needs): the
    # compiled-signature set is the DIAGONAL of the per-rung tier ladders —
    # linear in levels, not the product — so prewarm enumerates every
    # reachable signature in a handful of compiles and steady state can
    # never hit a cold shape. A lopsided batch pads its small rungs up to
    # the shared level; padding is NOT free (the padded output rows still
    # flow through the group-topk + merge tail, ~6-7us/group measured), so
    # the level is recomputed from the REMAINING work before every round —
    # overflow rounds drop to the smallest diagonal member that fits their
    # remainder instead of re-paying the first round's tier.
    def _shared_level():
        lvl = 0
        for r in per_rung:
            kw, n_left = r[0], len(r[1]) - r[9]
            tiers = _GRP_W_TIERS[kw]
            lvl = max(
                lvl,
                next((i for i, w in enumerate(tiers) if n_left <= w),
                     len(tiers) - 1),
            )
        return lvl

    def make_chunk(kw, b_s, m_s, p_s, c_s, q_s, s_s, jlo, pk, lo, level):
        tiers = _GRP_W_TIERS[kw]
        W = tiers[min(level, len(tiers) - 1)]
        hi = min(lo + W, len(b_s))
        n = hi - lo
        G = _g_items_grp(kw, T)
        if n == 0:
            # fully-masked filler rung (overflow rounds): reuse one cached
            # DEVICE array per shape — zero host build + zero transfer
            return _empty_chunk(kw, W, G, T, num_prows, num_queries), hi
        STRIDE, SPR, R = _grp_scal_layout(T, G)
        A = 4 + T
        rows = np.zeros((W, STRIDE), dtype=np.int32)
        rows[:, 1] = num_prows
        rows[:, 4:4 + T] = -1
        q_pad = np.full(W, num_queries, dtype=np.int32)
        s_pad = np.zeros(W, dtype=np.int32)
        rows[:n, 0] = b_s[lo:hi]
        rows[:n, 1] = p_s[lo:hi]
        rows[:n, 2] = c_s[lo:hi]
        rows[:n, 3] = m_s[lo:hi]
        rows[:n, 4:4 + T] = jlo[lo:hi]
        rows[:n, A:A + 8 * T] = pk[lo:hi].reshape(n, 8 * T)
        q_pad[:n] = q_s[lo:hi]
        s_pad[:n] = s_s[lo:hi]
        P = W // G
        flat = rows.reshape(P, G * STRIDE)
        flat = np.pad(flat, ((0, 0), (0, R * 128 - G * STRIDE)))
        scal = flat.reshape(P, R, 128)
        return ((W, kw, G), jnp.asarray(scal), jnp.asarray(q_pad),
                jnp.asarray(s_pad)), hi

    row_th = tables.get("row_th")
    if row_th is None:
        row_th = np.full(num_prows + 1, NEG_INF, dtype=np.float32)
    table_args = (
        jnp.asarray(tables["cl_weight"]),
        jnp.asarray(tables["cl_kind"]),
        jnp.asarray(tables["cl_start"]),
        jnp.asarray(tables["cl_len"]),
        jnp.asarray(tables["cl_shipped"].astype(np.int32)),
        jnp.asarray(tables["req_must"]),
        jnp.asarray(tables["req_should"]),
        jnp.asarray(row_th),
    )

    pack_addr = bool(getattr(fused, "pack_addr_ok", False))

    def launch(chunks):
        rungs = tuple(c[0] for c in chunks)
        if _DEBUG_LAUNCHES is not None:
            _DEBUG_LAUNCHES.append(
                dict(
                    chunks=chunks, table_args=table_args,
                    cstore=fused.cstore, k=k, num_queries=num_queries,
                    num_prows=num_prows, n_clauses=T, pack_addr=pack_addr,
                )
            )
        return fused_bool_topk(
            tuple(c[1] for c in chunks),
            tuple(c[2] for c in chunks),
            tuple(c[3] for c in chunks),
            *table_args,
            fused.cstore,
            k=k, num_queries=num_queries, num_prows=num_prows,
            n_clauses=T, rungs=rungs, interpret=interpret,
            pack_addr=pack_addr,
        )

    # every launch carries ALL rungs at the SHARED level (exhausted rungs
    # pass fully-masked CACHED filler pages with zero transfer cost): ONE
    # compiled program signature per (tier level, k_eff) regardless of
    # batch composition or overflow — no fresh compiles mid-run
    outs = []
    while True:
        chunks = []
        progressed = False
        lvl_shared = _shared_level()
        with debug_time("launch.make_chunks"):
            for r in per_rung:
                chunk, hi = make_chunk(*r[:9], r[9], lvl_shared)
                if hi > r[9]:
                    progressed = True
                r[9] = hi
                chunks.append(chunk)
        if not progressed and outs:
            break
        with debug_time("launch.dispatch"):
            outs.append(launch(chunks))
        if all(r[9] >= len(r[1]) for r in per_rung):
            break
    return outs


_EMPTY_CHUNKS: dict = {}

#: when set to a list (debug/microbench only), every fused launch's exact
#: arguments are appended for offline replay
_DEBUG_LAUNCHES = None


def _empty_chunk(kw, W, G, T, num_prows, num_queries):
    """Cached fully-masked scalar pages for exhausted rungs: every group's
    member mask is 0 (the kernel elides its DMAs and reports nothing), so
    one device-resident page per shape serves every overflow launch with no
    rebuild and no host->device transfer."""
    key = (kw, W, G, T, num_prows, num_queries)
    c = _EMPTY_CHUNKS.get(key)
    if c is None:
        STRIDE, SPR, R = _grp_scal_layout(T, G)
        rows = np.zeros((W, STRIDE), dtype=np.int32)
        rows[:, 1] = num_prows
        rows[:, 4:4 + T] = -1
        P = W // G
        flat = rows.reshape(P, G * STRIDE)
        flat = np.pad(flat, ((0, 0), (0, R * 128 - G * STRIDE)))
        c = (
            (W, kw, G),
            jnp.asarray(flat.reshape(P, R, 128)),
            jnp.asarray(np.full(W, num_queries, dtype=np.int32)),
            jnp.asarray(np.zeros(W, dtype=np.int32)),
        )
        _EMPTY_CHUNKS[key] = c
    return c


def compute_jlo(dfp, work_blocks, work_qid, cl_start, cl_len, kw: int):
    """Host-side window starts [N, T]: for each work item and clause, the
    first clause block whose last doc >= the item block's base (one
    vectorized searchsorted per (query, clause) region), clamped so the
    kw-row DMA stays in bounds."""
    n = len(work_blocks)
    T = cl_start.shape[1]
    kw8 = _kw8(kw)
    nbp = -(-dfp.num_blocks // 8) * 8  # cstore rows are padded to 8
    out = np.zeros((n, T), dtype=np.int32)
    base = dfp.blk_base[work_blocks]
    order = np.argsort(work_qid, kind="stable")
    blast = dfp.blk_last_doc
    sorted_q = work_qid[order]
    bounds = np.searchsorted(sorted_q, np.arange(cl_start.shape[0] + 1))
    for q in np.unique(sorted_q):
        lo, hi = bounds[q], bounds[q + 1]
        rows = order[lo:hi]
        for t in range(T):
            s, ln = int(cl_start[q, t]), int(cl_len[q, t])
            if ln <= 0:
                out[rows, t] = 0
                continue
            j = s + np.searchsorted(blast[s : s + ln], base[rows])
            # 8-align down (Mosaic DMA tiling) and keep the window in bounds
            j = (np.minimum(j, max(nbp - kw8, 0)) // 8) * 8
            out[rows, t] = j
    return out
