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
from .probe_scorer import (
    KIND_MUST,
    KIND_MUST_NOT,
    KIND_SHOULD,
    T_MAX,
    pack_results,
    per_query_topk_from_rows,
)

NEG_INF = np.float32(-np.inf)


def _g_items(kw: int) -> int:
    """Work items per grid program, sized to the VMEM window budget."""
    return 16 if kw > 8 else 64


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


def _bool_kernel_body(n_clauses: int, kw: int, num_queries: int, G: int):
    def kernel(
        cl_w_ref,      # [Qp, T] f32 (scalar prefetch — small tables only:
        cl_kind_ref,   # [Qp, T] i32  SMEM is ~1MB, per-item scalars ride
        cl_start_ref,  # [Qp, T] i32  per-program SMEM blocks instead)
        cl_len_ref,    # [Qp, T] i32
        cl_ship_ref,   # [Qp, T] i32
        req_m_ref,     # [Qp] i32
        req_s_ref,     # [Qp] i32
        scal_ref,      # [1, 8, 128] i32 — this program's packed scalars:
                       #   bids [0,G) | qid [G,2G) | lcl [2G,3G) |
                       #   jlo [3G + gi*T + t]
        cstore_ref,    # [NB, 384] u32 (HBM)
        scores_ref,    # out [G, 128] f32 (VMEM)
        docs_ref,      # out [G, 128] u32 (VMEM)
        lane_buf,      # scratch VMEM [G, 8, 384] u32
        win_buf,       # scratch VMEM [G, T, kw8, 384] u32
        sems,          # DMA sems [G, 1 + T]
    ):
        kw8 = ((kw + 7) & ~7) + 8  # 8-aligned super-window size

        def sc(idx):
            return scal_ref[0, idx // 128, idx % 128]

        def lane_dma(g):
            # 8-aligned super-row fetch; the target row selects in VMEM
            b8 = pl.multiple_of((sc(g) // 8) * 8, 8)
            return pltpu.make_async_copy(
                cstore_ref.at[pl.ds(b8, 8)],
                lane_buf.at[g],
                sems.at[g, 0],
            )

        def win_dma(g, t):
            # jlo is pre-aligned host-side; extra leading rows only add
            # smaller docs of the same region (harmless for presence/tf)
            j8 = pl.multiple_of(sc(3 * G + g * n_clauses + t), 8)
            return pltpu.make_async_copy(
                cstore_ref.at[pl.ds(j8, kw8)],
                win_buf.at[g, t],
                sems.at[g, 1 + t],
            )

        def start_g(g, _):
            lane_dma(g).start()
            for t in range(n_clauses):
                win_dma(g, t).start()
            return 0

        jax.lax.fori_loop(0, G, start_g, 0)

        def compute_g(g, _):
            lane_dma(g).wait()
            for t in range(n_clauses):
                win_dma(g, t).wait()

            b_off = sc(g) % 8
            row = lane_buf[g, pl.ds(b_off, 1), :]      # [1, 384] u32
            docs_row = row[:, 0:128]                   # [1, 128]
            tfs_row = row[:, 128:256]
            cachev = pltpu.bitcast(row[:, 256:384], jnp.float32)
            q = sc(G + g)
            cl = sc(2 * G + g)
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
                s = cl_start_ref[q, t]
                n = cl_len_ref[q, t]
                j = sc(3 * G + g * n_clauses + t)
                wrow = win_buf[g, t]                   # [kw8, 384]
                wdocs = wrow[:, 0:128]
                wtfs = wrow[:, 128:256]
                roff = jax.lax.broadcasted_iota(jnp.int32, (kw8, 1), 0)
                row_ok = ((j + roff) >= s) & ((j + roff) < s + n)
                wd = jnp.where(
                    row_ok, wdocs, jnp.uint32(0xFFFFFFFF)
                ).reshape(1, kw8 * 128)
                # i32 throughout: Mosaic lacks unsigned reductions
                wt = wtfs.reshape(1, kw8 * 128).astype(jnp.int32)
                eq = wd == docs_col                    # [128, kw8*128]
                found = jnp.any(eq, axis=1).reshape(1, 128)
                tf_probe = jnp.sum(
                    jnp.where(eq, jnp.broadcast_to(wt, (128, kw8 * 128)),
                              jnp.int32(0)),
                    axis=1,
                ).reshape(1, 128)
                own = cl == t
                presence = found | own  # own lane: presence by construction
                tf_t = jnp.where(
                    own, tfs_row.astype(jnp.int32), tf_probe
                ).astype(jnp.float32)
                kind = cl_kind_ref[q, t]
                contrib = cl_w_ref[q, t] * (tf_t / (tf_t + cachev))
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
                    presence & (cl_ship_ref[q, t] > 0) & (primary > T_MAX)
                )
                primary = jnp.where(is_prim, jnp.int32(t), primary)

            ok = (
                lane_ok
                & (primary == cl)
                & (cnt_must >= req_m_ref[q])
                & (cnt_should >= req_s_ref[q])
                & jnp.logical_not(has_not)
            )
            scores_ref[pl.ds(g, 1), :] = jnp.where(ok, score, NEG_INF)
            docs_ref[pl.ds(g, 1), :] = docs_row
            return 0

        jax.lax.fori_loop(0, G, compute_g, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "num_queries", "n_clauses", "kw", "interpret"),
)
def pallas_bool_topk(
    bids,        # [W] i32 — lane block ids
    qid,         # [W] i32
    lcl,         # [W] i32
    jlo,         # [W, T] i32 — host-computed window starts (clamped)
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
    G = _g_items(kw)
    kernel = _bool_kernel_body(n_clauses, kw, num_queries, G)
    # pack the per-item scalars into (8, 128)-tiled SMEM blocks
    P = w // G
    scal = jnp.concatenate(
        [
            bids.reshape(P, G),
            qid.reshape(P, G),
            lcl.reshape(P, G),
            jlo.reshape(P, G * n_clauses),
        ],
        axis=1,
    ).astype(jnp.int32)
    pad_cols = 8 * 128 - scal.shape[1]
    scal = jnp.pad(scal, ((0, 0), (0, pad_cols))).reshape(P, 8, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
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
                (G, n_clauses, ((kw + 7) & ~7) + 8, 384), jnp.uint32
            ),
            pltpu.SemaphoreType.DMA((G, 1 + n_clauses)),
        ],
    )
    scores, docs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((w, 128), jnp.float32),
            jax.ShapeDtypeStruct((w, 128), jnp.uint32),
        ],
        interpret=interpret,
    )(
        cl_weight, cl_kind, cl_start, cl_len, cl_shipped, req_must,
        req_should, scal, cstore,
    )
    kk = min(k, 128)
    row_sc, row_idx = jax.lax.top_k(scores, kk)
    row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
    return pack_results(
        *per_query_topk_from_rows(row_sc, row_doc, qid, k, num_queries)
    )


def compute_jlo(dfp, work_blocks, work_qid, cl_start, cl_len, kw: int):
    """Host-side window starts [N, T]: for each work item and clause, the
    first clause block whose last doc >= the item block's base (one
    vectorized searchsorted per (query, clause) region), clamped so the
    kw-row DMA stays in bounds."""
    n = len(work_blocks)
    T = cl_start.shape[1]
    kw8 = ((kw + 7) & ~7) + 8
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
