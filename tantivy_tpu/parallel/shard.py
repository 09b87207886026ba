"""Segment-sharded search over a device mesh.

The TPU-native equivalent of the reference's per-segment rayon fan-out +
`merge_fruits` reduce (`core/executor.rs:32-102`, `collector/mod.rs:167`),
re-expressed as SPMD over `jax.sharding.Mesh`:

* every device owns one shard of the corpus (its segments' block stores,
  fieldnorms, alive masks, stacked into uniform arrays),
* queries (weights/caches/block selections) are planned on host and the
  per-shard block selections are sharded alongside the data,
* each device decodes + scores + computes a local `lax.top_k`,
* an `all_gather` over the mesh axis moves only `[D, Q, k]` candidates across
  ICI, and a final replicated top-k produces the global answer — the exact
  analogue of `merge_fruits`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from ..ops.fmath import exact_div
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..postings.format import TERMINATED

NEG_INF = np.float32(-np.inf)


def _local_topk(docs, tfs, valid, norm_ids, alive, doc_off, weights, caches, k):
    """Per-shard scoring. docs/tfs: [Q, B, 128]; valid: [Q, B];
    norm_ids/alive: [max_doc_local]; doc_off: scalar; weights: [Q];
    caches: [Q, 256]. Returns (scores [Q, k], global_docs [Q, k])."""
    q, b, _ = docs.shape
    max_doc = norm_ids.shape[0]
    safe = jnp.minimum(docs, jnp.uint32(max(max_doc - 1, 0)))
    nid = norm_ids[safe].astype(jnp.int32)
    norm = jnp.take_along_axis(
        caches[:, None, :], nid.reshape(q, b * 128)[:, None, :], axis=2
    ).reshape(q, b, 128)
    tf = tfs.astype(jnp.float32)
    scores = weights[:, None, None] * exact_div(tf, tf + norm)
    mask = (docs != jnp.uint32(TERMINATED)) & valid[:, :, None] & alive[safe]
    scores = jnp.where(mask, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores.reshape(q, b * 128), k)
    local_docs = jnp.take_along_axis(docs.reshape(q, b * 128), idx, axis=1)
    global_docs = local_docs + doc_off
    return vals, global_docs


def make_sharded_term_topk(mesh: Mesh, k: int):
    """Builds the jitted SPMD step. Input shapes (D = mesh axis size):
      doc_store [D, NB, 128] u32, tf_store [D, NB, 128] u32,
      block_sel [D, Q, B] i32, valid [D, Q, B] bool,
      norm_ids [D, MD] u8, alive [D, MD] bool, doc_off [D] u32,
      weights [Q] f32, caches [Q, 256] f32
    Returns (scores [Q, k], global_docs [Q, k]) replicated."""

    def step(doc_store, tf_store, block_sel, valid, norm_ids, alive, doc_off,
             weights, caches):
        def shard_fn(doc_store, tf_store, block_sel, valid, norm_ids, alive,
                     doc_off, weights, caches):
            # leading shard axis has local size 1
            docs = jnp.take(doc_store[0], block_sel[0], axis=0)  # [Q, B, 128]
            tfs = jnp.take(tf_store[0], block_sel[0], axis=0)
            vals, gdocs = _local_topk(
                docs, tfs, valid[0], norm_ids[0], alive[0], doc_off[0],
                weights, caches, k,
            )
            # fruit merge: all_gather candidates over ICI, then global top-k
            all_vals = jax.lax.all_gather(vals, "seg", axis=0)  # [D, Q, k]
            all_docs = jax.lax.all_gather(gdocs, "seg", axis=0)
            d, q, kk = all_vals.shape
            flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q, d * kk)
            flat_docs = jnp.transpose(all_docs, (1, 0, 2)).reshape(q, d * kk)
            # order candidates by (score desc, global doc asc): stable top_k
            # prefers lower flat index, and within a shard docs ascend, but
            # across shards we need doc-ascending tie-break -> sort by doc
            # first via a compound key.
            order = jnp.argsort(flat_docs, axis=1)
            sv = jnp.take_along_axis(flat_vals, order, axis=1)
            sd = jnp.take_along_axis(flat_docs, order, axis=1)
            mvals, midx = jax.lax.top_k(sv, k)
            mdocs = jnp.take_along_axis(sd, midx, axis=1)
            return mvals, mdocs

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("seg"), P("seg"), P("seg"), P("seg"), P("seg"), P("seg"),
                P("seg"), P(), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(doc_store, tf_store, block_sel, valid, norm_ids, alive, doc_off,
          weights, caches)

    return jax.jit(step)


def _fruit_merge(vals, gdocs, k):
    """all_gather candidates over ICI + replicated global top-k with the
    (score desc, global doc asc) tie-break — `merge_fruits` on the mesh."""
    all_vals = jax.lax.all_gather(vals, "seg", axis=0)  # [D, Q, k]
    all_docs = jax.lax.all_gather(gdocs, "seg", axis=0)
    d, q, kk = all_vals.shape
    flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q, d * kk)
    flat_docs = jnp.transpose(all_docs, (1, 0, 2)).reshape(q, d * kk)
    order = jnp.argsort(flat_docs, axis=1)
    sv = jnp.take_along_axis(flat_vals, order, axis=1)
    sd = jnp.take_along_axis(flat_docs, order, axis=1)
    mvals, midx = jax.lax.top_k(sv, k)
    mdocs = jnp.take_along_axis(sd, midx, axis=1)
    return mvals, mdocs


def make_sharded_bool_topk(mesh: Mesh, k: int, num_queries: int,
                           n_clauses: int, n_segs: int, n_iters: int):
    """SPMD boolean(term) batch step. Each shard runs the probe kernel over
    its own stacked block store (lanes probe only their own segment's clause
    regions — shard-local doc ranges are disjoint across segments), then
    fruits merge over the mesh axis. Shapes (D = mesh axis size, W = work
    list, Qp = num_queries + 1, T/S static buckets):
      doc_store/tf_store [D, NB, 128], blk_last [D, NB],
      block_sel/lane_q/lane_cl/lane_seg [D, W] (+ valid [D, W]),
      norm_ids/alive [D, MD], doc_off [D],
      cl_weight/cl_kind [D, Qp, T], cl_start/cl_len/cl_shipped [D, Qp, T, S],
      req_must/req_should [Qp], cache [256]."""
    from ..ops.probe_scorer import (
        KIND_MUST,
        KIND_MUST_NOT,
        KIND_SHOULD,
        T_MAX,
        per_query_topk_from_rows,
        probe_term,
    )

    def step(doc_store, tf_store, blk_last, block_sel, lane_q, lane_cl,
             lane_seg, valid, norm_ids, alive, doc_off,
             cl_weight, cl_kind, cl_start, cl_len, cl_shipped,
             req_must, req_should, cache):
        def shard_fn(doc_store, tf_store, blk_last, block_sel, lane_q,
                     lane_cl, lane_seg, valid, norm_ids, alive, doc_off,
                     cl_weight, cl_kind, cl_start, cl_len, cl_shipped,
                     req_must, req_should, cache):
            ds, ts, bl = doc_store[0], tf_store[0], blk_last[0]
            nid, alv = norm_ids[0], alive[0]
            c_start, c_len = cl_start[0], cl_len[0]
            c_w, c_kind, c_ship = cl_weight[0], cl_kind[0], cl_shipped[0]
            docs = jnp.take(ds, block_sel[0], axis=0)      # [W, 128]
            tfs = jnp.take(ts, block_sel[0], axis=0)
            w, lanes = docs.shape
            max_doc = nid.shape[0]

            fq = jnp.repeat(lane_q[0], lanes)
            fdoc = docs.reshape(-1)
            ftf = tfs.reshape(-1)
            fcl = jnp.repeat(lane_cl[0], lanes)
            fseg = jnp.repeat(lane_seg[0], lanes)
            safe = jnp.minimum(fdoc, jnp.uint32(max(max_doc - 1, 0)))
            lane_ok = (
                (fdoc != jnp.uint32(TERMINATED))
                & jnp.repeat(valid[0], lanes)
                & alv[safe]
                & (fq < jnp.int32(num_queries))
            )
            norm = cache[nid[safe].astype(jnp.int32)]

            score = jnp.zeros_like(norm)
            cnt_must = jnp.zeros(fq.shape, dtype=jnp.int32)
            cnt_should = jnp.zeros(fq.shape, dtype=jnp.int32)
            has_not = jnp.zeros(fq.shape, dtype=jnp.bool_)
            primary = jnp.full(fq.shape, T_MAX + 1, dtype=jnp.int32)
            for t in range(n_clauses):
                own = fcl == t
                found, tf_probe, _ = probe_term(
                    ds, ts, bl, fdoc,
                    c_start[fq, t, fseg], c_len[fq, t, fseg], n_iters,
                )
                presence = jnp.where(own, True, found)
                tf_t = jnp.where(own, ftf, tf_probe).astype(jnp.float32)
                kind_t = c_kind[fq, t]
                contrib = c_w[fq, t] * exact_div(tf_t, tf_t + norm)
                positive = presence & (
                    (kind_t == KIND_MUST) | (kind_t == KIND_SHOULD)
                )
                score = score + jnp.where(positive, contrib, jnp.float32(0.0))
                cnt_must = cnt_must + (
                    presence & (kind_t == KIND_MUST)
                ).astype(jnp.int32)
                cnt_should = cnt_should + (
                    presence & (kind_t == KIND_SHOULD)
                ).astype(jnp.int32)
                has_not = has_not | (presence & (kind_t == KIND_MUST_NOT))
                is_prim = presence & c_ship[fq, t, fseg] & (primary > T_MAX)
                primary = jnp.where(is_prim, jnp.int32(t), primary)

            ok = (
                lane_ok
                & (fcl == primary)
                & (cnt_must >= req_must[fq])
                & (cnt_should >= req_should[fq])
                & ~has_not
            )
            lane_scores = jnp.where(ok, score, NEG_INF).reshape(w, lanes)
            kk = min(k, lanes)
            row_sc, row_idx = jax.lax.top_k(lane_scores, kk)
            row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
            vals, ldocs = per_query_topk_from_rows(
                row_sc, row_doc, lane_q[0], k, num_queries
            )
            gdocs = ldocs + doc_off[0]
            return _fruit_merge(vals, gdocs, k)

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("seg"), P("seg"), P("seg"), P("seg"), P("seg"), P("seg"),
                P("seg"), P("seg"), P("seg"), P("seg"), P("seg"),
                P("seg"), P("seg"), P("seg"), P("seg"), P("seg"),
                P(), P(), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(doc_store, tf_store, blk_last, block_sel, lane_q, lane_cl,
          lane_seg, valid, norm_ids, alive, doc_off,
          cl_weight, cl_kind, cl_start, cl_len, cl_shipped,
          req_must, req_should, cache)

    return jax.jit(step)


def make_sharded_phrase_topk(mesh: Mesh, k: int, num_queries: int,
                             n_terms: int, n_segs: int, n_iters: int,
                             pw: int, max_p: int):
    """SPMD phrase(slop=0) batch step. Each shard anchors work items on the
    rarest term's blocks of its own segments, probes every term's region by
    per-lane binary search (`probe_term` — the deep-probe variant, no window
    caps), gathers pw-wide position windows from the shard's stacked
    positions store, counts aligned matches, and fruit-merges over the mesh.
    The single-chip analogue is `ops/phrase_scorer.probe_phrase_topk`."""
    from ..ops.probe_scorer import per_query_topk_from_rows, probe_term

    def step(doc_store, tf_store, blk_last, pos_cum, positions,
             block_sel, lane_q, lane_t, lane_seg, valid,
             norm_ids, alive, doc_off,
             q_weight, cl_start, cl_len, cl_pos_start, cl_shift, cache):
        def shard_fn(doc_store, tf_store, blk_last, pos_cum, positions,
                     block_sel, lane_q, lane_t, lane_seg, valid,
                     norm_ids, alive, doc_off,
                     q_weight, cl_start, cl_len, cl_pos_start, cl_shift,
                     cache):
            ds, ts, bl = doc_store[0], tf_store[0], blk_last[0]
            pcum, pos = pos_cum[0], positions[0]
            nid, alv = norm_ids[0], alive[0]
            c_start, c_len = cl_start[0], cl_len[0]
            c_pstart = cl_pos_start[0]
            docs = jnp.take(ds, block_sel[0], axis=0)  # [W, 128]
            tfs = jnp.take(ts, block_sel[0], axis=0)
            w, lanes = docs.shape
            max_doc = nid.shape[0]
            npos = max(int(pos.shape[0]), 1)

            fq = jnp.repeat(lane_q[0], lanes)
            fdoc = docs.reshape(-1)
            fterm = jnp.repeat(lane_t[0], lanes)
            fseg = jnp.repeat(lane_seg[0], lanes)
            safe = jnp.minimum(fdoc, jnp.uint32(max(max_doc - 1, 0)))
            lane_ok = (
                (fdoc != jnp.uint32(TERMINATED))
                & jnp.repeat(valid[0], lanes)
                & alv[safe]
                & (fq < jnp.int32(num_queries))
            )
            norm = cache[nid[safe].astype(jnp.int32)]

            all_found = lane_ok
            tf_t, pwin_t, shift_t = [], [], []
            for t in range(n_terms):
                s = c_start[fq, t, fseg]
                found, tf, flatpos = probe_term(
                    ds, ts, bl, fdoc, s, c_len[fq, t, fseg], n_iters,
                )
                all_found = all_found & found & (c_len[fq, t, fseg] > 0)
                tfi = tf.astype(jnp.int32)
                tf_t.append(tfi)
                pbase = c_pstart[fq, t, fseg] + (
                    pcum[flatpos]
                    - pcum[jnp.minimum(s * 128, pcum.shape[0] - 1)]
                ).astype(jnp.int32)
                pidx = jnp.clip(
                    pbase[:, None] + jnp.arange(pw, dtype=jnp.int32),
                    0, npos - 1,
                )
                win = pos[pidx].astype(jnp.int32)  # [L, pw]
                in_tf = jnp.arange(pw, dtype=jnp.int32) < tfi[:, None]
                pwin_t.append(jnp.where(in_tf, win, jnp.int32(-(1 << 30))))
                shift_t.append(cl_shift[fq, t])

            anchor_tf = jnp.zeros_like(tf_t[0])
            anchor_win = jnp.zeros_like(pwin_t[0])
            anchor_shift = jnp.zeros_like(shift_t[0])
            for t in range(n_terms):
                own = fterm == t
                anchor_tf = jnp.where(own, tf_t[t], anchor_tf)
                anchor_win = jnp.where(own[:, None], pwin_t[t], anchor_win)
                anchor_shift = jnp.where(own, shift_t[t], anchor_shift)

            count = jnp.zeros(fq.shape, dtype=jnp.int32)
            for j in range(max_p):
                in_range = (j < anchor_tf) & all_found
                p = anchor_win[:, j] + anchor_shift
                match = in_range
                for t in range(n_terms):
                    target = (p - shift_t[t])[:, None]
                    match = match & jnp.any(pwin_t[t] == target, axis=1)
                count = count + match.astype(jnp.int32)

            tf = count.astype(jnp.float32)
            score = q_weight[fq] * exact_div(tf, tf + norm)
            ok = all_found & (count > 0)
            lane_scores = jnp.where(ok, score, NEG_INF).reshape(w, lanes)
            kk = min(k, lanes)
            row_sc, row_idx = jax.lax.top_k(lane_scores, kk)
            row_doc = jnp.take_along_axis(docs, row_idx, axis=1)
            vals, ldocs = per_query_topk_from_rows(
                row_sc, row_doc, lane_q[0], k, num_queries
            )
            gdocs = ldocs + doc_off[0]
            return _fruit_merge(vals, gdocs, k)

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("seg"), P("seg"), P("seg"), P("seg"), P("seg"),
                P("seg"), P("seg"), P("seg"), P("seg"), P("seg"),
                P("seg"), P("seg"), P("seg"),
                P(), P("seg"), P("seg"), P("seg"), P(), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(doc_store, tf_store, blk_last, pos_cum, positions,
          block_sel, lane_q, lane_t, lane_seg, valid,
          norm_ids, alive, doc_off,
          q_weight, cl_start, cl_len, cl_pos_start, cl_shift, cache)

    return jax.jit(step)


class ShardedSearcher:
    """Device-mesh search over an index: shards segments across the mesh and
    runs batched term/boolean/phrase top-k with on-device fruit merging and
    two-phase Block-WAND pruning (thresholds established from a phase-1
    launch over each query's best-UB blocks; phase 2 ships survivors only)."""

    def __init__(self, searcher, mesh: Mesh):
        self.searcher = searcher
        self.mesh = mesh
        self.n_shards = mesh.shape["seg"]
        #: shipped-block accounting of the last batch (pruning visibility)
        self.last_shipped: dict[str, int] = {}
        self._build_shards()

    def _build_shards(self):
        from ..ops.device_index import DeviceSegment

        readers = self.searcher.segment_readers()
        D = self.n_shards
        # round-robin segments over shards; stack each shard's blocks
        # contiguous assignment: shard s gets segments [s*c, (s+1)*c) so a
        # scalar per-shard base keeps global doc ids in DocAddress order
        # (required for the cross-shard tie-break)
        shard_readers: list[list] = [[] for _ in range(D)]
        shard_seg_ords: list[list[int]] = [[] for _ in range(D)]
        chunk = -(-len(readers) // D) if readers else 1
        for i, r in enumerate(readers):
            s = min(i // chunk, D - 1)
            shard_readers[s].append(r)
            shard_seg_ords[s].append(i)
        self.shard_readers = shard_readers
        self.shard_seg_ords = shard_seg_ords
        # globally-unique doc numbering in (segment_ord, doc) order so that
        # ascending global id == ascending DocAddress (the tie-break key)
        self.seg_bases = np.concatenate(
            [[0], np.cumsum([r.max_doc for r in readers])]
        ).astype(np.int64)
        self.field_cache: dict[str, dict] = {}

    def _field_data(self, field: str):
        """Stack per-shard block stores for `field` into mesh-ready arrays."""
        cached = self.field_cache.get(field)
        if cached is not None:
            return cached
        from ..ops.device_index import DeviceSegment

        D = self.n_shards
        shard_blobs = []
        for shard_i, readers in enumerate(self.shard_readers):
            docs_list, tfs_list, norm_list, alive_list = [], [], [], []
            blast_list = []
            block_off = 0
            doc_off = 0  # shard-local doc offset (norms/alive indexing)
            seg_infos = []
            pos_list, pcum_list = [], []
            pos_off = 0
            for seg_idx, r in enumerate(readers):
                dseg = DeviceSegment(r, mode="dense")
                dfp = dseg.field_postings(field)
                d_np = np.asarray(dfp.docs)
                t_np = np.asarray(dfp.tfs)
                docs_list.append(d_np)
                tfs_list.append(t_np)
                blast_list.append(
                    dfp.blk_last_doc.astype(np.uint32) + np.uint32(doc_off)
                )
                norm_list.append(np.asarray(dfp.norm_ids))
                a = r.alive_bitset()
                alive_list.append(
                    a if a is not None else np.ones(r.max_doc, dtype=bool)
                )
                # host-side planning stats: block-max bfac (WAND UBs) and
                # per-block true max tf (phrase position-window rungs)
                from ..query.bm25 import compute_tf_cache

                fs = self.searcher.field_statistics(field)
                cache = compute_tf_cache(np.float32(fs.average_fieldnorm))
                btf = dfp.blk_max_tf.astype(np.float32)
                bfac = (btf / (btf + cache[dfp.blk_max_fnid])).astype(
                    np.float32
                )
                real_tf = np.where(d_np != np.uint32(TERMINATED), t_np, 0)
                # per-segment positions + exclusive posting-rank cumsum
                positions_np, _ = dfp._positions_np, None
                pcum = np.cumsum(real_tf.reshape(-1), dtype=np.uint32)
                pcum -= real_tf.reshape(-1).astype(np.uint32)
                pos_list.append(positions_np.astype(np.uint32))
                pcum_list.append(pcum)
                seg_infos.append(
                    {
                        "reader": r,
                        "block_off": block_off,
                        "doc_off": doc_off,
                        "pos_off": pos_off,
                        "global_base": int(
                            self.seg_bases[self.shard_seg_ords[shard_i][seg_idx]]
                        ),
                        "dfp": dfp,
                        "bfac": bfac,
                        "blk_top_tf": real_tf.max(axis=1, initial=0),
                    }
                )
                block_off += dfp.num_blocks
                doc_off += r.max_doc
                pos_off += len(positions_np)
            # store docs as shard-local ids (for norm/alive gathers); the
            # kernel's doc_off is replaced by per-block global rebase below
            adj_docs = []
            for info, d in zip(seg_infos, docs_list):
                d = d.copy()
                mask = d != np.uint32(TERMINATED)
                d[mask] += np.uint32(info["doc_off"])
                adj_docs.append(d)
            docs = (
                np.concatenate(adj_docs)
                if adj_docs
                else np.zeros((0, 128), dtype=np.uint32)
            )
            tfs = (
                np.concatenate(tfs_list)
                if tfs_list
                else np.zeros((0, 128), dtype=np.uint32)
            )
            blast = (
                np.concatenate(blast_list)
                if blast_list
                else np.zeros(0, dtype=np.uint32)
            )
            norms = (
                np.concatenate(norm_list)
                if norm_list
                else np.zeros(0, dtype=np.uint8)
            )
            alive = (
                np.concatenate(alive_list)
                if alive_list
                else np.zeros(0, dtype=bool)
            )
            shard_blobs.append(
                {
                    "docs": docs,
                    "tfs": tfs,
                    "blast": blast,
                    "norms": norms,
                    "alive": alive,
                    "segs": seg_infos,
                    "positions": (
                        np.concatenate(pos_list)
                        if pos_list else np.zeros(0, dtype=np.uint32)
                    ),
                    "pos_cum": (
                        np.concatenate(pcum_list)
                        if pcum_list else np.zeros(0, dtype=np.uint32)
                    ),
                }
            )
        # pad shards to uniform shapes
        nb = max(max((b["docs"].shape[0] for b in shard_blobs), default=1), 1)
        md = max(max((len(b["norms"]) for b in shard_blobs), default=1), 1)
        doc_store = np.full((D, nb, 128), TERMINATED, dtype=np.uint32)
        tf_store = np.ones((D, nb, 128), dtype=np.uint32)
        blk_last = np.full((D, nb), 0xFFFFFFFF, dtype=np.uint32)
        norm_ids = np.zeros((D, md), dtype=np.uint8)
        alive = np.zeros((D, md), dtype=bool)
        for s, blob in enumerate(shard_blobs):
            n = blob["docs"].shape[0]
            doc_store[s, :n] = blob["docs"]
            tf_store[s, :n] = blob["tfs"]
            blk_last[s, :n] = blob["blast"]
            norm_ids[s, : len(blob["norms"])] = blob["norms"]
            alive[s, : len(blob["alive"])] = blob["alive"]
        np_pos = max(max((len(b["positions"]) for b in shard_blobs),
                         default=1), 1)
        positions = np.zeros((D, np_pos), dtype=np.uint32)
        pos_cum = np.zeros((D, nb * 128), dtype=np.uint32)
        for s, blob in enumerate(shard_blobs):
            positions[s, : len(blob["positions"])] = blob["positions"]
            pos_cum[s, : len(blob["pos_cum"])] = blob["pos_cum"]
        data = {
            "doc_store": doc_store,
            "tf_store": tf_store,
            "blk_last": blk_last,
            "norm_ids": norm_ids,
            "alive": alive,
            "positions": positions,
            "pos_cum": pos_cum,
            "shard_blobs": shard_blobs,
            "nb": nb,
            "md": md,
        }
        self.field_cache[field] = data
        return data

    def search_term_batch(self, terms: list, k: int):
        """Batched sharded term search. Returns
        list[list[(score, DocAddress)]]."""
        from ..query.bm25 import Bm25Weight
        from ..searcher import DocAddress

        if not terms:
            return []
        field = terms[0].field
        assert all(t.field == field for t in terms), "one field per batch"
        data = self._field_data(field)
        D = self.n_shards
        Q = len(terms)

        weights = np.zeros(Q, dtype=np.float32)
        caches = np.zeros((Q, 256), dtype=np.float32)
        fs = self.searcher.field_statistics(field)
        for qi, t in enumerate(terms):
            df = self.searcher.doc_freq(t)
            w = Bm25Weight.for_one_term(max(df, 1), fs.total_num_docs,
                                        fs.average_fieldnorm)
            weights[qi] = w.weight
            caches[qi] = w.cache

        # per-shard block selection (host planning)
        max_b = 1
        sels = []
        for blob in data["shard_blobs"]:
            shard_sel = []
            for t in terms:
                blocks = []
                for info in blob["segs"]:
                    inv = info["reader"].inverted_index(field)
                    o = inv.term_ord(t.value_bytes)
                    if o is not None:
                        dfp = info["dfp"]
                        s0 = int(dfp.term_block_start[o])
                        n = int(dfp.term_num_blocks[o])
                        blocks.extend(
                            range(info["block_off"] + s0, info["block_off"] + s0 + n)
                        )
                shard_sel.append(blocks)
                max_b = max(max_b, len(blocks))
            sels.append(shard_sel)
        B = 1
        while B < max_b:
            B *= 2
        block_sel = np.zeros((D, Q, B), dtype=np.int32)
        valid = np.zeros((D, Q, B), dtype=bool)
        for s in range(D):
            for qi in range(Q):
                bl = sels[s][qi]
                block_sel[s, qi, : len(bl)] = bl
                valid[s, qi, : len(bl)] = True

        # per-shard global base = global base of its first segment
        doc_off = np.zeros(D, dtype=np.uint32)
        for s in range(D):
            if self.shard_seg_ords[s]:
                doc_off[s] = np.uint32(self.seg_bases[self.shard_seg_ords[s][0]])
        step = make_sharded_term_topk(self.mesh, k)
        vals, gdocs = step(
            data["doc_store"], data["tf_store"], block_sel, valid,
            data["norm_ids"], data["alive"], doc_off,
            weights, caches,
        )
        vals = np.asarray(vals)
        gdocs = np.asarray(gdocs).astype(np.int64)

        # map globally-unique doc ids back to DocAddress
        out = []
        for qi in range(Q):
            hits = []
            for j in range(k):
                s = vals[qi, j]
                if not np.isfinite(s):
                    continue
                g = int(gdocs[qi, j])
                seg = int(np.searchsorted(self.seg_bases, g, side="right")) - 1
                hits.append(
                    (np.float32(s), DocAddress(seg, g - int(self.seg_bases[seg])))
                )
            out.append(hits)
        return out


    def search_boolean_batch(self, queries: list, k: int):
        """Batched sharded boolean(term-clause) search: shipped candidate
        blocks per shard (only the rarest MUST clause for intersections),
        probe scoring on each shard, fruit merge over the mesh. Returns
        list[list[(score, DocAddress)]]."""
        from ..ops.probe_scorer import (
            KIND_ABSENT,
            KIND_MUST,
            KIND_MUST_NOT,
            KIND_SHOULD,
            t_bucket,
        )
        from ..query import Occur
        from ..query.bm25 import Bm25Weight, compute_tf_cache
        from ..searcher import DocAddress

        if not queries:
            return []
        field = queries[0].clauses[0][1].term.field
        data = self._field_data(field)
        D = self.n_shards
        Q = len(queries)
        kind_of = {
            Occur.MUST: KIND_MUST,
            Occur.SHOULD: KIND_SHOULD,
            Occur.MUST_NOT: KIND_MUST_NOT,
        }
        fs = self.searcher.field_statistics(field)
        cache = compute_tf_cache(np.float32(fs.average_fieldnorm))

        T = t_bucket(max(len(q.clauses) for q in queries))
        S = max(max((len(b["segs"]) for b in data["shard_blobs"]),
                    default=1), 1)
        req_must = np.zeros(Q + 1, dtype=np.int32)
        req_should = np.zeros(Q + 1, dtype=np.int32)
        req_must[Q] = 1 << 30
        cl_weight = np.zeros((D, Q + 1, T), dtype=np.float32)
        cl_kind = np.full((D, Q + 1, T), KIND_ABSENT, dtype=np.int32)
        cl_start = np.zeros((D, Q + 1, T, S), dtype=np.int32)
        cl_len = np.zeros((D, Q + 1, T, S), dtype=np.int32)
        cl_shipped = np.zeros((D, Q + 1, T, S), dtype=bool)

        qinfo = []
        max_nblk = 1
        for qi, q in enumerate(queries):
            n_must = sum(1 for occ, _ in q.clauses if occ == Occur.MUST)
            n_should = sum(1 for occ, _ in q.clauses if occ == Occur.SHOULD)
            req_must[qi] = n_must
            ms = q.minimum_number_should_match
            if n_must == 0:
                ms = max(ms, 1)
            req_should[qi] = min(ms, n_should) if n_should else 0
            if n_should and q.minimum_number_should_match > n_should:
                req_should[qi] = 1 << 30
            info = []
            for occ, sub in q.clauses:
                kd = kind_of[occ]
                if kd == KIND_MUST_NOT:
                    w = np.float32(0.0)
                else:
                    bw = Bm25Weight.for_one_term(
                        max(self.searcher.doc_freq(sub.term), 1),
                        fs.total_num_docs, fs.average_fieldnorm,
                    )
                    w = bw.weight
                info.append((kd, sub.term, w))
            qinfo.append(info)

        # candidate blocks + WAND upper bounds per (shard, segment, query,
        # shipped clause) — the single-chip planner's bounds, shard-local
        from .wand import FieldWand

        M1 = 4
        cand = []  # (shard, qi, gblocks, ub, gbase_of_blocks, cls, segs)
        for s, blob in enumerate(data["shard_blobs"]):
            for si, seg in enumerate(blob["segs"]):
                inv = seg["reader"].inverted_index(field)
                dfp = seg["dfp"]
                fw = seg.get("fw")
                if fw is None:
                    fw = seg["fw"] = FieldWand(dfp, fs.average_fieldnorm)
                for qi, info in enumerate(qinfo):
                    ords = [inv.term_ord(t.value_bytes) for _, t, _ in info]
                    ords = [-1 if o is None else o for o in ords]
                    if any(
                        kd == KIND_MUST and o < 0
                        for (kd, _, _), o in zip(info, ords)
                    ):
                        continue
                    positive = [
                        ci
                        for ci, ((kd, _, _), o) in enumerate(zip(info, ords))
                        if kd in (KIND_MUST, KIND_SHOULD) and o >= 0
                    ]
                    if not positive:
                        continue
                    for ci, ((kd, t, w), o) in enumerate(zip(info, ords)):
                        if o < 0:
                            continue
                        cl_weight[s, qi, ci] = (
                            0.0 if kd == KIND_MUST_NOT else w
                        )
                        cl_kind[s, qi, ci] = kd
                        cl_start[s, qi, ci, si] = (
                            seg["block_off"] + int(dfp.term_block_start[o])
                        )
                        cl_len[s, qi, ci, si] = int(dfp.term_num_blocks[o])
                        max_nblk = max(max_nblk, int(dfp.term_num_blocks[o]))
                    musts = [
                        ci for ci in positive if info[ci][0] == KIND_MUST
                    ]
                    if musts:
                        shipped = [min(
                            musts,
                            key=lambda ci: int(
                                dfp.term_num_blocks[ords[ci]]
                            ),
                        )]
                    else:
                        shipped = positive
                    qsegcand = []
                    for ci in shipped:
                        cl_shipped[s, qi, ci, si] = True
                        others = [
                            (info[c2][0] == KIND_MUST,
                             info[c2][2] if c2 in positive
                             else np.float32(0.0),
                             int(dfp.term_block_start[ords[c2]]),
                             int(dfp.term_num_blocks[ords[c2]]),
                             c2)
                            for c2 in range(len(info))
                            if c2 != ci and ords[c2] >= 0
                            and (c2 in positive
                                 or info[c2][0] == KIND_MUST_NOT)
                        ]
                        ids, ub, _ = fw.clause_blocks_ub(
                            int(dfp.term_block_start[ords[ci]]),
                            int(dfp.term_num_blocks[ords[ci]]),
                            info[ci][2], others, self_pos=ci,
                        )
                        if not len(ids):
                            continue
                        gblocks = ids + seg["block_off"]
                        gbase = (
                            dfp.blk_base[ids].astype(np.int64)
                            + seg["global_base"]
                        )
                        qsegcand.append((ci, gblocks, ub, gbase))
                    if not qsegcand:
                        continue
                    # phase-1 = top-M1 blocks by UB across this (q, seg)
                    all_ub = np.concatenate([c[2] for c in qsegcand])
                    if len(all_ub) <= M1:
                        cut = NEG_INF
                    else:
                        cut = np.partition(all_ub, len(all_ub) - M1)[
                            len(all_ub) - M1
                        ]
                    taken = 0
                    for ci, gblocks, ub, gbase in qsegcand:
                        pick = ub >= cut
                        extra = int(pick.sum()) - (M1 - taken)
                        if extra > 0:
                            sel = np.nonzero(pick)[0]
                            pick[sel[len(sel) - extra:]] = False
                        taken += int(pick.sum())
                        cand.append(
                            (s, qi, si, ci, gblocks, ub, gbase, pick)
                        )

        doc_off = np.zeros(D, dtype=np.uint32)
        for s in range(D):
            if self.shard_seg_ords[s]:
                doc_off[s] = np.uint32(
                    self.seg_bases[self.shard_seg_ords[s][0]]
                )
        n_iters = max(int(np.ceil(np.log2(max(max_nblk, 2)))) + 1, 4)
        step = make_sharded_bool_topk(self.mesh, k, Q, T, S, n_iters)

        def launch(selector):
            """Pack per-shard work lists for the selected blocks and run one
            SPMD step. selector(entry) -> bool mask over the entry's blocks."""
            per_shard = {s: [] for s in range(D)}
            total = 0
            for entry in cand:
                s, qi, si, ci, gblocks, ub, gbase, pick = entry
                m = selector(entry)
                if m.any():
                    per_shard[s].append(
                        (gblocks[m], qi, ci, si)
                    )
                    total += int(m.sum())
            W = max(
                (sum(len(x[0]) for x in lst) for lst in per_shard.values()),
                default=1,
            )
            Wp = 1
            while Wp < max(W, 1):
                Wp *= 2
            block_sel = np.zeros((D, Wp), dtype=np.int32)
            lane_q = np.full((D, Wp), Q, dtype=np.int32)
            lane_cl = np.zeros((D, Wp), dtype=np.int32)
            lane_seg = np.zeros((D, Wp), dtype=np.int32)
            valid = np.zeros((D, Wp), dtype=bool)
            for s, lst in per_shard.items():
                off = 0
                for gblocks, qi, ci, si in lst:
                    n = len(gblocks)
                    block_sel[s, off : off + n] = gblocks
                    lane_q[s, off : off + n] = qi
                    lane_cl[s, off : off + n] = ci
                    lane_seg[s, off : off + n] = si
                    valid[s, off : off + n] = True
                    off += n
            vals, gdocs = step(
                data["doc_store"], data["tf_store"], data["blk_last"],
                block_sel, lane_q, lane_cl, lane_seg, valid,
                data["norm_ids"], data["alive"], doc_off,
                cl_weight, cl_kind, cl_start, cl_len, cl_shipped,
                req_must, req_should, jnp.asarray(cache),
            )
            return np.asarray(vals), np.asarray(gdocs).astype(np.int64), total

        # ---- phase 1: each query's best-UB blocks -------------------------
        v1, d1, n1 = launch(lambda e: e[7])
        th = np.full(Q, NEG_INF, dtype=np.float32)
        th_doc = np.full(Q, 1 << 62, dtype=np.int64)
        for qi in range(Q):
            finite = np.isfinite(v1[qi])
            if int(finite.sum()) == k:
                th[qi] = v1[qi][finite][-1]
                th_doc[qi] = d1[qi][finite][-1]

        # ---- phase 2: surviving rest blocks (tie-aware, exact) ------------
        def survivors(e):
            s, qi, si, ci, gblocks, ub, gbase, pick = e
            rest = ~pick
            if th[qi] == NEG_INF:
                return rest
            later = gbase > th_doc[qi]
            return rest & ((ub > th[qi]) | ((ub == th[qi]) & ~later))

        v2, d2, n2 = launch(survivors)
        self.last_shipped = {
            "candidates": int(sum(len(e[4]) for e in cand)),
            "phase1": n1,
            "phase2": n2,
        }

        out = []
        for qi in range(Q):
            merged: dict[int, np.float32] = {}
            for vals, gdocs in ((v1, d1), (v2, d2)):
                for j in range(k):
                    sc = vals[qi, j]
                    if not np.isfinite(sc):
                        continue
                    g = int(gdocs[qi, j])
                    if g not in merged or merged[g] < sc:
                        merged[g] = np.float32(sc)
            hits = sorted(
                ((sc, g) for g, sc in merged.items()),
                key=lambda x: (-float(x[0]), x[1]),
            )[:k]
            qout = []
            for sc, g in hits:
                seg = int(
                    np.searchsorted(self.seg_bases, g, side="right")
                ) - 1
                qout.append(
                    (np.float32(sc),
                     DocAddress(seg, g - int(self.seg_bases[seg])))
                )
            out.append(qout)
        return out


    def search_phrase_batch(self, queries: list, k: int):
        """Batched sharded phrase(slop=0) search with two-phase pruning:
        anchor blocks come from each segment's rarest term, phase 1 ships
        each query's best-UB anchors (UB = phrase_weight * leader bfac —
        phrase tf <= leader tf), phase 2 ships threshold survivors.
        Pathological in-doc tf resolves on host per query (exact), mirroring
        the single-chip planner. Returns list[list[(score, DocAddress)]]."""
        from ..collector import TopDocs
        from ..ops.phrase_scorer import MAX_P, _PW_LADDER
        from ..ops.phrase_scorer import t_bucket as ph_t_bucket
        from ..query.bm25 import Bm25Weight, compute_tf_cache
        from ..schema.term import Term
        from ..searcher import DocAddress

        if not queries:
            return []
        field = queries[0].field
        assert all(q.field == field for q in queries), "one field per batch"
        data = self._field_data(field)
        D = self.n_shards
        Q = len(queries)
        fs = self.searcher.field_statistics(field)
        cache = compute_tf_cache(np.float32(fs.average_fieldnorm))
        T = ph_t_bucket(max(len(q.term_bytes) for q in queries))
        S = max(max((len(b["segs"]) for b in data["shard_blobs"]),
                    default=1), 1)

        q_weight = np.zeros(Q + 1, dtype=np.float32)
        for qi, q in enumerate(queries):
            dfs = [
                self.searcher.doc_freq(Term(field, tb)) for tb in q.term_bytes
            ]
            q_weight[qi] = Bm25Weight.for_terms(
                dfs, fs.total_num_docs, fs.average_fieldnorm
            ).weight

        cl_start = np.zeros((D, Q + 1, T, S), dtype=np.int32)
        cl_len = np.zeros((D, Q + 1, T, S), dtype=np.int32)
        cl_pstart = np.zeros((D, Q + 1, T, S), dtype=np.int32)
        cl_shift = np.zeros((Q + 1, T), dtype=np.int32)
        host_queries: set[int] = set()
        cand = []  # (shard, qi, si, gblocks, ub, gbase, pick)
        max_nblk = 1
        max_tf = 1
        M1 = 4
        for qi, q in enumerate(queries):
            mx_off = max(q.offsets)
            for t, off in enumerate(q.offsets):
                cl_shift[qi, t] = mx_off - off
        for s, blob in enumerate(data["shard_blobs"]):
            for si, seg in enumerate(blob["segs"]):
                inv = seg["reader"].inverted_index(field)
                dfp = seg["dfp"]
                for qi, q in enumerate(queries):
                    if qi in host_queries:
                        continue
                    ords = [inv.term_ord(tb) for tb in q.term_bytes]
                    if any(o is None for o in ords):
                        continue  # a phrase term is a MUST
                    starts = [int(dfp.term_block_start[o]) for o in ords]
                    nblks = [int(dfp.term_num_blocks[o]) for o in ords]
                    tops = [
                        int(seg["blk_top_tf"][s0 : s0 + n].max(initial=0))
                        for s0, n in zip(starts, nblks)
                    ]
                    leader = min(range(len(ords)), key=lambda t: nblks[t])
                    if tops[leader] > MAX_P or max(tops) > _PW_LADDER[-1][0]:
                        host_queries.add(qi)
                        continue
                    max_tf = max(max_tf, *tops)
                    for t, o in enumerate(ords):
                        cl_start[s, qi, t, si] = seg["block_off"] + starts[t]
                        cl_len[s, qi, t, si] = nblks[t]
                        cl_pstart[s, qi, t, si] = (
                            seg["pos_off"] + int(dfp.term_pos_start[o])
                        )
                        max_nblk = max(max_nblk, nblks[t])
                    ids = np.arange(
                        starts[leader], starts[leader] + nblks[leader],
                        dtype=np.int64,
                    )
                    ub = (
                        np.float32(q_weight[qi]) * seg["bfac"][ids]
                    ).astype(np.float32)
                    gblocks = ids + seg["block_off"]
                    gbase = (
                        dfp.blk_base[ids].astype(np.int64)
                        + seg["global_base"]
                    )
                    pick = np.zeros(len(ids), dtype=bool)
                    if len(ids) <= M1:
                        pick[:] = True
                    else:
                        pick[np.argpartition(-ub, M1 - 1)[:M1]] = True
                    cand.append((s, qi, si, leader, gblocks, ub, gbase, pick))

        # pw rung from the batch's max in-doc tf
        pw = next(p for p, _ in _PW_LADDER if max_tf <= p)
        doc_off = np.zeros(D, dtype=np.uint32)
        for s in range(D):
            if self.shard_seg_ords[s]:
                doc_off[s] = np.uint32(
                    self.seg_bases[self.shard_seg_ords[s][0]]
                )
        n_iters = max(int(np.ceil(np.log2(max(max_nblk, 2)))) + 1, 4)
        step = make_sharded_phrase_topk(
            self.mesh, k, Q, T, S, n_iters, pw, MAX_P
        )

        def launch(selector):
            per_shard = {s: [] for s in range(D)}
            total = 0
            for entry in cand:
                s, qi, si, leader, gblocks, ub, gbase, pick = entry
                m = selector(entry)
                if m.any():
                    per_shard[s].append((gblocks[m], qi, leader, si))
                    total += int(m.sum())
            W = max(
                (sum(len(x[0]) for x in lst) for lst in per_shard.values()),
                default=1,
            )
            Wp = 1
            while Wp < max(W, 1):
                Wp *= 2
            block_sel = np.zeros((D, Wp), dtype=np.int32)
            lane_q = np.full((D, Wp), Q, dtype=np.int32)
            lane_t = np.zeros((D, Wp), dtype=np.int32)
            lane_seg = np.zeros((D, Wp), dtype=np.int32)
            valid = np.zeros((D, Wp), dtype=bool)
            for s, lst in per_shard.items():
                off = 0
                for gblocks, qi, leader, si in lst:
                    n = len(gblocks)
                    block_sel[s, off : off + n] = gblocks
                    lane_q[s, off : off + n] = qi
                    lane_t[s, off : off + n] = leader
                    lane_seg[s, off : off + n] = si
                    valid[s, off : off + n] = True
                    off += n
            vals, gdocs = step(
                data["doc_store"], data["tf_store"], data["blk_last"],
                data["pos_cum"], data["positions"],
                block_sel, lane_q, lane_t, lane_seg, valid,
                data["norm_ids"], data["alive"], doc_off,
                q_weight, cl_start, cl_len, cl_pstart, cl_shift,
                jnp.asarray(cache),
            )
            return np.asarray(vals), np.asarray(gdocs).astype(np.int64), total

        v1, d1, n1 = launch(lambda e: e[7])
        th = np.full(Q, NEG_INF, dtype=np.float32)
        th_doc = np.full(Q, 1 << 62, dtype=np.int64)
        for qi in range(Q):
            finite = np.isfinite(v1[qi])
            if int(finite.sum()) == k:
                th[qi] = v1[qi][finite][-1]
                th_doc[qi] = d1[qi][finite][-1]

        def survivors(e):
            s, qi, si, leader, gblocks, ub, gbase, pick = e
            rest = ~pick
            if th[qi] == NEG_INF:
                return rest
            later = gbase > th_doc[qi]
            return rest & ((ub > th[qi]) | ((ub == th[qi]) & ~later))

        v2, d2, n2 = launch(survivors)
        self.last_shipped = {
            "candidates": int(sum(len(e[4]) for e in cand)),
            "phase1": n1,
            "phase2": n2,
        }

        out = []
        for qi in range(Q):
            if qi in host_queries:
                hits = self.searcher.search(queries[qi], TopDocs(k))
                out.append([(np.float32(s), a) for s, a in hits])
                continue
            merged: dict[int, np.float32] = {}
            for vals, gdocs in ((v1, d1), (v2, d2)):
                for j in range(k):
                    sc = vals[qi, j]
                    if not np.isfinite(sc):
                        continue
                    g = int(gdocs[qi, j])
                    if g not in merged or merged[g] < sc:
                        merged[g] = np.float32(sc)
            hits = sorted(
                ((sc, g) for g, sc in merged.items()),
                key=lambda x: (-float(x[0]), x[1]),
            )[:k]
            qout = []
            for sc, g in hits:
                seg = int(
                    np.searchsorted(self.seg_bases, g, side="right")
                ) - 1
                qout.append(
                    (np.float32(sc),
                     DocAddress(seg, g - int(self.seg_bases[seg])))
                )
            out.append(qout)
        return out


def default_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("seg",))
