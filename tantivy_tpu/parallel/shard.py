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
    scores = weights[:, None, None] * (tf / (tf + norm))
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


class ShardedSearcher:
    """Device-mesh search over an index: shards segments across the mesh and
    runs batched term top-k with on-device fruit merging."""

    def __init__(self, searcher, mesh: Mesh):
        self.searcher = searcher
        self.mesh = mesh
        self.n_shards = mesh.shape["seg"]
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
            block_off = 0
            doc_off = 0  # shard-local doc offset (norms/alive indexing)
            seg_infos = []
            for seg_idx, r in enumerate(readers):
                dseg = DeviceSegment(r, mode="dense")
                dfp = dseg.field_postings(field)
                docs_list.append(np.asarray(dfp.docs))
                tfs_list.append(np.asarray(dfp.tfs))
                norm_list.append(np.asarray(dfp.norm_ids))
                a = r.alive_bitset()
                alive_list.append(
                    a if a is not None else np.ones(r.max_doc, dtype=bool)
                )
                seg_infos.append(
                    {
                        "reader": r,
                        "block_off": block_off,
                        "doc_off": doc_off,
                        "global_base": int(
                            self.seg_bases[self.shard_seg_ords[shard_i][seg_idx]]
                        ),
                        "dfp": dfp,
                    }
                )
                block_off += dfp.num_blocks
                doc_off += r.max_doc
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
                    "norms": norms,
                    "alive": alive,
                    "segs": seg_infos,
                }
            )
        # pad shards to uniform shapes
        nb = max(max((b["docs"].shape[0] for b in shard_blobs), default=1), 1)
        md = max(max((len(b["norms"]) for b in shard_blobs), default=1), 1)
        doc_store = np.full((D, nb, 128), TERMINATED, dtype=np.uint32)
        tf_store = np.ones((D, nb, 128), dtype=np.uint32)
        norm_ids = np.zeros((D, md), dtype=np.uint8)
        alive = np.zeros((D, md), dtype=bool)
        for s, blob in enumerate(shard_blobs):
            n = blob["docs"].shape[0]
            doc_store[s, :n] = blob["docs"]
            tf_store[s, :n] = blob["tfs"]
            norm_ids[s, : len(blob["norms"])] = blob["norms"]
            alive[s, : len(blob["alive"])] = blob["alive"]
        data = {
            "doc_store": doc_store,
            "tf_store": tf_store,
            "norm_ids": norm_ids,
            "alive": alive,
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


def default_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("seg",))
