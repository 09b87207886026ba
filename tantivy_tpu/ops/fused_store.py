"""FusedStore — every (segment, field) dense block store concatenated into
ONE device-resident combined row store.

Why: the remoted TPU backend charges a fixed ~26 ms per kernel launch and
~28 ms per result fetch regardless of size, so launch count dominates batch
latency. Fusing all segments and fields into one global block id space lets
a whole batch phase (every query x every segment x every field) ride ONE
kernel launch + ONE fetch (see `pallas_probe.fused_bool_topk`). It also
makes multi-field boolean queries a non-event: a clause's region is just a
slab range, whichever field it lives in.

Layout:
* per-(segment, field) slab of cstore rows (`pallas_probe.build_cstore`
  format: docs | tfs | bitcast(bm25 denominator), NaN = deleted/pad), each
  padded to a multiple of 8 rows (Mosaic DMA tiling);
* host planning tables (blk_base / blk_last_doc / block-max pairs / bfac)
  concatenated with the same padding, so a global block id indexes both the
  device store and the planning tables;
* per-term regions exposed via `region(seg_ord, field, term_ord)` —
  `term_block_start + slab_offset`.

The reference has no analogue — its per-segment scorers walk mmap'd posting
lists (`block_segment_postings.rs`); the fused layout is the TPU-native
re-design of SURVEY §7 ("postings become [n_blocks, 128] tensors").
"""

from __future__ import annotations

import numpy as np

from ..postings.format import TERMINATED
from ..query.bm25 import compute_tf_cache


def build_cstore_np(docs_np, tfs_np, norm_ids_np, alive_np, cache):
    """Host (numpy) build of the [NBp, 384] u32 combined row store:
    docs | tfs | bitcast(tf-cache denominator), NaN marking deleted/pad
    lanes; rows padded to a multiple of 8 (Mosaic DMA tiling). Semantics
    identical to `pallas_probe.build_cstore` (the device variant kept for
    the non-fused probe paths); built once per (segment, field) and
    shipped to HBM as part of ONE fused-store transfer."""
    max_doc = len(norm_ids_np)
    safe = np.minimum(docs_np, np.uint32(max(max_doc - 1, 0)))
    cachev = cache[norm_ids_np[safe].astype(np.int32)].astype(np.float32)
    dead = docs_np == np.uint32(TERMINATED)
    if alive_np is not None:
        dead |= ~alive_np[safe]
    cachev = np.where(dead, np.float32(np.nan), cachev)
    out = np.concatenate(
        [docs_np, tfs_np, cachev.view(np.uint32)], axis=1
    )
    nb = out.shape[0]
    pad = (-nb) % 8
    if pad:
        out = np.concatenate(
            [out, np.full((pad, 384), np.uint32(TERMINATED), np.uint32)]
        )
    return np.ascontiguousarray(out)


def _row_tier(rows: int, floor: int = 128) -> int:
    """Store rows pad up to a {1, 1.5}·pow2 ladder (waste <= 33%) so the
    kernel launch signatures — which include the cstore/postore operand
    shapes — survive commits, merges and corpus growth within a tier. A
    fresh Mosaic compile costs minutes on the remote service; a tier
    crossing is the only event that should pay it."""
    t = max(floor, 128)
    while t < rows:
        if t + t // 2 >= rows:
            return t + t // 2
        t *= 2
    return t


class FusedStore:
    def __init__(self):
        self.slabs: dict[tuple[int, str], dict] = {}
        self._order: list[tuple[int, str]] = []
        self._dirty = False
        # concatenated host tables (padded rows included)
        self.blk_base = np.zeros(0, dtype=np.uint32)
        self.blk_last_doc = np.zeros(0, dtype=np.uint32)
        self.bfac = np.zeros(0, dtype=np.float32)
        self.blk_seg = np.zeros(0, dtype=np.int32)
        self.num_blocks = 0
        self.cstore = None  # device [NB, 384] u32
        self._rmax = None
        self._rkeys = None
        # phrase extension (built on demand): positions / owners interleaved
        # in ONE 2D row-DMA-able store + per-block position offsets
        self.postore = None         # device [NPr, 256] u32: pos | owner doc
        self.blk_pos = None         # host [NB + 1] i64 position offset per block
        self._pos_dirty = False

    # -- slab registration -----------------------------------------------

    def ensure_slab(self, seg_ord: int, field: str, dfp, alive,
                    avg_fieldnorm) -> dict:
        """Register (and lazily build) the slab for a (segment, field).

        `alive` may be a host bool mask or None. The per-slab cstore is
        built in NUMPY (`build_cstore_np`) — the whole fused store ships to
        HBM in ONE transfer at `_rebuild`, with zero per-slab XLA compiles
        (the jnp per-slab build paid a compile per distinct segment shape,
        which dominated index-open time)."""
        key = (seg_ord, field)
        slab = self.slabs.get(key)
        if slab is None:
            cache = compute_tf_cache(np.float32(avg_fieldnorm))
            a = None if alive is None else np.asarray(alive, dtype=bool)
            cstore = build_cstore_np(
                dfp.docs_np, dfp.tfs_np, dfp.norm_ids_np, a, cache
            )
            nb = dfp.num_blocks
            nbp = -(-nb // 8) * 8
            tf = dfp.blk_max_tf.astype(np.float32)
            bfac = (tf / (tf + cache[dfp.blk_max_fnid])).astype(np.float32)
            slab = {
                "seg_ord": seg_ord,
                "field": field,
                "dfp": dfp,
                "cache": cache,
                "cstore": cstore,
                "nb": nb,
                "nbp": nbp,
                "bfac": bfac,
                "offset": -1,  # assigned at rebuild
            }
            self.slabs[key] = slab
            self._order.append(key)
            self._dirty = True
            self._pos_dirty = True
        return slab

    def _rebuild(self) -> None:
        import jax.numpy as jnp

        bases, lasts, bfacs, segs, stores = [], [], [], [], []
        off = 0
        for key in self._order:
            s = self.slabs[key]
            s["offset"] = off
            dfp = s["dfp"]
            nb, nbp = s["nb"], s["nbp"]
            pad = nbp - nb
            bases.append(dfp.blk_base.astype(np.uint32))
            lasts.append(dfp.blk_last_doc.astype(np.uint32))
            bfacs.append(s["bfac"])
            if pad:
                bases.append(np.full(pad, TERMINATED, dtype=np.uint32))
                lasts.append(np.full(pad, TERMINATED, dtype=np.uint32))
                bfacs.append(np.zeros(pad, dtype=np.float32))
            segs.append(np.full(nbp, s["seg_ord"], dtype=np.int32))
            stores.append(s["cstore"])
            off += nbp
        # pad to the row tier (also keeps the widest boolean window DMA —
        # kw8 = 72 rows + alignment — in bounds even on tiny stores)
        if off > 0:
            tier = _row_tier(off)
            pad = tier - off
            if pad:
                bases.append(np.full(pad, TERMINATED, dtype=np.uint32))
                lasts.append(np.full(pad, TERMINATED, dtype=np.uint32))
                bfacs.append(np.zeros(pad, dtype=np.float32))
                segs.append(np.zeros(pad, dtype=np.int32))
                stores.append(
                    np.full((pad, 384), np.uint32(TERMINATED), np.uint32)
                )
            off = tier
        self.num_blocks = off
        self.blk_base = np.concatenate(bases) if bases else np.zeros(0, np.uint32)
        self.blk_last_doc = (
            np.concatenate(lasts) if lasts else np.zeros(0, np.uint32)
        )
        self.bfac = np.concatenate(bfacs) if bfacs else np.zeros(0, np.float32)
        self.blk_seg = np.concatenate(segs) if segs else np.zeros(0, np.int32)
        # ONE host concat + ONE HBM transfer for the whole store
        self.cstore = (
            jnp.asarray(np.concatenate(stores, axis=0)) if stores else None
        )
        from ..parallel.wand import RangeMax

        self._rmax = RangeMax(self.bfac)
        self._rkeys = None
        # merge tails may pack (seg, doc) into one u32 (seg<<28 | doc) when
        # every segment ordinal fits 4 bits and every doc id fits 28
        segs = {s["seg_ord"] for s in self.slabs.values()}
        self.pack_addr_ok = bool(
            all(0 <= s <= 15 for s in segs)
            and all(
                s["dfp"].norm_ids.shape[0] < (1 << 28)
                for s in self.slabs.values()
            )
        )
        self._dirty = False

    def ready(self):
        if self._dirty:
            self._rebuild()
        return self

    @property
    def rmax(self):
        self.ready()
        return self._rmax

    @property
    def region_keys(self):
        """(cblast, cbbase) composite u64 keys: (term-region start << 32) |
        block last/base doc. Regions are contiguous and doc-sorted within,
        so ONE global searchsorted with a (region << 32 | doc) key answers
        a per-region bounds query — the batched planner's replacement for
        per-(query, clause, segment) sub-array searchsorted calls. Padding
        rows carry the max region sentinel (sort after all real keys)."""
        self.ready()
        if self._rkeys is None:
            # padding rows (slab tails + store tier pad) key by their OWN
            # block index: > every earlier region's keys, < every later
            # region's (region starts strictly increase), so the composite
            # array stays globally sorted
            rs = np.arange(self.num_blocks, dtype=np.uint64)
            for key in self._order:
                s = self.slabs[key]
                dfp = s["dfp"]
                tbs = np.asarray(dfp.term_block_start, dtype=np.int64)
                tnb = np.asarray(dfp.term_num_blocks, dtype=np.int64)
                starts = np.repeat(
                    np.uint64(s["offset"]) + tbs.astype(np.uint64), tnb
                )
                rs[s["offset"]:s["offset"] + len(starts)] = starts
            sh = np.uint64(32)
            cblast = (rs << sh) | self.blk_last_doc.astype(np.uint64)
            cbbase = (rs << sh) | self.blk_base.astype(np.uint64)
            assert len(cblast) < 2 or (
                np.all(cblast[1:] >= cblast[:-1])
                and np.all(cbbase[1:] >= cbbase[:-1])
            ), "composite region keys not globally sorted"
            self._rkeys = (cblast, cbbase)
        return self._rkeys

    def region(self, seg_ord: int, field: str, term_ord: int) -> tuple[int, int]:
        """(global block start, n_blocks) for a term of a registered slab."""
        self.ready()
        s = self.slabs[(seg_ord, field)]
        dfp = s["dfp"]
        return (
            s["offset"] + int(dfp.term_block_start[term_ord]),
            int(dfp.term_num_blocks[term_ord]),
        )

    # FieldWand-compatible UB planning over the fused tables --------------

    def clause_blocks_ub(self, start, n, weight, others, self_pos=0,
                         return_detail=False):
        from ..parallel.wand import FieldWand

        return FieldWand.clause_blocks_ub(
            self, start, n, weight, others, self_pos, return_detail
        )

    @property
    def dfp(self):
        # FieldWand.clause_blocks_ub reads self.dfp.blk_base/blk_last_doc
        return self

    # -- phrase position stores -------------------------------------------

    def ensure_positions(self):
        """Build the fused 2D position/owner store + per-block position
        offsets. Positions are re-laid out [ceil(NPOS/128), 256] with row r
        holding positions 128r..128r+127 in columns 0:128 and each
        position's OWNER DOC id in columns 128:256 — interleaving halves the
        phrase kernel's DMA count (one slab fetch serves both membership and
        alignment compares, no per-lane gathers); `blk_pos[b]` is the global
        position offset of block b's first posting (from the device pos_cum,
        fetched once)."""
        self.ready()
        if self.postore is not None and not self._pos_dirty:
            return
        import jax.numpy as jnp

        pos_parts, own_parts, blk_pos_parts = [], [], []
        pos_off = 0
        for key in self._order:
            s = self.slabs[key]
            dfp = s["dfp"]
            positions = dfp._positions_np
            pos_cum = dfp.pos_cum_np()
            npos = int(positions.shape[0])
            # per-block position offset (within slab): pos_cum at block
            # starts
            bp = pos_cum[::128].astype(np.int64)
            nb, nbp = s["nb"], s["nbp"]
            # layout invariant the phrase kernel relies on: a term's flat
            # position region starts exactly at its first block's cumulative
            # tf (PostingsSerializer appends positions in (term, block)
            # order with no gaps — `postings/format.py:135`)
            tbs = dfp.term_block_start
            if len(tbs):
                assert np.array_equal(
                    np.asarray(dfp.term_pos_start, dtype=np.int64), bp[tbs]
                ), "positions layout mismatch: term regions not contiguous"
            ext = np.full(nbp, npos, dtype=np.int64)
            ext[:nb] = bp[:nb]
            blk_pos_parts.append(pos_off + ext)
            # owners: doc id per position (host repeat)
            owners = np.repeat(
                dfp.docs_np.reshape(-1), dfp.real_tf_flat()
            )
            assert len(owners) == npos
            pos_parts.append(positions.astype(np.uint32, copy=False))
            own_parts.append(owners.astype(np.uint32, copy=False))
            s["pos_offset"] = pos_off
            pos_off += npos
        total = pos_off
        rows = max(-(-total // 128), 1)
        # keep at least the widest phrase-kernel slab DMA in bounds even on
        # tiny stores
        from .pallas_phrase import max_slab_rows

        rows = max(rows, max_slab_rows())
        rows_p = _row_tier(-(-rows // 8) * 8)
        padlen = rows_p * 128 - total
        padv = np.full(padlen, np.uint32(0xFFFFFFFF), dtype=np.uint32)
        flat_pos = np.concatenate(pos_parts + [padv]).reshape(rows_p, 128)
        flat_own = np.concatenate(own_parts + [padv]).reshape(rows_p, 128)
        # ONE host concat + ONE HBM transfer for the whole position store
        self.postore = jnp.asarray(
            np.concatenate([flat_pos, flat_own], axis=1)
        )
        self.blk_pos = np.concatenate(blk_pos_parts + [[total]]) if \
            blk_pos_parts else np.zeros(1, dtype=np.int64)
        self.num_pos = total
        self.pos_rows = rows_p
        self._pos_dirty = False
