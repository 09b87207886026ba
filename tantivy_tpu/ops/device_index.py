"""DeviceSegment — the HBM-resident mirror of a segment's scoring data.

Layout per indexed field:
* packed doc/tf matrices, one per bit width (uint32 [n_blocks_w, 128*w/32])
* dense decoded `docs`/`tfs` [total_blocks, 128] (optional "dense" mode —
  trades HBM for zero per-query decode; "packed" mode decodes on the fly)
* fieldnorm ids uint8 [max_doc]
* block/term tables stay host-side (numpy) — query *planning* is host work,
  only scoring data lives in HBM. The alive bitset mirrors as a bool mask.

This is the §7 SURVEY.md re-layout: postings become `[n_blocks, 128]` tensors,
skip data becomes dense arrays driving masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..common import arrayio
from ..postings.format import TERMINATED
from .decode import decode_doc_rows, decode_tf_rows

_WIDTHS = (0, 1, 2, 4, 8, 16, 32)


class DeviceFieldPostings:
    def __init__(self, arrays: dict[str, np.ndarray], norm_ids: np.ndarray,
                 mode: str = "dense"):
        self.mode = mode
        # host-side planning tables
        self.blk_last_doc = arrays["blk_last_doc"]
        self.blk_base = arrays["blk_base"]
        self.blk_len = arrays["blk_len"]
        self.blk_doc_bits = arrays["blk_doc_bits"]
        self.blk_doc_row = arrays["blk_doc_row"]
        self.blk_tf_bits = arrays["blk_tf_bits"]
        self.blk_tf_row = arrays["blk_tf_row"]
        self.blk_max_fnid = arrays["blk_max_fnid"]
        self.blk_max_tf = arrays["blk_max_tf"]
        self.term_block_start = arrays["term_block_start"]
        self.term_num_blocks = arrays["term_num_blocks"]
        self.term_doc_freq = arrays["term_doc_freq"]
        self.has_freqs = bool(arrays["has_freqs"][0])
        self.num_blocks = len(self.blk_len)
        # phrase support (lazy device mirrors; see ensure_positions)
        self.term_pos_start = arrays["term_pos_start"]
        self._positions_np = arrays["positions"]
        self.positions = None
        self.pos_cum = None

        self.norm_ids_np = np.ascontiguousarray(norm_ids, dtype=np.uint8)
        self.norm_ids = jnp.asarray(self.norm_ids_np)

        self._docs_dev = None
        self._tfs_dev = None
        if mode == "dense":
            self.docs_np, self.tfs_np = self._decode_all(arrays)
            self.doc_mats = None
            self.tf_mats = None
        else:
            self.doc_mats = {
                w: jnp.asarray(arrays[f"doc_w{w}"]) for w in _WIDTHS
                if arrays[f"doc_w{w}"].size
            }
            self.tf_mats = {
                w: jnp.asarray(arrays[f"tf_w{w}"]) for w in _WIDTHS
                if self.has_freqs and arrays[f"tf_w{w}"].size
            }
            self.docs_np = None
            self.tfs_np = None

    @property
    def docs(self):
        """Dense [NB, 128] doc ids as a DEVICE array (lazy one-shot upload
        of the host-decoded store; None in packed mode). The fused store
        builds from `docs_np` directly — pure-fused execution never pays
        this HBM copy."""
        if self.docs_np is None:
            return None
        if self._docs_dev is None:
            self._docs_dev = jnp.asarray(self.docs_np)
        return self._docs_dev

    @property
    def tfs(self):
        if self.tfs_np is None:
            return None
        if self._tfs_dev is None:
            self._tfs_dev = jnp.asarray(self.tfs_np)
        return self._tfs_dev

    def _decode_all(self, arrays: dict[str, np.ndarray]):
        """Decode every block once at load (dense mode) on the HOST with
        vectorized numpy unpack, shipped to HBM in ONE transfer per array.

        The jnp decode it replaces paid an XLA compile for every distinct
        (row-count, width) shape — hundreds of multi-second compiles across
        segments, which dominated index-open/prewarm time. Same strict-delta
        semantics as `ops/decode.decode_doc_rows` (uint32 wraparound cumsum,
        TERMINATED-masked pad lanes, tf stored minus-one)."""
        from ..common import bitpack

        n = self.num_blocks
        docs = np.full((n, 128), TERMINATED, dtype=np.uint32)
        tfs = np.ones((n, 128), dtype=np.uint32)
        lane = np.arange(128, dtype=np.uint32)[None, :]
        for w in np.unique(self.blk_doc_bits):
            sel = np.nonzero(self.blk_doc_bits == w)[0]
            if w == 0:
                deltas = np.zeros((len(sel), 128), dtype=np.uint32)
            else:
                deltas = bitpack.unpack_rows(
                    arrays[f"doc_w{int(w)}"][self.blk_doc_row[sel]],
                    int(w), 128,
                )
            d = (
                self.blk_base[sel].astype(np.uint32)[:, None]
                + np.cumsum(deltas, axis=1, dtype=np.uint32)
                + lane
            )
            keep = lane < self.blk_len[sel].astype(np.uint32)[:, None]
            docs[sel] = np.where(keep, d, np.uint32(TERMINATED))
        if self.has_freqs:
            for w in np.unique(self.blk_tf_bits):
                if w == 0:
                    continue  # width-0 tf rows are all ones (already set)
                sel = np.nonzero(self.blk_tf_bits == w)[0]
                tfs[sel] = bitpack.unpack_rows(
                    arrays[f"tf_w{int(w)}"][self.blk_tf_row[sel]],
                    int(w), 128,
                ) + np.uint32(1)
        return docs, tfs

    def ensure_blk_top_tf(self) -> np.ndarray:
        """True per-block MAX tf (host numpy [NB]). NOTE: `blk_max_tf` is the
        tf of the block-max *score* pair (`skip.rs:175-184`) — an upper
        bound on scores, NOT on tf (a high-tf doc in a long field can lose
        the score argmax). Anything bounding in-doc tf (phrase position
        windows, MAX_P host fallbacks) must use this instead."""
        if getattr(self, "_blk_top_tf", None) is None:
            assert self.mode == "dense"
            real = np.where(
                self.docs_np != np.uint32(TERMINATED), self.tfs_np,
                np.uint32(0),
            )
            self._blk_top_tf = real.max(axis=1)
        return self._blk_top_tf

    def real_tf_flat(self) -> np.ndarray:
        """Host [NB*128] uint32: tf per store lane, 0 on pad lanes."""
        assert self.mode == "dense"
        return np.where(
            self.docs_np != np.uint32(TERMINATED), self.tfs_np, np.uint32(0)
        ).reshape(-1)

    def pos_cum_np(self) -> np.ndarray:
        """Host exclusive cumsum of real tfs over the flattened block store
        (pad lanes contribute 0) — the position-slice base table."""
        if getattr(self, "_pos_cum_np", None) is None:
            flat = self.real_tf_flat()
            incl = np.cumsum(flat, dtype=np.uint32)
            self._pos_cum_np = incl - flat
        return self._pos_cum_np

    def ensure_blk_last(self):
        """Device mirror of the per-block last-doc skip column (probe
        kernels binary-search it to locate a doc's candidate block)."""
        if getattr(self, "_blk_last_dev", None) is None:
            self._blk_last_dev = jnp.asarray(self.blk_last_doc, dtype=jnp.uint32)
        return self._blk_last_dev

    def ensure_positions(self):
        """Upload the flat positions array and build the exclusive cumsum of
        real tfs over the flattened block store (pad lanes contribute 0) —
        the probe kernels turn a hit index into a position-slice base with
        `term_pos_start[t] + pos_cum[hit] - pos_cum[region_start]`."""
        if self.positions is None:
            assert self.mode == "dense", "phrase device path needs dense mode"
            assert len(self._positions_np) < 2**31
            self.positions = jnp.asarray(self._positions_np, dtype=jnp.uint32)
            self.pos_cum = jnp.asarray(self.pos_cum_np())
        return self.positions, self.pos_cum

    # -- query-time block fetch ----------------------------------------------

    def gather_blocks(self, block_ids: np.ndarray):
        """Returns (docs [W,128] uint32 TERMINATED-padded, tfs [W,128]) as
        device arrays for the given block ids (host numpy)."""
        if self.mode == "dense":
            ids = jnp.asarray(block_ids, dtype=jnp.int32)
            return jnp.take(self.docs, ids, axis=0), jnp.take(self.tfs, ids, axis=0)
        return self._gather_packed(block_ids)

    def _gather_packed(self, block_ids: np.ndarray):
        W = len(block_ids)
        docs = jnp.full((W, 128), TERMINATED, dtype=jnp.uint32)
        tfs = jnp.ones((W, 128), dtype=jnp.uint32)
        widths = self.blk_doc_bits[block_ids]
        for w in np.unique(widths):
            slots = np.nonzero(widths == w)[0]
            ids = block_ids[slots]
            if w == 0:
                words = jnp.zeros((len(slots), 0), dtype=jnp.uint32)
            else:
                words = jnp.take(
                    self.doc_mats[int(w)],
                    jnp.asarray(self.blk_doc_row[ids]),
                    axis=0,
                )
            dec = decode_doc_rows(
                words,
                jnp.asarray(self.blk_base[ids]),
                jnp.asarray(self.blk_len[ids]),
                int(w),
            )
            docs = docs.at[jnp.asarray(slots)].set(dec)
        if self.has_freqs:
            twidths = self.blk_tf_bits[block_ids]
            for w in np.unique(twidths):
                slots = np.nonzero(twidths == w)[0]
                ids = block_ids[slots]
                if w == 0:
                    tdec = jnp.ones((len(slots), 128), dtype=jnp.uint32)
                else:
                    twords = jnp.take(
                        self.tf_mats[int(w)],
                        jnp.asarray(self.blk_tf_row[ids]),
                        axis=0,
                    )
                    tdec = decode_tf_rows(twords, int(w))
                tfs = tfs.at[jnp.asarray(slots)].set(tdec)
        return docs, tfs


class DeviceSegment:
    def __init__(self, segment_reader, mode: str = "dense"):
        self.reader = segment_reader
        self.mode = mode
        self.max_doc = segment_reader.max_doc
        self._fields: dict[str, DeviceFieldPostings] = {}
        alive = segment_reader.alive_bitset()
        self.alive_np = (
            np.ascontiguousarray(alive, dtype=bool)
            if alive is not None else None
        )
        self.alive = jnp.asarray(alive) if alive is not None else None

    def field_postings(self, field_name: str) -> DeviceFieldPostings:
        dfp = self._fields.get(field_name)
        if dfp is None:
            entry = self.reader.schema.get_field(field_name)
            arrays = arrayio.field_arrays(self.reader._idx, entry.field_id)
            norms = self.reader.fieldnorms(field_name)
            dfp = DeviceFieldPostings(arrays, norms, self.mode)
            self._fields[field_name] = dfp
        return dfp
