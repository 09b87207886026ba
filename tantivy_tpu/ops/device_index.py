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

        self.norm_ids = jnp.asarray(norm_ids, dtype=jnp.uint8)

        if mode == "dense":
            self.docs, self.tfs = self._decode_all(arrays)
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
            self.docs = None
            self.tfs = None

    def _decode_all(self, arrays: dict[str, np.ndarray]):
        """Decode every block once at load (dense mode) using the device
        unpack kernels, scattered back into block order."""
        n = self.num_blocks
        docs = jnp.full((n, 128), TERMINATED, dtype=jnp.uint32)
        tfs = jnp.ones((n, 128), dtype=jnp.uint32)
        for w in _WIDTHS:
            mat = arrays[f"doc_w{w}"]
            sel = np.nonzero(self.blk_doc_bits == w)[0]
            if len(sel):
                rows = self.blk_doc_row[sel]
                if w == 0:
                    words = jnp.zeros((len(sel), 0), dtype=jnp.uint32)
                else:
                    words = jnp.asarray(mat[rows])
                decoded = decode_doc_rows(
                    words,
                    jnp.asarray(self.blk_base[sel]),
                    jnp.asarray(self.blk_len[sel]),
                    int(w),
                )
                docs = docs.at[jnp.asarray(sel)].set(decoded)
            if self.has_freqs:
                tmat = arrays[f"tf_w{w}"]
                tsel = np.nonzero(self.blk_tf_bits == w)[0]
                if len(tsel):
                    trows = self.blk_tf_row[tsel]
                    if w == 0:
                        twords = jnp.zeros((len(tsel), 0), dtype=jnp.uint32)
                    else:
                        twords = jnp.asarray(tmat[trows])
                    tdec = decode_tf_rows(twords, int(w))
                    tfs = tfs.at[jnp.asarray(tsel)].set(tdec)
        return docs, tfs

    def ensure_blk_top_tf(self) -> np.ndarray:
        """True per-block MAX tf (host numpy [NB]). NOTE: `blk_max_tf` is the
        tf of the block-max *score* pair (`skip.rs:175-184`) — an upper
        bound on scores, NOT on tf (a high-tf doc in a long field can lose
        the score argmax). Anything bounding in-doc tf (phrase position
        windows, MAX_P host fallbacks) must use this instead."""
        if getattr(self, "_blk_top_tf", None) is None:
            assert self.mode == "dense"
            real = jnp.where(
                self.docs != jnp.uint32(TERMINATED), self.tfs, jnp.uint32(0)
            )
            self._blk_top_tf = np.asarray(jnp.max(real, axis=1))
        return self._blk_top_tf

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
            real = jnp.where(
                self.docs != jnp.uint32(TERMINATED), self.tfs, jnp.uint32(0)
            ).reshape(-1)
            incl = jnp.cumsum(real, dtype=jnp.uint32)
            self.pos_cum = incl - real
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
