"""SegmentWriter — builds one immutable segment from a stream of documents.

Counterpart of reference `src/indexer/segment_writer.rs:66` + the `stacker`
term-hash (we use a Python dict of term bytes -> per-term growing arrays; the
planned C++ arena hashmap drops in behind the same `serialize()` contract).

Output is a dict of component-name -> bytes (see `index/segment.py` for the
file naming), with postings laid out in the TPU block format
(`postings/format.py`).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..fastfield import ColumnarWriter
from ..fieldnorm import fieldnorm_to_id
from ..postings.format import PostingsSerializer
from ..schema import FieldType, Schema
from ..schema.document import Document
from ..schema.term import Term, f64_to_u64, i64_to_u64, u64_to_bytes
from ..store import Compressor, StoreWriter
from ..termdict import TermDictionary
from ..tokenizer import TokenizerManager

#: JSON path separator / end-of-path markers (reference
#: `common/src/json_path_writer.rs`: \x01-separated path, \x00 end).
JSON_PATH_SEP = b"\x01"
JSON_END_OF_PATH = b"\x00"


class _TermPostings:
    """Per-term growing posting list (reference `Recorder`, `recorder.rs:62`)."""

    __slots__ = ("docs", "tfs", "positions")

    def __init__(self):
        self.docs: list[int] = []
        self.tfs: list[int] = []
        self.positions: list[int] = []

    def record(self, doc: int, positions: list[int] | None) -> None:
        if self.docs and self.docs[-1] == doc:
            self.tfs[-1] += 1
        else:
            self.docs.append(doc)
            self.tfs.append(1)
        if positions is not None:
            self.positions.extend(positions)


def encode_json_terms(path_prefix: bytes, value, out: list[tuple[bytes, str]]):
    """Flatten a JSON value into (term_suffix_bytes, token_text|None) pairs.

    Numeric/bool leaves encode inline; text leaves are returned for
    tokenization by the caller. Type bytes: s=str, i=i64, f=f64, o=bool.
    """
    if isinstance(value, dict):
        for k, v in value.items():
            sub = path_prefix + (JSON_PATH_SEP if path_prefix else b"") + k.encode("utf-8")
            encode_json_terms(sub, v, out)
    elif isinstance(value, list):
        for v in value:
            encode_json_terms(path_prefix, v, out)
    elif isinstance(value, bool):
        out.append((path_prefix + JSON_END_OF_PATH + b"o" + u64_to_bytes(int(value)), None))
    elif isinstance(value, int):
        out.append(
            (path_prefix + JSON_END_OF_PATH + b"i" + u64_to_bytes(i64_to_u64(value)), None)
        )
    elif isinstance(value, float):
        out.append(
            (path_prefix + JSON_END_OF_PATH + b"f" + u64_to_bytes(f64_to_u64(value)), None)
        )
    elif isinstance(value, str):
        out.append((path_prefix + JSON_END_OF_PATH + b"s", value))
    elif value is None:
        pass
    else:
        raise TypeError(f"unsupported json value: {type(value)}")


class SegmentWriter:
    def __init__(self, schema: Schema, tokenizers: TokenizerManager | None = None,
                 compressor: str = Compressor.ZSTD):
        self.schema = schema
        self.tokenizers = tokenizers or TokenizerManager.default()
        # field_id -> {term_bytes: _TermPostings}
        self._postings: dict[int, dict[bytes, _TermPostings]] = defaultdict(dict)
        # field_id -> {doc: num_tokens}
        self._fieldnorms: dict[int, dict[int, int]] = defaultdict(dict)
        # field_id -> total tokens subscribed (reference
        # `postings_writer.rs:215` counts one per subscribe)
        self._token_counts: dict[int, int] = defaultdict(int)
        self._columnar = ColumnarWriter()
        self._store = StoreWriter(compressor)
        self.max_doc = 0
        self._mem_hint = 0

    # -- ingestion -----------------------------------------------------------

    def add_document(self, doc: Document) -> int:
        doc_id = self.max_doc
        self.max_doc += 1
        for field_name, value in doc.field_values():
            entry = self.schema.get_field(field_name)
            ftype = entry.field_type
            if ftype == FieldType.TEXT:
                self._index_text(entry, doc_id, str(value))
            elif ftype in (FieldType.U64, FieldType.I64, FieldType.F64,
                           FieldType.BOOL, FieldType.DATE):
                self._index_numeric(entry, doc_id, value)
            elif ftype == FieldType.BYTES:
                if entry.is_indexed():
                    self._subscribe(entry.field_id, bytes(value), doc_id, None)
                if entry.is_fast():
                    self._columnar.record(doc_id, entry.name, bytes(value), "bytes")
            elif ftype == FieldType.FACET:
                self._index_facet(entry, doc_id, str(value))
            elif ftype == FieldType.JSON:
                self._index_json(entry, doc_id, value)
            elif ftype == FieldType.IP_ADDR:
                self._index_ip(entry, doc_id, value)
            else:
                raise TypeError(f"unhandled field type {ftype}")
        # every doc gets a (possibly empty) store row so doc ids stay aligned
        self._store.store(self._stored_subdoc(doc))
        self._mem_hint += 200 + sum(len(str(v)) for _, v in doc.field_values())
        return doc_id

    def _stored_subdoc(self, doc: Document) -> Document:
        sub = Document()
        for f, v in doc.field_values():
            if self.schema.get_field(f).is_stored():
                sub.add(f, v)
        return sub

    def _subscribe(self, field_id: int, term_bytes: bytes, doc_id: int,
                   positions: list[int] | None) -> None:
        self._token_counts[field_id] += 1
        postings = self._postings[field_id]
        rec = postings.get(term_bytes)
        if rec is None:
            rec = _TermPostings()
            postings[term_bytes] = rec
        rec.record(doc_id, positions)

    def _index_text(self, entry, doc_id: int, text: str) -> None:
        if entry.is_indexed():
            analyzer = self.tokenizers.get(entry.tokenizer_name())
            if analyzer is None:
                raise KeyError(f"tokenizer not registered: {entry.tokenizer_name()}")
            record = entry.index_record_option()
            num_tokens = 0
            # accumulate per-term in-doc positions, then subscribe once
            local: dict[bytes, list[int]] = {}
            prev_num_tokens = self._fieldnorms[entry.field_id].get(doc_id, 0)
            for tok in analyzer.token_stream(text):
                term_bytes = tok.text.encode("utf-8")
                local.setdefault(term_bytes, []).append(prev_num_tokens + tok.position)
                num_tokens += 1
            for term_bytes, positions in local.items():
                for p in positions:
                    self._subscribe(
                        entry.field_id, term_bytes, doc_id,
                        None,
                    )
                if record.has_positions():
                    self._postings[entry.field_id][term_bytes].positions.extend(positions)
            if entry.has_fieldnorms():
                self._fieldnorms[entry.field_id][doc_id] = prev_num_tokens + num_tokens
        if entry.is_fast():
            self._columnar.record(doc_id, entry.name, text, "str")

    def _index_numeric(self, entry, doc_id: int, value) -> None:
        type_name = entry.field_type.value
        if entry.is_indexed():
            if entry.field_type == FieldType.U64:
                t = Term.from_field_u64(entry.name, int(value))
            elif entry.field_type == FieldType.I64:
                t = Term.from_field_i64(entry.name, int(value))
            elif entry.field_type == FieldType.F64:
                t = Term.from_field_f64(entry.name, float(value))
            elif entry.field_type == FieldType.BOOL:
                t = Term.from_field_bool(entry.name, bool(value))
            else:  # DATE
                t = Term.from_field_date(entry.name, int(value))
            self._subscribe(entry.field_id, t.value_bytes, doc_id, None)
        if entry.is_fast():
            self._columnar.record(doc_id, entry.name, value, type_name)

    def _index_facet(self, entry, doc_id: int, path: str) -> None:
        if entry.is_indexed():
            analyzer = self.tokenizers.get("facet")
            for tok in analyzer.token_stream(path):
                self._subscribe(entry.field_id, tok.text.encode("utf-8"), doc_id, None)
        if entry.is_fast():
            self._columnar.record(doc_id, entry.name, path, "str")

    def _index_json(self, entry, doc_id: int, value) -> None:
        if not isinstance(value, dict):
            raise TypeError("json field expects a dict")
        if not entry.is_indexed():
            return
        leaves: list[tuple[bytes, str | None]] = []
        encode_json_terms(b"", value, leaves)
        analyzer = self.tokenizers.get(entry.tokenizer_name())
        has_positions = entry.index_record_option().has_positions()
        pos_base = self._fieldnorms[entry.field_id].get(doc_id, 0)
        pos = pos_base
        postings = self._postings[entry.field_id]
        for term_prefix, text in leaves:
            if text is None:
                self._subscribe(entry.field_id, term_prefix, doc_id, None)
                if has_positions:
                    postings[term_prefix].positions.append(pos)
                pos += 1
            else:
                for tok in analyzer.token_stream(text):
                    tb = term_prefix + tok.text.encode("utf-8")
                    self._subscribe(entry.field_id, tb, doc_id, None)
                    if has_positions:
                        postings[tb].positions.append(pos)
                    pos += 1
        if entry.has_fieldnorms():
            self._fieldnorms[entry.field_id][doc_id] = pos

    def _index_ip(self, entry, doc_id: int, value) -> None:
        import ipaddress

        ip = ipaddress.ip_address(value)
        as_int = int(ipaddress.IPv6Address(f"::ffff:{ip}") if ip.version == 4 else ip)
        raw = as_int.to_bytes(16, "big")
        if entry.is_indexed():
            self._subscribe(entry.field_id, raw, doc_id, None)
        if entry.is_fast():
            self._columnar.record(doc_id, entry.name, raw, "bytes")

    def mem_usage(self) -> int:
        return self._mem_hint

    # -- serialization -------------------------------------------------------

    def serialize(self) -> dict[str, dict[str, np.ndarray]]:
        """Returns component -> arrays: {"idx", "term", "fieldnorm", "fast",
        "store"}."""
        max_doc = self.max_doc
        fieldnorm_arrays: dict[str, np.ndarray] = {}
        norm_ids_by_field: dict[int, np.ndarray] = {}
        total_tokens: dict[int, int] = dict(self._token_counts)
        for field_id, per_doc in self._fieldnorms.items():
            ids = np.zeros(max_doc, dtype=np.uint8)
            for d, n in per_doc.items():
                ids[d] = fieldnorm_to_id(n)
            fieldnorm_arrays[str(field_id)] = ids
            norm_ids_by_field[field_id] = ids

        idx_arrays: dict[str, np.ndarray] = {}
        term_arrays: dict[str, np.ndarray] = {}
        for field_id, postings in self._postings.items():
            entry = self.schema.get_field_entry(field_id)
            has_freqs = entry.index_record_option().has_freq()
            has_positions = entry.index_record_option().has_positions()
            norm_ids = norm_ids_by_field.get(field_id)
            tot = total_tokens.get(field_id, 0)
            avg = (tot / max_doc) if max_doc else 0.0
            ser = PostingsSerializer(
                avg_fieldnorm=avg,
                fieldnorm_ids=norm_ids,
                has_freqs=has_freqs,
            )
            sorted_terms = sorted(postings)
            for term_bytes in sorted_terms:
                rec = postings[term_bytes]
                docs = np.asarray(rec.docs, dtype=np.uint32)
                tfs = np.asarray(rec.tfs, dtype=np.uint32)
                pos = (
                    np.asarray(rec.positions, dtype=np.uint32)
                    if has_positions
                    else None
                )
                ser.serialize_term(docs, tfs, pos)
            arrays = ser.finish()
            arrays["total_num_tokens"] = np.asarray([tot], dtype=np.int64)
            for k, v in arrays.items():
                idx_arrays[f"{field_id}/{k}"] = v
            td = TermDictionary.from_sorted_terms(sorted_terms)
            for k, v in td.to_arrays().items():
                term_arrays[f"{field_id}/{k}"] = v

        return {
            "idx": idx_arrays,
            "term": term_arrays,
            "fieldnorm": fieldnorm_arrays,
            "fast": self._columnar.serialize(max_doc),
            "store": self._store.finish(),
        }
