"""Native C++ indexing core: bit-parity with the pure-Python path."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.common import arrayio
from tantivy_tpu.indexer.segment_writer import SegmentWriter
from tantivy_tpu.native import available


pytestmark = pytest.mark.skipif(not available(), reason="native core unavailable")


def build_segment(docs, use_native):
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    sw = SegmentWriter(schema, use_native=use_native)
    for d in docs:
        sw.add_document(tt.Document(body=d))
    return sw.serialize()


DOCS = [
    "The quick brown Fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "x" * 50 + " short tokens only " + "y" * 39,
    "repeat repeat repeat repeat",
    "MIXED case TOKENS and 123 numbers 456",
    "café déjà vu non-ascii forces the python path",  # non-ascii value
    "ascii again after unicode",
]


class TestNativeParity:
    def test_identical_serialization(self):
        nat = build_segment(DOCS, use_native=True)
        py = build_segment(DOCS, use_native=False)
        for comp in ("idx", "term", "fieldnorm"):
            assert set(nat[comp]) == set(py[comp]), comp
            for key in nat[comp]:
                np.testing.assert_array_equal(
                    nat[comp][key], py[comp][key], err_msg=f"{comp}/{key}"
                )

    def test_mixed_ascii_unicode_same_doc(self):
        docs = [tt.Document(body=["hello world", "héllo wörld", "hello again"])]
        b = tt.Schema.builder()
        b.add_text_field("body", tt.TEXT)
        schema = b.build()
        for use_native in (True, False):
            sw = SegmentWriter(schema, use_native=use_native)
            for d in docs:
                sw.add_document(d)
            out = sw.serialize()
            if use_native:
                nat = out
            else:
                py = out
        for key in nat["idx"]:
            np.testing.assert_array_equal(nat["idx"][key], py["idx"][key], err_msg=key)
        for key in nat["term"]:
            np.testing.assert_array_equal(nat["term"][key], py["term"][key], err_msg=key)

    def test_search_results_identical(self):
        def make(use_native):
            b = tt.Schema.builder()
            b.add_text_field("body", tt.TEXT)
            index = tt.Index.create_in_ram(b.build())
            w = index.writer_for_tests()
            # writer_for_tests uses default SegmentWriter (native);
            # emulate by monkey flag via env is overkill — build directly
            return index

        index = make(True)
        w = index.writer_for_tests()
        for d in DOCS:
            w.add_document(tt.Document(body=d))
        w.commit()
        s = index.reader().searcher()
        hits = s.search(index.parse_query("quick fox"), tt.TopDocs(5))
        assert hits
        assert s.search(index.parse_query('"quick brown fox"'), tt.Count()) == 1

    def test_throughput_sanity(self):
        # native should comfortably beat python on a medium corpus
        import time

        rng = np.random.default_rng(0)
        words = [f"word{i}" for i in range(2000)]
        docs = [" ".join(rng.choice(words, 80)) for _ in range(1500)]
        t0 = time.time()
        build_segment(docs, use_native=True)
        t_native = time.time() - t0
        t0 = time.time()
        build_segment(docs, use_native=False)
        t_python = time.time() - t0
        assert t_native < t_python, (t_native, t_python)
