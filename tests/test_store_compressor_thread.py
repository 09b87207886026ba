"""Dedicated docstore compressor thread (reference `store_compressor.rs:25`,
`IndexSettings.docstore_compress_dedicated_thread`)."""

import numpy as np

import tantivy_tpu as tt
from tantivy_tpu.schema.document import Document
from tantivy_tpu.store import Compressor, StoreReader, StoreWriter


def _fill(writer, n=300):
    for i in range(n):
        writer.store(Document(body=f"doc {i} " + "x" * (i % 97)))


def test_dedicated_thread_output_identical():
    a = StoreWriter(Compressor.ZSTD)
    b = StoreWriter(Compressor.ZSTD, dedicated_thread=True)
    _fill(a)
    _fill(b)
    ra = a.finish()
    rb = b.finish()
    for k in ra:
        assert np.array_equal(ra[k], rb[k]), k


def test_dedicated_thread_roundtrip():
    w = StoreWriter(Compressor.ZSTD, dedicated_thread=True)
    _fill(w, 500)
    reader = StoreReader(w.finish())
    assert reader.num_docs == 500
    assert reader.get(0).get_first("body") == "doc 0 "
    assert reader.get(499).get_first("body").startswith("doc 499")


def test_index_setting_round_trips(tmp_path):
    from tantivy_tpu.index import IndexSettings

    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT | tt.STORED_TEXT)
    settings = IndexSettings(docstore_compress_dedicated_thread=True)
    idx = tt.Index.create_in_dir(tmp_path, b.build(), settings=settings)
    w = idx.writer_for_tests()
    w.add_document(tt.Document(body="hello world"))
    w.commit()
    w.close()
    idx2 = tt.Index.open_in_dir(tmp_path)
    assert idx2.settings.docstore_compress_dedicated_thread is True
    s = idx2.reader().searcher()
    hits = s.search(idx2.parse_query("hello", ["body"]), tt.TopDocs(3))
    assert len(hits) == 1
    assert s.doc(hits[0][1]).get_first("body") == "hello world"
