"""Observability: space_usage, docstore cache stats, tracer spans
(reference `space_usage/mod.rs`, `store/reader.rs:123`, and the repo's
chrome-trace tracer — SURVEY §5 aux subsystems)."""

import json
import os

import tantivy_tpu as tt


def _small_index():
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT | tt.STORED_TEXT)
    b.add_u64_field("u", tt.FAST)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    for i in range(64):
        w.add_document(tt.Document(t=f"doc number {i} alpha beta", u=i))
    w.commit()
    for i in range(32):
        w.add_document(tt.Document(t=f"second segment {i} gamma", u=i))
    w.commit()
    return index


def test_space_usage_structure():
    index = _small_index()
    s = index.reader().searcher()
    su = s.space_usage()
    assert len(su["segments"]) == 2
    total = su["total"]
    # every component accounted, bytes positive where data exists
    for comp in ("postings", "termdict", "store", "fastfields",
                 "fieldnorms"):
        assert comp in total and total[comp] > 0, (comp, total)
    assert sum(total.values()) > 0
    assert sum(total.values()) == sum(
        sum(seg.values()) for seg in su["segments"]
    )


def test_doc_store_cache_stats_move():
    index = _small_index()
    s = index.reader().searcher()
    before = s.doc_store_cache_stats()
    hits = s.search(tt.TermQuery(tt.Term.from_field_text("t", "alpha")),
                    tt.TopDocs(5))
    for _, addr in hits:
        s.doc(addr)
    for _, addr in hits:  # second pass hits the LRU
        s.doc(addr)
    after = s.doc_store_cache_stats()
    assert after["cache_misses"] >= before["cache_misses"]
    assert after["cache_hits"] > before["cache_hits"]


def test_tracer_spans_and_chrome_trace(tmp_path):
    from tantivy_tpu.utils.trace import debug_time, tracer

    tracer.enable()
    tracer.clear()
    with debug_time("unit.test_span", n=3):
        pass
    with debug_time("unit.test_span"):
        pass
    tracer.disable()
    totals = tracer.span_totals()
    assert "unit.test_span" in totals
    events = tracer.events
    assert sum(1 for e in events if e["name"] == "unit.test_span") == 2
    path = os.path.join(tmp_path, "trace.json")
    tracer.dump_chrome_trace(path)
    data = json.load(open(path))
    evs = data["traceEvents"] if isinstance(data, dict) else data
    assert any(e.get("name") == "unit.test_span" for e in evs)
