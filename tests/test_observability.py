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


def test_reload_policy_on_commit_with_delay():
    """ON_COMMIT_WITH_DELAY debounces a burst of commits into one reload
    (reference OnCommitWithDelay, `src/reader/mod.rs:21`)."""
    import time

    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    w.add_document(tt.Document(body="alpha"))
    w.commit()

    from tantivy_tpu.index import ReloadPolicy

    reloads = []
    reader = index.reader(ReloadPolicy.ON_COMMIT_WITH_DELAY,
                          reload_delay_s=0.15)
    orig = reader.reload

    def counting():
        reloads.append(time.time())
        orig()

    reader.reload = counting
    for i in range(4):  # burst: 4 commits inside one window
        w.add_document(tt.Document(body=f"bravo {i}"))
        w.commit()
    assert reloads == []  # nothing reloaded synchronously
    deadline = time.time() + 3.0
    while time.time() < deadline:
        s = reader.searcher()
        from tantivy_tpu.collector import Count

        if s.search(index.parse_query("bravo", ["body"]), Count()) == 4:
            break
        time.sleep(0.02)
    assert len(reloads) == 1  # the burst coalesced


def test_reload_reuses_unchanged_segment_readers():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    from tantivy_tpu.indexer.merge_policy import NoMergePolicy

    w.set_merge_policy(NoMergePolicy())
    w.add_document(tt.Document(body="alpha"))
    w.commit()
    from tantivy_tpu.index import ReloadPolicy

    reader = index.reader(ReloadPolicy.MANUAL)
    first = reader.searcher().segment_readers()
    w.add_document(tt.Document(body="bravo"))
    w.commit()
    reader.reload()
    second = reader.searcher().segment_readers()
    assert len(second) == 2
    assert any(r is first[0] for r in second)  # unchanged segment reused


def test_device_search_warmer_stashes_executor():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    w.add_document(tt.Document(body="alpha bravo"))
    w.commit()
    from tantivy_tpu.index import ReloadPolicy
    from tantivy_tpu.parallel import BatchExecutor, DeviceSearchWarmer

    warmer = DeviceSearchWarmer(["body"])
    reader = index.reader(ReloadPolicy.MANUAL, warmers=[warmer])
    s = reader.searcher()
    ex = BatchExecutor.for_searcher(s)
    assert ex is s._warm_executor
    assert (0, "body") in ex._fused().slabs  # slab pre-built by the warmer
    q = tt.TermQuery(tt.Term.from_field_text("body", "alpha"))
    hits = ex.search_batch([q], 10)
    assert len(hits[0]) == 1
