"""Background merge threads (reference `segment_updater.rs:490`): merges
scheduled at commit run off-thread; wait_merging_threads joins them; stale
merges (sources no longer live) are dropped, not swapped in."""

import numpy as np

import tantivy_tpu as tt
from tantivy_tpu.indexer.merge_policy import LogMergePolicy


def test_background_merge_runs_and_joins():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer(num_threads=1, merge_policy=LogMergePolicy(
        min_num_segments=2, max_docs_before_merge=10_000_000,
    ))
    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(10)]
    for c in range(4):
        for _ in range(50):
            w.add_document(tt.Document(body=" ".join(rng.choice(words, 6))))
        w.commit()
    w.wait_merging_threads()
    w.close()
    searcher = index.reader().searcher()
    # all docs searchable post-merge
    assert searcher.search(tt.AllQuery(), tt.Count()) == 200
    # merge actually reduced the segment count
    assert len(index.searchable_segment_metas()) < 4


def test_manual_merge_then_search_exact():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    for c in range(3):
        for i in range(40):
            w.add_document(tt.Document(body=f"alpha doc{c}_{i}"))
        w.commit()
    before = index.reader().searcher().search(
        tt.TermQuery(tt.Term.from_field_text("body", "alpha")), tt.Count()
    )
    w.merge([s.segment_id for s in index.searchable_segment_metas()])
    w.wait_merging_threads()
    w.close()
    after = index.reader().searcher().search(
        tt.TermQuery(tt.Term.from_field_text("body", "alpha")), tt.Count()
    )
    assert before == after == 120
