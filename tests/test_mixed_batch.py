"""search_batch over a MIXED query inventory: device-eligible kinds
(term / boolean / phrase / phrase-prefix) interleaved with host-tail kinds
(sloppy phrase, fuzzy, regex, term-set, dismax, MLT-ish boolean) in one
call. Asserts exact parity with the sequential host engine for every slot
— the router must keep result positions straight while splitting the
batch across device paths and the pruned host tail (reference executes
each via `Weight::for_each_pruning`, `weight.rs:123-132`)."""

import numpy as np

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor
from tantivy_tpu.query import (
    BoostQuery,
    DisjunctionMaxQuery,
    TermQuery,
    TermSetQuery,
)
from tantivy_tpu.query.automaton_queries import FuzzyTermQuery, RegexQuery
from tantivy_tpu.query.phrase_query import PhrasePrefixQuery, PhraseQuery


def build_corpus(seed=9, n=400):
    rng = np.random.default_rng(seed)
    words = [f"w{i:02d}" for i in range(40)] + ["prefixable", "prefixed"]
    p = 1.0 / np.arange(1, len(words) + 1)
    p /= p.sum()
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer_for_tests()
    for c in range(3):
        for _ in range(n // 3):
            w.add_document(
                tt.Document(body=" ".join(rng.choice(words, 7, p=p)))
            )
        w.commit()
    w.close()
    return index


def test_mixed_batch_parity():
    index = build_corpus()
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)

    def t(word):
        return TermQuery(tt.Term.from_field_text("body", word))

    queries = [
        t("w00"),
        tt.BooleanQuery.union([t("w01"), t("w02")]),
        PhraseQuery("body", ["w00", "w01"]),
        PhraseQuery("body", ["w01", "w03"], slop=2),          # host tail
        PhrasePrefixQuery("body", ["prefix"]),                 # expansion
        FuzzyTermQuery(tt.Term.from_field_text("body", "w01"), 1),
        RegexQuery("w0[0-3]", "body"),
        TermSetQuery([tt.Term.from_field_text("body", w)
                      for w in ("w04", "w05")]),
        DisjunctionMaxQuery([t("w02"), t("w06")], tie_breaker=0.3),
        BoostQuery(t("w07"), 2.0),
        tt.BooleanQuery([(tt.Occur.MUST, t("w00")),
                         (tt.Occur.MUST_NOT, t("w01"))]),
        tt.AllQuery(),
    ]
    res = ex.search_batch(queries, 10)
    assert len(res) == len(queries)
    for q, r in zip(queries, res):
        h = searcher.search(q, tt.TopDocs(10))
        assert [(s, a) for s, a in r] == [(s, a) for s, a in h], q


def test_mixed_batch_order_stability():
    """Result list positions must match input positions even when the
    router reorders work internally (device groups, expansions, tail)."""
    index = build_corpus(seed=10)
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)

    def t(word):
        return TermQuery(tt.Term.from_field_text("body", word))

    # interleave kinds so sub-batches are non-contiguous
    qs = []
    for i in range(8):
        qs.append(t(f"w{i:02d}"))
        qs.append(PhraseQuery("body", [f"w{i:02d}", f"w{(i+1):02d}"]))
        qs.append(FuzzyTermQuery(tt.Term.from_field_text("body", f"w{i:02d}"), 1))
    res = ex.search_batch(qs, 5)
    for q, r in zip(qs, res):
        h = searcher.search(q, tt.TopDocs(5))
        assert [(s, a) for s, a in r] == [(s, a) for s, a in h], q


def test_dismax_term_clauses_device_expansion(monkeypatch):
    """DisjunctionMax (tie_breaker 0) over term/boosted-term clauses
    expands to per-clause device queries merged keep-max — exact vs the
    host engine (see the union-max argument in `search_batch`)."""
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")
    index = build_corpus()
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)
    qs = [
        DisjunctionMaxQuery([
            TermQuery(tt.Term.from_field_text("body", "w00")),
            BoostQuery(
                TermQuery(tt.Term.from_field_text("body", "w03")), 2.0
            ),
        ]),
        # nonzero tie_breaker stays on the host path
        DisjunctionMaxQuery([
            TermQuery(tt.Term.from_field_text("body", "w01")),
            TermQuery(tt.Term.from_field_text("body", "w02")),
        ], tie_breaker=0.3),
    ]
    dev = ex.search_batch(qs, 10)
    for q, d in zip(qs, dev):
        h = searcher.search(q, tt.TopDocs(10))
        assert [(s, a) for s, a in d] == [(s, a) for s, a in h], repr(q)


def test_phrase_prefix_device_truncation_parity(monkeypatch):
    """Multi-term phrase-prefixes ride the fused phrase launch with
    PER-SEGMENT capped expansion rows (no batch inflation, no
    `phrase_prefix_trunc` fallbacks) — exact vs host even when segments
    truncate DIFFERENT expansion sets (the case the old global-union
    expansion could not reproduce and host-fallbacked on)."""
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")
    rng = np.random.default_rng(17)
    # pre00..pre19 share a prefix; segment composition varies so each
    # segment's first-max_expansions set differs
    words = [f"pre{i:02d}" for i in range(20)] + [f"w{i:02d}" for i in range(10)]
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer_for_tests()
    for c in range(3):
        pool = words if c == 0 else words[c * 6:] + words[:3]
        for _ in range(120):
            doc = " ".join(rng.choice(pool, 6))
            w.add_document(tt.Document(body=doc))
        w.commit()
    w.close()
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)
    qs = [
        PhrasePrefixQuery("body", ["w00", "pre"], max_expansions=4),
        PhrasePrefixQuery("body", ["w01", "pre"], max_expansions=50),
        PhrasePrefixQuery("body", ["pre00", "pre"], max_expansions=3),
        PhrasePrefixQuery("body", ["w02", "pre0"]),
        PhrasePrefixQuery("body", ["w03", "zzz"]),  # no expansions
        PhraseQuery("body", ["w00", "w01"]),        # mixed in one launch
    ]
    res = ex.search_batch(qs, 10)
    for q, r in zip(qs, res):
        h = searcher.search(q, tt.TopDocs(10))
        assert [(s, a) for s, a in r] == [(s, a) for s, a in h], repr(q)
    assert "phrase_prefix_trunc" not in (getattr(ex, "fallbacks", {}) or {})
    # and at k=3 (k_eff quantization shares the compiled shapes)
    res3 = ex.search_batch(qs, 3)
    for q, r in zip(qs, res3):
        h = searcher.search(q, tt.TopDocs(3))
        assert [(s, a) for s, a in r] == [(s, a) for s, a in h], repr(q)


def test_phrase_prefix_row_budget_subbatching(monkeypatch):
    """A prefix batch whose expansion rows exceed the plan-row tier must
    sub-batch by ROW budget (not query count) and stay exact."""
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")
    import tantivy_tpu.parallel as par

    index = build_corpus(seed=11)
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)
    qs = [PhrasePrefixQuery("body", ["w00", "prefix"])for _ in range(6)]
    qs += [PhraseQuery("body", ["w01", "w02"])]
    # shrink the tier budget via monkeypatching _prow_tier so the 6
    # queries (2 expansions x 3 segments each) must split
    orig = ex._prow_tier
    monkeypatch.setattr(
        type(ex), "_prow_tier", staticmethod(lambda n, Tb=2: 8)
    )
    try:
        res = ex.search_batch(qs, 5)
    finally:
        monkeypatch.setattr(type(ex), "_prow_tier", staticmethod(orig))
    for q, r in zip(qs, res):
        h = searcher.search(q, tt.TopDocs(5))
        assert [(s, a) for s, a in r] == [(s, a) for s, a in h], repr(q)


def test_search_batches_pipelined_parity():
    """The pipelined multi-batch API must return exactly what per-batch
    sequential calls return, in order, with a span per batch — two
    batches in flight share the executor's caches and the fused store."""
    index = build_corpus(seed=11)
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)

    def t(word):
        return TermQuery(tt.Term.from_field_text("body", word))

    batches = []
    for b in range(5):
        qs = []
        for i in range(6):
            w = f"w{(b * 6 + i) % 38:02d}"
            qs.append(t(w))
            qs.append(tt.BooleanQuery.union([t(w), t("w39")]))
            qs.append(PhraseQuery("body", [w, f"w{(b + i + 1) % 38:02d}"]))
        batches.append(qs)
    want = [ex.search_batch(b, 7) for b in batches]
    got = ex.search_batches(batches, 7, pipeline=2)
    assert got == want
    assert len(ex.batch_spans) == len(batches)
    assert all(s > 0 for s in ex.batch_spans)
    # degenerate pipelines
    assert ex.search_batches([], 7) == []
    assert ex.search_batches(batches[:1], 7, pipeline=4) == want[:1]
