"""Fused-store boolean batches (one launch per phase) vs the host engine.

Runs the pallas kernels in interpreter mode on CPU. Exercises the round-3
additions specifically: multi-segment fusion, multi-field clauses, the
wide-window probe-skip (dual-report) plan for pure-SHOULD queries, and
MUST-query window explosion.
"""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor

from test_device_ops import assert_hits_match


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")


def t(w, field="body"):
    return tt.TermQuery(tt.Term.from_field_text(field, w))


def build_zipf_index(num_docs=600, num_commits=3, seed=3):
    """Zipf-ish corpus: w0 very common, tail rare — makes real wide windows."""
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    b.add_text_field("title", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    rng = np.random.default_rng(seed)
    vocab = 40
    ranks = np.arange(1, vocab + 1)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    words = [f"w{i}" for i in range(vocab)]
    w = index.writer_for_tests()
    per = num_docs // num_commits
    for c in range(num_commits):
        for _ in range(per):
            body = " ".join(rng.choice(words, 12, p=probs))
            title = " ".join(rng.choice(words, 3, p=probs))
            w.add_document(tt.Document(body=body, title=title))
        w.commit()
    w.close()
    return index, words


@pytest.fixture(scope="module")
def zipf():
    index, words = build_zipf_index()
    searcher = index.reader().searcher()
    return searcher, words


def check(searcher, queries, k=10):
    executor = BatchExecutor(searcher)
    device = executor.search_batch(queries, k)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(k))
        assert_hits_match(dev, host, context=repr(q))
    return executor


def test_fused_multisegment_or_and(zipf):
    searcher, words = zipf
    queries = []
    for i in range(0, 16, 2):
        queries.append(tt.BooleanQuery.union([t(words[i]), t(words[i + 1])]))
        queries.append(
            tt.BooleanQuery.intersection([t(words[i]), t(words[i + 1])])
        )
    check(searcher, queries)


def test_fused_multifield_clauses(zipf):
    searcher, words = zipf
    queries = [
        tt.BooleanQuery.union([t(words[0], "body"), t(words[1], "title")]),
        tt.BooleanQuery.intersection(
            [t(words[0], "body"), t(words[0], "title")]
        ),
        tt.BooleanQuery(
            [
                (tt.Occur.MUST, t(words[2], "body")),
                (tt.Occur.MUST_NOT, t(words[1], "title")),
            ]
        ),
    ]
    check(searcher, queries)


def test_fused_wide_window_skip_exact(zipf, monkeypatch):
    """Force the probe-skip (dual-report) path: with fused_kw_max dropped to
    1, every rare-OR-common query has wide windows toward the common term."""
    import tantivy_tpu.ops.pallas_probe as pp

    monkeypatch.setattr(pp, "fused_kw_max", lambda n_clauses: 1)
    searcher, words = zipf
    queries = [
        tt.BooleanQuery.union([t(words[-1]), t(words[0])]),  # rare OR common
        tt.BooleanQuery.union([t(words[0]), t(words[-2])]),  # common OR rare
        tt.BooleanQuery.union([t(words[0]), t(words[1])]),   # common OR common
        t(words[-3]),
    ]
    executor = check(searcher, queries)


def test_fused_must_explosion_exact(zipf, monkeypatch):
    """Force MUST-window explosion: rare AND common re-enumerates the wide
    rare blocks through the common clause's overlapping blocks."""
    import tantivy_tpu.ops.pallas_probe as pp

    monkeypatch.setattr(pp, "fused_kw_max", lambda n_clauses: 1)
    searcher, words = zipf
    queries = [
        tt.BooleanQuery.intersection([t(words[-1]), t(words[0])]),
        tt.BooleanQuery.intersection([t(words[0]), t(words[-2])]),
        tt.BooleanQuery.intersection([t(words[1]), t(words[2])]),
    ]
    check(searcher, queries)


def test_fused_m_of_n_and_mustnot(zipf):
    searcher, words = zipf
    queries = [
        tt.BooleanQuery(
            [
                (tt.Occur.SHOULD, t(words[0])),
                (tt.Occur.SHOULD, t(words[1])),
                (tt.Occur.SHOULD, t(words[5])),
            ],
            minimum_number_should_match=2,
        ),
        tt.BooleanQuery(
            [
                (tt.Occur.MUST, t(words[0])),
                (tt.Occur.MUST_NOT, t(words[1])),
            ]
        ),
    ]
    check(searcher, queries)


def test_fused_with_deletes():
    index, words = build_zipf_index(num_docs=300, num_commits=2, seed=11)
    w = index.writer_for_tests()
    w.delete_term(tt.Term.from_field_text("body", words[3]))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    queries = [
        tt.BooleanQuery.union([t(words[0]), t(words[1])]),
        tt.BooleanQuery.intersection([t(words[0]), t(words[2])]),
    ]
    check(searcher, queries)


def test_fused_wide_clause_counts(zipf):
    """9..16-clause queries ride the narrow-rung fused path (T_MAX=16)."""
    searcher, words = zipf
    rng = np.random.default_rng(11)
    queries = []
    for n in (9, 12, 16):
        ws = rng.choice(words, n, replace=False)
        queries.append(tt.BooleanQuery.union([t(w) for w in ws]))
        queries.append(tt.BooleanQuery.intersection([t(w) for w in ws[:3]] +
                                                    [t(words[0])] * 0))
    # a 10-clause AND over common terms (wide windows -> explosion paths)
    queries.append(
        tt.BooleanQuery.intersection([t(words[i]) for i in range(10)])
    )
    # mixed occur at T=11
    from tantivy_tpu.query import BooleanQuery, Occur
    mixed = BooleanQuery(
        [(Occur.MUST, t(words[0]))]
        + [(Occur.SHOULD, t(words[i])) for i in range(1, 10)]
        + [(Occur.MUST_NOT, t(words[30]))]
    )
    queries.append(mixed)
    check(searcher, queries)


def test_fused_partial_explosion_exact(monkeypatch):
    """Regression: explosion with PARTIAL leader coverage (some leader
    blocks narrow, some wide). The leader must not claim fullprobe after its
    wide blocks are re-anchored, or the partner enumerator's lanes are
    suppressed and matches in the dropped blocks vanish (found as a scaled
    TPU bench exact_match failure, round 3)."""
    import tantivy_tpu.ops.pallas_probe as pp

    monkeypatch.setattr(pp, "fused_kw_max", lambda n_clauses: 2)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    # "bb" everywhere; "aa" dense in docs 0..127 (narrow leader block) then
    # sparse every 8th doc (wide leader blocks spanning many bb blocks)
    for i in range(1280):
        body = "bb" if (i >= 128 and i % 8) else "aa bb"
        w.add_document(tt.Document(body=body))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    q = tt.BooleanQuery.intersection([t("aa"), t("bb")])
    check(searcher, [q], k=10)
    # also top-k deep enough to need hits from both coverage regions
    check(searcher, [q], k=60)


def test_ratchet_two_round_phase2_exact(monkeypatch):
    """Force the phase-2 threshold ratchet (two UB-ordered device rounds)
    and check device-vs-host exactness — on big corpora the ratchet prunes
    the bulk with thresholds tightened by the best-UB slice."""
    import numpy as np

    import tantivy_tpu as tt
    import tantivy_tpu.parallel as par
    from tantivy_tpu.parallel import BatchExecutor

    monkeypatch.setattr(par, "_RATCHET_MIN_PER_Q", 0)
    monkeypatch.setattr(par, "_RATCHET_TOP_PER_Q", 1)

    rng = np.random.default_rng(17)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    words = [f"w{i}" for i in range(12)]
    for _ in range(900):
        n = int(rng.integers(3, 25))
        w.add_document(tt.Document(body=" ".join(rng.choice(words, n))))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher, mode="dense")

    def t(x):
        return tt.TermQuery(tt.Term.from_field_text("body", str(x)))

    queries = []
    for i in range(12):
        a, bb = words[i % 12], words[(i + 5) % 12]
        if i % 3 == 0:
            queries.append(tt.BooleanQuery.union([t(a), t(bb)]))
        elif i % 3 == 1:
            queries.append(tt.BooleanQuery.intersection([t(a), t(bb)]))
        else:
            queries.append(tt.PhraseQuery("body", [a, bb]))
    res = executor.search_batch(queries, 5)
    for q, d in zip(queries, res):
        h = searcher.search(q, tt.TopDocs(5))
        assert [(float(s), a) for s, a in d] == \
            [(float(s), a) for s, a in h], q


def test_row_tier_ladder_and_store_shape_stability():
    """Store rows pad to the {1,1.5}*pow2 ladder so kernel signatures
    survive corpus growth within a tier (compile stability across
    commits/merges — a fresh remote Mosaic compile costs minutes)."""
    from tantivy_tpu.ops.fused_store import FusedStore, _row_tier

    assert _row_tier(1) == 128
    assert _row_tier(128) == 128
    assert _row_tier(129) == 192
    assert _row_tier(193) == 256
    assert _row_tier(400) == 512
    assert _row_tier(600) == 768
    for n in (1, 100, 1000, 54321):
        t = _row_tier(n)
        assert t >= n and t <= max(128, n + n // 2)

    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer()
    for i in range(64):
        w.add_document(tt.Document(body=f"alpha beta w{i % 7}"))
    w.commit()

    def store_shapes(idx):
        ex = BatchExecutor(idx.reader().searcher(), mode="dense")
        for so in range(len(ex.searcher.segment_readers())):
            ex._ensure_fused_slab(so, "body")
        f = ex._fused().ready()
        f.ensure_positions()
        return f.cstore.shape, f.postore.shape

    s1 = store_shapes(index)
    w.add_document(tt.Document(body="alpha beta extra growth doc"))
    w.commit()
    s2 = store_shapes(index)
    assert s1 == s2, (s1, s2)
    assert s1[0][0] == _row_tier(1)  # tiny corpus rides the floor tier


def test_boosted_term_clauses_ride_device(zipf):
    """BoostQuery-wrapped term clauses fold boost into the clause weight
    (reference `boost_query.rs` boost chaining) and stay device-eligible —
    bitwise parity with the host engine."""
    searcher, words = zipf
    executor = BatchExecutor(searcher)
    queries = [
        tt.BooleanQuery.union([
            tt.BoostQuery(t(words[1]), 2.5), t(words[4]),
        ]),
        tt.BooleanQuery.intersection([
            tt.BoostQuery(t(words[2]), 0.5),
            tt.BoostQuery(tt.BoostQuery(t(words[3]), 2.0), 3.0),
        ]),
        tt.BoostQuery(t(words[5]), 4.0),  # top-level boosted term
    ]
    assert executor._bool_device_eligible(queries[0])
    assert executor._bool_device_eligible(queries[1])
    device = executor.search_batch(queries, 10)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(10))
        assert [(s, a) for s, a in dev] == [(s, a) for s, a in host], repr(q)
    assert not dict(getattr(executor, "fallbacks", {}) or {})
