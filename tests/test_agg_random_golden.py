"""Randomized aggregation golden tests: every run builds a random corpus
(random cardinalities per column — full / optional / multi-valued — random
segment counts and deletes), fires a nested aggregation tree, and recomputes
every result in plain numpy from the raw value table. The reference covers
this ground with per-agg proptest suites (`bucket/term_agg`, `histogram`,
`metric/*` test mods); one randomized cross-check here covers the
factorization/bincount execution engine end to end."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.aggregation import AggregationCollector


def _build(rng, n_docs, n_segments, delete_ratio):
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    b.add_u64_field("full_u", tt.FAST)
    b.add_f64_field("opt_f", tt.FAST)
    b.add_u64_field("multi_u", tt.FAST)
    b.add_text_field("cat", tt.TEXT | tt.FAST)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer()
    cats = ["a", "b", "c", "d", "e"]
    rows = []  # (alive, full_u, opt_f | None, [multi_u...], cat)
    per_seg = n_docs // n_segments
    for i in range(n_docs):
        fu = int(rng.integers(0, 12))
        of = float(rng.integers(-5, 6)) * 0.5 if rng.random() < 0.7 else None
        mu = [int(v) for v in rng.integers(0, 6, rng.integers(0, 3))]
        c = cats[int(rng.integers(0, len(cats)))]
        d = tt.Document(t=f"doc {i}", full_u=fu, cat=c)
        if of is not None:
            d.add_f64("opt_f", of)
        for v in mu:
            d.add_u64("multi_u", v)
        rows.append([True, fu, of, mu, c])
        w.add_document(d)
        if (i + 1) % per_seg == 0:
            w.commit()
    w.commit()
    # deletes by term on the text field
    ndel = int(n_docs * delete_ratio)
    for i in rng.choice(n_docs, ndel, replace=False):
        # delete by the doc's unique numeral TOKEN (terms are not analyzed)
        w.delete_term(tt.Term.from_field_text("t", str(int(i))))
        rows[int(i)][0] = False
    w.commit()
    return index, rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_corpus_agg_goldens(seed):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(300, 900))
    n_segments = int(rng.integers(1, 5))
    index, rows = _build(rng, n_docs, n_segments, float(rng.uniform(0, 0.2)))
    searcher = index.reader().searcher()

    alive = [r for r in rows if r[0]]
    req = {
        "by_cat": {
            "terms": {"field": "cat", "size": 100},
            "aggs": {
                "s": {"stats": {"field": "full_u"}},
                "o": {"avg": {"field": "opt_f"}},
            },
        },
        "hist": {
            "histogram": {"field": "full_u", "interval": 3.0},
            "aggs": {"m": {"sum": {"field": "multi_u"}}},
        },
        "mterms": {"terms": {"field": "multi_u", "size": 100}},
        "vc": {"value_count": {"field": "opt_f"}},
    }
    res = searcher.search(tt.AllQuery(), AggregationCollector(req))

    # terms over cat, ordered count desc then key asc
    from collections import Counter, defaultdict

    cnt = Counter(r[4] for r in alive)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(bu["key"], bu["doc_count"]) for bu in res["by_cat"]["buckets"]]
    assert got == want
    for bu in res["by_cat"]["buckets"]:
        sub = [r for r in alive if r[4] == bu["key"]]
        fu = np.array([r[1] for r in sub], dtype=np.float64)
        assert bu["s"]["count"] == len(fu)
        assert bu["s"]["sum"] == pytest.approx(float(fu.sum()))
        assert bu["s"]["min"] == pytest.approx(float(fu.min()))
        assert bu["s"]["max"] == pytest.approx(float(fu.max()))
        ofv = np.array([r[2] for r in sub if r[2] is not None])
        if len(ofv):
            assert bu["o"]["value"] == pytest.approx(float(ofv.mean()))

    # histogram over full_u interval 3 with multi-value sum sub-agg
    hb = defaultdict(lambda: [0, 0.0])
    for r in alive:
        key = (r[1] // 3) * 3.0
        hb[key][0] += 1
        hb[key][1] += sum(r[3])
    got_h = {
        bu["key"]: (bu["doc_count"], bu["m"]["value"])
        for bu in res["hist"]["buckets"]
    }
    assert got_h == {k: (c, pytest.approx(s)) for k, (c, s) in hb.items()}

    # terms over the multi-valued column: doc_count equals TERM COUNT
    # (per occurrence, reference `term_agg/mod.rs:72`)
    mc = Counter()
    for r in alive:
        for v in r[3]:
            mc[float(v)] += 1
    got_m = {bu["key"]: bu["doc_count"] for bu in res["mterms"]["buckets"]}
    assert got_m == dict(mc)

    # value_count over the optional column
    assert res["vc"]["value"] == sum(1 for r in alive if r[2] is not None)

    # composite paging over (cat, full_u): walk after_key to exhaustion and
    # compare the full paged set
    pages = []
    after = None
    while True:
        creq = {
            "co": {
                "composite": {
                    "size": 7,
                    "sources": [
                        {"c": {"terms": {"field": "cat"}}},
                        {"u": {"terms": {"field": "full_u"}}},
                    ],
                    **({"after": after} if after else {}),
                }
            }
        }
        r = searcher.search(tt.AllQuery(), AggregationCollector(creq))
        buckets = r["co"]["buckets"]
        if not buckets:
            break
        pages.extend(
            ((bu["key"]["c"], bu["key"]["u"]), bu["doc_count"])
            for bu in buckets
        )
        after = r["co"].get("after_key")
        if after is None:
            break
    cc = Counter((r[4], float(r[1])) for r in alive)
    assert pages == sorted(cc.items())
