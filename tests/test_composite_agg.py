"""Composite aggregation (reference `src/aggregation/bucket/composite/`):
cross-source buckets, ES-style after_key pagination, missing_bucket, order,
sub-aggregations, and cross-segment merging."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.aggregation import AggregationCollector


def agg(searcher, query, req):
    return searcher.search(query, AggregationCollector(req))


@pytest.fixture(scope="module")
def setup():
    b = tt.Schema.builder()
    b.add_text_field("brand", tt.STRING | tt.FAST)
    b.add_u64_field("qty", tt.FAST)
    b.add_f64_field("price", tt.FAST)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer_for_tests()
    rows = [
        ("acme", 1, 10.0),
        ("acme", 1, 20.0),
        ("acme", 2, 30.0),
        ("globex", 1, 5.0),
        ("globex", 3, 7.0),
    ]
    for brand, qty, price in rows[:3]:
        w.add_document(tt.Document(brand=brand, qty=qty, price=price))
    w.commit()  # second segment: exercises intermediate merge
    for brand, qty, price in rows[3:]:
        w.add_document(tt.Document(brand=brand, qty=qty, price=price))
    # one doc missing brand
    w.add_document(tt.Document(qty=9, price=1.0))
    w.commit()
    w.close()
    return index, index.reader().searcher()


def comp(sources, **extra):
    return {"comp": {"composite": {"sources": sources, **extra}}}


class TestComposite:
    def test_two_sources_cross_product(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), comp([
            {"b": {"terms": {"field": "brand"}}},
            {"q": {"histogram": {"field": "qty", "interval": 1}}},
        ]))
        buckets = {
            (b["key"]["b"], b["key"]["q"]): b["doc_count"]
            for b in res["comp"]["buckets"]
        }
        assert buckets == {
            ("acme", 1.0): 2,
            ("acme", 2.0): 1,
            ("globex", 1.0): 1,
            ("globex", 3.0): 1,
        }
        # sorted asc by (brand, qty)
        keys = [tuple(b["key"].values()) for b in res["comp"]["buckets"]]
        assert keys == sorted(keys)

    def test_after_key_pagination(self, setup):
        _, s = setup
        sources = [
            {"b": {"terms": {"field": "brand"}}},
            {"q": {"histogram": {"field": "qty", "interval": 1}}},
        ]
        seen = []
        after = None
        while True:
            body = {"sources": sources, "size": 2}
            if after is not None:
                body["after"] = after
            res = agg(s, tt.AllQuery(), {"comp": {"composite": body}})["comp"]
            if not res["buckets"]:
                break
            seen.extend(
                (b["key"]["b"], b["key"]["q"], b["doc_count"])
                for b in res["buckets"]
            )
            assert len(res["buckets"]) <= 2
            after = res["after_key"]
        assert seen == [
            ("acme", 1.0, 2),
            ("acme", 2.0, 1),
            ("globex", 1.0, 1),
            ("globex", 3.0, 1),
        ]

    def test_missing_bucket(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), comp([
            {"b": {"terms": {"field": "brand", "missing_bucket": True}}},
        ]))
        buckets = [(b["key"]["b"], b["doc_count"]) for b in res["comp"]["buckets"]]
        # missing sorts first on asc
        assert buckets == [(None, 1), ("acme", 3), ("globex", 2)]
        # without missing_bucket, the doc is dropped
        res = agg(s, tt.AllQuery(), comp([
            {"b": {"terms": {"field": "brand"}}},
        ]))
        assert [(b["key"]["b"], b["doc_count"]) for b in res["comp"]["buckets"]] \
            == [("acme", 3), ("globex", 2)]

    def test_desc_order(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), comp([
            {"b": {"terms": {"field": "brand", "order": "desc"}}},
        ]))
        assert [b["key"]["b"] for b in res["comp"]["buckets"]] == [
            "globex", "acme",
        ]

    def test_sub_aggregations(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {
            "comp": {
                "composite": {"sources": [{"b": {"terms": {"field": "brand"}}}]},
                "aggs": {"avg_price": {"avg": {"field": "price"}}},
            }
        })
        by_brand = {
            b["key"]["b"]: b["avg_price"]["value"]
            for b in res["comp"]["buckets"]
        }
        assert by_brand["acme"] == pytest.approx(20.0)
        assert by_brand["globex"] == pytest.approx(6.0)

    def test_date_histogram_source(self, setup):
        b = tt.Schema.builder()
        b.add_date_field("ts", tt.FAST)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        day = 86400
        for t in (0, 10, day + 5, 2 * day):
            w.add_document(tt.Document(ts=t))
        w.commit()
        w.close()
        s = index.reader().searcher()
        res = agg(s, tt.AllQuery(), comp([
            {"d": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}},
        ]))
        assert [(b["key"]["d"], b["doc_count"]) for b in res["comp"]["buckets"]] \
            == [(0, 2), (day, 1), (2 * day, 1)]


def test_composite_argsort_matches_comparator():
    """The vectorized composite bucket sort must order exactly like the
    general `_composite_cmp` comparator (asc/desc per source, str and
    numeric sources), and bail out (None) on mixed/missing keys."""
    from functools import cmp_to_key

    import numpy as np

    from tantivy_tpu.aggregation import _composite_argsort, _composite_cmp

    rng = np.random.default_rng(5)
    words = ["ant", "bee", "cat", "dog", "elk", "fox"]
    for trial in range(40):
        n_src = int(rng.integers(1, 4))
        dirs = [bool(rng.integers(0, 2)) for _ in range(n_src)]
        kinds = [rng.integers(0, 2) for _ in range(n_src)]
        n = int(rng.integers(2, 60))
        keys = [
            tuple(
                words[int(rng.integers(0, len(words)))]
                if kinds[s] else float(rng.integers(-20, 20))
                for s in range(n_src)
            )
            for _ in range(n)
        ]
        order = _composite_argsort(keys, dirs)
        assert order is not None
        got = [keys[i] for i in order]
        want = sorted(
            keys, key=cmp_to_key(lambda a, b: _composite_cmp(a, b, dirs))
        )
        assert got == want, (dirs, kinds, got[:5], want[:5])
    # None / mixed-type keys fall back to the comparator
    assert _composite_argsort([(1.0,), (None,)], [False]) is None
    assert _composite_argsort([("a",), (2.0,)], [False]) is None
