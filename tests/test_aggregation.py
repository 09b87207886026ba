"""Aggregation tests — ES-shaped requests/responses, cross-segment merging,
intermediate serialization (the cross-shard hook)."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.aggregation import (
    AggregationCollector,
    AggregationError,
    AggregationLimits,
    IntermediateAggregationResults,
    parse_aggregations,
)


@pytest.fixture(scope="module")
def setup():
    b = tt.Schema.builder()
    b.add_text_field("text", tt.TEXT)
    b.add_f64_field("price", tt.FAST)
    b.add_u64_field("qty", tt.FAST)
    b.add_i64_field("delta", tt.FAST)
    b.add_text_field("brand", tt.TextOptions(fast=True, indexed=True, tokenizer="raw"))
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer_for_tests()
    data = [
        ("red apple", 10.0, 3, -5, "acme"),
        ("green apple", 20.0, 1, 2, "acme"),
        ("red cherry", 30.0, 2, 7, "globex"),
        ("blue berry", 40.0, 5, -1, "globex"),
        ("red berry", 50.0, 4, 0, "initech"),
    ]
    # two commits -> two segments, to exercise merging
    for i, (txt, price, qty, delta, brand) in enumerate(data):
        w.add_document(
            tt.Document(text=txt, price=price, qty=qty, delta=delta, brand=brand)
        )
        if i == 2:
            w.commit()
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    assert len(searcher.segment_readers()) == 2
    return index, searcher


def agg(searcher, query, req):
    return searcher.search(query, AggregationCollector(req))


class TestMetrics:
    def test_stats_family(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {
            "a": {"avg": {"field": "price"}},
            "mn": {"min": {"field": "price"}},
            "mx": {"max": {"field": "price"}},
            "sm": {"sum": {"field": "price"}},
            "ct": {"value_count": {"field": "price"}},
            "st": {"stats": {"field": "price"}},
            "xs": {"extended_stats": {"field": "price"}},
        })
        assert res["a"]["value"] == 30.0
        assert res["mn"]["value"] == 10.0
        assert res["mx"]["value"] == 50.0
        assert res["sm"]["value"] == 150.0
        assert res["ct"]["value"] == 5
        assert res["st"] == {
            "count": 5, "min": 10.0, "max": 50.0, "sum": 150.0, "avg": 30.0
        }
        assert res["xs"]["variance"] == pytest.approx(200.0)

    def test_i64_metric(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {"m": {"min": {"field": "delta"}},
                                     "x": {"max": {"field": "delta"}}})
        assert res["m"]["value"] == -5.0
        assert res["x"]["value"] == 7.0

    def test_metric_under_query(self, setup):
        index, s = setup
        q = index.parse_query("text:red")
        res = agg(s, q, {"a": {"avg": {"field": "price"}}})
        assert res["a"]["value"] == pytest.approx((10 + 30 + 50) / 3)

    def test_percentiles(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {"p": {"percentiles": {"field": "price"}}})
        v50 = res["p"]["values"]["50"]
        assert abs(v50 - 30.0) / 30.0 < 0.02

    def test_cardinality(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {"c": {"cardinality": {"field": "brand"}}})
        assert res["c"]["value"] == 3
        res = agg(s, tt.AllQuery(), {"c": {"cardinality": {"field": "qty"}}})
        assert res["c"]["value"] == 5


class TestBuckets:
    def test_terms_str(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {"b": {"terms": {"field": "brand"}}})
        buckets = {b["key"]: b["doc_count"] for b in res["b"]["buckets"]}
        assert buckets == {"acme": 2, "globex": 2, "initech": 1}
        # count-desc ordering
        assert res["b"]["buckets"][0]["doc_count"] == 2

    def test_terms_numeric_with_subagg(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand"},
                  "aggs": {"total": {"sum": {"field": "price"}}}}
        })
        by_key = {b["key"]: b for b in res["b"]["buckets"]}
        assert by_key["acme"]["total"]["value"] == 30.0
        assert by_key["globex"]["total"]["value"] == 70.0

    def test_histogram(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {
            "h": {"histogram": {"field": "price", "interval": 20.0}}
        })
        assert [(b["key"], b["doc_count"]) for b in res["h"]["buckets"]] == [
            (0.0, 1), (20.0, 2), (40.0, 2)
        ]

    def test_range(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {
            "r": {"range": {"field": "price", "ranges": [
                {"to": 25.0}, {"from": 25.0, "to": 45.0}, {"from": 45.0}
            ]}}
        })
        counts = {b["key"]: b["doc_count"] for b in res["r"]["buckets"]}
        assert counts == {"*-25": 2, "25-45": 2, "45-*": 1}

    def test_filter_agg(self, setup):
        _, s = setup
        res = agg(s, tt.AllQuery(), {
            "f": {"filter": {"term": {"brand": "acme"}},
                  "aggs": {"a": {"avg": {"field": "price"}}}}
        })
        assert res["f"]["doc_count"] == 2
        assert res["f"]["a"]["value"] == 15.0

    def test_bucket_limit(self, setup):
        _, s = setup
        with pytest.raises(AggregationError):
            agg_col = AggregationCollector(
                {"b": {"terms": {"field": "brand"}}},
                AggregationLimits(bucket_limit=1),
            )
            s.search(tt.AllQuery(), agg_col)


class TestIntermediate:
    def test_roundtrip_and_merge(self, setup):
        _, s = setup
        col = AggregationCollector({
            "b": {"terms": {"field": "brand"},
                  "aggs": {"a": {"avg": {"field": "price"}}}},
            "st": {"stats": {"field": "qty"}},
        })
        weight = tt.AllQuery().weight(s, scoring=False)
        fruits = [
            col.collect_segment(weight, i, r)
            for i, r in enumerate(s.segment_readers())
        ]
        # serialize each fruit (simulating cross-shard transfer), then merge
        revived = [
            IntermediateAggregationResults.from_json_bytes(f.to_json_bytes())
            for f in fruits
        ]
        acc = revived[0]
        for f in revived[1:]:
            acc.merge(f)
        res = acc.finalize()
        by_key = {b["key"]: b for b in res["b"]["buckets"]}
        assert by_key["acme"]["a"]["value"] == 15.0
        assert res["st"]["sum"] == 15.0

    def test_parse_errors(self):
        with pytest.raises(AggregationError):
            parse_aggregations({"x": {"avg": {"field": "f"}, "sum": {"field": "g"}}})
        with pytest.raises(AggregationError):
            parse_aggregations({"x": {"avg": {"field": "f"}, "aggs": {"y": {"sum": {"field": "g"}}}}})


class TestTopHits:
    def test_top_hits(self, setup):
        index, s = setup
        q = index.parse_query("text:red")
        res = agg(s, q, {"th": {"top_hits": {"size": 2}}})
        assert len(res["th"]["hits"]) == 2
        assert res["th"]["hits"][0]["_score"] >= res["th"]["hits"][1]["_score"]


class TestTermsOptions:
    """Reference `term_agg/mod.rs` options: missing / include / exclude /
    min_doc_count / order-by-sub-metric."""

    @pytest.fixture(scope="class")
    def opt_setup(self):
        b = tt.Schema.builder()
        b.add_text_field("text", tt.TEXT)
        b.add_text_field(
            "brand", tt.TextOptions(fast=True, indexed=True, tokenizer="raw")
        )
        b.add_f64_field("price", tt.FAST)
        schema = b.build()
        index = tt.Index.create_in_ram(schema)
        w = index.writer_for_tests()
        rows = [
            ("a", "acme", 10.0),
            ("b", "acme", 30.0),
            ("c", "globex", 5.0),
            ("d", None, 7.0),       # missing brand
            ("e", None, 9.0),       # missing brand
            ("f", "initech", 100.0),
        ]
        for i, (txt, brand, price) in enumerate(rows):
            kw = {"text": txt, "price": price}
            if brand is not None:
                kw["brand"] = brand
            w.add_document(tt.Document(**kw))
            if i == 2:
                w.commit()  # two segments
        w.commit()
        w.close()
        return index, index.reader().searcher()

    def test_missing(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand", "missing": "N/A"}},
        })
        by_key = {b["key"]: b["doc_count"] for b in res["b"]["buckets"]}
        assert by_key == {"acme": 2, "globex": 1, "initech": 1, "N/A": 2}

    def test_missing_with_subagg(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand", "missing": "N/A"},
                  "aggs": {"p": {"sum": {"field": "price"}}}},
        })
        by_key = {b["key"]: b for b in res["b"]["buckets"]}
        assert by_key["N/A"]["p"]["value"] == 16.0
        assert by_key["acme"]["p"]["value"] == 40.0

    def test_include_regex(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand", "include": "(acme|glo.*)"}},
        })
        keys = {b["key"] for b in res["b"]["buckets"]}
        assert keys == {"acme", "globex"}

    def test_include_regex_is_full_match(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand", "include": "acm"}},
        })
        assert res["b"]["buckets"] == []

    def test_include_values_exclude_regex(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand",
                            "include": ["acme", "initech"],
                            "exclude": "ini.*"}},
        })
        keys = [b["key"] for b in res["b"]["buckets"]]
        assert keys == ["acme"]

    def test_exclude_values(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand", "exclude": ["acme"]}},
        })
        keys = {b["key"] for b in res["b"]["buckets"]}
        assert keys == {"globex", "initech"}

    def test_min_doc_count_zero(self, opt_setup):
        index, s = opt_setup
        q = index.parse_query("text:a")  # matches one doc (brand=acme)
        res = agg(s, q, {
            "b": {"terms": {"field": "brand", "min_doc_count": 0}},
        })
        by_key = {b["key"]: b["doc_count"] for b in res["b"]["buckets"]}
        assert by_key == {"acme": 1, "globex": 0, "initech": 0}

    def test_min_doc_count_filters(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand", "min_doc_count": 2}},
        })
        keys = {b["key"] for b in res["b"]["buckets"]}
        assert keys == {"acme"}

    def test_order_by_sub_metric(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand",
                            "order": {"mx": "desc"}},
                  "aggs": {"mx": {"max": {"field": "price"}}}},
        })
        keys = [b["key"] for b in res["b"]["buckets"]]
        assert keys == ["initech", "acme", "globex"]

    def test_order_by_stats_path(self, opt_setup):
        _, s = opt_setup
        res = agg(s, tt.AllQuery(), {
            "b": {"terms": {"field": "brand",
                            "order": {"st.avg": "asc"}},
                  "aggs": {"st": {"stats": {"field": "price"}}}},
        })
        keys = [b["key"] for b in res["b"]["buckets"]]
        assert keys == ["globex", "acme", "initech"]


class TestHistogramOptions:
    """Gap filling, bounds, keyed (reference `histogram.rs:60-148`)."""

    @pytest.fixture(scope="class")
    def hsetup(self):
        b = tt.Schema.builder()
        b.add_text_field("t", tt.TEXT)
        b.add_f64_field("v", tt.FAST)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer()
        for v in (1.0, 2.0, 9.0, 9.5, 30.0):
            w.add_document(tt.Document(t="x", v=v))
        w.commit()
        return index.reader().searcher()

    def run(self, s, body):
        from tantivy_tpu.aggregation import AggregationCollector

        return s.search(
            tt.AllQuery(), AggregationCollector({"h": {"histogram": body}})
        )["h"]["buckets"]

    def test_gap_filling_default(self, hsetup):
        got = self.run(hsetup, {"field": "v", "interval": 10.0})
        assert [(b["key"], b["doc_count"]) for b in got] == [
            (0.0, 4), (10.0, 0), (20.0, 0), (30.0, 1)
        ]

    def test_min_doc_count_filters(self, hsetup):
        got = self.run(
            hsetup, {"field": "v", "interval": 10.0, "min_doc_count": 1}
        )
        assert [(b["key"], b["doc_count"]) for b in got] == [
            (0.0, 4), (30.0, 1)
        ]

    def test_hard_bounds(self, hsetup):
        # hard_bounds only LIMITS buckets (reference `histogram.rs:119`:
        # "to force a range set both extended_bounds and hard_bounds")
        got = self.run(hsetup, {
            "field": "v", "interval": 10.0,
            "hard_bounds": {"min": 0.0, "max": 20.0},
        })
        assert [(b["key"], b["doc_count"]) for b in got] == [(0.0, 4)]
        got = self.run(hsetup, {
            "field": "v", "interval": 10.0,
            "hard_bounds": {"min": 0.0, "max": 20.0},
            "extended_bounds": {"min": 0.0, "max": 19.0},
        })
        assert [(b["key"], b["doc_count"]) for b in got] == [
            (0.0, 4), (10.0, 0)
        ]

    def test_extended_bounds(self, hsetup):
        got = self.run(hsetup, {
            "field": "v", "interval": 10.0,
            "extended_bounds": {"min": -20.0, "max": 40.0},
        })
        assert [b["key"] for b in got] == [
            -20.0, -10.0, 0.0, 10.0, 20.0, 30.0, 40.0
        ]
        assert got[0]["doc_count"] == 0 and got[2]["doc_count"] == 4

    def test_keyed(self, hsetup):
        got = self.run(hsetup, {
            "field": "v", "interval": 10.0, "keyed": True,
            "min_doc_count": 1,
        })
        assert isinstance(got, dict)
        assert got["0.0"]["doc_count"] == 4
        assert got["30.0"]["doc_count"] == 1


def test_range_keyed():
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    b.add_f64_field("v", tt.FAST)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    for v in (1.0, 5.0, 25.0):
        w.add_document(tt.Document(t="x", v=v))
    w.commit()
    s = index.reader().searcher()
    from tantivy_tpu.aggregation import AggregationCollector

    r = s.search(tt.AllQuery(), AggregationCollector({
        "r": {"range": {"field": "v", "keyed": True,
                        "ranges": [{"to": 10.0}, {"from": 10.0}]}}
    }))
    got = r["r"]["buckets"]
    assert isinstance(got, dict)
    assert got["*-10"]["doc_count"] == 2
    assert got["10-*"]["doc_count"] == 1


def test_histogram_gap_fill_bounded():
    """Sparse wide-range data must error on unbounded gap fill, not hang
    (review finding: finalize would materialize one bucket per interval
    step between min and max)."""
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    b.add_f64_field("v", tt.FAST)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    w.add_document(tt.Document(t="a", v=0.0))
    w.add_document(tt.Document(t="b", v=1e9))
    w.commit()
    s = index.reader().searcher()
    with pytest.raises(AggregationError):
        s.search(tt.AllQuery(), AggregationCollector(
            {"h": {"histogram": {"field": "v", "interval": 1.0}}}
        ))
    # min_doc_count=1 skips the fill and works fine
    r = s.search(tt.AllQuery(), AggregationCollector(
        {"h": {"histogram": {"field": "v", "interval": 1.0,
                             "min_doc_count": 1}}}
    ))
    assert [b_["doc_count"] for b_ in r["h"]["buckets"]] == [1, 1]
