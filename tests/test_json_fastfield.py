"""JSON-path dynamic fast-field columns (reference
`columnar/src/columnar/writer/mod.rs:50` per-path columns +
`src/fastfield/readers.rs:64-101` `field.path` resolution): aggregations
and range queries over `json_field.path` round-trip against plain-numpy
recomputes from the source data.
"""

import collections

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.aggregation import AggregationCollector
from tantivy_tpu.collector import Count
from tantivy_tpu.query.range_query import RangeQuery


@pytest.fixture(scope="module")
def jindex():
    b = tt.Schema.builder()
    b.add_json_field("attrs", tt.TEXT | tt.FAST)
    idx = tt.Index.create_in_ram(b.build())
    w = idx.writer_for_tests()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(1500):
        q = int(rng.integers(0, 40))
        rows.append(q)
        doc = {
            "qty": q,
            "price": float(q) + 0.25,
            "tag": f"t{q % 7}",
            "nested": {"deep": q * 3},
            "multi": [q, q + 1],
        }
        if q % 10 == 0:
            doc["sparse"] = q  # optional-cardinality path
        w.add_document(tt.Document(attrs=doc))
        if i == 700:
            w.commit()  # two segments
    w.commit()
    w.close()
    return idx.reader().searcher(), rows


def test_stats_over_json_path(jindex):
    s, rows = jindex
    r = s.search(
        tt.AllQuery(),
        AggregationCollector({"st": {"stats": {"field": "attrs.qty"}}}),
    )
    arr = np.array(rows, dtype=np.float64)
    assert r["st"]["count"] == len(rows)
    assert r["st"]["min"] == arr.min()
    assert r["st"]["max"] == arr.max()
    assert r["st"]["avg"] == pytest.approx(arr.mean(), rel=1e-12)


def test_terms_over_json_str_path(jindex):
    s, rows = jindex
    r = s.search(
        tt.AllQuery(),
        AggregationCollector(
            {"t": {"terms": {"field": "attrs.tag", "size": 20}}}
        ),
    )
    got = {b["key"]: b["doc_count"] for b in r["t"]["buckets"]}
    assert got == dict(collections.Counter(f"t{q % 7}" for q in rows))


def test_range_over_nested_json_path(jindex):
    s, rows = jindex
    cnt = s.search(RangeQuery("attrs.nested.deep", lower=9, upper=30), Count())
    assert cnt == sum(1 for q in rows if 9 <= q * 3 <= 30)


def test_range_over_json_float_path(jindex):
    s, rows = jindex
    cnt = s.search(RangeQuery("attrs.price", lower=3.0, upper=8.0), Count())
    assert cnt == sum(1 for q in rows if 3.0 <= q + 0.25 <= 8.0)


def test_multi_and_sparse_json_paths(jindex):
    s, rows = jindex
    # multi-valued path: doc matches when ANY value is in range
    cnt = s.search(RangeQuery("attrs.multi", lower=5, upper=5), Count())
    assert cnt == sum(1 for q in rows if q == 5 or q + 1 == 5)
    # sparse path: only docs with the key
    r = s.search(
        tt.AllQuery(),
        AggregationCollector(
            {"v": {"value_count": {"field": "attrs.sparse"}}}
        ),
    )
    assert r["v"]["value"] == sum(1 for q in rows if q % 10 == 0)


def test_int_float_promotion():
    b = tt.Schema.builder()
    b.add_json_field("j", tt.TEXT | tt.FAST)
    idx = tt.Index.create_in_ram(b.build())
    w = idx.writer_for_tests()
    w.add_document(tt.Document(j={"x": 1}))
    w.add_document(tt.Document(j={"x": 2.5}))
    w.commit()
    w.close()
    s = idx.reader().searcher()
    r = s.search(
        tt.AllQuery(),
        AggregationCollector({"st": {"stats": {"field": "j.x"}}}),
    )
    assert r["st"]["count"] == 2 and r["st"]["sum"] == 3.5
