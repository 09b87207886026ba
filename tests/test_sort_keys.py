"""General TopDocs sort keys vs a brute-force model (reference
`src/collector/sort_key/` semantics: component comparators compared
lexicographically, TopDocs keeps the k greatest, DocAddress-ascending
tie-break; Order::Asc == ReverseNoneLower — missing values last in both
asc and desc output, `order.rs:287-292`)."""

import random

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.collector.sort_key import _COMPARATORS


def _build(seed=0, n=120, segments=3):
    rng = random.Random(seed)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    b.add_u64_field("popularity", tt.FAST)
    b.add_i64_field("delta", tt.FAST)
    b.add_f64_field("ratio", tt.FAST)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    from tantivy_tpu.indexer.merge_policy import NoMergePolicy

    w.set_merge_policy(NoMergePolicy())
    model = []  # (DocAddress, dict)
    per_seg = n // segments
    for s in range(segments):
        for i in range(per_seg):
            doc = {"body": "apple " + ("pie " * rng.randrange(3))}
            if rng.random() < 0.8:
                doc["popularity"] = rng.randrange(20)
            if rng.random() < 0.8:
                doc["delta"] = rng.randrange(-10, 10)
            if rng.random() < 0.8:
                doc["ratio"] = round(rng.uniform(-2, 2), 3)
            w.add_document(tt.Document(**doc))
            model.append((tt.DocAddress(s, i), doc))
        w.commit()
    return index, model


def _brute(model, scores, components, k):
    """Top-k greatest under the component comparators."""
    import functools

    def cmp(a, b):
        for (field, cname), in_a, in_b in zip(
            components,
            [a] * len(components),
            [b] * len(components),
        ):
            none_first, asc = _COMPARATORS[cname]
            va = scores[in_a[0]] if field == "_score" else in_a[1].get(field)
            vb = scores[in_b[0]] if field == "_score" else in_b[1].get(field)
            if va is None or vb is None:
                if va is None and vb is None:
                    continue
                return -1 if (va is None) == none_first else 1
            if va != vb:
                wins_a = (va < vb) if asc else (va > vb)
                return -1 if wins_a else 1
        return -1 if a[0] < b[0] else 1

    ranked = sorted(model, key=functools.cmp_to_key(cmp))
    return [addr for addr, _ in ranked[:k]]


CASES = [
    [("popularity", "natural")],
    [("popularity", "reverse_none_lower")],
    [("delta", "natural")],
    [("delta", "reverse_none_lower")],
    [("ratio", "natural_none_higher")],
    [("ratio", "reverse")],
    [("popularity", "natural"), ("delta", "reverse_none_lower")],
    [("popularity", "reverse_none_lower"), ("_score", "natural")],
    [("_score", "natural"), ("ratio", "natural")],
    [("popularity", "natural"), ("delta", "natural"),
     ("ratio", "reverse_none_lower"), ("_score", "natural")],
]


@pytest.mark.parametrize("components", CASES)
def test_order_by_matches_bruteforce(components):
    index, model = _build(seed=hash(str(components)) % 1000)
    searcher = index.reader().searcher()
    q = index.parse_query("apple", ["body"])

    # model scores: collect real BM25 per address
    scored = searcher.search(q, tt.TopDocs(len(model)))
    scores = {addr: float(s) for s, addr in scored}

    comps = [
        (tt.SortByScore() if f == "_score" else tt.SortByFastField(f), c)
        for f, c in components
    ]
    got = searcher.search(q, tt.TopDocs(10).order_by(comps))
    want = _brute(model, scores, components, 10)
    assert [addr for _, addr in got] == want, components


def test_order_by_asc_desc_shorthand():
    index, model = _build(seed=5)
    searcher = index.reader().searcher()
    q = index.parse_query("apple", ["body"])
    got = searcher.search(
        q, tt.TopDocs(8).order_by([(tt.SortByFastField("popularity"), "asc")])
    )
    want = _brute(model, {}, [("popularity", "reverse_none_lower")], 8)
    assert [addr for _, addr in got] == want
    # decoded key values ride the fruit
    vals = [v for v, _ in got]
    present = [v for v in vals if v is not None]
    assert present == sorted(present)

    got_d = searcher.search(
        q, tt.TopDocs(8).order_by((tt.SortByFastField("popularity"), "desc"))
    )
    want_d = _brute(model, {}, [("popularity", "natural")], 8)
    assert [addr for _, addr in got_d] == want_d


def test_order_by_single_component_matches_order_by_score():
    index, model = _build(seed=9)
    searcher = index.reader().searcher()
    q = index.parse_query("apple pie", ["body"])
    base = searcher.search(q, tt.TopDocs(10))
    via = searcher.search(q, tt.TopDocs(10).order_by(tt.SortByScore()))
    assert [addr for _, addr in via] == [addr for _, addr in base]
    for (v, _), (s, _) in zip(via, base):
        assert np.float32(v) == np.float32(s)


def test_order_by_callable():
    index, model = _build(seed=11)
    searcher = index.reader().searcher()
    q = index.parse_query("apple", ["body"])

    def computer(reader):
        col = reader.fast_fields().column("popularity")

        def key(doc, score):
            raw, present = col.first_u64s(np.asarray([doc]))
            pop = float(raw[0]) if present[0] else 0.0
            return score + 0.1 * pop

        return key

    got = searcher.search(
        q, tt.TopDocs(5).order_by(tt.SortByCallable(computer))
    )
    scored = searcher.search(q, tt.TopDocs(len(model)))
    scores = {addr: float(s) for s, addr in scored}
    want = sorted(
        model,
        key=lambda m: (
            -(scores[m[0]] + 0.1 * m[1].get("popularity", 0)), m[0]
        ),
    )[:5]
    assert [addr for _, addr in got] == [addr for addr, _ in want]
