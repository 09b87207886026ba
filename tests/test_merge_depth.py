"""Merge depth tests, modeled on the reference's merger test battery
(`/root/reference/src/indexer/merger.rs:1012-2061`,
`merger_sorted_index_test.rs:152-908`): randomized op-sequence merge
equivalence, deletes (partial / whole-segment / all), sorted-index merges
with deletes, multivalued and missing fast values, facet merges, and
Block-WAND (skip/bmax) integrity after merge."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.index import IndexSettings


def _mk_index(sort=None, with_fast=True, with_facet=False):
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT | tt.STORED_TEXT)
    b.add_u64_field("id", tt.FAST | tt.INDEXED | tt.STORED)
    if with_fast:
        b.add_u64_field("val", tt.FAST | tt.STORED)
    if with_facet:
        b.add_facet_field("cat")
    settings = IndexSettings(sort_by_field=sort) if sort else None
    return tt.Index.create_in_ram(b.build(), settings=settings)


def _merge_all(index, w):
    metas = index.searchable_segment_metas()
    if len(metas) > 1:
        w.merge([s.segment_id for s in metas])
        w.wait_merging_threads()


def _doc_table(searcher):
    """(id -> stored body/val) over alive docs, plus the alive count."""
    out = {}
    for r in searcher.segment_readers():
        alive = r.alive_bitset()
        for d in range(r.max_doc):
            if alive is not None and not alive[d]:
                continue
            doc = r.doc(d)
            out[doc.get_first("id")] = (
                doc.get_first("body"), doc.get_first("val")
            )
    return out


class TestMergeEquivalence:
    """Merged multi-segment index == the same ops applied live."""

    @pytest.mark.parametrize("seed", [0, 7])
    def test_randomized_ops_merge_equivalence(self, seed):
        rng = np.random.default_rng(seed)
        words = [f"w{i}" for i in range(12)]
        index = _mk_index()
        w = index.writer_for_tests()
        live = {}
        next_id = 0
        for _commit in range(4):
            for _ in range(30):
                op = rng.random()
                if op < 0.75 or not live:
                    body = " ".join(rng.choice(words, 5))
                    val = int(rng.integers(0, 100))
                    w.add_document(
                        tt.Document(body=body, id=next_id, val=val)
                    )
                    live[next_id] = (body, val)
                    next_id += 1
                else:
                    victim = int(rng.choice(list(live)))
                    w.delete_term(tt.Term.from_field_u64("id", victim))
                    del live[victim]
            w.commit()
        _merge_all(index, w)
        w.close()
        searcher = index.reader().searcher()
        assert len(searcher.segment_readers()) == 1
        assert _doc_table(searcher) == live
        # postings survive: every live doc reachable by a term of its body
        for i, (body, _) in list(live.items())[:20]:
            q = tt.BooleanQuery.intersection([
                tt.TermQuery(tt.Term.from_field_text("body", body.split()[0])),
                tt.TermQuery(tt.Term.from_field_u64("id", i)),
            ])
            assert searcher.search(q, tt.Count()) >= 1

    def test_merge_drops_whole_deleted_segment(self):
        index = _mk_index()
        w = index.writer_for_tests()
        for i in range(10):
            w.add_document(tt.Document(body="alpha", id=i, val=i))
        w.commit()
        for i in range(10, 20):
            w.add_document(tt.Document(body="beta", id=i, val=i))
        w.commit()
        # wipe segment 1 entirely
        w.delete_query(tt.TermQuery(tt.Term.from_field_text("body", "beta")))
        w.commit()
        _merge_all(index, w)
        w.close()
        searcher = index.reader().searcher()
        assert searcher.search(tt.AllQuery(), tt.Count()) == 10
        assert searcher.search(
            tt.TermQuery(tt.Term.from_field_text("body", "beta")), tt.Count()
        ) == 0
        # merged docstore has no tombstone rows
        assert _doc_table(searcher) == {
            i: ("alpha", i) for i in range(10)
        }

    def test_merge_all_docs_deleted(self):
        # reference test_merge_multivalued_int_fields_all_deleted
        index = _mk_index()
        w = index.writer_for_tests()
        for c in range(2):
            for i in range(5):
                w.add_document(
                    tt.Document(body="x", id=c * 5 + i, val=i)
                )
            w.commit()
        w.delete_term(tt.Term.from_field_text("body", "x"))
        w.commit()
        _merge_all(index, w)
        w.close()
        searcher = index.reader().searcher()
        assert searcher.search(tt.AllQuery(), tt.Count()) == 0


class TestSortedMerge:
    """Sorted-index merges keep global sort across segment boundaries
    (reference merger_sorted_index_test.rs:172-302)."""

    @pytest.mark.parametrize("order", ["asc", "desc"])
    def test_interleaved_values_resort(self, order):
        # segment values are NOT disjunct: merge must interleave
        index = _mk_index(sort=("val", order))
        w = index.writer_for_tests()
        rng = np.random.default_rng(3)
        vals = rng.permutation(40)
        for c in range(2):
            for v in vals[c::2]:
                w.add_document(
                    tt.Document(body=f"v{v}", id=int(v), val=int(v))
                )
            w.commit()
        _merge_all(index, w)
        w.close()
        r = index.reader().searcher().segment_readers()[0]
        col = r.fast_fields().column("val")
        got = [col.first(d) for d in range(r.max_doc)]
        assert got == sorted(got, reverse=(order == "desc"))
        # the docstore rides along with the sort permutation
        for d in range(r.max_doc):
            doc = r.doc(d)
            assert doc.get_first("body") == f"v{doc.get_first('val')}"

    def test_sorted_merge_with_deletes(self):
        # reference test_merge_sorted_index_str_with_deletes analogue
        index = _mk_index(sort=("val", "asc"))
        w = index.writer_for_tests()
        for c in range(2):
            for i in range(20):
                v = c * 20 + i
                w.add_document(tt.Document(body=f"v{v}", id=v, val=v))
            w.commit()
        for v in range(0, 40, 3):
            w.delete_term(tt.Term.from_field_u64("id", v))
        w.commit()
        _merge_all(index, w)
        w.close()
        searcher = index.reader().searcher()
        r = searcher.segment_readers()[0]
        assert r.alive_bitset() is None  # deletes compacted away
        col = r.fast_fields().column("val")
        got = [col.first(d) for d in range(r.max_doc)]
        assert got == sorted(v for v in range(40) if v % 3 != 0)


class TestMergedStructures:
    def test_blockwand_tables_after_merge(self):
        """Merged postings must keep exact block-max/skip info: device
        (pruned) results == host results (reference
        test_merged_index_has_blockwand, merger.rs:1990)."""
        from tantivy_tpu.parallel import BatchExecutor

        index = _mk_index()
        w = index.writer_for_tests()
        rng = np.random.default_rng(11)
        words = [f"t{i}" for i in range(30)]
        zipf = (1.0 / np.arange(1, 31)) / (1.0 / np.arange(1, 31)).sum()
        n = 0
        for c in range(3):
            for _ in range(120):
                body = " ".join(rng.choice(words, 8, p=zipf))
                w.add_document(tt.Document(body=body, id=n, val=n))
                n += 1
            w.commit()
        # a few deletes so the merge remaps doc ids
        for v in range(0, n, 17):
            w.delete_term(tt.Term.from_field_u64("id", v))
        w.commit()
        _merge_all(index, w)
        w.close()
        searcher = index.reader().searcher()
        ex = BatchExecutor(searcher)
        queries = [
            tt.BooleanQuery.union([
                tt.TermQuery(tt.Term.from_field_text("body", a)),
                tt.TermQuery(tt.Term.from_field_text("body", b)),
            ])
            for a, b in zip(words[:8], words[8:16])
        ] + [
            tt.BooleanQuery.intersection([
                tt.TermQuery(tt.Term.from_field_text("body", a)),
                tt.TermQuery(tt.Term.from_field_text("body", b)),
            ])
            for a, b in zip(words[:4], words[4:8])
        ]
        dev = ex.search_batch(queries, 10)
        for q, d in zip(queries, dev):
            h = searcher.search(q, tt.TopDocs(10))
            assert [(s, a) for s, a in d] == [(s, a) for s, a in h], q

    def test_facet_counts_after_merge(self):
        # reference test_merge_facets (merger.rs:1537)
        index = _mk_index(with_facet=True)
        w = index.writer_for_tests()
        cats = ["/a/x", "/a/y", "/b/z"]
        n = 0
        for c in range(3):
            for i in range(15):
                w.add_document(
                    tt.Document(
                        body="f", id=n, val=n, cat=cats[n % 3]
                    )
                )
                n += 1
            w.commit()
        w.delete_term(tt.Term.from_field_u64("id", 0))
        w.commit()
        _merge_all(index, w)
        w.close()
        searcher = index.reader().searcher()
        fc = tt.FacetCollector("cat")
        fc.add_facet("/a")
        counts = {
            f.to_path_string(): c
            for f, c in searcher.search(tt.AllQuery(), fc).get("/a")
        }
        assert counts == {"/a/x": 14, "/a/y": 15}

    def test_multivalued_fast_after_merge(self):
        # reference test_merge_multivalued_int_fields_simple
        b = tt.Schema.builder()
        b.add_u64_field("id", tt.FAST | tt.INDEXED)
        b.add_u64_field("vals", tt.FAST)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        expect = {}
        n = 0
        for c in range(2):
            for i in range(8):
                vv = list(range(i % 3))  # 0, 1 or 2 values
                w.add_document(tt.Document(id=n, vals=vv))
                expect[n] = vv
                n += 1
            w.commit()
        _merge_all(index, w)
        w.close()
        searcher = index.reader().searcher()
        r = searcher.segment_readers()[0]
        idc = r.fast_fields().column("id")
        vc = r.fast_fields().column("vals")
        got = {}
        for d in range(r.max_doc):
            got[idc.first(d)] = list(vc.values_for_doc(d))
        assert got == expect


class TestMergeStructures:
    """Positions, JSON path columns and optional columns across merges
    (reference `merger.rs` positions DeltaComputer re-encode `:128`, columnar
    `merge_columnar` with Shuffle order)."""

    def test_phrase_positions_after_sorted_merge(self):
        index = _mk_index(sort=("id", "desc"))
        w = index.writer()
        phrases = {}
        n = 0
        for seg in range(3):
            for i in range(40):
                body = f"alpha w{n % 7} beta gamma w{(n + 1) % 5} delta"
                w.add_document(tt.Document(body=body, id=n, val=n % 9))
                phrases[n] = body
                n += 1
            w.commit()
        # delete a slice, merge, then phrase-query the merged index
        for d in range(10, 20):
            w.delete_term(tt.Term.from_field_u64("id", d))
            phrases.pop(d)
        w.commit()
        _merge_all(index, w)
        s = index.reader().searcher()
        assert len(s.segment_readers()) == 1
        q = tt.PhraseQuery("body", ["beta", "gamma"])
        assert s.search(q, tt.Count()) == len(phrases)
        q2 = tt.PhraseQuery("body", ["gamma", "beta"])
        assert s.search(q2, tt.Count()) == 0
        # a positions-sensitive 3-term phrase still matches after remap
        q3 = tt.PhraseQuery("body", ["beta", "gamma", "w0"])
        want = sum(
            1 for t in phrases.values() if "beta gamma w0" in t
        )
        assert s.search(q3, tt.Count()) == want

    def test_json_paths_after_merge(self):
        b = tt.Schema.builder()
        b.add_text_field("t", tt.TEXT)
        b.add_json_field("j", tt.TEXT | tt.FAST)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer()
        rng = np.random.default_rng(2)
        vals = []
        for seg in range(3):
            for i in range(30):
                v = int(rng.integers(0, 6))
                w.add_document(tt.Document(
                    t=f"d{len(vals)}",
                    j={"a": {"b": v}, "tag": f"k{v % 3}"},
                ))
                vals.append(v)
            w.commit()
        _merge_all(index, w)
        s = index.reader().searcher()
        assert len(s.segment_readers()) == 1
        from tantivy_tpu.aggregation import AggregationCollector

        res = s.search(tt.AllQuery(), AggregationCollector(
            {"x": {"terms": {"field": "j.a.b", "size": 100}}}
        ))
        got = {bu["key"]: bu["doc_count"] for bu in res["x"]["buckets"]}
        import collections

        want = collections.Counter(float(v) for v in vals)
        assert got == dict(want)
        q = index.parse_query("j.tag:k1", ["t"])
        assert s.search(q, tt.Count()) == sum(1 for v in vals if v % 3 == 1)

    def test_optional_column_after_sorted_merge(self):
        b = tt.Schema.builder()
        b.add_text_field("t", tt.TEXT)
        b.add_u64_field("id", tt.FAST | tt.INDEXED)
        b.add_f64_field("opt", tt.FAST)
        index = tt.Index.create_in_ram(
            b.build(), settings=IndexSettings(sort_by_field=("id", "asc"))
        )
        w = index.writer()
        present = {}
        n = 0
        rng = np.random.default_rng(3)
        for seg in range(3):
            for i in range(25):
                d = tt.Document(t=f"d{n}", id=n)
                if rng.random() < 0.6:
                    d.add_f64("opt", float(n) * 0.25)
                    present[n] = float(n) * 0.25
                w.add_document(d)
                n += 1
            w.commit()
        _merge_all(index, w)
        s = index.reader().searcher()
        r = s.segment_readers()[0]
        ids = r.fast_fields().column("id").values
        assert list(ids) == sorted(range(n))  # global k-way sorted order
        col = r.fast_fields().column("opt")
        got = {
            int(ids[d]): v
            for d, v in zip(col.present_docs, _opt_values(col))
        }
        assert got == present


def _opt_values(col):
    from tantivy_tpu.schema.term import u64_to_f64_array

    return u64_to_f64_array(col.values)
