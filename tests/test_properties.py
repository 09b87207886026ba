"""Property-based randomized invariants (reference proptest sites:
`block_search.rs:174-179`, `term_scorer.rs:211-252`, `merger.rs:1745-1757`,
`columnar/src/column_values/u64_based/tests.rs`)."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.common import bitpack
from tantivy_tpu.fastfield import _codec_decode, _codec_encode
from tantivy_tpu.fieldnorm import fieldnorm_to_id, id_to_fieldnorm
from tantivy_tpu.postings.format import PostingsSerializer, decode_term_host
from tantivy_tpu.query.phrase_query import _intersection_count_with_slop
from tantivy_tpu.termdict import TermDictionary

from test_device_ops import assert_hits_match


def random_postings(rng, max_doc=100_000):
    df = int(rng.integers(1, 600))
    docs = np.sort(rng.choice(max_doc, size=df, replace=False)).astype(np.uint32)
    tfs = rng.integers(1, 50, size=df).astype(np.uint32)
    return docs, tfs


class TestPostingsCodec:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for trial in range(50):
            ser = PostingsSerializer(avg_fieldnorm=10.0, fieldnorm_ids=None)
            expected = []
            for _ in range(int(rng.integers(1, 8))):
                docs, tfs = random_postings(rng)
                ser.serialize_term(docs, tfs)
                expected.append((docs, tfs))
            arrays = ser.finish()
            for t, (docs, tfs) in enumerate(expected):
                d, f = decode_term_host(arrays, t)
                np.testing.assert_array_equal(d, docs)
                np.testing.assert_array_equal(f, tfs)

    def test_block_max_upper_bounds_every_doc(self):
        # the stored block-max (fnid, tf) pair must upper-bound every doc's
        # BM25 tf-factor in its block — the WAND safety invariant
        from tantivy_tpu.query.bm25 import compute_tf_cache

        rng = np.random.default_rng(1)
        for _ in range(20):
            max_doc = 5000
            norm_ids = rng.integers(0, 256, size=max_doc).astype(np.uint8)
            avg = float(rng.uniform(1, 100))
            ser = PostingsSerializer(avg_fieldnorm=avg, fieldnorm_ids=norm_ids)
            docs, tfs = random_postings(rng, max_doc=max_doc)
            ser.serialize_term(docs, tfs)
            arrays = ser.finish()
            cache = compute_tf_cache(np.float32(avg))
            tf_f = tfs.astype(np.float32)
            factors = tf_f / (tf_f + cache[norm_ids[docs]])
            for b in range(int(arrays["term_num_blocks"][0])):
                lo, hi = b * 128, min((b + 1) * 128, len(docs))
                bmax_tf = np.float32(arrays["blk_max_tf"][b])
                bmax = bmax_tf / (
                    bmax_tf + cache[arrays["blk_max_fnid"][b]]
                )
                assert (factors[lo:hi] <= bmax + 1e-7).all()


class TestWandThresholdBoundary:
    @pytest.mark.parametrize("k", [1, 3, 10])
    def test_batched_equals_exhaustive(self, k):
        from tantivy_tpu.parallel import BatchExecutor

        from test_device_ops import build_random_index

        rng = np.random.default_rng(k)
        # small vocab -> massive score ties: hammers the prune margin
        index, words = build_random_index(
            num_docs=500, vocab=8, num_commits=2, seed=100 + k
        )
        searcher = index.reader().searcher()
        ex = BatchExecutor(searcher)
        queries = []
        for _ in range(30):
            a, b = rng.choice(len(words), 2, replace=False)
            occ = tt.Occur.MUST if rng.random() < 0.5 else tt.Occur.SHOULD
            queries.append(
                tt.BooleanQuery([(occ, tt.TermQuery(tt.Term.from_field_text("body", words[a]))),
                                 (occ, tt.TermQuery(tt.Term.from_field_text("body", words[b])))])
            )
        for q, dev in zip(queries, ex.search_batch(queries, k)):
            host = searcher.search(q, tt.TopDocs(k))
            assert_hits_match(dev, host, context=repr(q))


class TestSloppyPhrase:
    def test_two_term_count_positive_iff_pair_within_slop(self):
        rng = np.random.default_rng(3)
        for _ in range(300):
            left = sorted(rng.choice(60, size=rng.integers(1, 10), replace=False))
            right = sorted(rng.choice(60, size=rng.integers(1, 10), replace=False))
            slop = int(rng.integers(0, 5))
            count, _ = _intersection_count_with_slop(
                [int(x) for x in left], [int(x) for x in right], slop, False
            )
            brute = any(abs(a - b) <= slop for a in left for b in right)
            assert (count > 0) == brute, (left, right, slop)

    def test_exact_intersection_is_brute_force(self):
        from tantivy_tpu.query.phrase_query import _phrase_count_for_doc

        rng = np.random.default_rng(4)
        for _ in range(200):
            n_terms = int(rng.integers(2, 5))
            pos = [
                np.sort(rng.choice(40, size=rng.integers(1, 8), replace=False))
                .astype(np.uint32)
                for _ in range(n_terms)
            ]
            offsets = list(range(n_terms))
            got = _phrase_count_for_doc(pos, offsets, 0)
            base = set(int(p) for p in pos[0])
            for i in range(1, n_terms):
                base &= {int(p) - i for p in pos[i]}
            assert got == len(base)


class TestMergeWithDeletes:
    def test_merge_preserves_search_results(self):
        rng = np.random.default_rng(5)
        b = tt.Schema.builder()
        b.add_text_field("body", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        words = [f"w{i}" for i in range(15)]
        for c in range(3):
            for _ in range(120):
                w.add_document(
                    tt.Document(body=" ".join(rng.choice(words, 8)))
                )
            w.commit()
        w.delete_term(tt.Term.from_field_text("body", words[0]))
        w.commit()
        searcher = index.reader().searcher()
        before = {
            wd: searcher.search(
                tt.TermQuery(tt.Term.from_field_text("body", wd)), tt.Count()
            )
            for wd in words
        }
        before_top = searcher.search(
            tt.BooleanQuery.union([
                tt.TermQuery(tt.Term.from_field_text("body", words[1])),
                tt.TermQuery(tt.Term.from_field_text("body", words[2])),
            ]),
            tt.TopDocs(10),
        )
        w.merge([s.segment_id for s in index.searchable_segment_metas()])
        w.close()
        searcher2 = index.reader().searcher()
        assert len(searcher2.segment_readers()) == 1
        after = {
            wd: searcher2.search(
                tt.TermQuery(tt.Term.from_field_text("body", wd)), tt.Count()
            )
            for wd in words
        }
        assert before == after
        assert before[words[0]] == 0
        # NOTE: scores legitimately change across this merge — physically
        # dropping deleted docs changes the global stats (idf/avg fieldnorm),
        # exactly as in the reference. Exact score preservation is asserted
        # in test_merge_without_deletes_preserves_scores.
        after_top = searcher2.search(
            tt.BooleanQuery.union([
                tt.TermQuery(tt.Term.from_field_text("body", words[1])),
                tt.TermQuery(tt.Term.from_field_text("body", words[2])),
            ]),
            tt.TopDocs(10),
        )
        assert len(after_top) == len(before_top)

    def test_merge_without_deletes_preserves_scores(self):
        rng = np.random.default_rng(8)
        b = tt.Schema.builder()
        b.add_text_field("body", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        words = [f"w{i}" for i in range(12)]
        for _ in range(3):
            for _ in range(100):
                w.add_document(
                    tt.Document(body=" ".join(rng.choice(words, 8)))
                )
            w.commit()
        searcher = index.reader().searcher()
        q = tt.BooleanQuery.union([
            tt.TermQuery(tt.Term.from_field_text("body", words[1])),
            tt.TermQuery(tt.Term.from_field_text("body", words[2])),
        ])
        before_top = searcher.search(q, tt.TopDocs(10))
        w.merge([s.segment_id for s in index.searchable_segment_metas()])
        w.close()
        searcher2 = index.reader().searcher()
        after_top = searcher2.search(q, tt.TopDocs(10))
        # no deletes -> stats unchanged -> exact f32 score preservation;
        # merged doc ids are the stacked originals, so order matches too
        assert [float(s) for s, _ in before_top] == [
            float(s) for s, _ in after_top
        ]


class TestColumnCodecProperty:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(6)
        specials = np.array(
            [0, 1, 2**31, 2**32, 2**53, 2**62, 2**63, 2**64 - 1],
            dtype=np.uint64,
        )
        for _ in range(60):
            n = int(rng.integers(0, 400))
            kind = rng.integers(0, 3)
            if kind == 0:  # narrow range
                vals = rng.integers(10_000, 10_050, size=n).astype(np.uint64)
            elif kind == 1:  # near-linear
                vals = (
                    np.arange(n, dtype=np.uint64) * np.uint64(123)
                    + rng.integers(0, 7, size=n).astype(np.uint64)
                )
            else:  # wild, incl. extremes
                vals = rng.choice(specials, size=n).astype(np.uint64)
            enc = _codec_encode(vals)
            arrays = {f"x/{kk}": v for kk, v in enc.items()}
            np.testing.assert_array_equal(_codec_decode(arrays, "x/"), vals)


class TestFieldnormTable:
    def test_floor_encode(self):
        # fieldnorm_to_id must be the floor index of the decode table
        from tantivy_tpu.fieldnorm import FIELD_NORMS_TABLE

        for v in list(range(0, 300)) + [1000, 65535, 65536, 10**7]:
            i = fieldnorm_to_id(v)
            assert id_to_fieldnorm(i) <= v
            if i < 255:
                assert id_to_fieldnorm(i + 1) > v


class TestTermDictProperty:
    def test_random_keys_roundtrip_and_lookup(self):
        rng = np.random.default_rng(7)
        for _ in range(10):
            n = int(rng.integers(1, 300))
            keys = sorted(
                {
                    bytes(rng.integers(0, 256, size=rng.integers(0, 12)).astype(np.uint8))
                    for _ in range(n)
                }
            )
            td = TermDictionary.from_arrays(
                TermDictionary.from_sorted_terms(keys).to_arrays()
            )
            assert [td.term(i) for i in range(len(td))] == keys
            ords = td.term_ords(keys)
            assert list(ords) == list(range(len(keys)))
            for _ in range(20):
                probe = bytes(
                    rng.integers(0, 256, size=rng.integers(0, 12)).astype(np.uint8)
                )
                got = td.term_ord(probe)
                want = keys.index(probe) if probe in keys else None
                assert got == want


def test_slop2_vectorized_matches_scalar():
    """The batched two-pointer slop automaton must agree with the scalar
    reference implementation on random position lists."""
    import numpy as np

    from tantivy_tpu.query.phrase_query import (
        _intersection_count_with_slop,
        _slop2_counts_vectorized,
    )

    rng = np.random.default_rng(99)
    D = 300
    lpads, rpads, llens, rlens = [], [], [], []
    Lmax = Rmax = 12
    expected = []
    for _ in range(D):
        ll = int(rng.integers(1, Lmax + 1))
        rl = int(rng.integers(1, Rmax + 1))
        left = np.sort(rng.choice(60, ll, replace=False)).astype(np.int64)
        right = np.sort(rng.choice(60, rl, replace=False)).astype(np.int64)
        lp = np.zeros(Lmax, dtype=np.int64)
        rp = np.zeros(Rmax, dtype=np.int64)
        lp[:ll] = left
        rp[:rl] = right
        lpads.append(lp)
        rpads.append(rp)
        llens.append(ll)
        rlens.append(rl)
    for slop in (1, 2, 5):
        for i in range(D):
            c, _ = _intersection_count_with_slop(
                list(lpads[i][: llens[i]]), list(rpads[i][: rlens[i]]),
                slop, False,
            )
            expected.append(c)
        got = _slop2_counts_vectorized(
            np.stack(lpads), np.array(llens), np.stack(rpads),
            np.array(rlens), slop,
        )
        assert list(got) == expected, slop
        expected = []


def test_slop_phrase_end_to_end_matches_bruteforce():
    import numpy as np

    import tantivy_tpu as tt

    rng = np.random.default_rng(4)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    words = ["aa", "bb", "cc"]
    for _ in range(300):
        w.add_document(
            tt.Document(body=" ".join(rng.choice(words, 12)))
        )
    w.commit()
    w.close()
    s = index.reader().searcher()
    for slop in (1, 3):
        q = tt.PhraseQuery("body", ["aa", "bb"], slop=slop)
        hits = s.search(q, tt.TopDocs(300))
        # per-doc scalar recomputation via the reference algorithm
        from tantivy_tpu.query.phrase_query import (
            _intersection_count_with_slop,
        )

        reader = s.segment_readers()[0]
        inv = reader.inverted_index("body")
        store = reader  # doc text via positions
        got = {a.doc_id for _, a in hits}
        oa = inv.term_ord(b"aa")
        ob = inv.term_ord(b"bb")
        da, ta, pa = inv.positions_for_term(oa)[:3]
        db, tb_, pb = inv.positions_for_term(ob)[:3]
        ca = np.concatenate([[0], np.cumsum(ta)])
        cb = np.concatenate([[0], np.cumsum(tb_)])
        expect = set()
        for i, d in enumerate(da):
            j = np.searchsorted(db, d)
            if j >= len(db) or db[j] != d:
                continue
            la = list(pa[int(ca[i]) : int(ca[i + 1])].astype(np.int64) + 1)
            lb = list(pb[int(cb[j]) : int(cb[j + 1])].astype(np.int64))
            c, _ = _intersection_count_with_slop(la, lb, slop, False)
            if c > 0:
                expect.add(int(d))
        assert got == expect, (slop, got ^ expect)
