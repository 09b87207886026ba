"""Device-path exactness: the jnp decode/score/top-k pipeline vs the host
(numpy) engine on the same index.

Integer paths (block decode, doc ids) must match bit-for-bit. Scores may
deviate by a few ulp because XLA lowers f32 division to a reciprocal-refine
sequence that is not IEEE correctly-rounded (verified empirically on the CPU
backend; TPU hardware division is likewise approximate). Doc ranking must
still agree whenever score gaps exceed that noise floor.
"""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor


def assert_hits_match(device_hits, host_hits, context=""):
    """Same docs in the same order; scores within 4 ulp. Adjacent swaps are
    tolerated only when the two scores are within the ulp noise floor."""
    assert len(device_hits) == len(host_hits), (context, device_hits, host_hits)
    host_map = {a: s for s, a in host_hits}
    dev_map = {a: s for s, a in device_hits}
    assert set(host_map) == set(dev_map), (context, device_hits, host_hits)
    for addr, hs in host_map.items():
        ds = dev_map[addr]
        ulp = np.spacing(np.float32(abs(hs))) if hs != 0 else np.float32(1e-30)
        assert abs(np.float32(ds) - np.float32(hs)) <= 4 * ulp, (context, addr, ds, hs)
    # order: allow permutations only among near-tied scores
    for i, ((ds, da), (hs, ha)) in enumerate(zip(device_hits, host_hits)):
        if da != ha:
            ulp = np.spacing(np.float32(abs(hs))) if hs != 0 else np.float32(1e-30)
            assert abs(np.float32(dev_map[ha]) - np.float32(hs)) <= 8 * ulp, (
                context, i, device_hits, host_hits,
            )


def build_random_index(num_docs=500, vocab=40, seed=3, num_commits=2):
    rng = np.random.default_rng(seed)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer_for_tests()
    words = [f"w{i}" for i in range(vocab)]
    per_commit = num_docs // num_commits
    for c in range(num_commits):
        for _ in range(per_commit):
            n = int(rng.integers(1, 30))
            text = " ".join(rng.choice(words, n))
            w.add_document(tt.Document(body=text))
        w.commit()
    w.close()
    return index, words


class TestDecodeKernels:
    @pytest.mark.parametrize("bits", [0, 1, 2, 4, 8, 16, 32])
    def test_unpack_matches_host(self, bits):
        import jax.numpy as jnp

        from tantivy_tpu.common import bitpack
        from tantivy_tpu.ops.decode import unpack_rows

        rng = np.random.default_rng(bits)
        n = 8
        if bits == 0:
            vals = np.zeros((n, 128), dtype=np.uint32)
        else:
            vals = rng.integers(0, 2 ** min(bits, 31), (n, 128)).astype(np.uint32)
        words = np.stack([bitpack.pack(v, bits) for v in vals])
        out = np.asarray(unpack_rows(jnp.asarray(words), bits))
        np.testing.assert_array_equal(out, vals)

    @pytest.mark.parametrize("mode", ["dense", "packed"])
    def test_gather_blocks_matches_host_decode(self, mode):
        from tantivy_tpu.ops.device_index import DeviceSegment
        from tantivy_tpu.postings.format import decode_block_host, TERMINATED

        index, _ = build_random_index(num_commits=1)
        reader = index.reader().searcher().segment_readers()[0]
        dseg = DeviceSegment(reader, mode=mode)
        dfp = dseg.field_postings("body")
        entry = reader.schema.get_field("body")
        from tantivy_tpu.common import arrayio

        arrays = arrayio.field_arrays(reader._idx, entry.field_id)
        n_blocks = len(arrays["blk_len"])
        ids = np.arange(n_blocks)
        docs, tfs = dfp.gather_blocks(ids)
        docs, tfs = np.asarray(docs), np.asarray(tfs)
        for b in range(n_blocks):
            hdocs, htfs = decode_block_host(arrays, b)
            L = len(hdocs)
            np.testing.assert_array_equal(docs[b, :L], hdocs)
            np.testing.assert_array_equal(tfs[b, :L], htfs)
            assert np.all(docs[b, L:] == TERMINATED)


class TestBatchedTermSearch:
    @pytest.mark.parametrize("mode", ["dense", "packed"])
    def test_exact_match_vs_host(self, mode):
        index, words = build_random_index()
        searcher = index.reader().searcher()
        executor = BatchExecutor(searcher, mode=mode)
        terms = [tt.Term.from_field_text("body", w) for w in words]
        batch_results = executor.search_term_batch(terms, k=10)
        for term, device_hits in zip(terms, batch_results):
            host_hits = searcher.search(tt.TermQuery(term), tt.TopDocs(10))
            assert_hits_match(device_hits, host_hits, context=str(term))

    def test_with_deletes(self):
        index, words = build_random_index(num_commits=1)
        w = index.writer_for_tests()
        w.delete_term(tt.Term.from_field_text("body", words[0]))
        w.commit()
        searcher = index.reader().searcher()
        assert searcher.segment_readers()[0].has_deletes()
        executor = BatchExecutor(searcher)
        terms = [tt.Term.from_field_text("body", w_) for w_ in words[:8]]
        batch_results = executor.search_term_batch(terms, k=10)
        for term, device_hits in zip(terms, batch_results):
            host_hits = searcher.search(tt.TermQuery(term), tt.TopDocs(10))
            assert_hits_match(device_hits, host_hits, context=str(term))

    def test_missing_term(self):
        index, _ = build_random_index(num_docs=50, num_commits=1)
        searcher = index.reader().searcher()
        executor = BatchExecutor(searcher)
        res = executor.search_term_batch(
            [tt.Term.from_field_text("body", "doesnotexist")], k=5
        )
        assert res == [[]]


class TestExactDiv:
    """`ops/fmath.exact_div` must equal IEEE round-to-nearest f32 division
    bit-for-bit. TPU hardware divide is only faithfully rounded (~45% of
    operand pairs 1 ulp off, measured); the Dekker-refined rebuild is what
    keeps device BM25 scores identical to the host engine's numpy scores.
    On CPU (this suite) hardware division is already IEEE, so this pins the
    algorithm itself: the refinement must never *break* a correct quotient.
    """

    def test_dense_realistic_grid(self):
        import jax.numpy as jnp
        import numpy as np

        from tantivy_tpu.ops.fmath import exact_div
        from tantivy_tpu.query.bm25 import compute_tf_cache

        # every (tf <= 512, cache entry) pair for several average fieldnorms
        tfs = np.arange(1, 513, dtype=np.float32)
        for avg in (1.0, 7.3, 24.0, 199.5):
            cache = compute_tf_cache(np.float32(avg))
            tf = np.repeat(tfs, len(cache))
            c = np.tile(cache, len(tfs))
            want = (tf / (tf + c)).astype(np.float32)
            got = np.asarray(exact_div(jnp.asarray(tf), jnp.asarray(tf + c)))
            assert np.array_equal(got.view(np.int32), want.view(np.int32))

    def test_random_pairs_and_nan(self):
        import jax.numpy as jnp
        import numpy as np

        from tantivy_tpu.ops.fmath import exact_div

        rng = np.random.default_rng(3)
        n = rng.integers(1, 1 << 24, 200_000).astype(np.float32)
        d = n + rng.uniform(1e-3, 1e4, len(n)).astype(np.float32)
        want = (n / d).astype(np.float32)
        got = np.asarray(exact_div(jnp.asarray(n), jnp.asarray(d)))
        assert np.array_equal(got.view(np.int32), want.view(np.int32))
        # NaN propagates (deleted/pad lanes are NaN-marked denominators)
        out = np.asarray(
            exact_div(jnp.float32(3.0), jnp.asarray(np.float32(np.nan)))
        )
        assert np.isnan(out)
