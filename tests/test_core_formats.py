"""Golden tests for the exactness-critical primitives: fieldnorm code, BM25,
block codec. Golden floats come from reference test expectations
(`src/query/term_query/term_scorer.rs:167-191`, `src/fieldnorm/code.rs` tests).
"""

import numpy as np
import pytest

from tantivy_tpu.common import bitpack
from tantivy_tpu.fieldnorm import (
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
)
from tantivy_tpu.postings.format import (
    PostingsSerializer,
    decode_term_host,
)
from tantivy_tpu.query.bm25 import Bm25Weight, idf


def nearly(a, b, tol=0.0005):
    assert abs(float(a) - float(b)) <= tol * max(abs(float(a)), abs(float(b))), (a, b)


class TestFieldNorm:
    def test_identity_below_41(self):
        # reference code.rs test: exact for 0..=40
        for i in range(41):
            assert fieldnorm_to_id(i) == i
        assert fieldnorm_to_id(41) == 40
        assert fieldnorm_to_id(42) == 41

    def test_table_spot_values(self):
        # spot values copied from the reference table (code.rs:13)
        assert FIELD_NORMS_TABLE[40] == 40
        assert FIELD_NORMS_TABLE[41] == 42
        assert FIELD_NORMS_TABLE[255] == 2_013_265_944
        assert FIELD_NORMS_TABLE[128] == 32_792
        assert FIELD_NORMS_TABLE[100] == 3_096

    def test_roundtrip_floor(self):
        for fid in range(43, 256):
            v = int(FIELD_NORMS_TABLE[fid])
            assert id_to_fieldnorm(fid) == v
            assert fieldnorm_to_id(v) == fid
            assert fieldnorm_to_id(v - 1) == fid - 1
            assert fieldnorm_to_id(v + 1) == fid

    def test_u32_max(self):
        assert fieldnorm_to_id(0xFFFFFFFF) == 255

    def test_vectorized(self):
        vals = np.array([0, 1, 40, 41, 42, 100000, 2**31], dtype=np.uint64)
        ids = fieldnorm_to_id(vals)
        for v, i in zip(vals, ids):
            assert int(i) == fieldnorm_to_id(int(v))


class TestBm25:
    def test_idf(self):
        # reference bm25.rs test: idf(1, 2) == ln(2)
        nearly(idf(1, 2), np.log(np.float32(2.0)))

    def test_term_scorer_goldens(self):
        # reference term_scorer.rs:167-191 (Bm25Weight::for_one_term(3, 6, 10.0))
        w = Bm25Weight.for_one_term(3, 6, np.float32(10.0))
        nearly(w.max_score(), 1.3990127)
        fieldnorms = np.array([0, 0, 10, 12, 0, 0, 0, 100], dtype=np.uint32)
        ids = fieldnorm_to_id(fieldnorms)
        nearly(w.score(int(ids[2]), 3), 1.0892314)
        nearly(w.score(int(ids[3]), 12), 1.3676447)
        nearly(w.score(int(ids[7]), 8), 0.72015285)

    def test_vectorized_score_matches_scalar(self):
        w = Bm25Weight.for_one_term(10, 1000, np.float32(7.5))
        ids = np.arange(256, dtype=np.uint8)
        tfs = np.arange(1, 257, dtype=np.uint32)
        vec = w.score(ids, tfs)
        for i in range(0, 256, 17):
            assert vec[i] == w.score(int(ids[i]), int(tfs[i]))


class TestBitpack:
    @pytest.mark.parametrize("bits", [0, 1, 2, 4, 8, 16, 32])
    def test_roundtrip(self, bits):
        rng = np.random.default_rng(bits + 1)
        n = 128
        if bits == 0:
            vals = np.zeros(n, dtype=np.uint32)
        elif bits == 32:
            vals = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        else:
            vals = rng.integers(0, 2**bits, n, dtype=np.uint32)
        words = bitpack.pack(vals, bits)
        assert words.size == bitpack.words_for(n, bits)
        out = bitpack.unpack(words, bits, n)
        np.testing.assert_array_equal(out, vals)

    def test_round_bits(self):
        assert bitpack.round_bits(0) == 0
        assert bitpack.round_bits(1) == 1
        assert bitpack.round_bits(3) == 4
        assert bitpack.round_bits(5) == 8
        assert bitpack.round_bits(9) == 16
        assert bitpack.round_bits(17) == 32
        assert bitpack.round_bits(32) == 32


class TestPostingsBlocks:
    def _roundtrip(self, docs, tfs, max_doc):
        fieldnorms = np.ones(max_doc, dtype=np.uint8)
        ser = PostingsSerializer(avg_fieldnorm=10.0, fieldnorm_ids=fieldnorms)
        ord_ = ser.serialize_term(docs, tfs)
        arrays = ser.finish()
        out_docs, out_tfs = decode_term_host(arrays, ord_)
        np.testing.assert_array_equal(out_docs, docs)
        np.testing.assert_array_equal(out_tfs, tfs)
        return arrays

    def test_single_small_block(self):
        docs = np.array([2, 3, 7], dtype=np.uint32)
        tfs = np.array([3, 12, 8], dtype=np.uint32)
        self._roundtrip(docs, tfs, 8)

    def test_exact_block_multiple(self):
        docs = np.arange(0, 256 * 7, 7, dtype=np.uint32)
        tfs = (docs % 5) + 1
        arrays = self._roundtrip(docs, tfs, int(docs[-1]) + 1)
        assert int(arrays["term_num_blocks"][0]) == 2

    def test_random_lists(self):
        rng = np.random.default_rng(42)
        for trial in range(20):
            n = int(rng.integers(1, 1000))
            docs = np.sort(
                rng.choice(np.arange(100_000, dtype=np.uint32), n, replace=False)
            ).astype(np.uint32)
            tfs = rng.integers(1, 300, n).astype(np.uint32)
            self._roundtrip(docs, tfs, 100_000)

    def test_dense_consecutive(self):
        # consecutive docs -> deltas all zero -> width-0 blocks
        docs = np.arange(1000, dtype=np.uint32)
        tfs = np.ones(1000, dtype=np.uint32)
        arrays = self._roundtrip(docs, tfs, 1000)
        assert arrays["doc_w0"].shape[0] >= 7  # most blocks are width 0

    def test_block_max_metadata(self):
        # block-max (fieldnorm_id, tf) must reproduce the true per-block max
        # score under the index-time average fieldnorm.
        rng = np.random.default_rng(7)
        max_doc = 3000
        fieldnorms = rng.integers(1, 500, max_doc).astype(np.uint32)
        norm_ids = fieldnorm_to_id(fieldnorms)
        n = 700
        docs = np.sort(
            rng.choice(np.arange(max_doc, dtype=np.uint32), n, replace=False)
        ).astype(np.uint32)
        tfs = rng.integers(1, 20, n).astype(np.uint32)
        avg = float(fieldnorms.sum()) / max_doc
        ser = PostingsSerializer(avg_fieldnorm=avg, fieldnorm_ids=norm_ids)
        ser.serialize_term(docs, tfs)
        arrays = ser.finish()

        w = Bm25Weight.for_one_term(n, max_doc, np.float32(avg))
        scores = w.score(norm_ids[docs], tfs)
        for b in range(int(arrays["term_num_blocks"][0])):
            lo, hi = b * 128, min((b + 1) * 128, n)
            true_max = scores[lo:hi].max()
            stored = w.score(
                int(arrays["blk_max_fnid"][b]), int(arrays["blk_max_tf"][b])
            )
            assert stored == true_max


class TestStemmer:
    def test_known_stems(self):
        from tantivy_tpu.tokenizer.stemmer import porter2_stem

        # Expected outputs from the published Snowball english vocabulary.
        cases = {
            "consign": "consign", "consigned": "consign", "consigning": "consign",
            "consignment": "consign",
            "consist": "consist", "consisted": "consist", "consistency": "consist",
            "consistent": "consist", "consistently": "consist",
            "knack": "knack", "knackeries": "knackeri", "knags": "knag",
            "knit": "knit", "knits": "knit", "knitted": "knit", "knitting": "knit",
            "generate": "generat", "generates": "generat", "generating": "generat",
            "generation": "generat", "generosity": "generos", "generous": "generous",
            "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
            "news": "news", "inning": "inning", "proceed": "proceed",
            "exceed": "exceed", "succeed": "succeed",
            "cry": "cri", "cries": "cri", "by": "by", "say": "say",
            "hope": "hope", "hoping": "hope", "hopped": "hop", "hopping": "hop",
            "ties": "tie", "tied": "tie",
            "congratulations": "congratul",
            "national": "nation", "rational": "ration",
            "happiness": "happi", "happily": "happili",
            "fortunately": "fortun",
            "activate": "activ",
            "conditional": "condit",
        }
        for word, expected in cases.items():
            assert porter2_stem(word) == expected, (word, porter2_stem(word), expected)
