"""Batched UB planning == per-call planning, bitwise (randomized).

`wand.batched_clause_details` and the phrase `plan_anchors_batched` closure
replace ~2k per-(query, clause, segment) numpy calls with one composite-key
searchsorted sweep (`FusedStore.region_keys`); these tests pin the bitwise
equivalence contract against `FieldWand.clause_blocks_ub` on randomized
corpora, clause structures and region picks."""

import os

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor
from tantivy_tpu.parallel.wand import batched_clause_details


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")


def _store(seed, vocab=30, docs=500, segs=3):
    rng = np.random.default_rng(seed)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    ranks = np.arange(1, vocab + 1)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    words = [f"w{i}" for i in range(vocab)]
    w = index.writer_for_tests()
    per = docs // segs
    for _ in range(segs):
        for _ in range(per):
            w.add_document(
                tt.Document(body=" ".join(rng.choice(words, 10, p=probs)))
            )
        w.commit()
    w.close()
    s = index.reader().searcher()
    ex = BatchExecutor(s, mode="dense")
    for so in range(segs):
        ex._ensure_fused_slab(so, "body")
    return s, ex, ex._fused().ready(), words, rng


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_batched_clause_details_bitwise(seed):
    s, ex, fused, words, rng = _store(seed)
    calls = []
    for _ in range(40):
        seg = int(rng.integers(0, 3))
        reader = s.segment_readers()[seg]
        terms = rng.choice(len(words), size=int(rng.integers(2, 5)),
                           replace=False)
        regions = []
        for t in terms:
            o = ex._term_ord(seg, reader, "body", f"w{t}".encode())
            if o is None or o < 0:
                break
            regions.append(fused.region(seg, "body", o))
        if len(regions) != len(terms):
            continue
        self_i = int(rng.integers(0, len(regions)))
        others = [
            (bool(rng.integers(0, 2)),
             np.float32(rng.uniform(0.1, 3.0)),
             regions[j][0], regions[j][1], j)
            for j in range(len(regions)) if j != self_i
        ]
        calls.append((
            regions[self_i][0], regions[self_i][1],
            np.float32(rng.uniform(0.1, 3.0)), others, self_i,
        ))
    assert calls
    dets = batched_clause_details(fused, calls)
    for c, d in zip(calls, dets):
        ref = fused.clause_blocks_ub(
            c[0], c[1], c[2], c[3], self_pos=c[4], return_detail=True
        )
        for k in ("ids", "ub", "widths", "jlo", "i0", "i1"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(d[k]), err_msg=k
            )
        assert set(ref["terms"]) == set(d["terms"])
        for p in ref["terms"]:
            np.testing.assert_array_equal(ref["terms"][p], d["terms"][p])


def test_batched_details_chunking_invariant():
    """Chunking is a pure memory cap: results independent of cell_budget."""
    s, ex, fused, words, rng = _store(7)
    reader = s.segment_readers()[0]
    calls = []
    for t in range(0, 10, 2):
        o0 = ex._term_ord(0, reader, "body", f"w{t}".encode())
        o1 = ex._term_ord(0, reader, "body", f"w{t+1}".encode())
        r0 = fused.region(0, "body", o0)
        r1 = fused.region(0, "body", o1)
        calls.append((r0[0], r0[1], np.float32(1.5),
                      [(False, np.float32(0.7), r1[0], r1[1], 1)], 0))
    a = batched_clause_details(fused, calls)
    b = batched_clause_details(fused, calls, cell_budget=1)
    for x, y in zip(a, b):
        for k in ("ids", "ub", "widths", "jlo", "i0", "i1"):
            np.testing.assert_array_equal(np.asarray(x[k]), np.asarray(y[k]))
