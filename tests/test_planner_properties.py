"""Randomized property tests for the fused planner (VERDICT r3 #9).

Random Zipf corpora (varying density skew, segment counts, deletes) x
random boolean/phrase batches, with the ratchet thresholds and phase-1
budget forced small so EVERY planner branch fires: window slicing, probe
skipping, the two-round phase-2 ratchet, and phrase re-anchoring. Each run
asserts bitwise device-vs-host parity, and the suite-level check asserts
(via the planner's branch counters) that each path actually executed.
"""

import numpy as np
import pytest

import tantivy_tpu as tt
import tantivy_tpu.parallel as par
from tantivy_tpu.parallel import BatchExecutor


def _zipf_index(rng, n_docs, vocab, alpha, n_segments, delete_frac=0.0):
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    words = np.array([f"w{i}" for i in range(vocab)])
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = ranks ** (-alpha)
    p /= p.sum()
    commit_at = {
        int(x) for x in np.linspace(0, n_docs, n_segments + 1)[1:-1]
    }
    for i in range(n_docs):
        n = int(rng.integers(3, 40))
        w.add_document(tt.Document(body=" ".join(rng.choice(words, n, p=p))))
        if i in commit_at:
            w.commit()
    w.commit()
    if delete_frac > 0:
        for i in range(vocab):
            if rng.random() < delete_frac / 10:
                w.delete_term(tt.Term.from_field_text("body", f"w{i}"))
        w.commit()
    w.close()
    return index, words


def _t(x):
    return tt.TermQuery(tt.Term.from_field_text("body", str(x)))


def _check_exact(searcher, executor, queries, k):
    res = executor.search_batch(queries, k)
    for qi, q in enumerate(queries):
        host = searcher.search(q, tt.TopDocs(k))
        dev = res[qi]
        assert [(float(s), a) for s, a in host] == \
            [(float(s), a) for s, a in dev], f"mismatch on {q!r}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_planner_branches_random(seed, monkeypatch):
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")  # interpret mode on CPU
    rng = np.random.default_rng(seed)
    # force the multi-round machinery on tiny corpora
    monkeypatch.setattr(par, "_RATCHET_MIN_PER_Q", 0)
    monkeypatch.setattr(par, "_RATCHET_TOP_PER_Q", 1)
    monkeypatch.setenv("TANTIVY_TPU_M1", "1")
    import tantivy_tpu.ops.pallas_probe as pp

    # tiny window cap: skew pairs go wide -> slices (MUST) + skips (SHOULD)
    monkeypatch.setattr(pp, "fused_kw_max", lambda n: 2)
    import tantivy_tpu.ops.pallas_phrase as php

    monkeypatch.setattr(php, "ANCHOR_POS_CAP", 512)
    monkeypatch.setattr(php, "PARTNER_POS_CAP", 512)

    n_segments = int(rng.integers(1, 4))
    alpha = float(rng.uniform(0.8, 1.6))
    index, words = _zipf_index(
        rng, int(rng.integers(1200, 2500)), 60, alpha, n_segments,
        delete_frac=float(rng.choice([0.0, 0.3])),
    )
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher, mode="dense")

    queries = []
    for _ in range(10):
        hi = int(rng.integers(0, 4))        # dense terms
        lo = int(rng.integers(30, 60))      # sparse terms
        queries.append(tt.BooleanQuery.union([_t(f"w{hi}"), _t(f"w{lo}")]))
        queries.append(
            tt.BooleanQuery.intersection([_t(f"w{lo}"), _t(f"w{hi}")])
        )
        queries.append(
            tt.BooleanQuery(
                [
                    (tt.Occur.SHOULD, _t(f"w{hi}")),
                    (tt.Occur.SHOULD, _t(f"w{int(rng.integers(5, 20))}")),
                    (tt.Occur.MUST_NOT, _t(f"w{lo}")),
                ]
            )
        )
        queries.append(
            tt.PhraseQuery("body", [f"w{hi}", f"w{int(rng.integers(0, 8))}"])
        )
    _check_exact(searcher, executor, queries, k=7)
    # record which branches fired for the suite-level coverage assert
    stats = getattr(executor, "plan_stats", {})
    fb = getattr(executor, "fallbacks", {})
    _FIRED.update(stats)
    _FIRED.update({f"fallback:{k}": v for k, v in fb.items()})


_FIRED: dict = {}


def test_zz_all_planner_branches_fired():
    """Runs after the randomized cases: every planner path must have fired
    at least once across the suite (slice, skip, both ratchets, re-anchor)."""
    for branch in (
        "bool_skip_rows", "bool_slice_rows", "bool_ratchet",
        "phrase_ratchet", "phrase_reanchor",
    ):
        assert _FIRED.get(branch, 0) > 0, (
            f"planner branch never fired across seeds: {branch} "
            f"(fired: {_FIRED})"
        )
