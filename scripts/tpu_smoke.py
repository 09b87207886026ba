"""Real-TPU smoke test for the group kernels: builds a small Zipf index,
runs boolean/term/phrase/phrase-prefix batches through the fused pallas
path, and asserts bitwise parity with the host engine. Run on hardware:

    python scripts/tpu_smoke.py [n_docs]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.collector import TopDocs  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402


def build(n_docs=20000, seed=3):
    rng = np.random.default_rng(seed)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    vocab = np.array([f"w{i}" for i in range(800)])
    ranks = np.arange(1, 801)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    for i in range(n_docs):
        n = int(rng.integers(5, 60))
        w.add_document(tt.Document(body=" ".join(rng.choice(vocab, n, p=p))))
        if i == n_docs // 2:
            w.commit()  # two segments
    w.commit()
    w.close()
    return index, vocab


def t(x):
    return tt.TermQuery(tt.Term.from_field_text("body", str(x)))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    index, vocab = build(n_docs)
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher, mode="dense")
    rng = np.random.default_rng(7)
    k = 10

    queries = []
    for _ in range(40):
        a, b2 = rng.choice(80, 2)
        queries.append(tt.BooleanQuery.union([t(f"w{a}"), t(f"w{b2}")]))
        queries.append(
            tt.BooleanQuery.intersection([t(f"w{a}"), t(f"w{b2}")])
        )
        queries.append(t(f"w{int(rng.integers(0, 200))}"))
        queries.append(
            tt.PhraseQuery("body", [f"w{a}", f"w{b2}"])
        )
    queries.append(tt.PhrasePrefixQuery("body", ["w1", "w7"]))
    queries.append(tt.PhrasePrefixQuery("body", ["w12"]))

    t0 = time.time()
    dev = ex.search_batch(queries, k)
    t1 = time.time()
    dev2 = ex.search_batch(queries, k)
    t2 = time.time()
    bad = 0
    for qi, q in enumerate(queries):
        host = searcher.search(q, TopDocs(k))
        d = dev[qi]
        if len(host) != len(d) or any(
            not (float(h[0]) == float(g[0]) and h[1] == g[1])
            for h, g in zip(host, d)
        ):
            bad += 1
            if bad <= 3:
                print(f"MISMATCH q{qi} {q}")
                print("  host:", [(float(s), a) for s, a in host[:3]])
                print("  dev :", [(float(s), a) for s, a in d[:3]])
    print(
        f"queries={len(queries)} mismatches={bad} "
        f"first_batch={t1 - t0:.1f}s warm_batch={t2 - t1:.3f}s "
        f"fallbacks={getattr(ex, 'fallbacks', {})}"
    )
    assert bad == 0, "device/host mismatch"
    print("OK")


if __name__ == "__main__":
    main()
