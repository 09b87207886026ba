"""Benchmark: batched term-query QPS, top-10, on the real TPU chip.

Builds a synthetic Zipf corpus (stand-in for the Wikipedia suite until the
corpus tooling lands), runs batches of term queries through the device
executor, and reports sustained QPS.

vs_baseline: the reference publishes no absolute numbers and cannot be built
here (no Rust toolchain — see BASELINE.md). We normalize against 1000 QPS/core
as a stand-in for tantivy's single-core term-query top-10 throughput on a
comparable corpus (search-benchmark-game term queries run ~0.3-3 ms/query on
one CPU core). vs_baseline = our QPS-per-chip / 1000.
"""

import json
import sys
import time

import numpy as np


def build_corpus(num_docs=20_000, vocab=4_000, avg_len=60, seed=7):
    import tantivy_tpu as tt

    rng = np.random.default_rng(seed)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer(memory_budget=1_000_000_000)
    # Zipf word distribution
    ranks = np.arange(1, vocab + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()
    words = np.array([f"w{i}" for i in range(vocab)])
    lengths = rng.poisson(avg_len, num_docs).clip(1)
    t0 = time.time()
    for i in range(num_docs):
        toks = rng.choice(words, lengths[i], p=probs)
        w.add_document(tt.Document(body=" ".join(toks)))
    w.commit()
    w.close()
    build_s = time.time() - t0
    return index, words, probs, build_s


def main():
    import tantivy_tpu as tt
    from tantivy_tpu.parallel import BatchExecutor

    tt.enable_compilation_cache()

    index, words, probs, build_s = build_corpus()
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher, mode="dense")

    rng = np.random.default_rng(123)
    batch_size = 256
    k = 10

    def term(w):
        return tt.TermQuery(tt.Term.from_field_text("body", w))

    def make_batch(kind):
        picks = rng.choice(len(words), (batch_size, 2), p=probs)
        if kind == "term":
            return [term(words[i]) for i, _ in picks]
        occur = tt.Occur.MUST if kind == "and" else tt.Occur.SHOULD
        return [
            tt.BooleanQuery([(occur, term(words[i])), (occur, term(words[j])) ])
            for i, j in picks
        ]

    suites = ("term", "and", "or")
    # warmup (compiles; persistent cache makes later runs fast)
    for kind in suites:
        for _ in range(2):
            executor.search_batch(make_batch(kind), k)

    per_kind = {}
    batch_times = []
    n_batches = 10
    for kind in suites:
        t0 = time.time()
        total = 0
        for _ in range(n_batches):
            batch = make_batch(kind)
            bt = time.time()
            res = executor.search_batch(batch, k)
            batch_times.append(time.time() - bt)
            total += len(res)
        per_kind[kind] = round(total / (time.time() - t0), 1)
    qps = float(np.mean(list(per_kind.values())))
    p99_ms = float(np.percentile(np.array(batch_times) * 1000, 99))

    print(
        json.dumps(
            {
                "metric": "batched_qps_top10_zipf20k_term_and_or",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / 1000.0, 3),
                "detail": {
                    "corpus_docs": 20_000,
                    "batch_size": batch_size,
                    "qps_per_suite": per_kind,
                    "p99_batch_ms": round(p99_ms, 1),
                    "index_build_s": round(build_s, 1),
                    "baseline_assumption": "1000 QPS/core tantivy top-10",
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
