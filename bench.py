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

    index, words, probs, build_s = build_corpus()
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher, mode="dense")

    rng = np.random.default_rng(123)
    batch_size = 256
    k = 10

    def make_batch():
        picks = rng.choice(len(words), batch_size, p=probs)
        return [tt.Term.from_field_text("body", words[i]) for i in picks]

    # warmup (compiles)
    for _ in range(3):
        executor.search_term_batch(make_batch(), k)

    n_batches = 20
    t0 = time.time()
    total = 0
    for _ in range(n_batches):
        batch = make_batch()
        res = executor.search_term_batch(batch, k)
        total += len(res)
    elapsed = time.time() - t0
    qps = total / elapsed

    print(
        json.dumps(
            {
                "metric": "batched_term_query_qps_top10_zipf20k",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / 1000.0, 3),
                "detail": {
                    "corpus_docs": 20_000,
                    "batch_size": batch_size,
                    "index_build_s": round(build_s, 1),
                    "baseline_assumption": "1000 QPS/core tantivy term top-10",
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
