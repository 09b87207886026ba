"""Benchmark: batched top-10 QPS over the Wikipedia sample corpus suites.

Mirrors the reference harness shape (`benches/and_or_queries.rs:1-17`,
search-benchmark-game): four suites — term / AND / OR / phrase — of 256-query
batches over (a) the reference's 1000-doc `wiki.json` sample and (b) a scaled
corpus synthesized from the same token stream (real vocabulary, Zipf shape,
real bigrams for the phrase suite). Reports per-suite QPS with p50/p99 batch
latency, compile/warmup time separately, and a device-vs-host top-10
exact-match gate per suite.

vs_baseline: the reference publishes no absolute numbers and cannot be built
here (no Rust toolchain — see BASELINE.md). We normalize against 1000 QPS/core
as a stand-in for tantivy's single-core top-10 throughput on comparable
corpora. vs_baseline = mean-suite QPS per chip / 1000.

The built indexes are cached under .bench_cache/ across runs.
"""

import json
import os
import re
import sys
import time
from pathlib import Path

import numpy as np

WIKI_JSON = "/root/reference/benches/wiki.json"
CACHE = Path(__file__).resolve().parent / ".bench_cache"
BATCH = 256
K = 10
N_BATCHES = 8
SCALED_DOCS = 200_000
EXACT_SAMPLE = 32


def _tokens_from_wiki():
    toks = []
    with open(WIKI_JSON) as f:
        for line in f:
            d = json.loads(line)
            text = (d.get("title", "") + " " + d.get("body", "")).lower()
            toks.extend(re.findall(r"[a-z0-9]+", text))
    return toks


def _synthetic_token_stream(rng, n_tokens=400_000, vocab=30_000):
    """Zipf stand-in when the reference corpus is unavailable."""
    ranks = np.arange(1, vocab + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()
    words = np.array([f"w{i}" for i in range(vocab)])
    return list(rng.choice(words, n_tokens, p=probs))


def _build_index(path, docs_iter, n_docs):
    import tantivy_tpu as tt

    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_dir(path, schema)
    w = index.writer(memory_budget=2_000_000_000)
    t0 = time.time()
    for text in docs_iter:
        w.add_document(tt.Document(body=text))
    w.commit()
    w.close()
    return index, time.time() - t0


def _open_or_build(name, docs_fn, n_docs):
    import tantivy_tpu as tt

    path = CACHE / name
    if (path / "meta.json").exists():
        try:
            return tt.Index.open_in_dir(path), 0.0
        except Exception:
            import shutil

            shutil.rmtree(path)
    path.mkdir(parents=True, exist_ok=True)
    return _build_index(path, docs_fn(), n_docs)


def make_corpora():
    have_wiki = os.path.exists(WIKI_JSON)
    rng = np.random.default_rng(42)
    if have_wiki:
        stream = _tokens_from_wiki()
    else:
        stream = _synthetic_token_stream(rng)

    def wiki_docs():
        with open(WIKI_JSON) as f:
            for line in f:
                d = json.loads(line)
                yield (d.get("title", "") + " " + d.get("body", ""))

    def scaled_docs():
        # windows over the token stream with a shifting phase per pass:
        # real vocabulary + real adjacency at any scale
        n = len(stream)
        made = 0
        passno = 0
        rng2 = np.random.default_rng(7)
        while made < SCALED_DOCS:
            i = (passno * 131) % max(n - 200, 1)
            while i + 10 < n and made < SCALED_DOCS:
                ln = int(rng2.integers(20, 100))
                yield " ".join(stream[i : i + ln])
                i += ln
                made += 1
            passno += 1

    corpora = []
    if have_wiki:
        corpora.append(("wiki1k", wiki_docs, 1000))
    corpora.append(("scaled", scaled_docs, SCALED_DOCS))
    return corpora, stream, have_wiki


def make_query_log(searcher, stream, rng, n_queries):
    """Query terms sampled by document frequency (common terms dominate, as
    in real query logs); phrases are real bigrams from the corpus."""
    import tantivy_tpu as tt

    # df-weighted unigram sampling over the corpus vocabulary
    uniq, counts = np.unique(stream, return_counts=True)
    keep = counts >= 5
    uniq, counts = uniq[keep], counts[keep]
    probs = counts / counts.sum()

    def sample_terms(n, width):
        return rng.choice(uniq, size=(n, width), p=probs)

    def sample_bigrams(n):
        out = []
        while len(out) < n:
            i = int(rng.integers(0, len(stream) - 1))
            out.append((stream[i], stream[i + 1]))
        return out

    def t(wd):
        return tt.TermQuery(tt.Term.from_field_text("body", str(wd)))

    logs = {}
    logs["term"] = [t(w) for w, in sample_terms(n_queries, 1)]
    logs["and"] = [
        tt.BooleanQuery.intersection([t(a), t(b)])
        for a, b in sample_terms(n_queries, 2)
    ]
    logs["or"] = [
        tt.BooleanQuery.union([t(a), t(b)])
        for a, b in sample_terms(n_queries, 2)
    ]
    logs["phrase"] = [
        tt.PhraseQuery("body", [str(a), str(b)])
        for a, b in sample_bigrams(n_queries)
    ]
    return logs


def run_suites(index, stream, label):
    import tantivy_tpu as tt
    from tantivy_tpu.parallel import BatchExecutor

    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher, mode="dense")
    rng = np.random.default_rng(123)
    logs = make_query_log(searcher, stream, rng, BATCH * (N_BATCHES + 3))

    suites = ("term", "and", "or", "phrase")
    result = {}
    warm_s = 0.0
    for kind in suites:
        qlog = logs[kind]
        # warmup: compiles (persistent jit cache makes reruns cheap)
        t0 = time.time()
        for b in range(3):
            executor.search_batch(qlog[b * BATCH : (b + 1) * BATCH], K)
        warm_s += time.time() - t0

        times = []
        total = 0
        for b in range(3, 3 + N_BATCHES):
            batch = qlog[b * BATCH : (b + 1) * BATCH]
            bt = time.time()
            res = executor.search_batch(batch, K)
            times.append(time.time() - bt)
            total += len(res)
        dt = np.array(times)
        result[kind] = {
            "qps": round(total / dt.sum(), 1),
            "p50_ms": round(float(np.percentile(dt * 1000, 50)), 1),
            "p99_ms": round(float(np.percentile(dt * 1000, 99)), 1),
        }

        # exactness gate: device vs host top-10 doc addresses
        sample = qlog[: EXACT_SAMPLE]
        dev = executor.search_batch(sample, K)
        exact = True
        for q, d in zip(sample, dev):
            h = searcher.search(q, tt.TopDocs(K))
            if [a for _, a in d] != [a for _, a in h]:
                exact = False
                break
        result[kind]["exact_match"] = exact
    result["warmup_s"] = round(warm_s, 1)
    return result


def main():
    import tantivy_tpu as tt

    tt.enable_compilation_cache()
    corpora, stream, have_wiki = make_corpora()

    detail = {"corpora": {}}
    all_qps = []
    all_exact = True
    for name, docs_fn, n_docs in corpora:
        index, build_s = _open_or_build(name, docs_fn, n_docs)
        res = run_suites(index, stream, name)
        res["docs"] = n_docs
        res["index_build_s"] = round(build_s, 1)
        detail["corpora"][name] = res
        if name == "scaled":
            all_qps = [res[k]["qps"] for k in ("term", "and", "or", "phrase")]
            all_exact = all(
                res[k]["exact_match"] for k in ("term", "and", "or", "phrase")
            )

    qps = float(np.mean(all_qps)) if all_qps else 0.0
    detail["wiki_corpus"] = have_wiki
    detail["batch_size"] = BATCH
    print(
        json.dumps(
            {
                "metric": "batched_qps_top10_wiki_term_and_or_phrase",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / 1000.0, 3),
                "exact_match": all_exact,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
