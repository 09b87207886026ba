"""Benchmark: batched top-10 QPS over the Wikipedia sample corpus suites.

Mirrors the reference harness shapes:
* `benches/and_or_queries.rs` / search-benchmark-game — term / AND / OR /
  phrase 256-query batches, top-10, over (a) the reference's 1000-doc
  `wiki.json` sample and (b) a 1M-doc corpus synthesized from the same token
  stream (real vocabulary, Zipf shape, real bigrams) across >= 4 segments.
* `benches/range_queries.rs` — range-count batches over u64 fast fields at
  three selectivity bands (low / high / out-of-range).
* `benches/agg_bench.rs` — histogram/stats/percentiles/terms/range/composite
  aggregation requests over fast-field columns.
* `benches/index-bench.rs` / README "<3 min Wikipedia" — cold-cache indexing
  throughput, single- and multi-threaded.

Per-suite QPS with p50/p99 batch latency; compile/warmup time reported
separately (the warm pass runs every timed batch once so steady-state numbers
measure execution, not XLA compilation — caches persist across runs); a
device-vs-host exact-match gate covers 256 queries per suite (and k=3 on
wiki1k); device->host fallback counts are reported per corpus.

vs_baseline: the reference publishes no absolute numbers and cannot be built
here (no Rust toolchain — see BASELINE.md). We normalize against 1000 QPS/core
as a stand-in for tantivy's single-core top-10 throughput on comparable
corpora. vs_baseline = mean-suite QPS per chip / 1000.

The built indexes are cached under .bench_cache/ across runs; cold build
timings are recorded in the cache at first build and re-reported.
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
SCALED_DOCS = 1_000_000
SCALED_COMMITS = 4
EXACT_SAMPLE = 256
RANGE_EXACT_SAMPLE = 64
AGG_REPEATS = 3


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


#: bump to invalidate cached bench indexes when the bench schema changes
SCHEMA_V = 2


def _scaled_schema():
    import tantivy_tpu as tt

    b = tt.Schema.builder()
    # body STORED: the doc-fetch suite reads real row payloads back
    # (reference treats store reads as a first-class perf surface,
    # `src/store/reader.rs:25,63`)
    b.add_text_field("body", tt.TEXT | tt.STORED_TEXT)
    b.add_u64_field("score", tt.FAST)
    b.add_f64_field("score_f64", tt.FAST)
    b.add_u64_field("ts", tt.FAST)
    return b.build()


def _build_index(path, docs_iter, n_docs, with_fast, num_threads=None,
                 commit_every=None):
    import tantivy_tpu as tt

    if with_fast:
        schema = _scaled_schema()
    else:
        b = tt.Schema.builder()
        b.add_text_field("body", tt.TEXT)
        schema = b.build()
    index = tt.Index.create_in_dir(path, schema)
    kwargs = {} if num_threads is None else {"num_threads": num_threads}
    w = index.writer(memory_budget=2_000_000_000, **kwargs)
    t0 = time.time()
    made = 0
    for doc in docs_iter:
        w.add_document(tt.Document(**doc) if isinstance(doc, dict)
                       else tt.Document(body=doc))
        made += 1
        if commit_every and made % commit_every == 0 and made < n_docs:
            w.commit()
    w.commit()
    dt = time.time() - t0
    w.close()
    return index, dt


def _open_or_build(name, docs_fn, n_docs, with_fast=False, commit_every=None):
    import tantivy_tpu as tt

    path = CACHE / name
    info_path = path / "bench_build_info.json"
    if (path / "meta.json").exists():
        try:
            info = (
                json.loads(info_path.read_text()) if info_path.exists()
                else {}
            )
            if info.get("schema_v") != SCHEMA_V:
                raise ValueError("bench schema changed; rebuild")
            index = tt.Index.open_in_dir(path)
            return index, info.get("build_s", 0.0)
        except Exception:
            import shutil

            shutil.rmtree(path)
    path.mkdir(parents=True, exist_ok=True)
    index, build_s = _build_index(
        path, docs_fn(), n_docs, with_fast, commit_every=commit_every
    )
    info_path.write_text(json.dumps(
        {"build_s": build_s, "docs": n_docs, "schema_v": SCHEMA_V}
    ))
    return index, build_s


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

    corpora = []
    if have_wiki:
        corpora.append(("wiki1k", wiki_docs, 1000, False))
    corpora.append(
        ("scaled1m", lambda: scaled_docs(stream, SCALED_DOCS), SCALED_DOCS,
         True)
    )
    return corpora, stream, have_wiki


def scaled_docs(stream, n_docs):
    """Windows over the token stream with a shifting phase per pass (real
    vocabulary + real adjacency at any scale) + synthetic fast-field columns
    shaped like the reference's range/agg bench corpora
    (`range_queries.rs:36-43`, `agg_bench.rs` score/score_f64)."""
    n = len(stream)
    made = 0
    passno = 0
    rng2 = np.random.default_rng(7)
    while made < n_docs:
        i = (passno * 131) % max(n - 200, 1)
        while i + 10 < n and made < n_docs:
            ln = int(rng2.integers(20, 100))
            yield {
                "body": " ".join(stream[i : i + ln]),
                "score": int(rng2.integers(0, 1000)),
                "score_f64": float(rng2.normal(100.0, 30.0)),
                "ts": made * 10 + int(rng2.integers(0, 10)),
            }
            i += ln
            made += 1
        passno += 1


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
    # host-tail / expansion suites (scaled corpus only): sloppy phrases
    # exercise the pruned host engine, phrase-prefixes the device expansion
    from tantivy_tpu.query.phrase_query import PhrasePrefixQuery

    logs["sloppy"] = [
        tt.PhraseQuery("body", [str(a), str(b)], slop=1)
        for a, b in sample_bigrams(n_queries)
    ]
    logs["prefix"] = [
        PhrasePrefixQuery("body", [str(a), str(b)[:3]])
        for a, b in sample_bigrams(n_queries)
    ]
    return logs


def make_range_log(rng, n_queries, n_docs):
    """Range queries over the scaled corpus's fast columns at the reference
    bench's three selectivity bands (`range_queries.rs:84-120`)."""
    from tantivy_tpu.query.range_query import RangeQuery

    out = []
    for i in range(n_queries):
        band = i % 3
        if band == 0:     # low-value narrow range over dense 0..999
            lo = int(rng.integers(0, 10))
            out.append(RangeQuery("score", lower=lo, upper=lo + 9))
        elif band == 1:   # high-value narrow range
            lo = int(rng.integers(985, 995))
            out.append(RangeQuery("score", lower=lo, upper=lo + 5))
        else:             # ascending ts window (~1% selectivity)
            lo = int(rng.integers(0, n_docs * 10))
            out.append(RangeQuery("ts", lower=lo, upper=lo + n_docs // 10))
    return out


AGG_REQUESTS = {
    "avg_u64": {"a": {"avg": {"field": "score"}}},
    "stats_f64": {"s": {"stats": {"field": "score_f64"}}},
    "percentiles_f64": {
        "p": {"percentiles": {"field": "score_f64",
                              "percents": [95, 99, 99.9]}}
    },
    "histogram": {"h": {"histogram": {"field": "score", "interval": 10.0}}},
    "terms_1000": {"t": {"terms": {"field": "score", "size": 100}}},
    "range_with_avg": {
        "r": {
            "range": {"field": "score",
                      "ranges": [{"to": 100.0},
                                 {"from": 100.0, "to": 500.0},
                                 {"from": 500.0}]},
            "aggs": {"a": {"avg": {"field": "score_f64"}}},
        }
    },
    "composite": {
        "c": {"composite": {"size": 100,
                            "sources": [{"s": {"terms": {"field": "score"}}}]}}
    },
}


def run_main_suites(index, stream, label, detail):
    import tantivy_tpu as tt
    from tantivy_tpu.parallel import BatchExecutor

    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher, mode="dense")
    rng = np.random.default_rng(123)
    logs = make_query_log(searcher, stream, rng, BATCH * (N_BATCHES + 3))

    suites = ("term", "and", "or", "phrase")
    result = {}
    # concurrent shape-grid prewarm: compiles overlap in a thread pool (the
    # backend compiles remotely) and land in the persistent cache; the
    # fixed plan-row tiers + canonical tier levels make every corpus hit
    # the same shapes, so this is fast on every run but the very first
    t0 = time.time()
    shapes = executor.prewarm(logs["or"][:BATCH], k=K)
    shapes += executor.prewarm(logs["phrase"][:BATCH], k=K)
    result["prewarm_s"] = round(time.time() - t0, 1)
    result["prewarm_shapes"] = shapes
    warm_s = 0.0
    for kind in suites:
        qlog = logs[kind]
        # short warm pass: two batches confirm the prewarmed shape grid and
        # populate per-(segment, field) host caches. The timed pass then
        # runs on FRESH queries — launch signatures are data-independent
        # (fixed plan-row tiers, canonical rung levels), so fresh batches
        # hit the same compiled programs and the numbers are honest
        # fresh-query throughput, not repeat-batch caching.
        t0 = time.time()
        for b in range(2):
            executor.search_batch(qlog[b * BATCH : (b + 1) * BATCH], K)
        warm_s += time.time() - t0

        # pipelined stream: three batches in flight (host planning of one
        # overlaps device execution of the other); QPS is end-to-end wall
        # over the whole stream, latencies are per-batch worker spans
        batches = [
            qlog[b * BATCH : (b + 1) * BATCH]
            for b in range(3, 3 + N_BATCHES)
        ]
        bt = time.time()
        res = executor.search_batches(batches, K)
        wall = time.time() - bt
        total = sum(len(r) for r in res)
        dt = np.array(executor.batch_spans)
        result[kind] = {
            "qps": round(total / wall, 1),
            "p50_ms": round(float(np.percentile(dt * 1000, 50)), 1),
            "p99_ms": round(float(np.percentile(dt * 1000, 99)), 1),
        }

        # exactness gate: device vs host top-10 doc addresses
        sample = qlog[:EXACT_SAMPLE]
        dev = executor.search_batch(sample, K)
        exact = True
        for q, d in zip(sample, dev):
            h = searcher.search(q, tt.TopDocs(K))
            if [a for _, a in d] != [a for _, a in h]:
                exact = False
                break
        result[kind]["exact_match"] = exact
    if label == "scaled1m":
        # host-tail + expansion suites (1 warm batch, 2 timed): sloppy
        # phrases measure the pruned host tail (`Weight.topk` thresholds +
        # per-(segment, term) decode LRU); phrase-prefixes expand against
        # the term dict and ride the device phrase kernels
        for kind in ("sloppy", "prefix"):
            qlog = logs[kind]
            executor.search_batch(qlog[:BATCH], K)
            batches = [qlog[b * BATCH : (b + 1) * BATCH] for b in (1, 2)]
            bt = time.time()
            res = executor.search_batches(batches, K)
            wall = time.time() - bt
            total = sum(len(r) for r in res)
            dt = np.array(executor.batch_spans)
            result[kind] = {
                "qps": round(total / wall, 1),
                "p50_ms": round(float(np.percentile(dt * 1000, 50)), 1),
            }
            sample = qlog[:64]
            dev = executor.search_batch(sample, K)
            exact = True
            for q, d in zip(sample, dev):
                h = searcher.search(q, tt.TopDocs(K))
                if [a for _, a in d] != [a for _, a in h]:
                    exact = False
                    break
            result[kind]["exact_match"] = exact
    if label == "wiki1k":
        # k-variation gate. k_eff quantization makes k=3 reuse the k=10
        # compiled programs, so no extra prewarm is needed.
        k3_ok = True
        for kind in suites:
            sample = logs[kind][:BATCH]
            dev = executor.search_batch(sample, 3)
            for q, d in zip(sample[:32], dev[:32]):
                h = searcher.search(q, tt.TopDocs(3))
                if [a for _, a in d] != [a for _, a in h]:
                    k3_ok = False
        result["exact_match_k3"] = k3_ok
    result["warmup_s"] = round(warm_s, 1)
    result["fallbacks"] = dict(getattr(executor, "fallbacks", {}) or {})
    return searcher, executor, result


def run_range_suite(searcher, executor, n_docs):
    import tantivy_tpu as tt

    rng = np.random.default_rng(77)
    qlog = make_range_log(rng, BATCH * (N_BATCHES + 1), n_docs)
    executor.count_batch(qlog[:BATCH])  # warm column sort caches
    times = []
    total = 0
    for b in range(1, 1 + N_BATCHES):
        batch = qlog[b * BATCH : (b + 1) * BATCH]
        t0 = time.time()
        res = executor.count_batch(batch)
        times.append(time.time() - t0)
        total += len(res)
    dt = np.array(times)
    from tantivy_tpu.collector import Count

    exact = all(
        c == searcher.search(q, Count())
        for q, c in zip(qlog[:RANGE_EXACT_SAMPLE],
                        executor.count_batch(qlog[:RANGE_EXACT_SAMPLE]))
    )
    return {
        "qps": round(total / dt.sum(), 1),
        "p50_ms": round(float(np.percentile(dt * 1000, 50)), 3),
        "p99_ms": round(float(np.percentile(dt * 1000, 99)), 3),
        "exact_match": exact,
    }


def run_docfetch_suite(searcher, executor, stream):
    """Batched `searcher.docs()` over the top-K addresses of term batches
    (the post-ranking fetch of a real serving path). Reference bar:
    `store/reader.rs:25,63` block-cached reads."""
    rng = np.random.default_rng(55)
    logs = make_query_log(searcher, stream, rng, BATCH * 3)
    addr_sets = []
    for b in range(3):
        hits = executor.search_batch(logs["term"][b * BATCH:(b + 1) * BATCH],
                                     K)
        addr_sets.append([a for h in hits for _, a in h])
    # warm one set (store LRU + JSON decode code paths)
    docs = searcher.docs(addr_sets[0])
    ok = all(
        d is not None and d.get_first("body") is not None for d in docs[:32]
    )
    fetched = 0
    t0 = time.time()
    for addrs in addr_sets:
        fetched += len(searcher.docs(addrs))
    dt = time.time() - t0
    stats = searcher.doc_store_cache_stats()
    return {
        "docs_per_s": round(fetched / dt, 1),
        "fetched": fetched,
        "stored_ok": ok,
        "cache_hit_rate": round(
            stats["cache_hits"]
            / max(stats["cache_hits"] + stats["cache_misses"], 1), 3,
        ),
    }


def _agg_goldens(searcher, results, n_docs):
    """Golden exactness gate: recompute avg/stats/histogram/terms/range/
    composite straight from the raw fast-field columns in plain numpy
    (independent of the aggregation module's bucketing machinery) and
    compare exactly. Percentiles are sketch-based by design (DDSketch) and
    are gated on count only."""
    from tantivy_tpu.aggregation import _convert_raw_f64

    per_seg = []
    for r in searcher.segment_readers():
        score = r.fast_fields().column("score").values.astype(np.float64)
        sf = _convert_raw_f64(
            r.fast_fields().column("score_f64").values, "f64"
        )
        per_seg.append((score, sf))

    ok = True

    def expect(cond, label):
        nonlocal ok
        if not cond:
            ok = False
            print(f"AGG GOLDEN MISMATCH: {label}", file=sys.stderr)

    # avg_u64 (segment-ordered float accumulation like InterMetric)
    total = 0.0
    cnt = 0
    for score, _ in per_seg:
        total += float(score.sum())
        cnt += len(score)
    expect(
        results["avg_u64"]["a"]["value"] == total / cnt
        and cnt == n_docs,
        "avg_u64",
    )
    # stats_f64
    t = tsq = 0.0
    vmin, vmax = np.inf, -np.inf
    for _, sf in per_seg:
        t += float(sf.sum())
        tsq += float((sf * sf).sum())
        vmin = min(vmin, float(sf.min()))
        vmax = max(vmax, float(sf.max()))
    s = results["stats_f64"]["s"]
    expect(
        s["count"] == n_docs and s["sum"] == t and s["min"] == vmin
        and s["max"] == vmax and s["avg"] == t / n_docs,
        "stats_f64",
    )
    expect(
        results["percentiles_f64"]["p"] is not None, "percentiles"
    )
    # histogram interval 10 over score
    allscore = np.concatenate([sc for sc, _ in per_seg])
    hkeys = np.floor(allscore / 10.0) * 10.0
    uniq, counts = np.unique(hkeys, return_counts=True)
    got = {b["key"]: b["doc_count"] for b in results["histogram"]["h"]["buckets"]}
    expect(
        got == {float(k): int(c) for k, c in zip(uniq, counts)}, "histogram"
    )
    # terms size 100: top-100 by (count desc, key asc)
    tuniq, tcounts = np.unique(allscore, return_counts=True)
    order = np.lexsort((tuniq, -tcounts))[:100]
    want = [(int(tuniq[i]), int(tcounts[i])) for i in order]
    gotb = [
        (b["key"], b["doc_count"])
        for b in results["terms_1000"]["t"]["buckets"]
    ]
    expect(gotb == want, "terms")
    # range + sub avg
    allsf = np.concatenate([sf for _, sf in per_seg])
    rbuckets = results["range_with_avg"]["r"]["buckets"]
    bounds = [(-np.inf, 100.0), (100.0, 500.0), (500.0, np.inf)]
    for bkt, (lo, hi) in zip(rbuckets, bounds):
        # per-segment accumulation matching InterMetric merge order
        c2 = 0
        t2 = 0.0
        for sc, sf in per_seg:
            sel = (sc >= lo) & (sc < hi)
            c2 += int(sel.sum())
            if sel.any():
                t2 += float(sf[sel].sum())
        expect(
            bkt["doc_count"] == c2
            and bkt["a"]["value"] == (t2 / c2 if c2 else None),
            f"range {lo}-{hi}",
        )
    # composite: first 100 keys ascending with counts
    cuniq = uniqc = None
    cuniq, uniqc = np.unique(allscore, return_counts=True)
    want_c = [
        (float(k), int(c)) for k, c in zip(cuniq[:100], uniqc[:100])
    ]
    got_c = [
        (b["key"]["s"], b["doc_count"])
        for b in results["composite"]["c"]["buckets"]
    ]
    expect(got_c == want_c, "composite")
    return ok


def run_agg_suite(searcher, executor, n_docs):
    per_req = {}
    total_reqs = 0
    total_s = 0.0
    names = list(AGG_REQUESTS)
    reqs = [AGG_REQUESTS[n] for n in names]
    results = dict(zip(names, executor.agg_batch(reqs)))  # warm
    # batched: all requests share one doc pass per repetition
    t0 = time.time()
    for _ in range(AGG_REPEATS):
        out = executor.agg_batch(reqs)
    batch_s = (time.time() - t0) / AGG_REPEATS
    for name, req in AGG_REQUESTS.items():
        t0 = time.time()
        for _ in range(AGG_REPEATS):
            res = executor.agg_batch([req])[0]
        dt = time.time() - t0
        per_req[name] = round(AGG_REPEATS / dt, 2)
        total_reqs += AGG_REPEATS
        total_s += dt
    return {
        "qps": round(total_reqs / total_s, 2),
        "batch7_ms": round(batch_s * 1000, 2),
        "per_request_qps": per_req,
        "exact_match": _agg_goldens(searcher, results, n_docs),
    }


def measure_indexing(stream):
    """Cold single-thread vs multi-thread ingest throughput (reference
    indexes full Wikipedia '<3 min, multithreaded', README.md:39).

    Runs in a SUBPROCESS: by this point the bench process holds the 1M-doc
    searcher, device stores, agg caches and the doc-store LRU — allocator
    and GC state that slowed the in-process measurement ~2-4x on a 1-CPU
    box. A fresh interpreter measures what a cold indexer actually does."""
    import subprocess

    code = (
        "import sys, json; sys.path.insert(0, %r); "
        "import bench; corpora, stream, _ = bench.make_corpora(); "
        "print(json.dumps(bench._measure_indexing_inproc(stream)))"
        % str(Path(__file__).resolve().parent)
    )
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1200, env=env,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        return _measure_indexing_inproc(stream)


def _measure_indexing_inproc(stream):
    import shutil
    import tempfile

    n = 100_000
    out = {"cpus": os.cpu_count()}
    # synthesizing the corpus from the token stream is bench infrastructure
    # (the reference reads pre-existing JSON lines); materialize the doc
    # dicts outside the timed window so the timer covers indexing only
    docs = list(scaled_docs(stream, n))
    for threads, key in ((1, "docs_per_s_1t"), (None, "docs_per_s_mt")):
        tmp = tempfile.mkdtemp(prefix="tantivy_tpu_idx_bench")
        try:
            _, dt = _build_index(
                Path(tmp), iter(docs), n, with_fast=True,
                num_threads=threads,
            )
            out[key] = round(n / dt, 1)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def main():
    import tantivy_tpu as tt

    tt.enable_compilation_cache()
    corpora, stream, have_wiki = make_corpora()

    detail = {"corpora": {}}
    all_qps = []
    all_exact = True
    for name, docs_fn, n_docs, with_fast in corpora:
        index, build_s = _open_or_build(
            name, docs_fn, n_docs, with_fast,
            commit_every=(n_docs // SCALED_COMMITS if with_fast else None),
        )
        searcher, executor, res = run_main_suites(index, stream, name, detail)
        res["docs"] = n_docs
        res["segments"] = len(searcher.segment_readers())
        res["index_build_s"] = round(build_s, 1)
        if with_fast:
            res["range"] = run_range_suite(searcher, executor, n_docs)
            res["agg"] = run_agg_suite(searcher, executor, n_docs)
            res["docfetch"] = run_docfetch_suite(searcher, executor, stream)
        detail["corpora"][name] = res
        if with_fast:
            all_qps = [res[k]["qps"] for k in ("term", "and", "or", "phrase")]
            all_exact = all(
                res[k]["exact_match"]
                for k in ("term", "and", "or", "phrase")
            ) and res["range"]["exact_match"]

    detail["indexing"] = measure_indexing(stream)
    qps = float(np.mean(all_qps)) if all_qps else 0.0
    detail["wiki_corpus"] = have_wiki
    detail["batch_size"] = BATCH
    # per-suite calibrated baselines (see BASELINE.md "Per-suite baseline
    # calibration"): single-core tantivy QPS at 1M docs, derived from the
    # search-benchmark-game cost shape anchored at 1000 term-QPS/core
    bases = {"term": 1000.0, "and": 770.0, "or": 400.0, "phrase": 330.0}
    ratios = {}
    scaled = detail["corpora"].get("scaled1m", {})
    for kind, base in bases.items():
        if kind in scaled:
            ratios[kind] = round(scaled[kind]["qps"] / base, 3)
    detail["vs_baseline_per_suite"] = ratios
    vs = round(float(np.mean(list(ratios.values()))), 3) if ratios else 0.0
    print(
        json.dumps(
            {
                "metric": "batched_qps_top10_wiki_term_and_or_phrase",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": vs,
                "exact_match": all_exact,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
