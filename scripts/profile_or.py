"""Profile one suite's 256-query batch at 1M docs with span tracing.

Usage: python scripts/profile_or.py [or|and|phrase|term] [n_batches]
Reuses bench.py's cached scaled1m index and query-log generator; prints a
per-span time summary (host planning vs device launches) for timed batches.
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TANTIVY_TPU_TRACE", "1")

import numpy as np  # noqa: E402

import bench  # noqa: E402
import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402
from tantivy_tpu.utils.trace import tracer  # noqa: E402


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "or"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    tt.enable_compilation_cache()
    corpora, stream, _ = bench.make_corpora()
    (name, docs_fn, n_docs, with_fast) = next(
        c for c in corpora if c[0] == "scaled1m"
    )
    index, _ = bench._open_or_build(
        name, docs_fn, n_docs, with_fast,
        commit_every=n_docs // bench.SCALED_COMMITS,
    )
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher, mode="dense")
    rng = np.random.default_rng(123)
    logs = bench.make_query_log(searcher, stream, rng, bench.BATCH * 6)
    qlog = logs[kind]
    ex.prewarm(logs["or"][: bench.BATCH], k=bench.K)
    if kind == "phrase":
        ex.prewarm(logs["phrase"][: bench.BATCH], k=bench.K)

    # warm
    ex.search_batch(qlog[: bench.BATCH], bench.K)
    tracer.clear()

    t0 = time.time()
    for b in range(1, 1 + n_batches):
        bt = time.time()
        ex.search_batch(qlog[b * bench.BATCH : (b + 1) * bench.BATCH], bench.K)
        print(f"batch {b}: {time.time() - bt:.3f}s")
    wall = time.time() - t0

    spans = defaultdict(lambda: [0.0, 0])
    for ev in list(tracer.events):
        if ev.get("ph") == "X":
            s = spans[ev["name"]]
            s[0] += ev["dur"] / 1e6
            s[1] += 1
    print(f"\nwall {wall:.3f}s  qps {n_batches * bench.BATCH / wall:.1f}")
    print(f"{'span':<40}{'total_s':>10}{'calls':>8}{'avg_ms':>10}")
    for name, (tot, cnt) in sorted(spans.items(), key=lambda kv: -kv[1][0]):
        print(f"{name:<40}{tot:>10.3f}{cnt:>8}{tot / cnt * 1000:>10.2f}")
    print("plan_stats:", dict(getattr(ex, "plan_stats", {}) or {}))
    print("fallbacks:", dict(getattr(ex, "fallbacks", {}) or {}))


if __name__ == "__main__":
    main()
