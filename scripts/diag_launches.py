"""Per-launch device time + shipped work volume for one suite at 1M docs.

Usage: python scripts/diag_launches.py [and|or|phrase|term] [n_batches]

Wraps the fused launchers to (a) record each launch's work-item/group/rung
composition and (b) time it synchronously (block_until_ready), separating
device execution from host planning. Kills pipelining, so total time is an
overestimate — the per-launch numbers are the point.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import bench  # noqa: E402
import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402
from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402
from tantivy_tpu.ops import pallas_phrase as php  # noqa: E402

KIND = sys.argv[1] if len(sys.argv) > 1 else "and"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3

tt.enable_compilation_cache()
corpora, stream, have_wiki = bench.make_corpora()
name, docs_fn, n_docs, with_fast = next(
    c for c in corpora if c[0] == "scaled1m"
)
index, _ = bench._open_or_build(
    name, docs_fn, n_docs, with_fast,
    commit_every=n_docs // bench.SCALED_COMMITS,
)
searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
rng = np.random.default_rng(123)
logs = bench.make_query_log(searcher, stream, rng, bench.BATCH * (N + 2))
qlog = logs[KIND]

records = []

orig_bool = pp.launch_fused_bool
orig_phrase = php.launch_fused_phrase if hasattr(php, "launch_fused_phrase") else None


def timed_bool(fused, work, tables, k, num_queries, interpret):
    t0 = time.perf_counter()
    outs = orig_bool(fused, work, tables, k, num_queries, interpret)
    t_build = time.perf_counter() - t0
    for o in outs:
        o.block_until_ready()
    t_dev = time.perf_counter() - t0 - t_build
    n_items = len(work[0])
    T = tables["cl_weight"].shape[1]
    records.append(("bool", T, n_items, len(outs), t_build, t_dev))
    return outs


pp.launch_fused_bool = timed_bool

if orig_phrase is not None:
    def timed_phrase(*a, **kw):
        t0 = time.perf_counter()
        outs = orig_phrase(*a, **kw)
        t_build = time.perf_counter() - t0
        for o in outs:
            o.block_until_ready()
        t_dev = time.perf_counter() - t0 - t_build
        records.append(("phrase", -1, -1, len(outs), t_build, t_dev))
        return outs

    php.launch_fused_phrase = timed_phrase

# warm
for b in range(2):
    executor.search_batch(qlog[:256], 10)
records.clear()

t0 = time.time()
for b in range(N):
    lo = 256 * (b + 2)
    executor.search_batch(qlog[lo:lo + 256], 10)
total = time.time() - t0
print(f"[{KIND}] {N} synchronous batches in {total:.2f}s "
      f"({256 * N / total:.0f} QPS lower-bound)")

per_batch = len(records) // N if N else 0
print(f"launch calls/batch: {per_batch}")
for i, (kind, T, n_items, n_launch, t_build, t_dev) in enumerate(records):
    print(f"  [{i % per_batch if per_batch else i}] {kind} T={T} "
          f"items={n_items} launches={n_launch} "
          f"build={t_build * 1e3:.0f}ms dev={t_dev * 1e3:.0f}ms")
    if per_batch and (i + 1) % per_batch == 0:
        print("  ---")

b_dev = sum(r[5] for r in records) / N
b_build = sum(r[4] for r in records) / N
print(f"avg per batch: build={b_build * 1e3:.0f}ms device={b_dev * 1e3:.0f}ms")
