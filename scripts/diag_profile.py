"""cProfile the steady-state host side of one suite's batches.

Usage: python scripts/diag_profile.py [and|or|phrase|term] [n_batches]
Prints cumulative-time hotspots for the host planner/collector; device
waits show up inside jax array conversions (asarray / block_until_ready).
"""

import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402

KIND = sys.argv[1] if len(sys.argv) > 1 else "and"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4

tt.enable_compilation_cache()
corpora, stream, have_wiki = bench.make_corpora()
name, docs_fn, n_docs, with_fast = [c for c in corpora
                                    if c[0] == "scaled1m"][0]
index, _ = bench._open_or_build(
    name, docs_fn, n_docs, with_fast,
    commit_every=n_docs // bench.SCALED_COMMITS,
)
searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
rng = np.random.default_rng(123)
logs = bench.make_query_log(searcher, stream, rng, bench.BATCH * (N + 2))
qlog = logs[KIND]

for b in range(2):  # warm trace/compile
    executor.search_batch(qlog[b * bench.BATCH : (b + 1) * bench.BATCH],
                          bench.K)

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
for b in range(2, 2 + N):
    executor.search_batch(qlog[b * bench.BATCH : (b + 1) * bench.BATCH],
                          bench.K)
pr.disable()
print(f"[{KIND}] {N} batches in {time.time()-t0:.2f}s", flush=True)
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
