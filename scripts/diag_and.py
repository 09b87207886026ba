"""Diagnose the AND-suite regression: per-batch timing + compile logging.

Builds (or opens) the scaled1m bench index, prewarms, then runs the AND
suite batch-by-batch printing per-batch wall time, tracer span totals, and
XLA compile events (via jax_log_compiles -> stderr and a compile counter).
"""

import json
import logging
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("TANTIVY_TPU_TRACE", "1")

import jax

jax.config.update("jax_log_compiles", True)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)
logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.DEBUG)

import bench  # noqa: E402  (repo-root bench.py)
import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402
from tantivy_tpu.utils.trace import tracer  # noqa: E402

SUITES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["and"]
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8

tt.enable_compilation_cache()
corpora, stream, have_wiki = bench.make_corpora()
name, docs_fn, n_docs, with_fast = [c for c in corpora if c[0] == "scaled1m"][0]
t0 = time.time()
index, build_s = bench._open_or_build(
    name, docs_fn, n_docs, with_fast,
    commit_every=n_docs // bench.SCALED_COMMITS,
)
print(f"[open/build] {time.time()-t0:.1f}s (recorded build {build_s:.1f}s)",
      flush=True)

searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
rng = np.random.default_rng(123)
logs = bench.make_query_log(searcher, stream, rng, bench.BATCH * (N_BATCHES + 3))

t0 = time.time()
shapes = executor.prewarm(logs["or"][:bench.BATCH], k=bench.K)
shapes += executor.prewarm(logs["phrase"][:bench.BATCH], k=bench.K)
print(f"[prewarm] {time.time()-t0:.1f}s shapes={shapes}", flush=True)

for kind in SUITES:
    qlog = logs[kind]
    for b in range(2):
        t0 = time.time()
        executor.search_batch(qlog[b * bench.BATCH : (b + 1) * bench.BATCH],
                              bench.K)
        print(f"[{kind} warm {b}] {time.time()-t0:.2f}s", flush=True)
    for b in range(3, 3 + N_BATCHES):
        tracer.clear()
        batch = qlog[b * bench.BATCH : (b + 1) * bench.BATCH]
        t0 = time.time()
        executor.search_batch(batch, bench.K)
        dt = time.time() - t0
        tot = tracer.span_totals()
        spans = " ".join(
            f"{k}={v*1000:.0f}ms" for k, v in sorted(
                tot.items(), key=lambda kv: -kv[1])[:8]
        )
        print(f"[{kind} batch {b}] {dt:.2f}s | {spans}", flush=True)
    print(f"[{kind}] plan_stats={getattr(executor, 'plan_stats', {})} "
          f"fallbacks={getattr(executor, 'fallbacks', {})}", flush=True)
