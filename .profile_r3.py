"""Round-3 profiling: per-suite launch counts + phase timings on the real TPU."""
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")
import tantivy_tpu as tt

tt.enable_compilation_cache()
from tantivy_tpu.parallel import BatchExecutor
from tantivy_tpu.utils.trace import tracer
import bench

corpora, stream, have_wiki = bench.make_corpora()
name, docs_fn, n_docs = corpora[-1]  # scaled
index, _ = bench._open_or_build(name, docs_fn, n_docs)
searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
rng = np.random.default_rng(123)
logs = bench.make_query_log(searcher, stream, rng, 256 * 4)

# count kernel launches
import tantivy_tpu.ops.probe_scorer as ps
import tantivy_tpu.ops.phrase_scorer as ph
import tantivy_tpu.ops.pallas_probe as pp
import tantivy_tpu.ops.flat_scorer as fl

counters = {}
def wrap(mod, fname):
    orig = getattr(mod, fname)
    def wrapped(*a, **k):
        key = fname
        if "kw" in k:
            key += f"_kw{k['kw']}"
        if "pw" in k:
            key += f"_pw{k['pw']}"
        counters[key] = counters.get(key, 0) + 1
        return orig(*a, **k)
    setattr(mod, fname, wrapped)
    return orig

wrap(pp, "pallas_bool_topk")
wrap(ps, "probe_bool_topk_window")
wrap(ps, "probe_bool_topk")
wrap(ph, "probe_phrase_topk")
wrap(fl, "flat_topk_kernel")

tracer.enable()
for kind in ("term", "and", "or", "phrase"):
    qlog = logs[kind]
    # warm
    for b in range(2):
        executor.search_batch(qlog[b * 256 : (b + 1) * 256], 10)
    counters.clear()
    tracer.clear()
    t0 = time.time()
    executor.search_batch(qlog[2 * 256 : 3 * 256], 10)
    dt = time.time() - t0
    print(f"== {kind}: {dt*1000:.0f} ms ({256/dt:.0f} QPS)")
    print("   launches:", dict(counters))
    tot = tracer.span_totals()
    for k2, v in sorted(tot.items(), key=lambda x: -x[1])[:8]:
        print(f"   span {k2}: {v*1000:.0f} ms")
