"""Steady-state phase breakdown on the cached 1M bench corpus."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor
from tantivy_tpu.utils.trace import tracer

tt.enable_compilation_cache()

src = open("/root/repo/bench.py").read().replace(
    'if __name__ == "__main__":', 'if False:'
)
ns = {"__file__": "/root/repo/bench.py"}
exec(compile(src, "bench.py", "exec"), ns)

index = tt.Index.open_in_dir("/root/repo/.bench_cache/scaled1m")
searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
corpora, stream, have_wiki = ns["make_corpora"]()
rng = np.random.default_rng(123)
logs = ns["make_query_log"](searcher, stream, rng, 1024)

kinds = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "term", "and", "or", "phrase"
]
for kind in kinds:
    for rep in range(3):
        t0 = time.time()
        executor.search_batch(logs[kind][:256], 10)
        dt = time.time() - t0
        print(f"{kind} rep{rep}: {dt*1000:.0f} ms "
              f"({256/dt:.0f} QPS)", flush=True)
    tracer.enable()
    tracer.clear()
    t0 = time.time()
    executor.search_batch(logs[kind][:256], 10)
    dt = time.time() - t0
    tracer.disable()
    spans = {}
    for e in tracer._events:
        spans.setdefault(e["name"], [0.0, 0])
        spans[e["name"]][0] += e["dur"] / 1e3
        spans[e["name"]][1] += 1
    print(f"== {kind}: {dt*1000:.0f} ms total")
    for name, (ms, n) in sorted(spans.items(), key=lambda x: -x[1][0]):
        print(f"   {name}: {ms:.0f} ms over {n} spans", flush=True)
