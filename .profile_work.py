"""Inspect fused planner work volumes for one AND + one OR batch."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import tantivy_tpu as tt
tt.enable_compilation_cache()
import bench
from tantivy_tpu.parallel import BatchExecutor
import tantivy_tpu.ops.pallas_probe as pp

corpora, stream, _ = bench.make_corpora()
name, docs_fn, n_docs = corpora[-1]
index, _ = bench._open_or_build(name, docs_fn, n_docs)
searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
rng = np.random.default_rng(123)
logs = bench.make_query_log(searcher, stream, rng, 256 * 3)

orig = pp.launch_fused_bool
calls = []
def spy(fused, work, tables, k, nq, interpret):
    blocks, prow, clause, width, qid, seg, skip = work
    hist = {}
    prev = -1
    for kw in pp._FUSED_RUNGS:
        hist[f"kw{kw}"] = int(((width > prev) & (width <= kw)).sum())
        prev = kw
    hist["wider"] = int((width > prev).sum())
    hist["skipped_probes"] = int((skip != 0).sum())
    calls.append((len(blocks), hist))
    t0 = time.time()
    r = orig(fused, work, tables, k, nq, interpret)
    calls[-1] = calls[-1] + (round(time.time() - t0, 2),)
    return r
pp.launch_fused_bool = spy

for kind in ("and", "or"):
    for b in range(2):
        calls.clear()
        t0 = time.time()
        executor.search_batch(logs[kind][b*256:(b+1)*256], 10)
        dt = time.time() - t0
        print(f"{kind} batch{b}: {dt*1000:.0f} ms, fallbacks={getattr(executor,'fallbacks',{})}")
        for c in calls:
            print("   work:", c)
