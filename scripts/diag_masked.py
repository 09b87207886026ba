"""Time a fully-masked (all-padding) fused launch vs the real one —
isolates the cost of tier padding."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import bench  # noqa: E402
import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402
from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402

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
logs = bench.make_query_log(searcher, stream, rng, bench.BATCH * 3)

executor.search_batch(logs["and"][:256], 10)  # warm

pp._DEBUG_LAUNCHES = []
executor.search_batch(logs["and"][256:512], 10)
captured = pp._DEBUG_LAUNCHES
pp._DEBUG_LAUNCHES = None

big = max(captured, key=lambda c: sum(ch[0][0] for ch in c["chunks"]))
T = big["n_clauses"]
num_prows = big["num_prows"]
num_queries = big["num_queries"]


def run(chunks, label):
    rungs = tuple(c[0] for c in chunks)
    args = (
        tuple(c[1] for c in chunks), tuple(c[2] for c in chunks),
        tuple(c[3] for c in chunks), *big["table_args"], big["cstore"],
    )
    kw = dict(k=big["k"], num_queries=num_queries, num_prows=num_prows,
              n_clauses=T, rungs=rungs, interpret=False,
              pack_addr=big["pack_addr"])
    out = pp.fused_bool_topk(*args, **kw)
    out.block_until_ready()
    times = []
    for _ in range(5):
        t0 = time.time()
        out = pp.fused_bool_topk(*args, **kw)
        out.block_until_ready()
        times.append(time.time() - t0)
    print(f"{label}: rungs={[c[0] for c in chunks]} "
          f"steady={min(times) * 1e3:.0f}ms", flush=True)


run(big["chunks"], "real launch")
empty = [
    pp._empty_chunk(kwid, W, G, T, num_prows, num_queries)
    for (W, kwid, G), _, _, _ in big["chunks"]
]
run(empty, "all-masked launch")

# half-empty: real rung16, empty rung64 and vice versa
mixed1 = [big["chunks"][0], empty[1]]
mixed2 = [empty[0], big["chunks"][1]]
run(mixed1, "real rung16 only")
run(mixed2, "real rung64 only")
