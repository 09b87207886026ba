"""Ablate the big OR phase-2 fused launch to locate in-kernel cost.

Captures the biggest launch of one OR batch, then times variants with
FRESH device uploads per iteration (axon memoizes identical-input calls):
  full     — as captured
  noprobe  — member windows zeroed + jlo=-1 (no window DMA, no pair probes)
  nowork   — all member masks zeroed (scalar-read-only programs)

Usage: python scripts/diag_or_ablate.py [or|and] [reps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402
from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402

KIND = sys.argv[1] if len(sys.argv) > 1 else "or"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

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
qlog = logs[KIND]

executor.prewarm(logs[KIND][:256], k=10)
print("prewarmed", flush=True)
executor.search_batch(qlog[:256], 10)  # warm compiles
print("warm batch done", flush=True)

pp._DEBUG_LAUNCHES = []
executor.search_batch(qlog[256:512], 10)
captured = pp._DEBUG_LAUNCHES
pp._DEBUG_LAUNCHES = None
print(f"captured {len(captured)} launches", flush=True)


def size_of(c):
    return sum(ch[0][0] for ch in c["chunks"])


captured.sort(key=size_of, reverse=True)
big = captured[0]
print("big launch:", [ch[0] for ch in big["chunks"]],
      "k(eff)=", big["k"], flush=True)

T = big["n_clauses"]
A = 4 + T

# unpack each chunk's scal pages back to [W, STRIDE] rows for editing
raw = []
for (W, kw, G), scal, qp, sp in big["chunks"]:
    STRIDE, SPR, R = pp._grp_scal_layout(T, G)
    rows = np.asarray(scal).reshape(W // G, R * 128)[:, : G * STRIDE]
    rows = rows.reshape(W, STRIDE).copy()
    raw.append(((W, kw, G), rows, np.asarray(qp), np.asarray(sp), STRIDE, R))


def variant(mode):
    chunks = []
    for (W, kw, G), rows, qp, sp, STRIDE, R in raw:
        r = rows.copy()
        if mode == "noprobe":
            r[:, 4:4 + T] = -1        # no window DMA
            r[:, A:A + 8 * T] = 0     # no member probes
        elif mode == "nowork":
            r[:, 3] = 0               # fully masked
            r[:, 4:4 + T] = -1
        flat = r.reshape(W // G, G * STRIDE)
        flat = np.pad(flat, ((0, 0), (0, R * 128 - G * STRIDE)))
        chunks.append(((W, kw, G), flat.reshape(W // G, R, 128), qp, sp))
    return chunks


def run_once(chunks_np):
    chunks = [
        (c[0], jnp.asarray(c[1]), jnp.asarray(c[2]), jnp.asarray(c[3]))
        for c in chunks_np
    ]
    rungs = tuple(c[0] for c in chunks)
    t0 = time.time()
    out = pp.fused_bool_topk(
        tuple(c[1] for c in chunks), tuple(c[2] for c in chunks),
        tuple(c[3] for c in chunks), *big["table_args"], big["cstore"],
        k=big["k"], num_queries=big["num_queries"],
        num_prows=big["num_prows"], n_clauses=T,
        rungs=rungs, interpret=False, pack_addr=big["pack_addr"],
    )
    out.block_until_ready()
    return time.time() - t0


for mode in ("full", "noprobe", "nowork"):
    chunks_np = variant(mode)
    run_once(chunks_np)  # compile/warm
    times = [run_once(chunks_np) for _ in range(REPS)]
    print(f"{mode:8s}: min={min(times)*1e3:.0f}ms "
          f"all={[f'{t*1e3:.0f}' for t in times]}", flush=True)
