"""Capture one suite's fused launches and replay the big (phase-2) one with
varied kernel parameters — isolates per-program overhead vs DMA/compute.

Usage: python scripts/diag_replay.py [and|or] [G_mults...]
e.g. python scripts/diag_replay.py and 1 2 4
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import bench  # noqa: E402
import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402
from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402

KIND = sys.argv[1] if len(sys.argv) > 1 else "and"
MULTS = [float(x) for x in sys.argv[2:]] or [1.0]

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

executor.search_batch(qlog[:256], 10)  # warm compiles

pp._DEBUG_LAUNCHES = []
executor.search_batch(qlog[256:512], 10)
captured = pp._DEBUG_LAUNCHES
pp._DEBUG_LAUNCHES = None
print(f"captured {len(captured)} launches")

# biggest launch by total W
def size_of(c):
    return sum(ch[0][0] for ch in c["chunks"])

captured.sort(key=size_of, reverse=True)
big = captured[0]
print("replaying biggest launch:",
      [(ch[0], int(np.asarray(ch[2]).size)) for ch in big["chunks"]])

orig_g = pp._g_items_grp

for mult in MULTS:
    def patched(kw, n_clauses, _m=mult):
        g = orig_g(kw, n_clauses)
        return max(4, int(g * _m))

    pp._g_items_grp = patched
    # rebuild chunks from the original: the capture stores final chunks
    # whose (W, kw, G) triple came from the original G — recompute G only
    chunks = []
    for (W, kw, G), scal, qp, sp in big["chunks"]:
        G2 = patched(kw, 2)
        # scal pages are [P, R, 128] with P = W // G; repack for G2
        import tantivy_tpu.ops.pallas_probe as _pp
        STRIDE, SPR, R = _pp._grp_scal_layout(big["n_clauses"], G)
        rows = np.asarray(scal).reshape(W // G, R * 128)[
            :, : G * STRIDE
        ].reshape(W, STRIDE)
        S2, _, R2 = _pp._grp_scal_layout(big["n_clauses"], G2)
        W2 = -(-W // G2) * G2
        rows2 = np.zeros((W2, S2), dtype=np.int32)
        rows2[:, 1] = big["num_prows"]
        rows2[:, 4:4 + big["n_clauses"]] = -1
        rows2[:W, :STRIDE] = rows
        qp2 = np.full(W2, big["num_queries"], np.int32)
        qp2[:W] = np.asarray(qp)[:W]
        sp2 = np.zeros(W2, np.int32)
        sp2[:W] = np.asarray(sp)[:W]
        flat = rows2.reshape(W2 // G2, G2 * S2)
        flat = np.pad(flat, ((0, 0), (0, R2 * 128 - G2 * S2)))
        import jax.numpy as jnp
        chunks.append(((W2, kw, G2), jnp.asarray(flat.reshape(W2 // G2, R2, 128)),
                       jnp.asarray(qp2), jnp.asarray(sp2)))

    rungs = tuple(c[0] for c in chunks)
    t0 = time.time()
    out = pp.fused_bool_topk(
        tuple(c[1] for c in chunks), tuple(c[2] for c in chunks),
        tuple(c[3] for c in chunks), *big["table_args"], big["cstore"],
        k=big["k"], num_queries=big["num_queries"],
        num_prows=big["num_prows"], n_clauses=big["n_clauses"],
        rungs=rungs, interpret=False, pack_addr=big["pack_addr"],
    )
    out.block_until_ready()
    t_compile = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        out = pp.fused_bool_topk(
            tuple(c[1] for c in chunks), tuple(c[2] for c in chunks),
            tuple(c[3] for c in chunks), *big["table_args"], big["cstore"],
            k=big["k"], num_queries=big["num_queries"],
            num_prows=big["num_prows"], n_clauses=big["n_clauses"],
            rungs=rungs, interpret=False, pack_addr=big["pack_addr"],
        )
        out.block_until_ready()
        times.append(time.time() - t0)
    print(f"G x{mult}: rungs={[c[0] for c in chunks]} "
          f"first={t_compile:.2f}s steady={min(times)*1e3:.0f}ms")

pp._g_items_grp = orig_g
