"""Per-phase in-kernel cost decomposition of the big OR phase-2 launch.

First run captures the launch to /tmp/or_launch.npz (slow: index open +
prewarm). Later runs load the npz and time per-rung _grp_rows kernels under
each ablation mode (fresh uploads per rep — axon memoizes identical-input
calls):
  full / nodma / noprobe2 / nocombine / noextract

Usage: python scripts/diag_kernel_ablate.py [or|and] [reps]
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402

KIND = sys.argv[1] if len(sys.argv) > 1 else "or"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
NPZ = f"/tmp/{KIND}_launch.npz"

tt.enable_compilation_cache()

if not os.path.exists(NPZ):
    import bench  # noqa: E402
    from tantivy_tpu.parallel import BatchExecutor  # noqa: E402

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
    logs = bench.make_query_log(searcher, stream, rng, 256 * 3)
    executor.prewarm(logs[KIND][:256], k=10)
    executor.search_batch(logs[KIND][:256], 10)
    pp._DEBUG_LAUNCHES = []
    executor.search_batch(logs[KIND][256:512], 10)
    captured = pp._DEBUG_LAUNCHES
    pp._DEBUG_LAUNCHES = None
    captured.sort(key=lambda c: sum(ch[0][0] for ch in c["chunks"]),
                  reverse=True)
    big = captured[0]
    save = {
        "k": big["k"], "num_queries": big["num_queries"],
        "num_prows": big["num_prows"], "n_clauses": big["n_clauses"],
        "cstore": np.asarray(big["cstore"]),
        "n_chunks": len(big["chunks"]),
    }
    for i, ((W, kw, G), scal, qid, seg) in enumerate(big["chunks"]):
        save[f"c{i}_wkg"] = np.array([W, kw, G])
        save[f"c{i}_scal"] = np.asarray(scal)
        save[f"c{i}_qid"] = np.asarray(qid)
        save[f"c{i}_seg"] = np.asarray(seg)
    for j, t in enumerate(big["table_args"]):
        save[f"t{j}"] = np.asarray(t)
    np.savez(NPZ, **save)
    print("captured ->", NPZ, flush=True)

d = np.load(NPZ)
n_clauses = int(d["n_clauses"])
num_prows = int(d["num_prows"])
kk = min(int(d["k"]), 128)
cstore = jnp.asarray(d["cstore"])
n_tabs = len([k for k in d.files if k.startswith("t") and k[1:].isdigit()])
tables = tuple(jnp.asarray(d[f"t{j}"]) for j in range(min(n_tabs, 7)))
chunks = []
for i in range(int(d["n_chunks"])):
    W, kw, G = (int(x) for x in d[f"c{i}_wkg"])
    chunks.append(((W, kw, G), d[f"c{i}_scal"]))
print("chunks:", [c[0] for c in chunks], "kk:", kk, flush=True)

# flattened tables as _grp_rows expects (+ row_th: all -inf = blind extract,
# matching the captured pre-threshold behavior; captures taken after the
# row_th change carry their own t7)
if n_tabs > 7:
    row_th = jnp.asarray(d["t7"])
else:
    row_th = jnp.full((num_prows + 1,), -np.inf, jnp.float32)
flat_tables = (
    tables[0].reshape(-1), tables[1].reshape(-1), tables[2].reshape(-1),
    tables[3].reshape(-1), tables[4].reshape(-1), tables[5], tables[6],
    row_th,
)

for mode in ("full", "nodma", "noprobe2", "nocombine", "noextract"):
    pp._ABLATE = None if mode == "full" else mode
    per_rung = []
    for (W, kw, G), scal_np in chunks:
        fn = jax.jit(partial(
            pp._grp_rows, n_clauses=n_clauses, kw=kw,
            num_prows=num_prows, G=G, W=W, kk=kk, interpret=False,
        ))

        def run():
            scal = jnp.asarray(scal_np)  # fresh upload per rep
            t0 = time.time()
            out = fn(scal, *flat_tables, cstore)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
            return time.time() - t0

        run()  # compile
        times = [run() for _ in range(REPS)]
        per_rung.append((W, kw, min(times)))
    tot = sum(t for _, _, t in per_rung)
    print(f"{mode:10s}: total={tot*1e3:.0f}ms  "
          + "  ".join(f"W{w}/kw{kw}={t*1e3:.0f}ms" for w, kw, t in per_rung),
          flush=True)
pp._ABLATE = None
