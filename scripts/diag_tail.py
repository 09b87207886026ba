"""Decompose the fused-launch cost post in-kernel top-k: pallas probe
kernel alone (per rung tier) vs the per-query merge tail."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tantivy_tpu as tt  # noqa: E402

tt.enable_compilation_cache()

from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402
from tantivy_tpu.ops import probe_scorer as ps  # noqa: E402

T = 2
num_prows = 2048
num_queries = 256
K = 32
NB = 1536

tables = [
    jnp.zeros((num_prows + 1) * T, jnp.float32),       # cl_weight
    jnp.full(((num_prows + 1) * T,), 3, jnp.int32),    # cl_kind
    jnp.zeros((num_prows + 1) * T, jnp.int32),
    jnp.zeros((num_prows + 1) * T, jnp.int32),
    jnp.zeros((num_prows + 1) * T, jnp.int32),
    jnp.full((num_prows + 1,), 1 << 30, jnp.int32),
    jnp.zeros(num_prows + 1, jnp.int32),
]
cstore = jnp.full((NB, 384), np.uint32(pp.TERMINATED), jnp.uint32)


_perturb = jax.jit(lambda x, i: x + i)


def bench(fn, *args, label=""):
    """args[0] is perturbed per call (axon memoizes identical-input calls)."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    times = []
    for i in range(5):
        a0 = _perturb(args[0], jnp.zeros((), args[0].dtype) * i)
        a0 = a0.block_until_ready()
        t0 = time.time()
        out = fn(a0, *args[1:])
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        times.append(time.time() - t0)
    print(f"{label}: {min(times) * 1e3:.1f}ms", flush=True)
    return out


for (W, kw, G) in ((65536, 16, 64), (8192, 64, 16), (8192, 16, 64),
                   (256, 16, 64), (256, 64, 16)):
    chunk = pp._empty_chunk(kw, W, G, T, num_prows, num_queries)
    scal, qid, seg = chunk[1], chunk[2], chunk[3]

    grp = jax.jit(partial(
        pp._grp_rows, n_clauses=T, kw=kw, num_prows=num_prows, G=G, W=W,
        kk=K, interpret=False,
    ))
    scores, docs = bench(
        grp, scal, *tables, cstore,
        label=f"pallas probe W={W} kw={kw} kk={K} (masked)",
    )

    mt = jax.jit(partial(
        ps.per_query_topk_rows_seg, k=K, num_queries=num_queries,
        pack_addr=True,
    ))
    bench(mt, scores[:, :K], docs[:, :K], seg, qid,
          label=f"merge tail W={W}")
