"""Post in-kernel-top-k fused-launch cost decomposition, via
fused_bool_topk (which times reliably on axon): all-masked launches at
each rung tier combination — isolates padding cost vs tier size.

Usage: python scripts/diag_tail.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tantivy_tpu as tt  # noqa: E402

tt.enable_compilation_cache()

from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402

T = 2
num_prows = 4096
num_queries = 256
K = 10
NB = 1536

tables = (
    jnp.zeros((num_prows + 1, T), jnp.float32),        # cl_weight
    jnp.full((num_prows + 1, T), 3, jnp.int32),        # cl_kind
    jnp.zeros((num_prows + 1, T), jnp.int32),
    jnp.zeros((num_prows + 1, T), jnp.int32),
    jnp.zeros((num_prows + 1, T), jnp.int32),
    jnp.full((num_prows + 1,), 1 << 30, jnp.int32),
    jnp.zeros(num_prows + 1, jnp.int32),
    jnp.full((num_prows + 1,), -np.inf, jnp.float32),  # row_th
)
cstore = jnp.full((NB, 384), np.uint32(pp.TERMINATED), jnp.uint32)


def run(chunks, label):
    rungs = tuple(c[0] for c in chunks)
    args = (
        tuple(c[1] for c in chunks), tuple(c[2] for c in chunks),
        tuple(c[3] for c in chunks), *tables, cstore,
    )
    kw = dict(k=K, num_queries=num_queries, num_prows=num_prows,
              n_clauses=T, rungs=rungs, interpret=False, pack_addr=True)
    t0 = time.time()
    out = pp.fused_bool_topk(*args, **kw)
    out.block_until_ready()
    first = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        out = pp.fused_bool_topk(*args, **kw)
        out.block_until_ready()
        times.append(time.time() - t0)
    print(f"{label}: first={first:.1f}s steady={min(times) * 1e3:.0f}ms",
          flush=True)


for combo in (
    ((65536, 16, 64), (8192, 64, 16)),
    ((8192, 16, 64), (8192, 64, 16)),
    ((8192, 16, 64), (2048, 64, 16)),
    ((256, 16, 64), (256, 64, 16)),
):
    chunks = [
        pp._empty_chunk(kwid, W, G, T, num_prows, num_queries)
        for (W, kwid, G) in combo
    ]
    run(chunks, f"all-masked {[c[:2] for c in combo]}")
