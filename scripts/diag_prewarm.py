"""Where does prewarm time go? Stage-times one fused_bool_topk shape:
trace+lower vs compile (persistent-cache hit?) vs first execution.

Usage: python scripts/diag_prewarm.py [level]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tantivy_tpu as tt  # noqa: E402
from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 2

tt.enable_compilation_cache()

T = 2
num_prows = 4096
num_queries = 256
K = 10
NB = 1536

tables = (
    jnp.zeros((num_prows + 1, T), jnp.float32),
    jnp.full((num_prows + 1, T), 3, jnp.int32),
    jnp.zeros((num_prows + 1, T), jnp.int32),
    jnp.zeros((num_prows + 1, T), jnp.int32),
    jnp.zeros((num_prows + 1, T), jnp.int32),
    jnp.full((num_prows + 1,), 1 << 30, jnp.int32),
    jnp.zeros(num_prows + 1, jnp.int32),
    jnp.full((num_prows + 1,), -np.inf, jnp.float32),  # row_th
)
cstore = jnp.full((NB, 384), np.uint32(pp.TERMINATED), jnp.uint32)

rungs = pp.fused_rungs(T)
chunks = []
for kw in rungs:
    W = pp._GRP_W_TIERS[kw][LEVEL]
    G = pp._g_items_grp(kw, T)
    chunks.append(pp._empty_chunk(kw, W, G, T, num_prows, num_queries))

rung_t = tuple(c[0] for c in chunks)
args = (
    tuple(c[1] for c in chunks), tuple(c[2] for c in chunks),
    tuple(c[3] for c in chunks), *tables, cstore,
)
kw = dict(k=K, num_queries=num_queries, num_prows=num_prows,
          n_clauses=T, rungs=rung_t, interpret=False, pack_addr=True)

t0 = time.time()
lowered = pp.fused_bool_topk.lower(*args, **kw)
t1 = time.time()
print(f"trace+lower: {t1 - t0:.1f}s", flush=True)
compiled = lowered.compile()
t2 = time.time()
print(f"compile (cache?): {t2 - t1:.1f}s", flush=True)
out = compiled(*[a for a in args])
out.block_until_ready()
t3 = time.time()
print(f"first run: {t3 - t2:.1f}s", flush=True)
out = compiled(*[a for a in args])
out.block_until_ready()
print(f"second run: {time.time() - t3:.1f}s", flush=True)
