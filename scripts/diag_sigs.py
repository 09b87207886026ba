"""Record every fused-launch jit signature during prewarm vs real batches.

Kernel execution is STUBBED (returns all-NEG_INF packed results), so this
is pure host planning — fast on CPU. Prints signatures prewarm covers and
any EXTRA signatures real term/AND/OR/phrase/sloppy/prefix batches produce —
those are the cold compiles that would land in the bench's timed window.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["TANTIVY_TPU_PALLAS"] = "1"

import jax

# the axon TPU plugin overrides JAX_PLATFORMS — force CPU explicitly
jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from tantivy_tpu.ops import pallas_phrase as php
from tantivy_tpu.ops import pallas_probe as pp
from tantivy_tpu.parallel import BatchExecutor

SIGS: list = []
PHASE = ["init"]

NEG_INF_BITS = np.float32(-np.inf).view(np.uint32) if hasattr(
    np.float32(-np.inf), "view") else np.array(
        -np.inf, np.float32).view(np.uint32)
NEG_INF_BITS = np.array(-np.inf, np.float32).view(np.uint32)


def _stub_packed(num_queries, k):
    out = np.zeros((3, num_queries, min(k, 128)), dtype=np.uint32)
    out[0] = NEG_INF_BITS
    return out


def _wrap_bool(rung_scal, rung_qid, rung_seg, cl_weight, *args, **kw):
    # shape signature: everything static + every array shape
    sig = ("bool", kw.get("k"), kw.get("num_queries"), kw.get("num_prows"),
           kw.get("n_clauses"), kw.get("rungs"), kw.get("pack_addr"),
           tuple(s.shape for s in rung_scal), cl_weight.shape)
    SIGS.append((PHASE[0], sig))
    return _stub_packed(kw["num_queries"], kw["k"])


def _wrap_phrase(rung_scal, rung_qid, rung_seg, qw, *args, **kw):
    sig = ("phrase", kw.get("k"), kw.get("num_queries"),
           kw.get("n_partners"), kw.get("rungs"), kw.get("pack_addr"),
           tuple(s.shape for s in rung_scal), qw.shape,
           tuple(a.shape for a in args))
    SIGS.append((PHASE[0], sig))
    return _stub_packed(kw["num_queries"], kw["k"])


pp.fused_bool_topk = _wrap_bool
php.fused_phrase_topk = _wrap_phrase

# small corpus, 4 segments, same query generator as bench
import time

t0 = time.time()


def mark(what):
    print(f"[{time.time()-t0:7.1f}s] {what}", flush=True)


rng = np.random.default_rng(42)
stream = bench._synthetic_token_stream(rng, n_tokens=120_000, vocab=4_000)
import tempfile

tmp = tempfile.mkdtemp(prefix="sigdiag")
mark("building index")
index, _ = bench._build_index(
    Path(tmp), bench.scaled_docs(stream, 20_000), 20_000, True,
    commit_every=5_000,
)
searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
rng = np.random.default_rng(123)
logs = bench.make_query_log(searcher, stream, rng, bench.BATCH * 6)

mark("prewarm")
PHASE[0] = "prewarm"
executor.prewarm(logs["or"][:bench.BATCH], k=bench.K)
executor.prewarm(logs["phrase"][:bench.BATCH], k=bench.K)

warmed = {s for p, s in SIGS if p == "prewarm"}
for kind in ("term", "and", "or", "phrase", "prefix"):
    PHASE[0] = kind
    mark(kind)
    for b in range(3):
        executor.search_batch(
            logs[kind][b * bench.BATCH : (b + 1) * bench.BATCH], bench.K
        )
# k=3 gate reuse check
PHASE[0] = "k3"
executor.search_batch(logs["or"][: bench.BATCH], 3)
executor.search_batch(logs["phrase"][: bench.BATCH], 3)

print(f"prewarm sigs: {len(warmed)}")
for s in sorted(map(str, warmed)):
    print("  W", s)
extra = {}
for p, s in SIGS:
    if p != "prewarm" and s not in warmed:
        extra.setdefault(s, []).append(p)
print(f"EXTRA (cold at runtime): {len(extra)}")
for s, ps in extra.items():
    print("  X", sorted(set(ps)), s)
sys.exit(1 if extra else 0)
