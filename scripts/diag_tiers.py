"""Measure fused_bool_topk compile + empty-launch execution per tier size.

Usage: python scripts/diag_tiers.py "16:2048,64:2048" "16:16384,64:16384" ...
Each arg is a tier config; for each we monkeypatch _GRP_W_TIERS to a single
level and launch a no-op singleton work list sized to fill the tier.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402

corpora, stream, have_wiki = bench.make_corpora()
name, docs_fn, n_docs, with_fast = [c for c in corpora
                                    if c[0] == "scaled1m"][0]
index, _ = bench._open_or_build(
    name, docs_fn, n_docs, with_fast,
    commit_every=n_docs // bench.SCALED_COMMITS,
)
searcher = index.reader().searcher()
executor = BatchExecutor(searcher, mode="dense")
executor._ensure_fused_slab(0, "body")
for so in range(1, len(searcher.segment_readers())):
    executor._ensure_fused_slab(so, "body")
fused = executor._fused().ready()

from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402

Tb = 2
Q = 256
K = 10
tier = executor._prow_tier(0, Tb)
tables = {
    "cl_weight": np.zeros((tier + 1, Tb), np.float32),
    "cl_kind": np.full((tier + 1, Tb), 3, np.int32),
    "cl_start": np.zeros((tier + 1, Tb), np.int32),
    "cl_len": np.zeros((tier + 1, Tb), np.int32),
    "cl_shipped": np.zeros((tier + 1, Tb), np.int32),
    "req_must": np.full(tier + 1, 1 << 30, np.int32),
    "req_should": np.zeros(tier + 1, np.int32),
}


def make_work(counts):
    """Singleton no-op work items with the given per-rung counts."""
    nbp = -(-fused.num_blocks // 8) * 8
    blocks, width = [], []
    for kw, nn in counts.items():
        blocks.append((np.arange(nn, dtype=np.int64) * 8) % nbp)
        width.append(np.full(nn, kw, dtype=np.int64))
    blocks = np.concatenate(blocks)
    n = len(blocks)
    width = np.concatenate(width)
    jlo = np.full((n, Tb), -1, dtype=np.int64)
    wid = np.zeros((n, Tb), dtype=np.int64)
    jlo[:, 1] = 0
    wid[:, 1] = width
    frc = np.zeros((n, Tb), dtype=np.int64)
    return (
        blocks, np.arange(n, dtype=np.int64) % tier,
        np.zeros(n, dtype=np.int64), width,
        np.arange(n, dtype=np.int64) % Q, np.zeros(n, dtype=np.int64),
        jlo, wid, frc, np.zeros(n, dtype=bool),
    )


for cfg in sys.argv[1:]:
    tiers = {}
    for part in cfg.split(","):
        kw, w = part.split(":")
        tiers[int(kw)] = (int(w),)
    old = pp._GRP_W_TIERS
    pp._GRP_W_TIERS = tiers
    try:
        counts = {kw: t[0] for kw, t in tiers.items()}
        work = make_work(counts)
        t0 = time.time()
        outs = pp.launch_fused_bool(fused, work, tables, K, Q, False)
        for o in outs:
            np.asarray(o)
        compile_s = time.time() - t0
        # steady-state exec (cached compile)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            outs = pp.launch_fused_bool(fused, work, tables, K, Q, False)
            for o in outs:
                np.asarray(o)
        exec_s = (time.time() - t0) / reps
        # empty-ish: 8 items only, rest padded
        work_small = make_work({kw: 8 for kw in tiers})
        t0 = time.time()
        for _ in range(reps):
            outs = pp.launch_fused_bool(fused, work_small, tables, K, Q,
                                        False)
            for o in outs:
                np.asarray(o)
        pad_s = (time.time() - t0) / reps
        print(f"[{cfg}] compile+first={compile_s:.1f}s "
              f"noop_full={exec_s*1000:.0f}ms padded8={pad_s*1000:.0f}ms",
              flush=True)
    finally:
        pp._GRP_W_TIERS = old
