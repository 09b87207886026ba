"""Stage-time one fused_phrase shape per level (prewarm stall isolation).

Usage: python scripts/diag_prewarm_phrase.py [level] [Sb]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import tantivy_tpu as tt  # noqa: E402

tt.enable_compilation_cache()

from tantivy_tpu.ops import pallas_phrase as php  # noqa: E402

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SB = int(sys.argv[2]) if len(sys.argv) > 2 else 1  # partners per anchor
Q = 256
K = 10
PROWS = 4096

qw = np.zeros(PROWS + 1, dtype=np.float32)
nbp = 1536

per_rung = []
for rows, tiers in php._PHRASE_RUNGS:
    nn = tiers[min(LEVEL, len(tiers) - 1)]
    llen = max((rows - 16) * 128, 1)
    per_rung.append((nn, llen))
cols = {k: [] for k in ("ids", "prow", "qid", "seg", "lpos", "llen",
                        "anchor")}
cp_, cl_, dl_ = [], [], []
for nn, llen in per_rung:
    cols["ids"].append(np.arange(nn, dtype=np.int64) * 8 % nbp)
    cols["prow"].append(np.arange(nn, dtype=np.int64) % PROWS)
    cols["qid"].append(np.arange(nn, dtype=np.int64) % Q)
    cols["seg"].append(np.zeros(nn, dtype=np.int64))
    cols["lpos"].append(np.zeros(nn, dtype=np.int64))
    cols["llen"].append(np.full(nn, llen, dtype=np.int64))
    cols["anchor"].append(np.zeros(nn, dtype=np.int64))
    cp_.append(np.zeros((nn, SB), dtype=np.int64))
    cl_.append(np.full((nn, SB), llen, dtype=np.int64))
    dl_.append(np.ones((nn, SB), dtype=np.int64))
work = (
    np.concatenate(cols["ids"]), np.concatenate(cols["prow"]),
    np.concatenate(cols["qid"]), np.concatenate(cols["seg"]),
    np.concatenate(cols["lpos"]), np.concatenate(cols["llen"]),
    np.vstack(cp_), np.vstack(cl_), np.vstack(dl_),
    np.concatenate(cols["anchor"]),
)


class _FakeFused:
    num_blocks = nbp

    def ready(self):
        return self

    def ensure_positions(self):
        pass


import jax.numpy as jnp  # noqa: E402

from tantivy_tpu.ops import pallas_probe as pp  # noqa: E402


class _Fused:
    num_blocks = nbp
    # minimal attrs launch_fused_phrase touches; fill in as needed


# use the real launcher path via a tiny real index so all device stores
# exist (building is fast; compile dominates)
import tantivy_tpu as tt  # noqa: E402

schema_b = tt.Schema.builder()
schema_b.add_text_field("body", tt.TEXT)
schema = schema_b.build()
index = tt.Index.create_in_ram(schema)
w = index.writer()
for i in range(64):
    w.add_document(tt.Document(body=f"alpha beta gamma delta w{i} epsilon"))
w.commit()
searcher = index.reader().searcher()
from tantivy_tpu.parallel import BatchExecutor  # noqa: E402

ex = BatchExecutor(searcher, mode="dense")
from tantivy_tpu.query.phrase_query import PhraseQuery  # noqa: E402

hints = [PhraseQuery("body", ["alpha", "beta"] + ["gamma"] * SB * 0)]
t0 = time.time()
n = ex.prewarm(hints, k=K, concurrency=1, levels=(LEVEL,))
print(f"level {LEVEL} Sb {SB}: prewarm {time.time() - t0:.1f}s "
      f"({n} shapes)", flush=True)
