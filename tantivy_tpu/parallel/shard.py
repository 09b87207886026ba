"""Segment-sharded search over a device mesh.

The TPU-native equivalent of the reference's per-segment rayon fan-out +
`merge_fruits` reduce (`core/executor.rs:32-102`, `collector/mod.rs:167`),
re-expressed over `jax.sharding.Mesh`:

* segments are partitioned CONTIGUOUSLY across the mesh's ``seg`` axis, so
  ascending (shard, local DocAddress) order equals ascending global
  DocAddress order (the tie-break key);
* each shard runs the SAME batched engine the single-chip path runs — a
  per-shard `BatchExecutor` over a shard-view `Searcher` that keeps GLOBAL
  corpus statistics (BM25 weights must match the single-chip engine
  bit-for-bit).  The fused Pallas probe/phrase kernels (pallas mode) or
  their XLA probe fallbacks are therefore the ONE scoring implementation
  for both the single-chip and the sharded paths — there is no duplicate
  sharded scorer to keep in sync;
* on a real TPU mesh each shard's stores and kernel launches are pinned to
  its own device (`jax.default_device`), so per-shard batches execute
  concurrently (async dispatch) with zero cross-device traffic;
* only the per-shard top-k candidates — [D, Q, k] scores + addresses —
  cross the interconnect: a jitted `shard_map` `all_gather` over the
  ``seg`` axis followed by a replicated multi-key sort produces the global
  answer on every device, the exact analogue of `merge_fruits`
  (reference `sort_key_top_collector.rs:76-97` tie-break: score desc,
  DocAddress asc).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..searcher import DocAddress, Searcher
from . import BatchExecutor

NEG_INF = np.float32(-np.inf)


class _ShardView(Searcher):
    """Searcher over ONE shard's segment readers with GLOBAL statistics.

    `doc_freq` / `num_docs` / `max_docs` / `total_num_tokens` (and hence
    `field_statistics` / `term_statistics`) delegate to the full searcher:
    BM25 idf and average fieldnorm are corpus-wide quantities, and the
    sharded engine must produce bit-identical scores to the single-chip
    engine (reference bm25.rs computes them from the whole index too)."""

    def __init__(self, global_searcher: Searcher, readers: list):
        super().__init__(global_searcher.index, readers)
        self._global = global_searcher

    def doc_freq(self, term) -> int:
        return self._global.doc_freq(term)

    def num_docs(self) -> int:
        return self._global.num_docs()

    def max_docs(self) -> int:
        return self._global.max_docs()

    def total_num_tokens(self, field: str) -> int:
        return self._global.total_num_tokens(field)


class ShardedSearcher:
    """Device-mesh search over an index: shards segments across the mesh,
    runs the single-chip batched engine per shard (fused kernels, two-phase
    Block-WAND pruning, host fallbacks — everything `BatchExecutor`
    supports, i.e. the FULL query inventory), and fruit-merges the
    per-shard top-k on device via an `all_gather` over the mesh axis."""

    def __init__(self, searcher: Searcher, mesh: Mesh):
        self.searcher = searcher
        self.mesh = mesh
        self.n_shards = mesh.shape["seg"]
        #: shipped-block accounting of the last batch (pruning visibility):
        #: candidates >= phase1 + phase2 always (phase 2 only ships
        #: phase-1 leftovers that survive the threshold)
        self.last_shipped: dict[str, int] = {}
        readers = searcher.segment_readers()
        D = self.n_shards
        chunk = -(-len(readers) // D) if readers else 1
        self._shard_base: list[int] = []
        self._execs: list[BatchExecutor | None] = []
        mesh_devs = list(np.ravel(mesh.devices))
        for s in range(D):
            rs = readers[s * chunk: (s + 1) * chunk]
            self._shard_base.append(min(s * chunk, len(readers)))
            if rs:
                dev = mesh_devs[s]
                # pin each shard's stores + launches to its mesh device on
                # real hardware; on a virtual CPU mesh every "device" is
                # the host — skip pinning so jit programs compile once
                pin = dev if dev.platform != "cpu" else None
                ctx = (
                    jax.default_device(pin)
                    if pin is not None
                    else contextlib.nullcontext()
                )
                with ctx:
                    ex = BatchExecutor(_ShardView(searcher, rs))
                ex._shard_device = pin
                self._execs.append(ex)
            else:
                self._execs.append(None)
        self._merge_fns: dict = {}

    # -- batched search over the mesh -----------------------------------

    def search_batch(self, queries: list, k: int):
        """Batched top-k over the mesh for ANY query mix (device-eligible
        kinds ride the fused kernels per shard; the rest use each shard's
        pruned host engine). Returns list[list[(score, DocAddress)]] with
        global segment ordinals."""
        Q = len(queries)
        if Q == 0:
            return []
        counters = ("wand_candidates", "wand_p1", "wand_p2")
        before = [
            {c: (getattr(ex, "plan_stats", None) or {}).get(c, 0)
             for c in counters} if ex else None
            for ex in self._execs
        ]
        per_shard: list = []
        for ex in self._execs:
            if ex is None:
                per_shard.append([[] for _ in range(Q)])
                continue
            dev = ex._shard_device
            ctx = (
                jax.default_device(dev)
                if dev is not None
                else contextlib.nullcontext()
            )
            with ctx:
                per_shard.append(ex.search_batch(queries, k))
        shipped = {"candidates": 0, "phase1": 0, "phase2": 0}
        for ex, b in zip(self._execs, before):
            if ex is None:
                continue
            st = getattr(ex, "plan_stats", None) or {}
            shipped["candidates"] += st.get("wand_candidates", 0) - \
                b["wand_candidates"]
            shipped["phase1"] += st.get("wand_p1", 0) - b["wand_p1"]
            shipped["phase2"] += st.get("wand_p2", 0) - b["wand_p2"]
        self.last_shipped = shipped
        return self._fruit_merge(per_shard, Q, k)

    def search_term_batch(self, terms: list, k: int):
        from ..query import TermQuery

        return self.search_batch([TermQuery(t) for t in terms], k)

    def search_boolean_batch(self, queries: list, k: int):
        return self.search_batch(list(queries), k)

    def search_phrase_batch(self, queries: list, k: int):
        return self.search_batch(list(queries), k)

    # -- device fruit merge ----------------------------------------------

    def _merge_step(self, Q: int, k: int):
        fn = self._merge_fns.get((Q, k))
        if fn is not None:
            return fn
        from ..ops.probe_scorer import _sortable_desc

        mesh = self.mesh

        def step(sc, sg, dc):
            def local(sc, sg, dc):
                # [1, Q, k] local shard -> all_gather moves only the
                # candidates over the interconnect (merge_fruits)
                all_sc = jax.lax.all_gather(sc[0], "seg", axis=0)
                all_sg = jax.lax.all_gather(sg[0], "seg", axis=0)
                all_dc = jax.lax.all_gather(dc[0], "seg", axis=0)
                d, q, kk = all_sc.shape
                fsc = jnp.transpose(all_sc, (1, 0, 2)).reshape(q, d * kk)
                fsg = jnp.transpose(all_sg, (1, 0, 2)).reshape(q, d * kk)
                fdc = jnp.transpose(all_dc, (1, 0, 2)).reshape(q, d * kk)
                skey = _sortable_desc(fsc)
                _, ssg, sdc, ssc = jax.lax.sort(
                    (skey, fsg, fdc, fsc), num_keys=3, is_stable=False
                )
                return ssc[:, :k], ssg[:, :k], sdc[:, :k]

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P("seg"), P("seg"), P("seg")),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )(sc, sg, dc)

        fn = jax.jit(step)
        self._merge_fns[(Q, k)] = fn
        return fn

    def _fruit_merge(self, per_shard: list, Q: int, k: int):
        D = self.n_shards
        scores = np.full((D, Q, k), NEG_INF, dtype=np.float32)
        segs = np.zeros((D, Q, k), dtype=np.int32)
        docs = np.zeros((D, Q, k), dtype=np.uint32)
        for s, res in enumerate(per_shard):
            base = self._shard_base[s]
            for qi, hits in enumerate(res):
                for j, (sc, addr) in enumerate(hits[:k]):
                    scores[s, qi, j] = sc
                    segs[s, qi, j] = base + addr.segment_ord
                    docs[s, qi, j] = addr.doc_id
        sharding = NamedSharding(self.mesh, P("seg"))
        msc, msg, mdc = self._merge_step(Q, k)(
            jax.device_put(scores, sharding),
            jax.device_put(segs, sharding),
            jax.device_put(docs, sharding),
        )
        msc = np.asarray(msc)
        msg = np.asarray(msg)
        mdc = np.asarray(mdc)
        out = []
        for qi in range(Q):
            hits = []
            for j in range(k):
                sc = msc[qi, j]
                if sc == NEG_INF:
                    break
                hits.append(
                    (np.float32(sc),
                     DocAddress(int(msg[qi, j]), int(mdc[qi, j])))
                )
            out.append(hits)
        return out


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("seg",))
