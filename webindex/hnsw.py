"""HNSW graph ANN — the Lucene/ES dense-vector kNN algorithm (Malkov &
Yashunin 2018, arXiv:1603.09320).  ES builds one HNSW graph per Lucene
segment and scatter-gathers per-segment kNN results into a global top-k;
this module is that architecture on Ray Data:

- vectors hash-partition into PINNED ``n_shards`` (``stable_hash64(id) %
  n_shards`` — partition-count and CPU-count independent, the repo's
  logical-partitioning invariant);
- ONE deterministic graph per shard, built inside
  ``groupby(shard).map_groups`` and carried as a single pickled blob row
  (at 100-TB scale the blob rows persist via ``write_parquet`` and load
  shard-parallel, exactly like ``ivf_write``):
  * node level seeded from ``stable_hash64`` of the id — no RNG state,
  * insertion in ascending id,
  * every heap keyed ``(sim, id)`` so ties never depend on arrival
    order — the graph is a pure function of the (id, vector) set;
- search scatter-gathers: each shard task answers every query with beam
  ``ef_search`` over its graph and emits per-query partial top-k rows;
  the exact merge is the same groupby as ``ann.brute_topk``.  Shards
  are disjoint, so the merged top-k is exact *given* per-shard top-k
  (the serve.py scatter-gather proof); HNSW's approximation lives only
  inside each shard's beam search.

Reference parity: the reference delegates dense retrieval to exact
torch top-k over full embedding matrices
(beir_dense_retriever.py:316-330); HNSW is the self-contained engine
analog of what ES runs for ``dense_vector`` / ``knn`` queries, and the
scale path this repo's brute_topk falls back from.
"""

from __future__ import annotations

import heapq
import math
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _batch_vecs, _merge_topk_factory, _normalize
from .util import stable_hash64


def _level_of(node_id: int, m_l: float, seed: int) -> int:
    """Deterministic HNSW level: floor(-ln(u) * mL) with u in (0, 1]
    derived from a stable hash of the id (no RNG state to replay)."""
    h = stable_hash64(f"hnsw:{seed}:{node_id}")
    u = ((h % (1 << 53)) + 1) / float(1 << 53)
    return int(-math.log(u) * m_l)


class Graph:
    """One shard's HNSW graph over L2-normalized float64 vectors.

    ``links[level][node] -> list[int]`` adjacency (level 0 dense list,
    upper levels sparse dicts); similarity is the cosine (dot of
    normalized vectors).  Build and search are deterministic: all
    heaps/tie-breaks key on (sim, id-order) only.
    """

    __slots__ = ("ids", "mat", "levels", "links0", "links_up", "entry",
                 "max_level", "m", "m_max0")

    def __init__(self, ids: np.ndarray, mat: np.ndarray, *, m: int = 8,
                 ef_construction: int = 64, seed: int = 0):
        order = np.argsort(ids, kind="mergesort")
        self.ids = ids[order].astype(np.int64)
        self.mat = _normalize(mat[order].astype(np.float64))
        self.m = int(m)
        self.m_max0 = 2 * int(m)
        m_l = 1.0 / math.log(m)
        self.levels = np.array(
            [_level_of(int(i), m_l, seed) for i in self.ids], dtype=np.int32
        )
        n = self.ids.size
        self.links0: list[list[int]] = [[] for _ in range(n)]
        self.links_up: list[dict[int, list[int]]] = []
        self.entry = -1
        self.max_level = -1
        for i in range(n):
            self._insert(i, int(self.levels[i]), ef_construction)

    # -- internals ---------------------------------------------------------

    def _neighbors(self, node: int, level: int) -> list[int]:
        if level == 0:
            return self.links0[node]
        return self.links_up[level - 1].setdefault(node, [])

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      level: int) -> list[tuple[float, int]]:
        """Beam search one layer -> up to ``ef`` (sim, node) pairs.

        Candidate heap pops highest sim first (ties: lowest node idx);
        result heap evicts lowest sim first (ties: HIGHEST idx, so equal
        scores keep the smaller id) — both pure functions of the data.
        """
        visited = np.zeros(self.ids.size, dtype=bool)
        cand: list[tuple[float, int]] = []
        res: list[tuple[float, int]] = []
        for ep in eps:
            if visited[ep]:
                continue
            visited[ep] = True
            s = float(self.mat[ep] @ q)
            heapq.heappush(cand, (-s, ep))
            heapq.heappush(res, (s, -ep))
        while cand:
            neg_s, node = heapq.heappop(cand)
            if len(res) >= ef and -neg_s < res[0][0]:
                break
            nbrs = [x for x in self._neighbors(node, level) if not visited[x]]
            if not nbrs:
                continue
            visited[nbrs] = True
            sims = self.mat[nbrs] @ q  # one vectorized gather+matmul
            for x, s in zip(nbrs, sims):
                s = float(s)
                if len(res) < ef or s > res[0][0] or (
                    s == res[0][0] and x < -res[0][1]
                ):
                    heapq.heappush(cand, (-s, x))
                    heapq.heappush(res, (s, -x))
                    if len(res) > ef:
                        heapq.heappop(res)
        return [(s, -ni) for s, ni in res]

    def _select(self, pairs: list[tuple[float, int]], m: int) -> list[int]:
        """Closest-``m`` neighbor selection, ties by ascending idx."""
        pairs = sorted(pairs, key=lambda p: (-p[0], p[1]))
        return [n for _, n in pairs[:m]]

    def _shrink(self, node: int, level: int, m_max: int) -> None:
        lst = self._neighbors(node, level)
        if len(lst) <= m_max:
            return
        sims = self.mat[lst] @ self.mat[node]
        kept = self._select(list(zip(sims.tolist(), lst)), m_max)
        if level == 0:
            self.links0[node] = kept
        else:
            self.links_up[level - 1][node] = kept

    def _insert(self, i: int, level: int, ef_c: int) -> None:
        while len(self.links_up) < level:
            self.links_up.append({})
        if self.entry < 0:
            self.entry = i
            self.max_level = level
            return
        q = self.mat[i]
        ep = [self.entry]
        for lev in range(self.max_level, level, -1):
            best = self._search_layer(q, ep, 1, lev)
            ep = [max(best, key=lambda p: (p[0], -p[1]))[1]] if best else ep
        for lev in range(min(level, self.max_level), -1, -1):
            found = self._search_layer(q, ep, ef_c, lev)
            m_max = self.m_max0 if lev == 0 else self.m
            nbrs = self._select(found, self.m)
            if lev == 0:
                self.links0[i] = list(nbrs)
            else:
                self.links_up[lev - 1][i] = list(nbrs)
            for nb in nbrs:
                self._neighbors(nb, lev).append(i)
                self._shrink(nb, lev, m_max)
            ep = [n for _, n in found]
        if level > self.max_level:
            self.entry = i
            self.max_level = level

    # -- public ------------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef_search: int
               ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (ids, sims) for one query vector (assumed normalized)."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ep = [self.entry]
        for lev in range(self.max_level, 0, -1):
            best = self._search_layer(q, ep, 1, lev)
            ep = [max(best, key=lambda p: (p[0], -p[1]))[1]] if best else ep
        found = self._search_layer(q, ep, max(ef_search, k), 0)
        found.sort(key=lambda p: (-p[0], p[1]))
        found = found[:k]
        idx = np.array([n for _, n in found], dtype=np.int64)
        sims = np.array([s for s, _ in found], dtype=np.float64)
        return self.ids[idx], sims

    def to_blob(self) -> bytes:
        return pickle.dumps({
            "ids": self.ids, "mat": self.mat, "levels": self.levels,
            "links0": self.links0, "links_up": self.links_up,
            "entry": self.entry, "max_level": self.max_level,
            "m": self.m,
        }, protocol=4)

    @classmethod
    def from_blob(cls, blob: bytes) -> "Graph":
        d = pickle.loads(blob)
        g = cls.__new__(cls)
        g.ids, g.mat, g.levels = d["ids"], d["mat"], d["levels"]
        g.links0, g.links_up = d["links0"], d["links_up"]
        g.entry, g.max_level, g.m = d["entry"], d["max_level"], d["m"]
        g.m_max0 = 2 * g.m
        return g


def hnsw_build(emb_ds, *, n_shards: int = 4, m: int = 8,
               ef_construction: int = 64, seed: int = 0,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Embeddings Dataset -> materialized Dataset of (shard, blob) rows,
    one deterministic HNSW graph per pinned hash shard.  Persist with
    ``index_ds.write_parquet(dir)`` and reload with ``read_parquet`` —
    blob rows round-trip as plain binary columns."""

    def add_shard(batch: pa.Table) -> pa.Table:
        sh = np.array(
            [stable_hash64(f"{seed}:{v}") % n_shards
             for v in batch.column(id_col).to_pylist()],
            dtype=np.int32,
        )
        return batch.append_column("shard", pa.array(sh))

    def build_one(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(np.int64)
        mat = np.array(g[vec_col].tolist(), dtype=np.float64)
        graph = Graph(ids, mat, m=m, ef_construction=ef_construction,
                      seed=seed)
        return pd.DataFrame({
            "shard": [int(g["shard"].iloc[0])], "blob": [graph.to_blob()],
        })

    return (
        emb_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(build_one, batch_format="pandas")
        .materialize()
    )


def _search_task(batch: pa.Table, *, queries_ref, k: int, ef_search: int):
    import ray

    side = ray.get(queries_ref)
    qids, qmat = side["qids"], side["vecs"]
    out_q, out_id, out_sim = [], [], []
    for blob in batch.column("blob").to_pylist():
        graph = Graph.from_blob(blob)
        for qi, qv in zip(qids, qmat):
            ids, sims = graph.search(qv, k, ef_search)
            out_q.extend([qi] * ids.size)
            out_id.extend(ids.tolist())
            out_sim.extend(sims.tolist())
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(out_id, pa.int64()),
        "sim": pa.array(out_sim, pa.float64()),
    })


def hnsw_topk(index_ds, query_ids: list[int], query_vecs: np.ndarray,
              k: int, *, ef_search: int = 64):
    """Scatter-gather kNN over an ``hnsw_build`` index Dataset ->
    Dataset (query_id, vec_id, sim, rank) — ES ``knn`` search shape.

    Queries broadcast ONCE via ``ray.put`` (normalized on the driver);
    each shard row is searched in its own task and the disjoint partial
    top-k rows merge through the exact ``ann.brute_topk`` groupby."""
    import ray

    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    ref = ray.put({"qids": list(query_ids), "vecs": qmat})
    partial = index_ds.map_batches(
        _search_task,
        fn_kwargs=dict(queries_ref=ref, k=k, ef_search=ef_search),
        batch_format="pyarrow",
        batch_size=1,
    )
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )
