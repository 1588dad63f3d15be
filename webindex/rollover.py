"""Time-partitioned index rollover + alias search (the ES ILM pattern).

The reference's ES layer queries ONE index with
``search_type=dfs_query_then_fetch`` so scores use corpus-global document
frequencies (SURVEY.md §2.5 A8; behavior of the ``beir==0.2.3`` ES wrapper
invoked at /root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb
cell 10). Production web indexes are additionally TIME-PARTITIONED: an
index per day/month behind an alias, writes rolling over to a fresh index
when the current one is full (the ES ``/_rollover`` + ILM lifecycle), and
a search against the alias fanning out across every member index. This
module is that lifecycle over webindex's immutable artifact directories:

- an **alias** is a directory whose ``alias.json`` manifest names member
  indices plus the current write index;
- :func:`build_alias` builds one member index per caller-partitioned
  corpus slice; :func:`rollover_build` does the partitioning itself in
  ONE staged pass (partitioned parquet, then per-bucket builds — every
  member build is StageRunner-resumable on its own);
- :func:`ingest` is the write side: a document batch lands in the current
  write index (delta build + relay-level merge, ``webindex.merge``) until
  the ``max_docs`` rollover condition trips, then a new generation index
  is born (ES ``/_rollover`` with a ``max_docs`` condition);
- :func:`alias_search` is the query side. Its **dfs phase** merges
  per-index statistics — exact int64 sums of N / total_tokens / per-term
  df, then ONE float division for avgdl, the same arithmetic as a single
  build's stats stage (``build.sum_relay_sidecars``) — and every member
  index scores WITH the merged stats
  (``SegmentReader.set_stats_override``); an exact per-qid merge
  (score desc, docID asc — the serve.py shard-merge proof, member
  indices partition one docID space) reassembles global runs.

Because BM25 contributions depend only on (tf, dl, global stats) and the
summation order (ascending term) is pinned, alias search is
**bit-identical in ranks and scores** to searching one index built over
the union corpus (tests/test_rollover.py proves it per-float); without
the dfs phase (``search_type="query_then_fetch"``) each member scores
with its own local idf/avgdl — ES's cheaper default, exposed for parity.

Scale shape: the dfs phase reads ONLY stats.json + dict rows for the
query's analyzed terms (one small Ray task per member index, parquet
filter pushdown — never the dictionaries themselves); per-index search
reuses the standard sharded path (worker-cached segment subsets, applied
or restored at the ``_shard_searcher`` cache boundary so merged stats
never leak into plain queries); the final merge is runs-bounded
(n_indices x top_k rows per qid). Nothing corpus-sized reaches the
driver; queries (the ES msearch batch — small by contract) are the only
driver-side materialization.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

from webindex.config import IndexConfig
from webindex.util import StageRunner, atomic_write_json, read_json

ALIAS_MANIFEST = "alias.json"


# ---------------------------------------------------------------------------
# alias manifest
# ---------------------------------------------------------------------------


def read_alias(root: str) -> dict:
    """``{"indices": [name, ...], "write_index": name | None}`` (names are
    directories under ``root``); empty manifest when none exists yet."""
    return read_json(
        os.path.join(root, ALIAS_MANIFEST),
        {"indices": [], "write_index": None},
    )


def _write_alias(root: str, manifest: dict) -> None:
    os.makedirs(root, exist_ok=True)
    atomic_write_json(os.path.join(root, ALIAS_MANIFEST), manifest)


def alias_index_dirs(root: str) -> list[str]:
    """Member index directories, sorted by name (deterministic fan-out
    order — though results never depend on it: the merge re-sorts)."""
    man = read_alias(root)
    return [os.path.join(root, n) for n in sorted(man["indices"])]


# ---------------------------------------------------------------------------
# build side
# ---------------------------------------------------------------------------


def build_alias(root: str, parts: dict, cfg: IndexConfig | None = None,
                *, docvalues: dict | None = None) -> list[str]:
    """Build one member index per corpus slice: ``parts`` maps index name
    -> ``(doc_id:int64, text:string)`` Dataset. The caller owns the
    partition contract (slices must not share doc_ids — same contract as
    ``merge.merge_indexes``). ``docvalues`` optionally maps the same names
    to per-slice docvalues Datasets. Each build is independently
    resumable; re-running ``build_alias`` skips completed members."""
    from webindex.build import build_index

    cfg = cfg or IndexConfig()
    names = sorted(parts)
    for name in names:
        build_index(
            parts[name], os.path.join(root, name), cfg,
            docvalues_ds=(docvalues or {}).get(name),
        )
    _write_alias(
        root,
        {"indices": names, "write_index": names[-1] if names else None},
    )
    return [os.path.join(root, n) for n in names]


def rollover_build(corpus_ds, root: str, bucket_col: str,
                   cfg: IndexConfig | None = None) -> list[str]:
    """Partition a corpus by ``bucket_col`` (e.g. a crawl month) and build
    one member index per bucket under ``root`` — the batch equivalent of a
    time-based ILM policy.

    One staged pass over the data: the corpus streams ONCE into
    hive-partitioned parquet (``_staging/{bucket_col}=value/``,
    checkpointed), then each member build reads only its partition
    directory (pruned at the read — a bucket's build never touches
    another bucket's bytes). Bucket values become index names
    (``idx-<value>``), so the bucket count should be calendar-bounded,
    never row-bounded."""
    runner = StageRunner(root)

    def stage_staging(tmp):
        corpus_ds.select_columns(
            ["doc_id", "text", bucket_col]
        ).write_parquet(tmp, partition_cols=[bucket_col])
        return {}

    runner.run("_staging", stage_staging)
    staged = runner.out_dir("_staging")

    import ray.data as rd

    prefix = f"{bucket_col}="
    parts = {}
    for ent in sorted(os.listdir(staged)):
        if not ent.startswith(prefix):
            continue
        val = ent[len(prefix):]
        parts[f"idx-{val}"] = rd.read_parquet(
            os.path.join(staged, ent), columns=["doc_id", "text"]
        )
    if not parts:
        raise ValueError(f"no {bucket_col!r} partitions staged under {root}")
    return build_alias(root, parts, cfg)


def ingest(root: str, corpus_ds, *, max_docs: int,
           cfg: IndexConfig | None = None) -> str:
    """Write-side rollover (ES ``/_rollover`` with ``condition.max_docs``):
    index a ``(doc_id, text)`` batch into the alias at ``root``.

    - no write index yet -> the batch becomes generation ``gen-000001``;
    - write index already holds >= ``max_docs`` docs -> ROLLOVER: the
      batch becomes the next generation (the full index is sealed,
      untouched — exactly ES's immutable-after-rollover shape);
    - otherwise the batch APPENDS: a delta index is built over the batch
      and merged with the write index at the postings-relay level
      (``merge.merge_indexes`` — hardlinked relays, one re-encode, no
      retokenization of old docs), atomically replacing the write index.

    Returns the current write index directory. Batches must carry fresh
    doc_ids (append-only path; url-keyed upserts are ``webindex.refresh``).
    Like ES, the condition is evaluated per ingest call, so an index seals
    at the first call that finds it full — individual generations may
    overshoot ``max_docs`` by up to one batch, never undershoot."""
    from webindex.build import build_index
    from webindex.merge import merge_indexes

    man = read_alias(root)
    write_name = man["write_index"]

    def gen_name(i: int, rev: int = 0) -> str:
        return f"gen-{i:06d}" + (f"-r{rev}" if rev else "")

    def gen_of(name: str) -> int:
        return int(name.split("-")[1])

    if write_name is not None:
        wi_dir = os.path.join(root, write_name)
        cfg = IndexConfig.from_dict(
            read_json(os.path.join(wi_dir, "config.json"))
        )
        if read_json(os.path.join(wi_dir, "stats.json"))["N"] < max_docs:
            # append: delta build + relay merge -> replace the write index
            merged_name = gen_name(
                gen_of(write_name),
                (int(write_name.rsplit("-r", 1)[1])
                 if "-r" in write_name else 0) + 1,
            )
            # delta keyed by the TARGET revision: a crashed ingest retried
            # with the same batch resumes its checkpoints; distinct
            # successive batches always get distinct revisions (retries
            # must re-present the same batch — at-least-once ingest)
            delta = os.path.join(root, f"_delta-{merged_name}")
            merged = os.path.join(root, merged_name)
            build_index(corpus_ds, delta, cfg)
            merge_indexes([wi_dir, delta], merged)
            man["indices"] = [
                n for n in man["indices"] if n != write_name
            ] + [merged_name]
            man["write_index"] = merged_name
            _write_alias(root, man)
            shutil.rmtree(delta)
            shutil.rmtree(wi_dir)
            return merged
        next_gen = gen_of(write_name) + 1
    else:
        cfg = cfg or IndexConfig()
        next_gen = 1

    name = gen_name(next_gen)
    build_index(corpus_ds, os.path.join(root, name), cfg)
    man["indices"] = man["indices"] + [name]
    man["write_index"] = name
    _write_alias(root, man)
    return os.path.join(root, name)


# ---------------------------------------------------------------------------
# query side
# ---------------------------------------------------------------------------


def dfs_stats(index_dirs: list[str], terms) -> dict:
    """The ES dfs phase: cross-index-merged statistics for ``terms`` —
    ``{"N", "avgdl", "dfs": {term: global_df}}``. Exact int64 sums; avgdl
    is total_tokens/N in ONE float division (bit-identical to what a
    union build's stats stage computes). One small Ray task per index
    reads stats.json plus ONLY the query terms' dict rows (parquet filter
    pushdown), so cost is O(indices x query terms), independent of corpus
    and vocabulary size."""
    import ray

    terms = sorted(set(terms))

    @ray.remote(num_cpus=0.5)
    def one(d: str, terms: list[str]):
        import pyarrow.dataset as pads

        from webindex.util import read_json as _rj

        st = _rj(os.path.join(d, "stats.json"))
        tab = pads.dataset(os.path.join(d, "dict")).to_table(
            columns=["term", "df"],
            filter=pads.field("term").isin(terms),
        )
        return (
            int(st["N"]), int(st["total_tokens"]),
            dict(zip(tab.column("term").to_pylist(),
                     tab.column("df").to_pylist())),
        )

    parts = ray.get([one.remote(d, terms) for d in index_dirs])
    n = sum(p[0] for p in parts)
    tot = sum(p[1] for p in parts)
    dfs: dict[str, int] = {}
    for _, _, d in parts:
        for t, df in d.items():
            dfs[t] = dfs.get(t, 0) + int(df)
    return {"N": n, "avgdl": float(tot) / max(1, n), "dfs": dfs}


def alias_search(queries_ds, alias, *, top_k: int = 1000,
                 search_type: str = "dfs_query_then_fetch",
                 **search_kwargs):
    """queries(qid, text) Dataset -> runs Dataset over EVERY member index
    of ``alias`` (an alias root dir, or an explicit list of index dirs).

    ``search_type="dfs_query_then_fetch"`` (the reference's setting) runs
    the dfs phase first and scores every member with the merged global
    statistics — bit-identical ranks AND scores to one index built over
    the union corpus. ``"query_then_fetch"`` (ES's cheaper default) skips
    it: each member scores with its own local stats, so scores are only
    comparable per-member (exposed for ES parity; tests assert it
    actually diverges). Extra kwargs flow to ``search_queries``
    (filter_pred / match / boosts / ...) per member index.

    The per-qid merge is exact because member indices partition one docID
    space: each member's top-k is a superset of its docs' slots in the
    global top-k, and the total order (score desc, docID asc) is the
    standard one."""
    import pandas as pd

    from webindex.search import search_queries

    if search_type not in ("dfs_query_then_fetch", "query_then_fetch"):
        raise ValueError(f"unknown search_type {search_type!r}")
    dirs = alias_index_dirs(alias) if isinstance(alias, str) else list(alias)
    if not dirs:
        raise ValueError("alias has no member indices")
    an_cfgs = {
        repr(sorted(read_json(os.path.join(d, "config.json"))
                    ["analyzer"].items()))
        for d in dirs
    }
    if len(an_cfgs) != 1:
        raise ValueError(
            "alias members were built with different analyzers — "
            "cross-index scores would not be comparable"
        )

    stats = None
    if search_type == "dfs_query_then_fetch":
        from webindex.analyze import Analyzer

        cfg = IndexConfig.from_dict(
            read_json(os.path.join(dirs[0], "config.json"))
        )
        an = Analyzer(cfg.analyzer)
        # queries are the ES msearch batch — the one (small, runs-bounded)
        # driver-side materialization in the alias path
        texts = [
            r["text"]
            for r in queries_ds.select_columns(["text"]).take_all()
        ]
        terms = sorted({t for x in texts for t in an.tokens(x or "")})
        stats = dfs_stats(dirs, terms)

    per_index = [
        search_queries(
            queries_ds, d, top_k=top_k, global_stats=stats, **search_kwargs
        ).select_columns(["qid", "doc_id", "score"])
        for d in dirs
    ]
    unioned = per_index[0]
    if len(per_index) > 1:
        unioned = unioned.union(*per_index[1:])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["did"] = g["doc_id"].astype(str)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "did", "doc_id", "score", "rank"]]

    return unioned.groupby("qid").map_groups(merge, batch_format="pandas")
