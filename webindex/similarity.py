"""Pluggable similarity modules over the SAME inverted index — the ES
``similarity`` index setting (LM Dirichlet, LM Jelinek-Mercer, classic
TF-IDF, boolean), each a drop-in replacement for BM25's per-term
contribution with identical postings, stats, and determinism contract.

The reference scores with ES's default BM25 only (invoked at
/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 via
the beir dep); ES 7.0.0 exposes these alternatives per field with the same
``dfs_query_then_fetch`` corpus-global statistics. Like the BM25 spec
(SURVEY.md §7.0) the exact formulas are pinned HERE, shared by the engine,
the tests, and the DuckDB oracles:

  lmdirichlet (mu = 2000):
      c(t,d) = max(0, ln(1 + tf / (mu * (cf/T))) + ln(mu / (dl + mu)))
  lmjm (lambda = 0.1):
      c(t,d) = ln(1 + ((1-lambda)/lambda) * (tf/dl) / (cf/T))
  tfidf (Lucene-classic shape):
      idf(t) = 1 + ln(N / (df + 1))
      c(t,d) = sqrt(tf) * idf^2 / sqrt(dl)
  boolean:
      c(t,d) = 1.0   (score = number of matched unique query terms)

where T = exact total token count of the corpus (stats.json, int64) and
cf = collection frequency of the term (dict sidecar). LM Dirichlet's
per-term clamp at 0 keeps scores non-negative (matched docs with a fully
clamped score still count as hits, score 0.0 — the SQL oracle agrees).

Determinism: per-(query, doc) contributions are summed in ascending
unicode order of the query's unique terms in float64 (the BM25 contract,
webindex/scoring.py); ln is evaluated with scalar ``math.log`` per
DISTINCT argument — bit-identical to DuckDB ``ln()``, where numpy's SIMD
``np.log`` differs by 1 ulp (measured; CLAUDE.md invariant). Ranking ties
break by ascending docID.

Execution shape: the same pinned salt-range shard fan-out as
``search.count_queries`` — per-shard exhaustive scatter-add (shards hold
disjoint docID ranges, so unranked score sets need NO merge; top-k adds
the standard exact per-qid merge). WAND/MAXSCORE pruning is NOT offered
here: its block-max metadata stores BM25 score bounds, which bound no
other similarity.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

MU = 2000.0
LAMBDA = 0.1

SIMILARITIES = ("lmdirichlet", "lmjm", "tfidf", "boolean")


def _exact_ln(args: np.ndarray) -> np.ndarray:
    """ln per distinct argument with math.log (DuckDB-bit-identical)."""
    uniq, inv = np.unique(args, return_inverse=True)
    logs = np.fromiter(
        (math.log(u) for u in uniq.tolist()), np.float64, uniq.size
    )
    return logs[inv]


def sim_contrib(pl, reader, similarity: str) -> np.ndarray:
    """Per-posting contribution of ``pl.term`` under the similarity —
    cached on the posting list per similarity name (query-independent,
    like the BM25 ``dense_contrib`` cache in wand._dense)."""
    cache = getattr(pl, "sim_cache", None)
    if cache is None:
        cache = pl.sim_cache = {}
    c = cache.get(similarity)
    if c is not None:
        return c
    tf = pl.tfs.astype(np.float64)
    dl = reader._dl[pl.dense_pos].astype(np.float64)
    T = int(reader.stats["total_tokens"])
    if similarity == "lmdirichlet":
        p = reader.cf(pl.term) / T
        c1 = _exact_ln(1.0 + tf / (MU * p))
        c2 = _exact_ln(MU / (dl + MU))
        c = np.maximum(0.0, c1 + c2)
    elif similarity == "lmjm":
        p = reader.cf(pl.term) / T
        c = _exact_ln(1.0 + ((1.0 - LAMBDA) / LAMBDA) * (tf / dl) / p)
    elif similarity == "tfidf":
        idf_t = 1.0 + math.log(reader.N / (pl.df + 1))
        c = np.sqrt(tf) * (idf_t * idf_t) / np.sqrt(dl)
    elif similarity == "boolean":
        c = np.ones(tf.size, dtype=np.float64)
    else:
        raise ValueError(
            f"unknown similarity {similarity!r}; one of {SIMILARITIES}"
        )
    cache[similarity] = c
    return c


def score_matches(reader, terms: list[str], similarity: str):
    """(doc_ids, scores) of EVERY doc matching >=1 unique query term,
    scored under the similarity. Ascending-term scatter-add, exactly the
    exhaustive BM25 kernel's summation order (wand.exhaustive_topk)."""
    from webindex.wand import _dense, query_postings

    pls = query_postings(reader, terms)
    if not pls:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    n = reader._dl_ids.size
    scores = np.zeros(n, dtype=np.float64)
    hits = np.zeros(n, dtype=np.int16)
    for pl in pls:  # ascending term order (query_postings sorts)
        _dense(pl, reader)  # fills dense_pos (doclen-table positions)
        scores[pl.dense_pos] += sim_contrib(pl, reader, similarity)
        hits[pl.dense_pos] += 1
    # membership from the hit counter, NOT score>0: a fully clamped
    # LM-Dirichlet match (score 0.0) is still a hit
    sel = np.flatnonzero(hits)
    return reader._dl_ids[sel], scores[sel]


def similarity_search(queries_ds, index_dir: str, similarity: str, *,
                      top_k: int | None = None, n_shards: int | None = None):
    """queries(qid, text) Dataset -> (qid, doc_id, score[, rank]).

    ``top_k=None`` emits every match's score (the ``bm25_scores``-shaped
    contract surface); shards emit directly — disjoint docID ranges need
    no merge. With ``top_k`` each shard emits its local top-k and an
    exact per-qid merge (score desc, docID asc) reassembles global runs
    (the serve.py merge proof)."""
    import pandas as pd

    from webindex.search import SEARCH_SHARDS, _shard_searcher
    from webindex.serve import shard_salt_bounds
    from webindex.wand import _rank_topk

    if similarity not in SIMILARITIES:
        raise ValueError(
            f"unknown similarity {similarity!r}; one of {SIMILARITIES}"
        )
    if n_shards is None:
        n_shards = SEARCH_SHARDS
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        cols = {
            "shard": pa.array(
                np.repeat(np.arange(len(bounds), dtype=np.int32),
                          batch.num_rows)
            )
        }
        for name in batch.column_names:
            cols[name] = pa.concat_arrays(
                [batch.column(name).combine_chunks()] * len(bounds)
            )
        return pa.table(cols)

    def score_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        s = searcher.inner
        qid_out, id_out, sc_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            ids, scores = score_matches(
                s.reader, s.an.tokens(text or ""), similarity
            )
            if top_k is not None and ids.size:
                ids, scores = _rank_topk(ids, scores, top_k)
            qid_out.extend([qid] * ids.size)
            id_out.append(ids)
            sc_out.append(scores)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out
                    else np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(sc_out) if sc_out
                    else np.empty(0, np.float64)
                ),
            }
        )

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(score_shard, batch_format="pyarrow")
    )
    if top_k is None:
        return partial

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "rank"]]

    return partial.groupby("qid").map_groups(merge, batch_format="pandas")
