"""Phrase queries over the BM25 index (the ES ``match_phrase`` analog —
the query surface the reference's BM25 runs sit on top of via
Elasticsearch, SURVEY.md §2.6 K6).

The index stores no term positions (postings are ``(doc_id, tf)``), so
phrase matching runs as **lazy verification** — the standard trick for
position-free indexes:

1. conjunctive candidates from the index (``match="and"``; every doc that
   contains all phrase terms — bounded by the *rarest* term's df, never
   corpus-sized);
2. a hash semi-join of the candidate docIDs against the corpus text (the
   candidate side is the small side: broadcast below
   ``broadcast_limit`` rows, hash-partitioned co-location join above);
3. a re-analyze + vectorized adjacency check inside ``map_batches``
   (per-candidate cost is one tokenizer pass over one doc);
4. exact per-qid top-k (``relational.grouped_topk``: local top-k superset
   per batch, exact re-rank per hash partition).

Scoring matches ES ``match_phrase``: the BM25 score of the phrase's
unique terms (same contributions and ascending-term summation order as
the plain ``match`` path), filtered to docs where the analyzed phrase
tokens appear consecutively in order. Partitioning assumption: none
beyond one hash shuffle of the (bounded) candidate set; the corpus
streams, nothing corpus-sized reaches the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from webindex.analyze import Analyzer
from webindex.config import IndexConfig
from webindex.util import read_json


def contains_phrase(tokens: list[str], phrase: tuple[str, ...]) -> bool:
    """True iff ``phrase`` occurs as a contiguous subsequence of
    ``tokens`` (vectorized: filter candidate start positions per phrase
    slot instead of a Python window scan)."""
    n, m = len(tokens), len(phrase)
    if m == 0 or n < m:
        return False
    t = np.asarray(tokens, dtype=object)
    starts = np.flatnonzero(t[: n - m + 1] == phrase[0])
    for j in range(1, m):
        if starts.size == 0:
            return False
        starts = starts[t[starts + j] == phrase[j]]
    return bool(starts.size)


def _attach_text(cand_ds, docs_ds, *, id_col: str, text_col: str,
                 num_partitions: int, broadcast_limit: int):
    """Join ``text_col`` from the corpus onto candidate rows by doc id.

    Candidates are pre-materialized (bounded by Σ_q conjunctive matches);
    below ``broadcast_limit`` they broadcast via the object store and the
    corpus STREAMS through one ``map_batches`` (no shuffle at all). Above
    it, falls back to the repo's union + hash-partitioned groupby
    co-location join (dedup._attach_side shape)."""
    import ray

    cand = cand_ds.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return None
    if n_cand <= broadcast_limit:
        cand_tab = pa.concat_tables(
            list(cand.iter_batches(batch_format="pyarrow"))
        )
        order = np.argsort(cand_tab.column(id_col).to_numpy(), kind="stable")
        cand_tab = cand_tab.take(pa.array(order, pa.int64()))
        ref = ray.put(cand_tab)

        def join(batch: pa.Table) -> pa.Table:
            side = ray.get(ref)  # zero-copy
            cids = side.column(id_col).to_numpy()
            dids = batch.column(id_col).to_numpy()
            lo = np.searchsorted(cids, dids, side="left")
            hi = np.searchsorted(cids, dids, side="right")
            counts = hi - lo
            doc_rows = np.repeat(np.arange(batch.num_rows), counts)
            # candidate rows: per matched doc, the contiguous [lo, hi) run
            cand_rows = np.concatenate(
                [np.arange(lov, hiv) for lov, hiv in
                 zip(lo[counts > 0], hi[counts > 0])]
            ) if doc_rows.size else np.empty(0, np.int64)
            out = side.take(pa.array(cand_rows, pa.int64()))
            return out.append_column(
                text_col,
                batch.column(text_col).take(pa.array(doc_rows, pa.int64())),
            )

        return docs_ds.select_columns([id_col, text_col]).map_batches(
            join, batch_format="pyarrow"
        )

    from webindex.dedup import _attach_side

    joined = _attach_side(
        cand, docs_ds.select_columns([id_col, text_col]),
        [text_col], {text_col: pa.string()}, id_col, id_col,
        num_partitions,
    )
    # _attach_side names the joined column f"{col}_{side}"
    return joined.map_batches(
        lambda t: t.rename_columns(
            [text_col if c == f"{text_col}_{id_col}" else c
             for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


def phrase_search(queries_ds, index_dir: str, docs_ds=None, *,
                  top_k: int = 10, id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 32,
                  broadcast_limit: int = 100_000, strategy: str = "auto"):
    """queries(qid, text) × index [× corpus] -> phrase-match runs
    ``(qid, did, doc_id, score, rank)``; see module docstring.

    ``strategy="auto"`` answers from the index alone when it stores
    positions (``IndexConfig(store_positions=True)`` — the Lucene
    execution model, webindex.positional; no ``docs_ds`` needed), else
    falls back to this module's lazy verification against the corpus
    text. Both strategies are result-identical (tests/test_query_lang.py).
    """
    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    if strategy == "auto":
        strategy = "indexed" if cfg.store_positions else "verify"
    if strategy == "indexed":
        from webindex.search import search_queries

        return search_queries(
            queries_ds, index_dir, top_k=top_k, query_kind="phrase"
        )
    if docs_ds is None:
        raise ValueError(
            "phrase_search strategy='verify' needs docs_ds (the index "
            "stores no positions)"
        )
    stats = read_json(os.path.join(index_dir, "stats.json"))
    an = Analyzer(cfg.analyzer)
    # queries are the workload's small side (the reference broadcasts its
    # whole query set per dataset too): analyzed phrase per qid rides to
    # the verify stage through the object store
    import ray

    qtab = pa.concat_tables(
        list(queries_ds.iter_batches(batch_format="pyarrow"))
    )
    phrases = {
        qid: tuple(an.tokens(text or ""))
        for qid, text in zip(
            qtab.column("qid").to_pylist(), qtab.column("text").to_pylist()
        )
    }
    phrases_ref = ray.put(phrases)

    # 1. conjunctive candidates — ALL of them (k = N): exactness requires
    # verifying the phrase on every doc containing all terms
    from webindex.search import search_queries

    cand = search_queries(
        queries_ds, index_dir, top_k=max(1, stats["N"]), match="and"
    ).map_batches(
        lambda t: t.select(["qid", "doc_id", "score"]),
        batch_format="pyarrow",
    )

    # 2. text join (candidate side small -> corpus streams, no shuffle)
    withtext = _attach_text(
        cand, docs_ds, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
    )
    if withtext is None:  # no conjunctive candidates at all
        import ray.data as rd

        return rd.from_arrow(_empty_runs())

    # 3. verify adjacency (process-global analyzer cache, build.py pattern)
    def verify(batch: pa.Table) -> pa.Table:
        from webindex.build import analyzer_for

        ana = analyzer_for(cfg.analyzer)
        ph = ray.get(phrases_ref)
        keep = np.fromiter(
            (
                contains_phrase(ana.tokens(txt or ""), ph[qid])
                for qid, txt in zip(
                    batch.column("qid").to_pylist(),
                    batch.column(text_col).to_pylist(),
                )
            ),
            dtype=bool, count=batch.num_rows,
        )
        return batch.filter(pa.array(keep)).drop_columns([text_col])

    verified = withtext.map_batches(verify, batch_format="pyarrow")

    # 4. exact per-qid top-k (score desc, docID asc), did/rank like runs
    from webindex.relational import grouped_topk

    runs = grouped_topk(
        verified, ["qid"], "score", top_k, descending=True,
        tie_cols=["doc_id"], n_parts=num_partitions,
    )

    def finish(batch: pa.Table) -> pa.Table:
        did = pa.array(
            [str(d) for d in batch.column("doc_id").to_pylist()], pa.string()
        )
        return pa.table(
            {
                "qid": batch.column("qid"),
                "did": did,
                "doc_id": batch.column("doc_id"),
                "score": batch.column("score"),
                "rank": batch.column("rank"),
            }
        )

    return runs.map_batches(finish, batch_format="pyarrow")


def _empty_runs() -> pa.Table:
    return pa.table(
        {
            "qid": pa.array([], pa.string()),
            "did": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int32()),
        }
    )


def shingle_phrase_search(queries_ds, main_index: str, shingle_index: str,
                          *, top_k: int = 10, n_shards: int | None = None):
    """Exact two-word phrase queries through a SHINGLE (word-bigram)
    index — the Lucene ``index_phrases: true`` accelerator: a bigram
    term exists in a doc iff the adjacency occurs, so matching is ONE
    posting-list read (no positions decode, no corpus verify), and the
    match set is provably identical to the positional / lazy-verify
    phrase paths. Scoring stays on the MAIN index (BM25 over the
    phrase's unique terms, the shared ``_score_matched`` fold), so ranks
    are bit-identical to ``phrase_topk`` — the shingle index never
    influences statistics, mirroring Lucene's ``._index_phrase``
    subfield design.

    Both indexes must be built from the same corpus (docIDs derive from
    the corpus, not the token stream, so they agree by construction) and
    share ``num_buckets``; each shard task loads the salt-range subset
    of BOTH. Phrases longer than two words raise — route those to
    ``phrase_search`` / ``positional.phrase_topk`` (Lucene combines
    bigrams with positions there; the exactness argument needs only the
    bigram for m=2)."""
    import pandas as pd

    from webindex.positional import _score_matched
    from webindex.search import _qtext_explode, _shard_searcher
    from webindex.serve import shard_salt_bounds

    from webindex.search import SEARCH_SHARDS

    n_shards = n_shards or SEARCH_SHARDS
    bounds = shard_salt_bounds(main_index, n_shards)

    def sh_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        main = _shard_searcher(main_index, lo, hi, top_k, "auto", False)
        shin = _shard_searcher(shingle_index, lo, hi, top_k, "auto", False)
        s, sh = main.inner, shin.inner
        qid_out, id_out, sc_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            grams = sh.an.tokens(text or "")
            words = s.an.tokens(text or "")
            if len(words) != 2 or len(grams) != 1:
                raise ValueError(
                    "shingle_phrase_search handles exactly two-word "
                    f"phrases; got {words!r} — use phrase_search / "
                    "positional.phrase_topk for longer phrases"
                )
            gpl = sh.reader.postings(grams[0])
            if gpl is None:
                continue
            pls = []
            for t in sorted(set(words)):
                pl = s.reader.postings(t)
                if pl is None:
                    pls = None
                    break
                pls.append(pl)
            if pls is None:
                continue  # bigram exists => terms exist; defensive
            ids, scores = _score_matched(s.reader, pls, gpl.ids, top_k,
                                         None)
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

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "rank"]]

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(sh_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )
