"""Snippet extraction (the Lucene highlighter analog): for each search
hit, the analyzed-token window of fixed width with the highest DISTINCT
query-term coverage, earliest window winning ties — a pure deterministic
function of (doc text, query), so it is DuckDB-oracle-checkable
(contract entry snippets_top10).

Pipeline shape: hits are top-k-bounded (k × |queries| rows), so the
corpus text joins in via the same broadcast-candidates streaming
semi-join phrase verification uses (webindex.phrase._attach_text —
nothing corpus-sized moves, the corpus streams through one
map_batches); the window scan is one vectorized pass per hit
(per-term presence → windowed any via cumsum differences).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from webindex.analyze import Analyzer
from webindex.config import IndexConfig
from webindex.util import read_json


def best_window(tokens: list[str], query_terms: set[str],
                window: int) -> tuple[int, list[str]]:
    """(start, window tokens) of the width-``window`` token window with
    max distinct-query-term coverage; earliest start wins ties. A doc
    shorter than the window is one whole-doc window."""
    n = len(tokens)
    if n == 0:
        return 0, []
    w = min(window, n)
    n_starts = n - w + 1
    cov = np.zeros(n_starts, dtype=np.int32)
    t = np.asarray(tokens, dtype=object)
    for term in query_terms:
        present = (t == term).astype(np.int32)
        if not present.any():
            continue
        c = np.concatenate(([0], np.cumsum(present)))
        cov += (c[w:] - c[:-w] > 0).astype(np.int32)
    start = int(np.argmax(cov))  # argmax returns the FIRST maximum
    return start, tokens[start: start + w]


def snippet_runs(runs_ds, docs_ds, queries_ds, *, window: int = 8,
                 index_dir: str | None = None, analyzer_cfg=None,
                 id_col: str = "doc_id", text_col: str = "text",
                 broadcast_limit: int = 100_000, num_partitions: int = 32):
    """runs(qid, doc_id, ...) × corpus × queries ->
    (qid, doc_id, snippet). Analyzer comes from ``index_dir``'s config
    (or ``analyzer_cfg``) so snippets tokenize exactly like the index."""
    import ray

    from webindex.phrase import _attach_text

    if analyzer_cfg is None:
        if index_dir is None:
            raise ValueError("snippet_runs needs index_dir or analyzer_cfg")
        analyzer_cfg = IndexConfig.from_dict(
            read_json(os.path.join(index_dir, "config.json"))
        ).analyzer
    an = Analyzer(analyzer_cfg)
    qtab = pa.concat_tables(
        list(queries_ds.iter_batches(batch_format="pyarrow"))
    )
    qterms = {
        qid: set(an.tokens(text or ""))
        for qid, text in zip(
            qtab.column("qid").to_pylist(), qtab.column("text").to_pylist()
        )
    }
    qterms_ref = ray.put(qterms)

    hits = runs_ds.map_batches(
        lambda t: t.select(["qid", id_col]), batch_format="pyarrow"
    )
    withtext = _attach_text(
        hits, docs_ds, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
    )
    if withtext is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"qid": pa.array([], pa.string()),
                 id_col: pa.array([], pa.int64()),
                 "snippet": pa.array([], pa.string())}
            )
        )

    cfg = analyzer_cfg

    def extract(batch: pa.Table) -> pa.Table:
        from webindex.build import analyzer_for

        ana = analyzer_for(cfg)
        qt = ray.get(qterms_ref)
        snips = [
            " ".join(
                best_window(ana.tokens(txt or ""), qt[qid], window)[1]
            )
            for qid, txt in zip(
                batch.column("qid").to_pylist(),
                batch.column(text_col).to_pylist(),
            )
        ]
        return pa.table(
            {
                "qid": batch.column("qid"),
                id_col: batch.column(id_col),
                "snippet": pa.array(snips, pa.string()),
            }
        )

    return withtext.map_batches(extract, batch_format="pyarrow")
