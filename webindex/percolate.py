"""ES percolator analog: REVERSE search — match a stream of documents
against a registered set of queries (alerting / saved-search delivery:
"which saved queries does this new page satisfy?").

ES stores percolator queries in an index and runs each incoming doc
through them; the famous scale problem is that cost grows with the query
count per doc. Here the registered queries are the SMALL side: analyzed
once on the driver, broadcast via ``ray.put``, and the corpus STREAMS
through a stateless ``map_batches`` — per batch one vectorized
membership matrix (docs x query-vocabulary) and one int8 matmul produce
every (query, doc) match, so throughput scales with corpus blocks and
nothing corpus-sized is ever collected.

Match semantics per query: conjunctive (``operator: and`` — every
distinct analyzed term present in the doc) or ``min_match=N`` of them,
the same bool surface as the forward search path (webindex/search.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webindex.analyze import Analyzer
from webindex.config import AnalyzerConfig


def percolate(docs_ds, queries: list[tuple[str, str]], *,
              analyzer: AnalyzerConfig | None = None,
              min_match: int | None = None,
              id_col: str = "doc_id", text_col: str = "text"):
    """docs Dataset x [(query_id, text)] -> (query_id, doc_id) matches.

    ``min_match=None`` = conjunctive (all distinct terms); ``min_match=N``
    matches docs containing at least N of the query's distinct terms.
    Queries whose analyzed form is empty match nothing (ES semantics for
    an empty bool query under filter context: no terms, no match here).
    """
    import ray

    an_cfg = analyzer or AnalyzerConfig()
    an = Analyzer(an_cfg)
    qids, term_lists = [], []
    for qid, text in queries:
        ts = sorted(set(an.tokens(text or "")))
        if not ts:
            continue
        qids.append(qid)
        term_lists.append(ts)
    if not qids:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"query_id": pa.array([], pa.string()),
                      id_col: pa.array([], pa.int64())})
        )
    vocab = sorted({t for ts in term_lists for t in ts})
    v_index = {t: i for i, t in enumerate(vocab)}
    # indicator: vocabulary x queries (tiny — the registered-query side)
    ind = np.zeros((len(vocab), len(qids)), dtype=np.int32)
    for j, ts in enumerate(term_lists):
        for t in ts:
            ind[v_index[t], j] = 1
    need = np.array(
        [len(ts) if min_match is None else min(min_match, len(ts))
         for ts in term_lists],
        dtype=np.int32,
    )
    side = ray.put({"vocab": np.array(vocab), "ind": ind, "need": need,
                    "qids": np.array(qids)})

    def match_batch(batch: pa.Table) -> pa.Table:
        s = ray.get(side)  # zero-copy numpy from the object store
        vocab_np, ind_m, need_v, qid_v = (
            s["vocab"], s["ind"], s["need"], s["qids"]
        )
        an_b = Analyzer(an_cfg)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        n = len(ids)
        pres = np.zeros((n, vocab_np.size), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = np.array(sorted(set(an_b.tokens(t or ""))))
            if toks.size == 0:
                continue
            pos = np.searchsorted(vocab_np, toks)
            pos = pos[
                (pos < vocab_np.size) & (vocab_np[np.minimum(
                    pos, vocab_np.size - 1)] == toks)
            ]
            pres[i, pos] = 1
        counts = pres @ ind_m  # docs x queries
        di, qi = np.nonzero(counts >= need_v[None, :])
        return pa.table(
            {
                "query_id": pa.array(qid_v[qi]),
                id_col: pa.array(
                    np.asarray(ids, dtype=np.int64)[di], pa.int64()
                ),
            }
        )

    return docs_ds.map_batches(match_batch, batch_format="pyarrow")
