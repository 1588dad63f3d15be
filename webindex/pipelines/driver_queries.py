"""Driver-contract query registry: name -> (ray_callable, oracle_sql|None).

Each entry is an operator/pipeline from SURVEY.md §2 (mapping noted per
entry) over the driver's parquet tables. The Ray result and the DuckDB SQL
must agree in row count, schema (column NAMES match aliases) and values.

SQL-checkable BM25 uses the ``SQL_SAFE_ANALYZER`` (lowercase, ASCII
``[a-z0-9]+`` tokens, no stopwords/stemming) so DuckDB can reproduce
tokenization with ``regexp_extract_all``; the SQL scores sum per-term
contributions with ``list_sum(list(contrib ORDER BY term))`` — the same
fixed ascending-term float64 summation order the engine pins (SURVEY.md
§7.3). The stemmed engine path is covered by the pure-Python oracle in
pytest (tests/test_build_search.py) and appears here as rows-only entries.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from webindex.analyze import Analyzer
from webindex.config import SQL_SAFE_ANALYZER, IndexConfig

K1, B = 0.9, 0.4
TOPK = 10

# Fixed reference query set over the driver's documents vocabulary.
DOC_QUERIES: list[tuple[str, str]] = [
    ("q1", "merge join sort"),
    ("q2", "spark window stream"),
    ("q3", "filter hash table scan"),
    ("q4", "vector column batch data"),
    ("q5", "customer order line"),
    ("q6", "slow query big"),
    ("q7", "the fast key"),
    ("q8", "group agg row"),
]

_sql_an = Analyzer(SQL_SAFE_ANALYZER)
# unique (qid, term) pairs, tokenized once with the shared analyzer
QUERY_TERMS: list[tuple[str, str]] = [
    (qid, t) for qid, text in DOC_QUERIES for t in sorted(set(_sql_an.tokens(text)))
]

_TOK_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# Phrase-query workload (ES match_phrase analog, webindex.phrase): mixes
# common bigrams, a trigram with a stopword-scale term, and repeats.
PHRASE_QUERIES: list[tuple[str, str]] = [
    ("p1", "merge join"),
    ("p2", "the fast key"),
    ("p3", "batch batch"),
    ("p4", "customer order line"),
    ("p5", "window window"),
]
PHRASE_TERMS: list[tuple[str, str]] = [
    (qid, t)
    for qid, text in PHRASE_QUERIES
    for t in sorted(set(_sql_an.tokens(text)))
]


def _query_values_sql() -> str:
    rows = ", ".join(f"('{q}', '{t}')" for q, t in QUERY_TERMS)
    return f"(VALUES {rows}) AS q(qid, term)"


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


_INDEX_CACHE_ROOT = "/tmp/webindex-cache"


def ensure_index(sf_dir: str, variant: str = "nostem") -> str:
    """Build (once, resumably) the documents-table index for ``sf_dir``."""
    from webindex.build import build_index
    from webindex.pipelines.corpus import corpus_from_documents

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-{variant}")
    if variant in ("nostem", "pdv"):
        cfg = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=16)
    elif variant == "synidx":
        from webindex.config import AnalyzerConfig

        cfg = IndexConfig(
            analyzer=AnalyzerConfig(
                remove_stopwords=False, stem=False, ascii_only=True,
                synonyms=SYNIDX_MAP,
            ),
            num_buckets=16,
        )
    elif variant == "pos":
        # positional postings: index-only phrase queries (webindex.positional)
        cfg = IndexConfig(
            analyzer=SQL_SAFE_ANALYZER, num_buckets=16, store_positions=True
        )
    elif variant == "shingle":
        # word-bigram index: the Lucene index_phrases accelerator
        # (phrase.shingle_phrase_search) — matching only, never scoring
        from webindex.config import AnalyzerConfig

        cfg = IndexConfig(
            analyzer=AnalyzerConfig(
                remove_stopwords=False, stem=False, ascii_only=True,
                shingle_only=True,
            ),
            num_buckets=16,
        )
    else:
        cfg = IndexConfig(num_buckets=16)
    # docvalues sidecar (lang/source/n_chars) powers the filtered-search
    # entries; StageRunner adds the stage to pre-existing cached indexes
    # without re-tokenizing
    import ray.data as rd

    dv = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )
    if variant == "pdv":
        # PARTIAL docvalues: sidecar rows only for doc_id % 3 != 0 — powers
        # the ES exists/missing entries (missing-field semantics need
        # genuinely absent values)
        def _pdv_subset(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            return t.filter(pa.array(ids % 3 != 0))

        dv = dv.map_batches(_pdv_subset, batch_format="pyarrow")
    build_index(corpus_from_documents(_docs(sf_dir)), out, cfg,
                docvalues_ds=dv)
    return out


def _queries_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "qid": pa.array([q for q, _ in DOC_QUERIES]),
                "text": pa.array([t for _, t in DOC_QUERIES]),
            }
        )
    )


# ---------------------------------------------------------------------------
# 1. corpus stats  (SURVEY.md §2.5 A4/A8: global aggregates N, avgdl)
# ---------------------------------------------------------------------------


def q_corpus_stats(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    an = Analyzer(SQL_SAFE_ANALYZER)

    def doclen(batch: pa.Table) -> pa.Table:
        dls = [len(an.tokens(t or "")) for t in batch.column("text").to_pylist()]
        return pa.table({"dl": pa.array(dls, pa.int64())})

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    ).map_batches(doclen, batch_format="pyarrow")
    agg = ds.aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="total_tokens"))
    n, tot = int(agg["n_docs"]), int(agg["total_tokens"])
    return pd.DataFrame(
        [{"n_docs": n, "total_tokens": tot, "avgdl": float(tot) / max(1, n)}]
    )


SQL_CORPUS_STATS = f"""
WITH dl AS (
  SELECT len({_TOK_SQL})::BIGINT AS dl FROM documents WHERE text <> ''
)
SELECT count(*)::BIGINT AS n_docs,
       sum(dl)::BIGINT AS total_tokens,
       sum(dl)::DOUBLE / count(*) AS avgdl
FROM dl
"""


# ---------------------------------------------------------------------------
# 2. doclens  (per-doc token length — M5 analog)
# ---------------------------------------------------------------------------


def q_doclens(sf_dir: str):
    an = Analyzer(SQL_SAFE_ANALYZER)

    def doclen(batch: pa.Table) -> pa.Table:
        dls = [len(an.tokens(t or "")) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "dl": pa.array(dls, pa.int64())}
        )

    return _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    ).map_batches(doclen, batch_format="pyarrow")


SQL_DOCLENS = f"""
SELECT doc_id, len({_TOK_SQL})::BIGINT AS dl
FROM documents WHERE text <> ''
"""


# ---------------------------------------------------------------------------
# 3. term df/cf  (SURVEY.md §2.5 A8 — the dictionary aggregate)
# ---------------------------------------------------------------------------


def q_term_df(sf_dir: str):
    from ray.data.aggregate import Sum

    from webindex.build import TokenizeStage, _partial_df

    tok = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    ).map_batches(
        TokenizeStage, fn_constructor_args=(SQL_SAFE_ANALYZER,),
        batch_format="pyarrow", concurrency=2,
    )
    postings = tok.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0)), batch_format="pyarrow"
    )
    partial = postings.map_batches(_partial_df, batch_format="pyarrow")
    return partial.groupby("term").aggregate(
        Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf")
    )


SQL_TERM_DF = f"""
WITH toks AS (
  SELECT doc_id, t.tok AS term
  FROM documents, unnest({_TOK_SQL}) AS t(tok)
  WHERE text <> ''
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
"""


# ---------------------------------------------------------------------------
# 4. BM25 top-k, SQL-safe analyzer  (the full engine path vs SQL oracle)
# ---------------------------------------------------------------------------


def q_bm25_top10(sf_dir: str):
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, mode="wand", concurrency=2, batch_size=8
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _sql_bm25_scores(values_sql: str | None = None,
                     docs_where: str = "", having: str = "",
                     boosts_values: dict | None = None,
                     docs_sql: str | None = None,
                     tok_expr: str | None = None) -> str:
    boost_cte = boost_join = ""
    boost_expr = ""
    if boosts_values:
        rows = ", ".join(
            f"('{t}', {w!r})" for t, w in sorted(boosts_values.items())
        )
        boost_cte = (
            f"boosts AS (SELECT * FROM (VALUES {rows}) b(term, boost)),\n"
        )
        boost_join = "LEFT JOIN boosts b ON b.term = q.term"
        # same float-op order as the engine: (idf * tf_norm) * boost
        boost_expr = " * coalesce(b.boost, 1.0)"
    docs_sql = docs_sql or (
        f"SELECT doc_id, text FROM documents WHERE text <> '' {docs_where}"
    )
    tok_expr = tok_expr or _TOK_SQL
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({tok_expr}) AS t(tok)
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, len({tok_expr})::BIGINT AS dl FROM docs),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens FROM dl),
{boost_cte}qterms AS (SELECT * FROM {values_sql or _query_values_sql()}),
contrib AS (
  SELECT q.qid, tf.doc_id, q.term, tf.tf AS tf, dl.dl AS dl, df.df AS df,
    ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * (dl.dl / (s.total_tokens::DOUBLE / s.n_docs))))){boost_expr} AS c
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  {boost_join}
  CROSS JOIN stats s
),
scores AS (
  SELECT qid, doc_id, list_sum(list(c ORDER BY term)) AS score
  FROM contrib GROUP BY qid, doc_id {having}
)
"""


SQL_BM25_TOP10 = _sql_bm25_scores() + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


def q_bm25_scores(sf_dir: str):
    """All matching (qid, doc) BM25 scores rounded to 6dp — no top-k
    boundary, so the comparison is robust to last-ulp float noise."""
    from webindex.search import SearcherActor

    idx = ensure_index(sf_dir, "nostem")
    s = SearcherActor(idx, top_k=10**9, mode="exhaustive")
    rows = []
    for qid, text in DOC_QUERIES:
        ids, scores = s.search_one(qid, text)
        for d, sc in zip(ids.tolist(), scores.tolist()):
            rows.append((qid, d, round(sc, 6)))
    return pd.DataFrame(rows, columns=["qid", "doc_id", "score_r"])


SQL_BM25_SCORES = _sql_bm25_scores() + """
SELECT qid, doc_id, round(score, 6) AS score_r FROM scores
"""


# ---------------------------------------------------------------------------
# 4b. alias search over time-partitioned indices (webindex.rollover)
# ---------------------------------------------------------------------------


def ensure_alias(sf_dir: str) -> str:
    """Three member indices partitioning the documents table (doc_id mod 3
    — the pinned stand-in for calendar buckets), behind an alias manifest.
    Cached/resumable like ensure_index."""
    from webindex.rollover import build_alias, read_alias

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-alias")
    if len(read_alias(root)["indices"]) == 3:
        return root
    cfg = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=16)

    def part(r):
        def keep(t: pa.Table, r=r) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            mask = pc.and_(
                pa.array(ids % 3 == r), pc.not_equal(t.column("text"), "")
            )
            return t.filter(mask)

        return _docs(sf_dir).map_batches(keep, batch_format="pyarrow")

    build_alias(root, {f"idx-m{r}": part(r) for r in range(3)}, cfg)
    return root


def q_alias_top10(sf_dir: str):
    """ES alias search with search_type=dfs_query_then_fetch (the
    reference's ES setting, SURVEY.md §2.5 A8): three time-partition
    member indices score with cross-index-merged statistics, so the
    result — and hence the whole-corpus SQL oracle — is EXACTLY the
    single-index BM25 ranking."""
    from webindex.rollover import alias_search

    root = ensure_alias(sf_dir)
    runs = alias_search(_queries_ds(), root, top_k=TOPK)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_alias_scores(sf_dir: str):
    """Every matching (qid, doc) score via the alias path, 6dp — the
    value-level proof that the dfs stats merge reproduces whole-corpus
    BM25 bit-for-bit (rounding only guards the contract hash)."""
    from webindex.rollover import alias_search

    root = ensure_alias(sf_dir)
    runs = alias_search(_queries_ds(), root, top_k=10**9)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "score_r": pc.round(t.column("score"), 6),
            }
        )

    return runs.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# 5. rerank join  (SURVEY.md §2.4 J2: top-k gather join + pair scoring)
# ---------------------------------------------------------------------------


def q_rerank_overlap(sf_dir: str):
    """Rerank the BM25 top-10 by exact query-term overlap count (a
    deterministic stand-in for the reference's GPT pair scorer,
    /root/reference/crossencoder/beir/sgptce.py:314-333)."""
    import ray

    runs = q_bm25_top10(sf_dir).to_pandas()
    # gather ONLY the top-k docs' texts (runs-bounded, never corpus-sized)
    need_arr = pa.array(sorted(set(runs["doc_id"].tolist())), pa.int64())
    docs = (
        _docs(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("doc_id"), need_arr)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    texts = {int(i): t for i, t in zip(docs["doc_id"], docs["text"])}
    an = Analyzer(SQL_SAFE_ANALYZER)
    qterms = {qid: set(an.tokens(text)) for qid, text in DOC_QUERIES}
    rows = []
    for qid, did in zip(runs["qid"], runs["doc_id"]):
        toks = set(an.tokens(texts[int(did)]))
        rows.append((qid, int(did), len(qterms[qid] & toks)))
    return pd.DataFrame(rows, columns=["qid", "doc_id", "overlap"])


SQL_RERANK_OVERLAP = _sql_bm25_scores() + f"""
, top AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
    FROM scores
  ) WHERE rank <= {TOPK}
)
SELECT top.qid, top.doc_id,
       count(DISTINCT toks.term)::BIGINT AS overlap
FROM top
JOIN toks ON toks.doc_id = top.doc_id
JOIN qterms ON qterms.qid = top.qid AND qterms.term = toks.term
GROUP BY top.qid, top.doc_id
"""


# ---------------------------------------------------------------------------
# 6. relational operators over documents / events / embeddings
# ---------------------------------------------------------------------------


def q_docs_by_lang(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )


SQL_DOCS_BY_LANG = """
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY lang
"""


def q_top_longest(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    # K3 analog: length-descending sort + limit
    out = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)
    return out


SQL_TOP_LONGEST = """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20
"""


def q_exact_dedup_docs(sf_dir: str):
    """Exact dedup summary (SURVEY.md §2.7 D1/D5): representative (min
    doc_id) + duplicate count per distinct text."""
    from ray.data.aggregate import Count, Min

    from webindex.dedup import add_text_hash

    hashed = _docs(sf_dir).map_batches(add_text_hash, batch_format="pyarrow")
    agg = hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.map_batches(
        lambda t: t.select(["doc_id", "n_dups"]), batch_format="pyarrow"
    )


SQL_EXACT_DEDUP = """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_dups
FROM documents GROUP BY text
"""


def q_events_hourly(sf_dir: str):
    """Streaming-shaped tumbling window (SURVEY.md §2.9 note): per
    (user_id, hour) event count + min/max value.

    High key cardinality (~#rows at this data shape), so this uses the
    hash-partitioned combiner/final pattern (webindex.relational) instead
    of Ray's per-key aggregate."""
    import ray.data as rd

    from webindex.relational import hash_partitioned_groupby

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
        override_num_blocks=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        return (
            df.groupby(["user_id", "hour"], sort=False)
            .agg(n_p=("value", "size"), mn=("value", "min"), mx=("value", "max"))
            .reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["user_id", "hour"], sort=False)
            .agg(
                n_events=("n_p", "sum"),
                min_value=("mn", "min"),
                max_value=("mx", "max"),
            )
            .reset_index()
        )

    return hash_partitioned_groupby(
        ds, ["user_id", "hour"], partial, final, n_parts=64
    )


SQL_EVENTS_HOURLY = """
SELECT user_id, date_trunc('hour', ts) AS hour,
       count(*)::BIGINT AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def q_events_pipeline_aggs(sf_dir: str):
    """ES PIPELINE aggregations (cumulative_sum / derivative / moving_avg
    as sibling pipeline aggs over a date_histogram): the monthly
    per-event_type histogram is the distributed combiner/final pass
    (events_calendar machinery); the pipeline transforms then run over
    the BUCKET ARRAY — exactly where ES runs them (coordinating node,
    bucket-count-sized data). deriv = n - lag(n) (first bucket 0),
    cum_n = running int sum, mavg = trailing-3 window mean — one int/int
    IEEE division per bucket (bit-exact cross-engine, events_sliding
    precedent)."""
    import ray.data as rd

    from webindex.relational import hash_partitioned_groupby

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts"],
        override_num_blocks=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(month=df["ts"].values.astype("datetime64[M]"))
        return (
            df.groupby(["event_type", "month"], sort=False)
            .size().rename("n_p").reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["event_type", "month"], sort=False)["n_p"]
            .sum().rename("n_events").reset_index()
        )

    hist = hash_partitioned_groupby(
        ds, ["event_type", "month"], partial, final
    ).to_pandas().sort_values(["event_type", "month"],
                              kind="mergesort").reset_index(drop=True)

    out = []
    for et, g in hist.groupby("event_type", sort=False):
        n = g["n_events"].to_numpy(np.int64)
        cum = np.cumsum(n)
        deriv = np.zeros_like(n)
        deriv[1:] = n[1:] - n[:-1]
        s1 = np.zeros_like(n)
        s1[1:] = n[:-1]
        s2 = np.zeros_like(n)
        s2[2:] = n[:-2]
        wsum = n + s1 + s2
        wcnt = np.minimum(np.arange(1, n.size + 1), 3)
        out.append(pd.DataFrame({
            "event_type": et,
            "month": g["month"].to_numpy(),
            "n_events": n,
            "cum_n": cum,
            "deriv": deriv,
            "mavg": wsum / wcnt,
        }))
    return pd.concat(out, ignore_index=True)


SQL_EVENTS_PIPELINE_AGGS = """
WITH m AS (
  SELECT event_type, date_trunc('month', ts) AS month,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY event_type, date_trunc('month', ts)
)
SELECT event_type, month, n_events,
       (sum(n_events) OVER w_cum)::BIGINT AS cum_n,
       coalesce(n_events - lag(n_events) OVER w, 0)::BIGINT AS deriv,
       (sum(n_events) OVER w3)::DOUBLE / (count(*) OVER w3) AS mavg
FROM m
WINDOW w AS (PARTITION BY event_type ORDER BY month),
       w_cum AS (PARTITION BY event_type ORDER BY month
                 ROWS UNBOUNDED PRECEDING),
       w3 AS (PARTITION BY event_type ORDER BY month
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_events_bucket_pipeline(sf_dir: str):
    """The other half of the ES pipeline-agg family — serial_diff
    (lag=2), bucket_selector, and bucket_sort over a DAILY
    date_histogram. ES order of operations: serial_diff is a sibling
    pipeline agg computed over the FULL bucket array; bucket_selector
    then drops buckets (n_events >= 60 here, both branches live at
    sf0.01 where daily counts span 47-86); bucket_sort finally orders
    the survivors (n_events desc, day asc) and keeps the top 5 per
    event_type. The histogram is the distributed combiner/final pass;
    the pipeline transforms run over the bucket array on the driver —
    exactly where ES runs them (coordinating node, bucket-count-sized
    data)."""
    import ray.data as rd

    from webindex.relational import hash_partitioned_groupby

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts"],
        override_num_blocks=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(day=df["ts"].values.astype("datetime64[D]"))
        return (
            df.groupby(["event_type", "day"], sort=False)
            .size().rename("n_p").reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["event_type", "day"], sort=False)["n_p"]
            .sum().rename("n_events").reset_index()
        )

    hist = hash_partitioned_groupby(
        ds, ["event_type", "day"], partial, final
    ).to_pandas().sort_values(["event_type", "day"],
                              kind="mergesort").reset_index(drop=True)

    out = []
    for et, g in hist.groupby("event_type", sort=False):
        n = g["n_events"].to_numpy(np.int64)
        sdiff = np.zeros_like(n)
        sdiff[2:] = n[2:] - n[:-2]
        b = pd.DataFrame({
            "event_type": et,
            "day": g["day"].to_numpy(),
            "n_events": n,
            "sdiff": sdiff,
        })
        b = b[b["n_events"] >= 60]
        b = b.sort_values(["n_events", "day"],
                          ascending=[False, True],
                          kind="mergesort").head(5)
        out.append(b)
    return pd.concat(out, ignore_index=True)


SQL_EVENTS_BUCKET_PIPELINE = """
WITH m AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY event_type, date_trunc('day', ts)
), d AS (
  SELECT event_type, day, n_events,
         coalesce(n_events - lag(n_events, 2) OVER
                  (PARTITION BY event_type ORDER BY day), 0)::BIGINT
           AS sdiff
  FROM m
)
SELECT event_type, day, n_events, sdiff FROM d
WHERE n_events >= 60
QUALIFY row_number() OVER
  (PARTITION BY event_type ORDER BY n_events DESC, day) <= 5
"""


def q_events_calendar(sf_dir: str):
    """ES date_histogram with calendar_interval=month (calendar buckets
    are NOT fixed-width — the reason ES distinguishes calendar_interval
    from fixed_interval): per (event_type, month) event count + exact
    min/max. Same hash-partitioned combiner/final shape as the hourly
    fixed-interval entry."""
    import ray.data as rd

    from webindex.relational import hash_partitioned_groupby

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
        override_num_blocks=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["month"] = df["ts"].values.astype("datetime64[M]")
        return (
            df.groupby(["event_type", "month"], sort=False)
            .agg(n_p=("value", "size"), mn=("value", "min"),
                 mx=("value", "max"))
            .reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["event_type", "month"], sort=False)
            .agg(
                n_events=("n_p", "sum"),
                min_value=("mn", "min"),
                max_value=("mx", "max"),
            )
            .reset_index()
        )

    return hash_partitioned_groupby(
        ds, ["event_type", "month"], partial, final
    )


SQL_EVENTS_CALENDAR = """
SELECT event_type, date_trunc('month', ts) AS month,
       count(*)::BIGINT AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type, date_trunc('month', ts)
"""


def q_events_asof_orders(sf_dir: str):
    """As-of join (temporal operator Ray Data lacks; webindex.temporal):
    each event matched to the user's latest order at-or-before the event
    timestamp, inner semantics — DuckDB's ASOF JOIN is the oracle. The
    right side is deduped to one row per (custkey, orderdate) (max orderkey
    wins) so the as-of match is unique and deterministic on both sides."""
    import ray.data as rd

    from webindex.temporal import asof_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("o_orderkey", kind="mergesort")
        return g.groupby("o_orderdate", as_index=False).last()

    od_u = od.groupby("o_custkey").map_groups(dedupe, batch_format="pandas")
    return asof_join(
        ev, od_u, key="user_id", left_ts="ts",
        right_key="o_custkey", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )


SQL_EVENTS_ASOF = """
WITH od AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.ts, e.user_id, e.value, o.o_orderkey, o.o_totalprice
FROM events e ASOF JOIN od o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_events_range_pairs(sf_dir: str):
    """Range join (webindex.temporal): every (event, earlier event) pair of
    the same user within a 6-hour attribution window — the inequality join
    DuckDB writes directly and Ray Data has no operator for.
    Bin-replication keeps the shuffle key time-aware (session-ization /
    burst-detection shape). Identity pairs are filtered after the join."""
    import ray.data as rd

    from webindex.temporal import range_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )
    rt = ev.map_batches(
        lambda t: t.select(["event_id", "ts", "user_id"]).rename_columns(
            ["r_event_id", "r_ts", "user_id"]
        ),
        batch_format="pyarrow",
    )
    out = range_join(
        ev, rt, key="user_id", left_ts="ts", right_ts="r_ts",
        right_cols=["r_event_id"], window="6h",
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(
            pc.not_equal(t.column("event_id"), t.column("r_event_id"))
        )
        return t.select(["event_id", "user_id", "r_event_id"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_RANGE = """
SELECT l.event_id, l.user_id, r.event_id AS r_event_id
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.ts >= r.ts
 AND l.ts < r.ts + INTERVAL 6 HOUR
 AND l.event_id <> r.event_id
"""


def q_bpe_token_counts(sf_dir: str):
    """Whitespace + BPE-ish-regex token counting (textstats
    token_count_batch) over the punctuation-rich events.props JSON column
    — the model-token-budgeting proxy from the brief, SQL-checked: the
    GPT-2-ish pattern's whitespace branches never survive the non-space
    filter, so an RE2-safe equivalent drives the DuckDB oracle (verified
    identical on apostrophe/whitespace stress cases in pytest).

    Equivalence is ASCII-scoped: Python's \\s/str.split() treat unicode
    whitespace (NBSP etc.) as separators while RE2's \\s is ASCII-only,
    so a non-ASCII corpus would need a normalization stage before the SQL
    check (props is ASCII JSON at every sf)."""
    import ray.data as rd

    from webindex.textstats import token_count_batch

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "props"],
    )

    def count(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["doc_id", "text"])
        out = token_count_batch(t)
        return out.rename_columns(["event_id", "n_ws_tokens", "n_bpeish_tokens"])

    return ds.map_batches(count, batch_format="pyarrow")


SQL_BPE_TOKEN_COUNTS = """
SELECT event_id,
       len(regexp_extract_all(props, '\\S+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(
         props,
         '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'
       ))::BIGINT AS n_bpeish_tokens
FROM events
"""


def q_bpe_word_counts(sf_dir: str):
    """Distributed word-frequency table (webindex/bpe.py word_counts) —
    the bounded-vocabulary input to BPE tokenizer training: per-batch
    Counter partials, ONE pinned word-hash shuffle, exact int64 sums.
    SQL oracle is a plain unnest+GROUP BY over the same [a-z0-9]+
    lowercase stream."""
    import ray.data as rd

    from webindex.bpe import word_counts

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return word_counts(ds, n_parts=16)


SQL_BPE_WORD_COUNTS = """
SELECT word, COUNT(*)::BIGINT AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents) t
GROUP BY word
"""


def q_bpe_pair_counts(sf_dir: str):
    """Round-1 BPE pair counts (webindex/bpe.py pair_counts_ds): exact
    adjacent-symbol-pair counts over the char+'</w>' stream — the table
    whose deterministic argmax is the first trained merge. The SQL
    oracle replays the symbol expansion with a lateral generate_series
    (pair i = (char_i, char_{i+1}), final pair (last char, '</w>'))."""
    import ray.data as rd

    from webindex.bpe import pair_counts_ds

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return pair_counts_ds(ds, n_parts=16)


SQL_BPE_PAIR_COUNTS = """
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
pairs AS (
  SELECT substr(w, i, 1) AS a,
         CASE WHEN i = len(w) THEN '</w>' ELSE substr(w, i + 1, 1) END AS b
  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) t
)
SELECT a, b, COUNT(*)::BIGINT AS cnt FROM pairs GROUP BY a, b
"""


def q_bpe_merges(sf_dir: str):
    """Corpus-trained BPE merge list (webindex/bpe.py train_bpe_from_ds,
    100 merges). The iteration count is pinned, so the sequential argmax
    loop UNROLLS into a generated 100-round DuckDB CTE chain
    (webindex/pipelines/sql_bpe.py) — full SQL oracle, upgraded from
    rows-only; the independent stream-based pytest oracle
    (tests/test_bpe.py) still gates the trainer itself."""
    import pandas as pd
    import ray.data as rd

    from webindex.bpe import train_bpe_from_ds

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    merges = train_bpe_from_ds(ds, 100, n_parts=16)
    return pd.DataFrame(
        {
            "rank": pd.array(range(len(merges)), dtype="int64"),
            "a": [a for a, _ in merges],
            "b": [b for _, b in merges],
        }
    )


def q_bpe_subword_counts(sf_dir: str):
    """Corpus-trained BPE encode (webindex/bpe.py bpe_token_counts):
    train 100 merges, broadcast ranks once via ray.put, stream the
    corpus through the memoizing actor pool -> (doc_id, n_words,
    n_bpe_tokens). SQL oracle: the unrolled training replay's FINAL
    vocab state is each corpus word's encoded segmentation (greedy
    train == greedy encode for in-vocab words, asserted in
    tests/test_bpe.py), so per-doc token counts join against it
    (webindex/pipelines/sql_bpe.py). The encode kernel itself stays
    pytest-gated against a sequential-application reference."""
    import ray.data as rd

    from webindex.bpe import bpe_token_counts, train_bpe_from_ds

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    merges = train_bpe_from_ds(ds, 100, n_parts=16)
    return bpe_token_counts(ds, merges, concurrency=(1, 4))


def q_pii_redact(sf_dir: str):
    """PII redaction (webindex/pii.py): emails/IPv4s/SSNs/phones ->
    typed placeholders + per-type counts, stateless vectorized
    map_batches. Engine kernel and DuckDB oracle are BOTH RE2 over the
    same pattern strings (single source of truth: pii.PII_PATTERNS /
    pii.oracle_sql), so redacted text is byte-identical."""
    import ray.data as rd

    from webindex.pii import redact_pii

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return redact_pii(ds)


def _sql_pii_redact() -> str:
    from webindex.pii import oracle_sql

    return oracle_sql()


SQL_PII_REDACT = _sql_pii_redact()


def q_quality_classifier(sf_dir: str):
    """GPT-3-style quality filter (webindex/classify.py): hashed
    bag-of-words logistic regression fit by distributed IRLS with exact
    int64 fixed-point gradient/Hessian reductions, scored over the full
    corpus -> (doc_id, y, score_micro). Rows-only (iterative Newton
    loop has no SQL form); training+scoring are pytest-gated against an
    independent sequential reference and partition-invariance asserts
    (tests/test_classify.py)."""
    import ray.data as rd

    from webindex.classify import quality_classifier_scores

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return quality_classifier_scores(ds, dim=256, iters=4)


def q_naive_bayes(sf_dir: str):
    """Multinomial Naive Bayes quality classifier
    (webindex/classify.py naive_bayes_scores): closed-form train
    (per-class term counts via ONE term-hash shuffle) + score (weight
    join + doc-hash fold) -> (doc_id, y, n_tokens, llr_r, pred). Fully
    SQL-checkable: training is pure counting and every ln is scalar
    math.log (bit-equal to DuckDB ln, measured); llr rounded to 6dp at
    the surface per the unigram_logprob fold-order precedent."""
    import ray.data as rd

    from webindex.classify import naive_bayes_scores

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return naive_bayes_scores(ds)


def _sql_naive_bayes() -> str:
    from webindex.classify import naive_bayes_sql

    return naive_bayes_sql(stoplist_sql=_stopword_sql_list())


def q_langid_nb(sf_dir: str):
    """Corpus-trained multiclass Naive Bayes language identifier
    (webindex/classify.py langid_nb_scores) — the fastText-direction
    upgrade of the heuristic langid entry: per-class term counts from
    the corpus's own lang labels, argmax class log-likelihood per doc,
    6dp surface, tie-break ascending class. Fully SQL-checked."""
    import ray.data as rd

    from webindex.classify import langid_nb_scores

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    return langid_nb_scores(ds)


def q_top_longest_per_lang(sf_dir: str):
    """Grouped top-k (relational.grouped_topk): 3 longest docs per lang.
    Per-batch local top-k per key bounds shuffle traffic at k x #keys rows
    per batch; ties break by doc_id so the cut is partition-independent."""
    import ray.data as rd

    from webindex.relational import grouped_topk

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )

    def measure(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "lang": t.column("lang"),
                "doc_id": t.column("doc_id"),
                "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    return grouped_topk(
        ds.map_batches(measure, batch_format="pyarrow"),
        ["lang"], "n_chars", 3, descending=True, tie_cols=["doc_id"],
        n_parts=8,
    )


SQL_TOP_PER_LANG = """
SELECT lang, doc_id, length(text)::BIGINT AS n_chars,
       row_number() OVER (
         PARTITION BY lang ORDER BY length(text) DESC, doc_id
       )::INTEGER AS rank
FROM documents QUALIFY rank <= 3
"""


def q_events_median(sf_dir: str):
    """Exact per-group median via distributed rank selection
    (webindex.quantile): binary search on the value domain with one
    vectorized counting pass per round and a bounded final pull — the
    aggregate a naive map_groups(np.median) cannot give a memory bound
    for. Bit-exact vs DuckDB median()."""
    import ray.data as rd

    from webindex.quantile import grouped_median

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    ).materialize()  # each selection round re-executes the plan
    out = grouped_median(ds, "event_type", "value")
    return out.rename(columns={"median": "med"})


SQL_EVENTS_MEDIAN = """
SELECT event_type, median(value) AS med FROM events GROUP BY event_type
"""


def q_events_sliding(sf_dir: str):
    """Sliding ROWS-window aggregate (webindex.temporal): hourly event
    count per event_type, then the trailing 3-row mean — integer counts so
    the mean is bit-exact against the SQL window oracle (no float-sum
    reassociation)."""
    import ray.data as rd

    from webindex.relational import hash_partitioned_groupby
    from webindex.temporal import sliding_window_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts"],
        override_num_blocks=8,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        return (
            df.groupby(["event_type", "hour"], sort=False)
            .agg(n_p=("ts", "size"))
            .reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["event_type", "hour"], sort=False)
            .agg(n_events=("n_p", "sum"))
            .reset_index()
        )

    hourly = hash_partitioned_groupby(
        ds, ["event_type", "hour"], partial, final, n_parts=16
    )
    return sliding_window_agg(
        hourly, key="event_type", order_col="hour", value_col="n_events",
        window=3, agg="mean", out_col="mov3",
    )


SQL_EVENTS_SLIDING = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, n_events,
       avg(n_events) OVER (PARTITION BY event_type ORDER BY hour
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3
FROM h
"""


def q_token_stats(sf_dir: str):
    """Quality-signal ints (SQL-checkable slice of textstats)."""
    an = Analyzer(SQL_SAFE_ANALYZER)
    from webindex.analyze import LUCENE_STOPWORDS

    def stats(batch: pa.Table) -> pa.Table:
        n_tok, n_stop = [], []
        for t in batch.column("text").to_pylist():
            toks = an.tokens(t or "")
            n_tok.append(len(toks))
            n_stop.append(sum(1 for w in toks if w in LUCENE_STOPWORDS))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def _stopword_sql_list() -> str:
    from webindex.analyze import LUCENE_STOPWORDS

    return ", ".join(f"'{w}'" for w in sorted(LUCENE_STOPWORDS))


SQL_TOKEN_STATS = f"""
WITH toks AS (
  SELECT doc_id, t.tok AS term
  FROM documents, unnest({_TOK_SQL}) AS t(tok)
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(s.n_stopwords, 0)::BIGINT AS n_stopwords
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         count(*) FILTER (term IN ({_stopword_sql_list()}))::BIGINT AS n_stopwords
  FROM toks GROUP BY doc_id
) s USING (doc_id)
"""


def q_max_query_tokens(sf_dir: str):
    """A4 (SURVEY.md §2.5): global max tokenized length as a Dataset
    aggregate (reference beir_openai_embeddings_batched_parallel.py:310;
    documents stand in for the query set). Per-batch int64 partial max;
    the driver sees one scalar."""
    from webindex.embed import max_query_tokens

    v = max_query_tokens(_docs(sf_dir))
    return pa.table({"max_toks": pa.array([v], pa.int64())})


SQL_MAX_QUERY_TOKENS = f"""
SELECT max(len({_TOK_SQL}))::BIGINT AS max_toks FROM documents
"""

_TRUNC_BUDGET = 64


def q_truncation_counters(sf_dir: str):
    """A3 (SURVEY.md §2.5): docs_truncated / toks_truncated / total_toks
    at a 64-token budget (reference beir_dense_retriever.py:160-218) as
    distributed int64 partial sums — one partial row per block, the
    driver reduces block-count rows."""
    from webindex.embed import truncation_counters

    c = truncation_counters(_docs(sf_dir), max_tokens=_TRUNC_BUDGET)
    return pa.table({k: pa.array([v], pa.int64()) for k, v in c.items()})


SQL_TRUNCATION_COUNTERS = f"""
WITH tk AS (
  SELECT len({_TOK_SQL})::BIGINT AS n FROM documents
)
SELECT count(*) FILTER (n > {_TRUNC_BUDGET})::BIGINT AS docs_truncated,
       coalesce(sum(CASE WHEN n > {_TRUNC_BUDGET}
                         THEN n - {_TRUNC_BUDGET} ELSE 0 END),
                0)::BIGINT AS toks_truncated,
       sum(n)::BIGINT AS total_toks,
       count(*)::BIGINT AS n_docs
FROM tk
"""


def q_giant_json_extract(sf_dir: str):
    """S3 streaming giant-JSON field extraction (reference
    crossencoder_bioasq_bm25.ipynb cell 4: the 19 GB BioASQ file is
    scanned line-by-line pulling pmid/abstractText with str.find marker
    literals, never JSON-parsed): documents re-emitted as a JSON-lines
    file (driver-side prep, cached per sf dir), then ``read_text`` ->
    per-line marker extraction -> (doc_id, text). The oracle reads the
    parquet directly, so a green hash proves the streaming extractor
    byte-exact on the round trip. At scale the prep side would be the
    sharded jsonl sink (S5); the SOURCE is what this entry pins."""
    import ray.data as rd

    from webindex.sources import read_giant_json

    os.makedirs("/tmp/webindex-cache", exist_ok=True)
    base = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/webindex-cache/giantjson-{base}.jsonl"
    if not os.path.exists(path):
        import pyarrow.parquet as pq

        tab = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        with open(path + ".tmp", "w", encoding="utf-8") as f:
            for did, txt in zip(tab.column("doc_id").to_pylist(),
                                tab.column("text").to_pylist()):
                f.write('{"pmid":"%d","journal":"x",'
                        '"abstractText":"%s","year":"2020"}\n'
                        % (did, txt))
        os.replace(path + ".tmp", path)

    out = read_giant_json(
        path,
        {"pmid": ('"pmid":"', '"'),
         "text": ('"abstractText":"', '"')},
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.cast(t.column("pmid"), pa.int64()),
             "text": t.column("text")}
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_GIANT_JSON_EXTRACT = "SELECT doc_id, text FROM documents"


def q_fetch_unzip_roundtrip(sf_dir: str):
    """S2 fetch+unzip (reference beir.util.download_and_unzip at
    beir_dense_retriever.py:378-382) + S5 jsonl writer + S1 loader,
    SQL-proven as a round trip: documents -> write_beir_corpus jsonl ->
    zip -> ``download_and_unzip`` over a ``file://`` URL (streamed
    http_get, traversal-validated extract, idempotent dir marker) ->
    ``read_beir_corpus`` -> (doc_id, text). The oracle reads the parquet
    directly, so a green hash proves the whole acquisition path
    byte-exact. file:// is the sandbox transport; http(s) shares every
    line of code after the urlopen."""
    import zipfile

    from webindex.fetch import download_and_unzip
    from webindex.sources import read_beir_corpus, write_beir_corpus

    os.makedirs("/tmp/webindex-cache", exist_ok=True)
    base = os.path.basename(os.path.normpath(sf_dir))
    zip_path = f"/tmp/webindex-cache/beirzip-{base}.zip"
    if not os.path.exists(zip_path):
        jsonl = zip_path + ".corpus.jsonl"
        write_beir_corpus(_docs(sf_dir), jsonl)
        with zipfile.ZipFile(zip_path + ".tmp", "w") as zf:
            zf.write(jsonl, f"corpus-{base}/corpus.jsonl")
        os.replace(zip_path + ".tmp", zip_path)
        os.remove(jsonl)

    out_dir = f"/tmp/webindex-cache/beirunzip-{base}"
    data_dir = download_and_unzip("file://" + zip_path, out_dir)
    corpus = read_beir_corpus(os.path.join(data_dir, "corpus.jsonl"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "text": t.column("text")}
        )

    return corpus.map_batches(finish, batch_format="pyarrow")


SQL_FETCH_UNZIP_ROUNDTRIP = "SELECT doc_id, text FROM documents"


def q_publish_roundtrip(sf_dir: str):
    """S10 dataset publish/download (reference Kaggle up/download,
    useb release scripts), SQL-proven through the transport INTERFACE:
    corpus jsonl -> init_dataset metadata -> create_dataset (zip +
    transport.push) -> download_dataset (transport.pull + validated
    extract) -> read_beir_corpus -> (doc_id, text) against the parquet
    oracle. LocalStoreTransport is the sandbox transport; the
    KaggleCliTransport shares every line except push/pull (CLI +
    credentials, env-blocked here)."""
    import shutil

    from webindex.publish import (LocalStoreTransport, create_dataset,
                                  download_dataset, init_dataset)
    from webindex.sources import read_beir_corpus, write_beir_corpus

    base = os.path.basename(os.path.normpath(sf_dir))
    work = f"/tmp/webindex-cache/publish-{base}"
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    os.makedirs(src)
    write_beir_corpus(_docs(sf_dir), os.path.join(src, "corpus.jsonl"))
    init_dataset(src, f"webindex/corpus-{base}")
    transport = LocalStoreTransport(os.path.join(work, "store"))
    create_dataset(src, transport)
    data_dir = download_dataset(
        f"webindex/corpus-{base}", os.path.join(work, "dl"), transport
    )
    corpus = read_beir_corpus(os.path.join(data_dir, "corpus.jsonl"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "text": t.column("text")}
        )

    return corpus.map_batches(finish, batch_format="pyarrow")


SQL_PUBLISH_ROUNDTRIP = "SELECT doc_id, text FROM documents"


def q_unique_first_seen(sf_dir: str):
    """D2 order-preserving unique (reference plugin_io_utils.py:31-42
    ``unique_list``) at Dataset scale: distinct event_type in FIRST-SEEN
    order over events ordered by event_id. Per-batch partial
    (type, min event_id) -> tiny final min -> the driver ranks a result
    bounded by type cardinality; unique_list replays the ordered
    sequence (exercising the reference helper itself)."""
    import ray.data as rd

    from webindex.textutil import unique_list

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(
            "event_type", as_index=False
        )["event_id"].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    firsts = parts.groupby("event_type", as_index=False)["event_id"].min()
    firsts = firsts.sort_values("event_id")
    ordered = unique_list(firsts["event_type"].tolist())
    return pa.table(
        {"event_type": pa.array(ordered, pa.string()),
         "seq": pa.array(range(1, len(ordered) + 1), pa.int64())}
    )


SQL_UNIQUE_FIRST_SEEN = """
SELECT event_type,
       row_number() OVER (ORDER BY min(event_id))::BIGINT AS seq
FROM events GROUP BY event_type
"""


def q_clean_truncate_docs(sf_dir: str):
    """M11 cleaning/truncation helpers + M12 pct projection, SQL-proven:
    clean_text_array (strip; empty -> null, plugin_io_utils.py:65-80),
    truncate_text_array (50-char cap + " (...)" marker, :45-62), and
    pct_round over a min-max rescale of n_chars whose lo/hi come from
    Dataset min/max aggregates (M12, useb/evaluators/base.py:23-24) —
    stateless per-batch Arrow kernels after two scalar aggregates."""
    import ray.data as rd

    from webindex.textutil import (clean_text_array, pct_round,
                                   truncate_text_array)

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )
    lo = float(ds.min("n_chars"))
    hi = float(ds.max("n_chars"))

    def project(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        n = t.column("n_chars").to_numpy().astype(np.float64)
        rescaled = (n - lo) / (hi - lo) if hi > lo else np.zeros_like(n)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "cleaned": clean_text_array(text),
                "t50": truncate_text_array(text, 50),
                "pct": pa.array(pct_round(rescaled), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


SQL_CLEAN_TRUNCATE_DOCS = r"""
WITH mm AS (
  SELECT min(n_chars)::DOUBLE AS lo, max(n_chars)::DOUBLE AS hi
  FROM documents
)
SELECT doc_id,
       nullif(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11)
                         || chr(12)), '') AS cleaned,
       CASE WHEN length(text) > 50
            THEN substr(text, 1, 50) || ' (...)' ELSE text END AS t50,
       round((n_chars - lo) / (hi - lo) * 100, 2) AS pct
FROM documents, mm
"""


def _model_metrics(sf_dir: str):
    """Deterministic (model, dataset, metric) table for the K5/A6
    entries: model = m<user_id%4>_ck<user_id%3>, dataset = event_type,
    metric = event count. INTEGER counts make every downstream macro
    average an exact int64 sum + ONE float division on both engines
    (the CLAUDE.md float-fold rule), so the ranking keys hash-match
    without rounding."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            model="m" + (df.user_id % 4).astype(str)
                  + "_ck" + (df.user_id % 3).astype(str)
        )
        return (
            df.groupby(["model", "event_type"]).size()
            .rename("n").reset_index()
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby(["model", "event_type"], as_index=False)["n"].sum()
    return m.rename(columns={"event_type": "dataset", "n": "ndcg@10"})


_MODEL_METRICS_SQL = """
m AS (
  SELECT 'm' || (user_id % 4)::VARCHAR || '_ck'
             || (user_id % 3)::VARCHAR AS model,
         event_type AS dataset, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
a AS (SELECT model, avg(n) AS avg_metric FROM m GROUP BY model)
"""


def q_model_ranking(sf_dir: str):
    """K5 model ranking (reference beir_dense_retriever.py:594-604
    ``rank_model_avg``) + A6 per-model macro averages (:520-541) over
    the deterministic metrics table: top-5 by average metric desc, name
    asc tie-break."""
    from webindex.eval import rank_models

    out = rank_models(_model_metrics(sf_dir), metric_col="ndcg@10",
                      top_n=5)
    out["rank"] = out["rank"].astype(np.int64)
    return out


SQL_MODEL_RANKING = f"""
WITH {_MODEL_METRICS_SQL}
SELECT model, avg_metric AS "avg_ndcg@10",
       row_number() OVER (ORDER BY avg_metric DESC, model)::BIGINT AS rank
FROM a ORDER BY rank LIMIT 5
"""


def q_best_ckpt(sf_dir: str):
    """K5 checkpoint selection (reference beir_dense_retriever.py:543-592):
    best checkpoint per model family (name minus final _<ckpt> segment)
    by average metric, strict-> ties keeping the first in sorted-name
    order."""
    from webindex.eval import select_best_ckpt

    return select_best_ckpt(_model_metrics(sf_dir), metric_col="ndcg@10")


SQL_BEST_CKPT = f"""
WITH {_MODEL_METRICS_SQL},
f AS (SELECT model, avg_metric,
             regexp_replace(model, '_[^_]*$', '') AS family FROM a)
SELECT family, model, avg_metric AS "avg_ndcg@10" FROM (
  SELECT *, row_number() OVER (
    PARTITION BY family ORDER BY avg_metric DESC, model
  ) AS rn FROM f
) WHERE rn = 1
"""


def q_metrics_accumulator_roundtrip(sf_dir: str):
    """S9 NDCG accumulator files (the reference writes one results/
    metrics JSON per dataset-model run and averages them later,
    beir_dense_retriever.py:520-541 + sgpt_utils.ipynb): the
    deterministic metrics table is accumulated into ONE JSON FILE PER
    MODEL (atomic_write_json), read back, and macro-averaged — proving
    the file-accumulator round trip; integer metric values keep the
    average an exact int sum + one float division, so it hash-matches
    the SQL avg."""
    import json
    import shutil

    from webindex.util import atomic_write_json

    m = _model_metrics(sf_dir)
    base = os.path.basename(os.path.normpath(sf_dir))
    outdir = f"/tmp/webindex-cache/metrics-{base}"
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)
    for model, grp in m.groupby("model"):
        atomic_write_json(
            os.path.join(outdir, f"{model}.json"),
            {d: int(n) for d, n in zip(grp["dataset"], grp["ndcg@10"])},
        )

    models, avgs = [], []
    for fname in sorted(os.listdir(outdir)):
        with open(os.path.join(outdir, fname)) as f:
            per_ds = json.load(f)
        models.append(fname[: -len(".json")])
        avgs.append(sum(per_ds.values()) / len(per_ds))
    return pa.table(
        {"model": pa.array(models, pa.string()),
         "avg_ndcg@10": pa.array(avgs, pa.float64())}
    )


SQL_METRICS_ACCUMULATOR = f"""
WITH {_MODEL_METRICS_SQL}
SELECT model, avg_metric AS "avg_ndcg@10" FROM a
"""


def q_fingerprints(sf_dir: str):
    from webindex.textstats import fingerprint_batch

    return _docs(sf_dir).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    ).map_batches(lambda t: t.select(["doc_id", "fp_md5"]), batch_format="pyarrow")


SQL_FINGERPRINTS = r"""
SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp_md5
FROM documents
"""


def q_ann_top5(sf_dir: str):
    """Brute-force cosine top-5 (SURVEY.md §2.6 K1/K2) for 3 query vectors
    (the embeddings of vec_id 0/1/2), sims rounded to 6dp."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webindex.ann import brute_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    tab = pq.read_table(path)
    vid = np.asarray(tab.column("vec_id").to_pylist())
    order = np.argsort(vid)
    qvecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)[
        order[:3]
    ]
    out = brute_topk(
        rd.read_parquet(path), [0, 1, 2], qvecs, 5, concurrency=2
    ).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


ANN_FILTER_LABEL = 1


def q_ann_filtered_top5(sf_dir: str):
    """Metadata-filtered vector search (the filtered-ANN shape every
    vector store exposes): exact cosine top-5 restricted to label == 1,
    with the predicate pushed into the parquet READ (row-group pruning
    at scale) — not post-filtered after scoring. Same partial-top-k +
    exact merge as ann_top5."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    from webindex.ann import brute_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    tab = pq.read_table(path)
    vid = np.asarray(tab.column("vec_id").to_pylist())
    order = np.argsort(vid)
    qvecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)[
        order[:3]
    ]
    emb = rd.read_parquet(
        path, filter=pads.field("label") == ANN_FILTER_LABEL
    )
    out = brute_topk(emb, [0, 1, 2], qvecs, 5, concurrency=2).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


SQL_ANN_FILTERED_TOP5 = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN (0, 1, 2)
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.label = {ANN_FILTER_LABEL}
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id)::INTEGER AS rank
  FROM sims
)
SELECT query_id, vec_id, round(sim, 6) AS sim_r, rank
FROM ranked WHERE rank <= 5
"""


def q_hnsw_top5(sf_dir: str):
    """ES/Lucene dense_vector kNN (HNSW graph, webindex.hnsw): 4 pinned
    hash shards, one deterministic graph each (seeded levels, id-sorted
    insertion), scatter-gather exact merge.  ef_search=512 >= every
    shard's size at contract scale, so the beam covers each shard
    exhaustively and the result equals exact cosine top-5 — gated by the
    SAME SQL oracle as ann_top5; tests/test_hnsw.py gates recall at
    sub-exhaustive beams and shard-count invariance."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webindex.hnsw import hnsw_build, hnsw_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    tab = pq.read_table(path)
    vid = np.asarray(tab.column("vec_id").to_pylist())
    order = np.argsort(vid)
    qvecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)[
        order[:3]
    ]
    idx = hnsw_build(rd.read_parquet(path), n_shards=4, m=8,
                     ef_construction=64, seed=0)
    out = hnsw_topk(idx, [0, 1, 2], qvecs, 5, ef_search=512).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


SQL_ANN_TOP5 = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS sim
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)::INTEGER AS rank
  FROM sims
)
SELECT query_id, vec_id, round(sim, 6) AS sim_r, rank
FROM ranked WHERE rank <= 5
"""


def q_sharded_bm25_top10(sf_dir: str):
    """Doc-partitioned sharded serving (webindex.serve): scatter-gather
    top-k over shard actors, checked against the SAME SQL oracle as the
    single-searcher path — the merge must be exact."""
    from webindex.serve import ShardedSearchService

    idx = ensure_index(sf_dir, "nostem")
    svc = ShardedSearchService(idx, n_shards=2, top_k=TOPK, mode="wand")
    runs = svc.search(DOC_QUERIES)
    return runs[["qid", "doc_id", "rank"]].copy()


def q_distinct_langs(sf_dir: str):
    """Order-preserving unique (SURVEY.md §2.7 D2,
    /root/reference/biencoder/beir/io_utils/plugin_io_utils.py:31-42):
    first-occurrence position per distinct value, encoded as a column so
    the order survives the driver's row-order-insensitive compare."""
    import ray.data as rd
    from ray.data.aggregate import Min

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    return ds.groupby("lang").aggregate(Min("doc_id", alias_name="first_doc_id"))


SQL_DISTINCT_LANGS = """
SELECT lang, min(doc_id)::BIGINT AS first_doc_id
FROM documents GROUP BY lang
"""


def q_simulate_rerank(sf_dir: str):
    """J3 semi-join (/root/reference/crossencoder/beir/crossencoder_beir_sgpt.ipynb
    cell 19, ``simulate_rerank``): re-derive a shallower rerank (top-5) from
    cached deeper results — top-5 dids by BM25 per qid, scores looked up in
    the cached overlap-rerank table rather than recomputed."""
    base = q_bm25_top10(sf_dir).to_pandas()
    cached = q_rerank_overlap(sf_dir)  # the "max_rerank=10" cached scores
    top5 = base[base["rank"] <= 5][["qid", "doc_id"]]
    out = top5.merge(cached, on=["qid", "doc_id"], how="inner")
    return out[["qid", "doc_id", "overlap"]]


SQL_SIMULATE_RERANK = _sql_bm25_scores() + f"""
, top AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
    FROM scores
  ) WHERE rank <= {TOPK}
)
SELECT top.qid, top.doc_id,
       count(DISTINCT toks.term)::BIGINT AS overlap
FROM top
JOIN toks ON toks.doc_id = top.doc_id
JOIN qterms ON qterms.qid = top.qid AND qterms.term = toks.term
WHERE top.rank <= 5
GROUP BY top.qid, top.doc_id
"""


def q_chars_histogram(sf_dir: str):
    """Fixed-width histogram of document lengths: per-batch partial counts
    (combiner) -> tiny groupby(bin) sum — the pre-aggregation shape that
    keeps the shuffle at #bins x #batches rows at any corpus size."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        bins = pc.divide(batch.column("n_chars"), 256)
        vc = pc.value_counts(pc.cast(bins, pa.int64()))
        return pa.table(
            {"bin": vc.field("values"), "n_p": vc.field("counts")}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "bin"
    ).aggregate(Sum("n_p", alias_name="n_docs"))


SQL_CHARS_HISTOGRAM = """
SELECT (n_chars // 256)::BIGINT AS bin, count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1
"""


def q_orders_by_nation(sf_dir: str):
    """Broadcast hash join (SURVEY.md §2.4 J2 physical plan): the small
    dimension side (customer x nation, ~N_cust rows) is put in the object
    store ONCE with ray.put and read zero-copy by every map task; only the
    tiny per-batch partials of the big fact side (orders) cross the
    shuffle. Revenue summed in exact integer cents so the result is
    bit-stable under any partitioning."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nmap = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )
    cust_to_nation = {
        int(c): nmap[int(n)]
        for c, n in zip(
            cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist()
        )
    }
    lookup_ref = ray.put(cust_to_nation)

    def join_batch(batch: pa.Table, lookup=lookup_ref) -> pa.Table:
        m = ray.get(lookup) if isinstance(lookup, ray.ObjectRef) else lookup
        names = [m[int(c)] for c in batch.column("o_custkey").to_pylist()]
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("o_totalprice"), 100.0)), pa.int64()
        )
        return pa.table({"n_name": pa.array(names), "cents": cents})

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    return ds.map_batches(join_batch, batch_format="pyarrow").groupby(
        "n_name"
    ).aggregate(
        Count(alias_name="n_orders"), Sum("cents", alias_name="revenue_cents")
    )


SQL_ORDERS_BY_NATION = """
SELECT n.n_name,
       count(*)::BIGINT AS n_orders,
       sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped pricing summary over lineitem: per (returnflag,
    linestatus) row counts and exact integer-cent revenue sums — the
    per-batch partial-aggregation (combiner) shape, bit-stable under any
    partitioning."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(pc.multiply(batch.column("l_quantity"), 100.0)),
                      pa.int64())
        price = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        disc_price = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(batch.column("l_extendedprice"),
                                pc.subtract(pa.scalar(1.0),
                                            batch.column("l_discount"))),
                    100.0,
                )
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_c": qty,
                "price_c": price,
                "disc_c": disc_price,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc_c", "sum"),
             ("qty_c", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_c", "sum_price_c",
             "sum_disc_c", "n_p"]
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("sum_qty_c", alias_name="sum_qty_cents"),
        Sum("sum_price_c", alias_name="sum_price_cents"),
        Sum("sum_disc_c", alias_name="sum_disc_price_cents"),
        Sum("n_p", alias_name="n_rows"),
    )
    return agg


SQL_LINEITEM_PRICING = """
-- round_even matches Arrow's HALF_TO_EVEN (plain round() is half-away and
-- diverges on exact half-cent products)
SELECT l_returnflag, l_linestatus,
       sum(round_even(l_quantity * 100, 0)::BIGINT)::BIGINT AS sum_qty_cents,
       sum(round_even(l_extendedprice * 100, 0)::BIGINT)::BIGINT AS sum_price_cents,
       sum(round_even(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT)::BIGINT
           AS sum_disc_price_cents,
       count(*)::BIGINT AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# rows-only entries (no SQL equivalent; correctness gated in pytest)
# ---------------------------------------------------------------------------


def q_bm25_stemmed_top10(sf_dir: str):
    """Full english-analyzer BM25 (Porter stem + Lucene stopwords) — rank
    identity vs the pure-Python oracle is asserted in
    tests/test_build_search.py, and the DuckDB oracle replays the ENTIRE
    chain including a generated-SQL Porter stemmer
    (webindex/pipelines/sql_porter.py): tokenize -> stopword filter ->
    per-distinct-word Porter CTE chain -> doc rewrite -> standard BM25."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "stemmed")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, mode="wand", concurrency=2, batch_size=8
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _sql_bm25_stemmed_top10() -> str:
    from webindex.analyze import LUCENE_STOPWORDS
    from webindex.config import AnalyzerConfig
    from webindex.pipelines.sql_porter import porter_sql_stages

    stoplist = ", ".join(f"'{w}'" for w in sorted(LUCENE_STOPWORDS))
    # query terms through the full english analyzer (the established
    # query-side precedent: analyzer output as SQL VALUES constants —
    # the corpus side is stemmed fully in SQL)
    stem_an = Analyzer(AnalyzerConfig())
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, text in DOC_QUERIES
        for t in sorted(set(stem_an.tokens(text)))
    )
    # docs rewritten to their analyzed token stream (stems space-joined;
    # stems are [a-z0-9]+ so the outer _TOK_SQL re-tokenization
    # round-trips exactly); docs whose tokens all drop stay as empty
    # rows — they count in N / avgdl like the engine's dl=0 docs.
    # Tokenization parity note: the engine's default analyzer NFC-
    # normalizes and tokenizes [^\W_]+ Unicode; the oracle tokenizes
    # [a-z0-9]+ — identical on the driver corpora, which are pure ASCII
    # at every scale factor (verified), where NFC is the identity and
    # the token classes coincide on lowercased text
    docs_sql = f"""
WITH raw AS (SELECT doc_id, text FROM documents WHERE text <> ''),
rtok AS (
  SELECT doc_id, t AS tok, i FROM (
    SELECT doc_id, unnest({_TOK_SQL}) AS t,
           unnest(range(len({_TOK_SQL}))) AS i
    FROM raw
  ) WHERE length(t) <= 64 AND t NOT IN ({stoplist})
),
svocab AS (SELECT DISTINCT tok AS word FROM rtok),
{porter_sql_stages('svocab')},
sagg AS (
  SELECT k.doc_id, string_agg(sm.stem, ' ' ORDER BY k.i) AS text
  FROM rtok k JOIN stem_map sm ON sm.word = k.tok
  GROUP BY k.doc_id
)
SELECT r.doc_id, coalesce(a.text, '') AS text
FROM raw r LEFT JOIN sagg a ON a.doc_id = r.doc_id
"""
    return _sql_bm25_scores(
        values_sql=f"(VALUES {rows}) AS q(qid, term)", docs_sql=docs_sql
    ) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


SQL_BM25_STEMMED_TOP10 = _sql_bm25_stemmed_top10()

from webindex.pipelines.sql_bpe import (  # noqa: E402
    sql_bpe_merges as _sql_bpe_merges_fn,
    sql_bpe_subword_counts as _sql_bpe_subword_fn,
)

SQL_BPE_MERGES = _sql_bpe_merges_fn(100)
SQL_BPE_SUBWORD_COUNTS = _sql_bpe_subword_fn(100)


def q_minhash_clusters(sf_dir: str):
    from webindex.dedup import minhash_dedup

    return minhash_dedup(_docs(sf_dir), threshold=0.8, concurrency=2)


def q_simhash_clusters(sf_dir: str):
    from webindex.dedup import simhash_dedup

    return simhash_dedup(_docs(sf_dir), max_hamming=3, concurrency=2)


def q_embedding_dedup(sf_dir: str):
    """Embedding-cosine near-dup over the embeddings table augmented with
    deterministic exact-duplicate rows (vec_id < 20 copied to
    vec_id + 100000) — the raw table's max pair cosine is 0.51, so the
    un-augmented pipeline would be vacuously empty. The same augmentation
    is expressed in the SQL oracle, which clusters via recursive-CTE
    reachability over the >= 0.98 cosine graph."""
    import ray.data as rd

    from webindex.dedup import embedding_dedup

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def dup(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch.column("vec_id"), 20))
        return keep.set_column(
            keep.schema.get_field_index("vec_id"),
            "vec_id",
            pc.add(keep.column("vec_id"), 100_000),
        )

    aug = emb.union(emb.map_batches(dup, batch_format="pyarrow"))
    return embedding_dedup(aug, threshold=0.98)


SQL_EMBEDDING_DEDUP = """
WITH RECURSIVE aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 20
),
pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM aug x JOIN aug y ON x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.embedding::DOUBLE[],
                               y.embedding::DOUBLE[]) >= 0.98
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
walk(node, m) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.m FROM edges e JOIN walk w ON w.node = e.v
)
SELECT node AS doc_id, min(m)::BIGINT AS cluster FROM walk GROUP BY node
"""


def q_ivf_top5(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    from webindex.ann import ivf_build, ivf_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    tab = pq.read_table(path)
    vid = np.asarray(tab.column("vec_id").to_pylist())
    order = np.argsort(vid)
    qvecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)[
        order[:3]
    ]
    assigned, cents = ivf_build(rd.read_parquet(path), n_centroids=16)
    out = ivf_topk(assigned, cents, [0, 1, 2], qvecs, 5, nprobe=4).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


def _query_vecs(sf_dir: str):
    import pyarrow.parquet as pq

    tab = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    vid = np.asarray(tab.column("vec_id").to_pylist())
    order = np.argsort(vid)
    return np.array(tab.column("embedding").to_pylist(), dtype=np.float64)[
        order[:3]
    ]


def q_pq_top5(sf_dir: str):
    """Product-quantized ANN (Jegou et al. 2011) with SEEDED codebooks:
    per-subspace codebooks = subvector slices of the 32 smallest-id
    normalized vectors (the seed_centroids rule per subspace), encode
    argmin + ADC ranking on 6dp-rounded keys — the full PQ path
    (codebook -> uint8 codes -> ADC lookup-table sums -> k-merge)
    replayed end-to-end by the DuckDB oracle. The kmeans-trained
    variant stays available as ann.pq_train (pytest-gated vs a
    from-scratch Python oracle); this entry pins the verifiable one.
    webindex/ann.py pq_seed_books/pq_encode/pq_topk."""
    import ray.data as rd

    from webindex.ann import pq_encode, pq_seed_books, pq_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    qvecs = _query_vecs(sf_dir)
    emb = rd.read_parquet(path)
    books = pq_seed_books(emb, m_subs=8, n_codes=32)
    out = pq_topk(
        pq_encode(emb, books, round6=True), books, [0, 1, 2], qvecs, 5,
        round6=True,
    ).to_pandas()
    out["sim_r"] = out["sim"]  # already 6dp-rounded (round6 ranking key)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


def q_ivfpq_top5(sf_dir: str):
    """IVF-PQ (FAISS IVFADC layout) with fully seeded, SQL-expressible
    parameters: 8 seed coarse centroids, 32-code seeded books, nprobe=3;
    assignment/encode/probe/rank all on 6dp-rounded keys. The DuckDB
    oracle replays coarse assignment, probe selection, PQ encoding and
    the ADC candidate ranking — closing the oracle gap the kmeans
    ``ivf_top5`` entry leaves open for the compressed-codes layout.
    webindex/ann.py ivfpq_seed_build/ivfpq_topk."""
    import ray.data as rd

    from webindex.ann import ivfpq_seed_build, ivfpq_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    qvecs = _query_vecs(sf_dir)
    codes_ds, cents, books = ivfpq_seed_build(
        rd.read_parquet(path), n_centroids=8, m_subs=8, n_codes=32,
    )
    out = ivfpq_topk(
        codes_ds, cents, books, [0, 1, 2], qvecs, 5, nprobe=3,
        round6=True,
    ).to_pandas()
    out["sim_r"] = out["sim"]  # already 6dp-rounded (round6 ranking key)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


# shared PQ SQL pieces: normalized vectors, seeded subspace codebooks
# (32 smallest-id vectors sliced into 8 x 8-dim subvectors), encode =
# per-(vector, subspace) argmin of the 6dp-rounded reduced L2 distance
# -2 x.c + ||c||^2, ties -> lowest code — replaying ann.pq_seed_books +
# pq_encode(round6=True) exactly.
_PQ_NORM_BOOKS_SQL = """
norm AS (
  -- zero vectors divide by 1, matching ann._normalize's n==0 guard
  SELECT vec_id,
         list_transform(
           embedding::DOUBLE[],
           x -> x / (CASE WHEN list_inner_product(
                            embedding::DOUBLE[], embedding::DOUBLE[]) = 0
                     THEN 1.0
                     ELSE sqrt(list_inner_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))
                     END)
         ) AS v
  FROM embeddings
),
cent AS (SELECT vec_id, v FROM norm ORDER BY vec_id LIMIT 32),
cidx AS (
  SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) - 1 AS c
  FROM cent
),
books AS (
  SELECT s.j, ci.c, ci.v[s.j * 8 + 1 : s.j * 8 + 8] AS cv
  FROM (SELECT unnest(range(8)) AS j) s CROSS JOIN cidx ci
),
enc AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT n.vec_id, b.j, b.c,
           row_number() OVER (
             PARTITION BY n.vec_id, b.j
             ORDER BY round(
               -2 * list_inner_product(
                      n.v[b.j * 8 + 1 : b.j * 8 + 8], b.cv)
               + list_inner_product(b.cv, b.cv), 6), b.c
           ) AS rn
    FROM norm n CROSS JOIN books b
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM norm WHERE vec_id IN (0, 1, 2))
"""

SQL_PQ_TOP5 = f"""
WITH {_PQ_NORM_BOOKS_SQL},
adc AS (
  SELECT q.query_id, e.vec_id,
         round(sum(list_inner_product(
           q.qv[e.j * 8 + 1 : e.j * 8 + 8], b.cv)), 6) AS sim_r
  FROM enc e
  JOIN books b ON b.j = e.j AND b.c = e.code
  CROSS JOIN q
  GROUP BY q.query_id, e.vec_id
)
SELECT query_id, vec_id, sim_r, rank FROM (
  SELECT query_id, vec_id, sim_r,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim_r DESC, vec_id
         )::INTEGER AS rank
  FROM adc
) WHERE rank <= 5
"""

SQL_IVFPQ_TOP5 = f"""
WITH {_PQ_NORM_BOOKS_SQL},
ccent AS (SELECT vec_id, v FROM norm ORDER BY vec_id LIMIT 8),
ccidx AS (
  SELECT vec_id, v AS cv, row_number() OVER (ORDER BY vec_id) - 1 AS c
  FROM ccent
),
assigned AS (
  SELECT vec_id, c AS centroid FROM (
    SELECT n.vec_id, cc.c,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY round(list_inner_product(n.v, cc.cv), 6) DESC, cc.c
           ) AS rn
    FROM norm n CROSS JOIN ccidx cc
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, c FROM (
    SELECT q.query_id, cc.c,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_inner_product(q.qv, cc.cv), 6) DESC, cc.c
           ) AS pr
    FROM q CROSS JOIN ccidx cc
  ) WHERE pr <= 3
),
adc AS (
  SELECT p.query_id, e.vec_id,
         round(sum(list_inner_product(
           q.qv[e.j * 8 + 1 : e.j * 8 + 8], b.cv)), 6) AS sim_r
  FROM probes p
  JOIN assigned a ON a.centroid = p.c
  JOIN enc e ON e.vec_id = a.vec_id
  JOIN books b ON b.j = e.j AND b.c = e.code
  JOIN q ON q.query_id = p.query_id
  GROUP BY p.query_id, e.vec_id
)
SELECT query_id, vec_id, sim_r, rank FROM (
  SELECT query_id, vec_id, sim_r,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim_r DESC, vec_id
         )::INTEGER AS rank
  FROM adc
) WHERE rank <= 5
"""


def q_ivf_seed_top5(sf_dir: str):
    """IVF with deterministic seed centroids (the 8 lowest-vec_id vectors),
    nprobe=3 — the SQL-verifiable IVF variant: centroid choice, assignment
    (argmax cosine, ties -> lowest centroid), probe selection and the final
    candidate top-5 are all reproduced by the DuckDB oracle, closing the
    oracle gap the k-means ``ivf_top5`` entry (rows-only) leaves open."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webindex.ann import ivf_assign, ivf_topk, seed_centroids

    path = os.path.join(sf_dir, "embeddings.parquet")
    tab = pq.read_table(path, columns=["vec_id", "embedding"])
    vid = np.asarray(tab.column("vec_id").to_pylist())
    order = np.argsort(vid)
    qvecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)[
        order[:3]
    ]
    ds = rd.read_parquet(path)
    cents = seed_centroids(ds, 8)
    assigned = ivf_assign(ds, cents)
    out = ivf_topk(assigned, cents, [0, 1, 2], qvecs, 5, nprobe=3).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


SQL_IVF_SEED_TOP5 = """
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8
),
cid_idx AS (
  SELECT cid, cvec,
         row_number() OVER (ORDER BY cid) - 1 AS cidx
  FROM cent
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
                                           c.cvec::DOUBLE[]) DESC, c.cidx
         ) AS rn
  FROM embeddings e CROSS JOIN cid_idx c
),
assigned AS (SELECT vec_id, embedding, cidx FROM assign WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
probes AS (
  SELECT query_id, cidx FROM (
    SELECT q.query_id, c.cidx,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv::DOUBLE[],
                                             c.cvec::DOUBLE[]) DESC, c.cidx
           ) AS pr
    FROM q CROSS JOIN cid_idx c
  ) WHERE pr <= 3
),
cand AS (
  SELECT p.query_id, a.vec_id,
         list_cosine_similarity(q.qv::DOUBLE[], a.embedding::DOUBLE[]) AS sim
  FROM probes p
  JOIN assigned a ON a.cidx = p.cidx
  JOIN q ON q.query_id = p.query_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, vec_id
         )::INTEGER AS rank
  FROM cand
)
SELECT query_id, vec_id, round(sim, 6) AS sim_r, rank
FROM ranked WHERE rank <= 5
"""


def q_langid(sf_dir: str):
    from webindex.textstats import LangIdStage

    return _docs(sf_dir).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=2
    )


def q_quality(sf_dir: str):
    from webindex.textstats import quality_batch

    return _docs(sf_dir).map_batches(quality_batch, batch_format="pyarrow")


SQL_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text,
         length(text)::BIGINT AS n_chars,
         {_TOK_SQL} AS toks
  FROM documents
),
stats AS (
  SELECT doc_id, n_chars,
         len(toks)::BIGINT AS n_tokens,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
             AS sum_len,
         coalesce(len(list_filter(
             toks, x -> list_contains([{{stoplist}}], x))), 0)::DOUBLE AS n_stop,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digit,
         length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS n_upper
  FROM base
),
derived AS (
  SELECT doc_id, n_chars, n_tokens,
         CASE WHEN n_tokens > 0 THEN sum_len / n_tokens ELSE 0.0 END
             AS mean_token_len,
         CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END
             AS stopword_ratio,
         CASE WHEN n_chars > 0 THEN n_digit / n_chars ELSE 0.0 END
             AS digit_ratio,
         CASE WHEN n_chars > 0 THEN n_upper / n_chars ELSE 0.0 END
             AS upper_ratio
  FROM stats
)
SELECT doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio,
       digit_ratio, upper_ratio,
       -- same multiply order as webindex.textstats.quality_batch:
       -- (((1*a)*b)*c)*d, 1*a == a in IEEE double
       ((least(1.0, n_tokens / 50.0)
         * (CASE WHEN mean_token_len BETWEEN 3.0 AND 10.0
                 THEN 1.0 ELSE 0.5 END))
        * (1.0 - least(1.0, abs(stopword_ratio - 0.3))))
       * (1.0 - least(1.0, digit_ratio * 3)) AS quality
FROM derived
""".replace("{stoplist}", _stopword_sql_list())


def _langid_sql() -> str:
    from webindex.textstats import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)  # alphabetical = the Python tie-break
    cnt_cols = ",\n         ".join(
        "coalesce(len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang]))
        + f"], x))), 0)::DOUBLE AS c_{lang}"
        for lang in langs
    )
    ratio_cols = ",\n    ".join(
        f"CASE WHEN n > 0 THEN c_{lang} / n ELSE 0.0 END AS s_{lang}"
        for lang in langs
    )
    g = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pred = "CASE WHEN " + g + " <= 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = {g} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH base AS (
  SELECT doc_id, {_TOK_SQL} AS toks FROM documents
),
counts AS (
  SELECT doc_id, len(toks)::BIGINT AS n,
         {cnt_cols}
  FROM base
),
ratios AS (
  SELECT doc_id,
    {ratio_cols}
  FROM counts
)
SELECT doc_id, {pred} AS lang_pred, {g} AS lang_conf FROM ratios
"""


SQL_LANGID = _langid_sql()


def q_curation_pipeline(sf_dir: str):
    """Flagship curation composition (the 100-TB training-data shape):
    language-ID + quality scoring -> filter (lang_pred = 'en', quality
    >= 0.5) -> exact dedup (min doc_id per text) -> per-source corpus
    budget (docs + tokens). Every stage is the same operator the
    standalone entries verify; the composition is hash-checked
    end-to-end against one SQL expression."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from webindex.dedup import exact_dedup
    from webindex.textstats import LangIdStage, quality_batch

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    def feats(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        lang = LangIdStage()(batch)
        keep = pc.and_(
            pc.greater_equal(q.column("quality"), 0.5),
            pc.equal(lang.column("lang_pred"), "en"),
        )
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "source": batch.column("source"),
                "n_tokens": q.column("n_tokens"),
            }
        )
        return out.filter(keep)

    kept = docs.map_batches(feats, batch_format="pyarrow")
    deduped = exact_dedup(kept, text_col="text")
    return deduped.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="sum_tokens")
    )


def _curation_sql() -> str:
    return f"""
WITH q AS (SELECT * FROM ({SQL_QUALITY})),
l AS (SELECT * FROM ({SQL_LANGID})),
keep AS (
  SELECT d.doc_id, d.source, d.text, q.n_tokens
  FROM documents d JOIN q USING (doc_id) JOIN l USING (doc_id)
  WHERE q.quality >= 0.5 AND l.lang_pred = 'en'
),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM keep
  ) WHERE rn = 1
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS sum_tokens
FROM dedup GROUP BY source
"""


SQL_CURATION = _curation_sql()


def q_cc_chain_clusters(sf_dir: str):
    """Distributed connected components (hash-to-min groupby rounds) over a
    deterministic chain graph: consecutive doc_ids within each (lang,
    source) group are linked, so each group's docs must all converge to the
    group's min doc_id through O(log chain-length) propagation rounds —
    nothing but the per-round convergence fingerprint touches the driver."""
    import ray.data as rd

    from webindex.dedup import connected_components_ds

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source"],
    )

    # stable group key (no PYTHONHASHSEED dependence)
    from webindex.util import stable_hash64

    def tag(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_pylist()
        src = batch.column("source").to_pylist()
        key = pa.array(
            [stable_hash64(f"{l}\x00{s}") % (1 << 62)
             for l, s in zip(lang, src)],
            pa.int64(),
        )
        return pa.table({"doc_id": batch.column("doc_id"), "gk": key})

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        if ids.size < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"a": ids[:-1], "b": ids[1:]})

    edges = (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(chain, batch_format="pandas")
    )
    labels = connected_components_ds(edges, n_parts=16)
    return (
        labels.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(np.int64)
    )


SQL_CC_CHAIN = """
WITH g AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY lang, source) AS cluster,
         count(*) OVER (PARTITION BY lang, source) AS n
  FROM documents
)
SELECT doc_id, cluster FROM g WHERE n > 1
"""


def q_ngram_jaccard_clusters(sf_dir: str):
    """Exact word-3-gram Jaccard near-dup clusters (§2.7 D3 family):
    complete shared-shingle candidate generation, joined exact verify,
    distributed-capable clustering — hash-checked against a DuckDB
    all-pairs Jaccard + recursive-CTE connected components oracle."""
    from webindex.dedup import ngram_jaccard_dedup

    return ngram_jaccard_dedup(_docs(sf_dir), shingle_k=3, threshold=0.5)


SQL_NGRAM_JACCARD = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_TOK_SQL} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN
           list_distinct(list_transform(
             generate_series(1, len(t) - 2),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
         ELSE [] END AS gs
  FROM toks
),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.gs, y.gs))::DOUBLE AS inter,
         (len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs)))::DOUBLE
             AS uni
  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
  WHERE len(x.gs) > 0 AND len(y.gs) > 0
),
good AS (SELECT a, b FROM pairs WHERE inter / uni >= 0.5),
edges AS (
  SELECT a AS u, b AS v FROM good
  UNION SELECT b, a FROM good
),
walk(node, m) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.m FROM edges e JOIN walk w ON w.node = e.v
)
SELECT node AS doc_id, min(m)::BIGINT AS cluster
FROM walk GROUP BY node
"""


def q_paraphrase_top(sf_dir: str):
    """Paraphrase mining (§2.7 D3) exact broadcast path: global top-50
    cosine pairs over the embeddings table, sims rounded to 6dp."""
    import ray.data as rd

    from webindex.ann import paraphrase_mining

    out = paraphrase_mining(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        max_pairs=50, query_chunk_top_k=100_000, mode="broadcast",
        concurrency=2,
    ).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["a", "b", "sim_r"]]


SQL_PARAPHRASE_TOP = """
WITH pairs AS (
  SELECT e1.vec_id AS a, e2.vec_id AS b,
         list_cosine_similarity(e1.embedding::DOUBLE[],
                                e2.embedding::DOUBLE[]) AS sim
  FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
)
SELECT a, b, round(sim, 6) AS sim_r
FROM (
  SELECT a, b, sim,
         row_number() OVER (ORDER BY sim DESC, a, b) AS rn
  FROM pairs
) WHERE rn <= 50
"""


def q_eval_metrics(sf_dir: str):
    """Runs x qrels -> per-query metrics (SURVEY.md §2.5 A7). Qrels are
    derived deterministically (docs containing every query term)."""
    from webindex.eval import evaluate_runs_pd

    runs = q_bm25_top10(sf_dir).to_pandas()
    runs["did"] = runs["doc_id"].astype(str)
    # qrels derivation runs as a distributed scan emitting only the small
    # (qid, did) hit rows — the corpus never reaches the driver whole
    qspec = [(qid, frozenset(_sql_an.tokens(text)))
             for qid, text in DOC_QUERIES]

    def qrels_batch(batch: pa.Table) -> pa.Table:
        an = Analyzer(SQL_SAFE_ANALYZER)
        out_q, out_d = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks = set(an.tokens(t or ""))
            for qid, terms in qspec:
                if terms <= toks:
                    out_q.append(qid)
                    out_d.append(str(int(did)))
        return pa.table(
            {"qid": pa.array(out_q, pa.string()),
             "did": pa.array(out_d, pa.string())}
        )

    qrels = (
        _docs(sf_dir)
        .map_batches(qrels_batch, batch_format="pyarrow")
        .to_pandas()
    )
    qrels["rel"] = 1
    out = evaluate_runs_pd(runs, qrels, k_values=[10])
    for c in out.columns:
        if c != "qid":
            out[c] = out[c].round(6)
    return out


SQL_EVAL_METRICS = _sql_bm25_scores() + f"""
, top AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id)::BIGINT AS rank
    FROM scores
  ) WHERE rank <= {TOPK}
),
doc_terms AS (SELECT DISTINCT doc_id, term FROM toks),
qn AS (SELECT qid, count(*)::BIGINT AS nq FROM qterms GROUP BY qid),
-- qrels: docs whose token set contains EVERY query term (rel = 1)
qrels AS (
  SELECT q.qid, dt.doc_id
  FROM qterms q JOIN doc_terms dt USING (term) JOIN qn USING (qid)
  GROUP BY q.qid, dt.doc_id, qn.nq
  HAVING count(DISTINCT dt.term) = qn.nq
),
nrel AS (SELECT qid, count(*)::BIGINT AS n_rel FROM qrels GROUP BY qid),
hits AS (
  SELECT t.qid, t.rank,
         CASE WHEN qr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM top t
  LEFT JOIN qrels qr ON qr.qid = t.qid AND qr.doc_id = t.doc_id
),
cum AS (
  SELECT qid, rank, rel,
         sum(rel) OVER (PARTITION BY qid ORDER BY rank) AS cum_rel
  FROM hits
),
perq AS (
  SELECT qid,
         -- rank-ascending summation order pinned (list_sum over ORDER BY),
         -- matching the Python enumerate order
         coalesce(list_sum(list(rel / log2(rank + 1) ORDER BY rank)), 0.0)
             AS dcg,
         sum(rel)::BIGINT AS hit_cnt,
         min(CASE WHEN rel = 1 THEN rank END) AS first_hit,
         coalesce(list_sum(
             list(cum_rel::DOUBLE / rank ORDER BY rank)
                 FILTER (WHERE rel = 1)), 0.0) AS ap_sum
  FROM cum GROUP BY qid
),
ideal AS (
  SELECT n.qid, list_sum(list(1.0 / log2(g.i + 1) ORDER BY g.i)) AS idcg
  FROM nrel n, generate_series(1, {TOPK}) AS g(i)
  WHERE g.i <= least({TOPK}, n.n_rel)
  GROUP BY n.qid
)
SELECT p.qid,
       round_even(p.dcg / i.idcg, 6) AS "ndcg@10",
       round_even(p.hit_cnt / {TOPK}.0, 6) AS "p@10",
       round_even(p.hit_cnt::DOUBLE / n.n_rel, 6) AS "recall@10",
       round_even(coalesce(1.0 / p.first_hit, 0.0), 6) AS "mrr@10",
       round_even(p.ap_sum / least({TOPK}, n.n_rel), 6) AS "map@10"
FROM perq p JOIN nrel n USING (qid) JOIN ideal i USING (qid)
"""


def q_media_features(sf_dir: str):
    """Multimodal decode pipeline over the deterministic media table
    (real PNG / WAV / Y4M payloads through the DecodeStage actor pool)."""
    import ray.data as rd

    from webindex.multimodal import media_features, synth_media_table

    ds = rd.from_arrow(synth_media_table(120))
    out = media_features(ds, concurrency=2, batch_size=32).to_pandas()
    out["mean_value"] = out["mean_value"].round(6)
    out["std_value"] = out["std_value"].round(6)
    return out


def q_rerank_scored(sf_dir: str):
    """Full rerank pipeline (SURVEY.md §3.3): BM25 top-10 -> broadcast doc
    gather -> actor-pool pair scoring (OverlapScorer: |q ∩ d| + Jaccard) ->
    re-ranked runs. Scores rounded to 6dp for the value-hash compare."""
    from webindex.rerank import rerank_runs

    runs = q_bm25_top10(sf_dir).to_pandas()
    runs = runs.rename(columns={"doc_id": "did"})
    runs["score"] = -runs["rank"].astype(float)  # rank order as score proxy
    # gather ONLY the top-k docs' texts (runs-bounded, never corpus-sized)
    need_arr = pa.array(sorted(set(runs["did"].astype(int))), pa.int64())
    docs = (
        _docs(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("doc_id"), need_arr)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    lookup = {str(int(i)): t for i, t in zip(docs["doc_id"], docs["text"])}
    runs["did"] = runs["did"].astype(int).astype(str)
    out = rerank_runs(runs, dict(DOC_QUERIES), lookup, depth=TOPK, concurrency=2)
    out["doc_id"] = out["did"].astype(int)
    out["score_r"] = out["score"].round(6)
    # re-rank on INT doc_id ties (rerank_runs tie-breaks on string dids,
    # which sorts "10" before "2"; the SQL oracle uses numeric doc_id)
    out = out.sort_values(
        ["qid", "score_r", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    out["rank"] = out.groupby("qid", sort=False).cumcount() + 1
    return out[["qid", "doc_id", "score_r", "rank"]]


SQL_RERANK_SCORED = _sql_bm25_scores() + f"""
, top AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
    FROM scores
  ) WHERE rank <= {TOPK}
),
qt_stats AS (SELECT qid, count(DISTINCT term) AS nq FROM qterms GROUP BY qid),
doc_terms AS (SELECT DISTINCT doc_id, term FROM toks),
ov AS (
  SELECT t.qid, t.doc_id,
         count(DISTINCT CASE WHEN q.term IS NOT NULL THEN dt.term END) AS inter,
         count(DISTINCT dt.term) AS nd
  FROM top t
  JOIN doc_terms dt ON dt.doc_id = t.doc_id
  LEFT JOIN qterms q ON q.qid = t.qid AND q.term = dt.term
  GROUP BY t.qid, t.doc_id
),
scored AS (
  SELECT ov.qid, ov.doc_id,
         round(ov.inter + ov.inter::DOUBLE /
               (qs.nq + ov.nd - ov.inter), 6) AS score_r
  FROM ov JOIN qt_stats qs ON qs.qid = ov.qid
)
SELECT qid, doc_id, score_r,
       row_number() OVER (PARTITION BY qid
                          ORDER BY score_r DESC, doc_id)::BIGINT AS rank
FROM scored
"""


def q_openai_search(sf_dir: str):
    """M13 search-endpoint scorer (SURVEY.md §2.2): mean query-span echo
    logprob × 100, empty-doc normalized, over 2 probe queries × the 10
    lowest-doc_id documents. The completion client is the deterministic
    offline stand-in (webindex/openai_scorer.py); semantics mirror
    /root/reference/crossencoder/beir/openai_search_endpoint_functionality.py:16-76.
    Rows-only: the score is a function of tokenizer offsets + stable
    hashes, not SQL-expressible."""
    import ray.data as rd

    from webindex.openai_scorer import score_pairs_ds

    probes = {"q1": "artificial intelligence", "q2": "river forest"}
    docs = (
        _docs(sf_dir).sort("doc_id").limit(10).to_pandas()
    )
    pairs = pd.DataFrame(
        [
            {"qid": qid, "query": qtext, "did": str(did), "text": text}
            for qid, qtext in probes.items()
            for did, text in zip(docs["doc_id"], docs["text"])
        ]
    )
    out = score_pairs_ds(rd.from_pandas(pairs), batch_size=8).to_pandas()
    return (
        out[["qid", "did", "score"]]
        .sort_values(["qid", "did"])
        .reset_index(drop=True)
    )


def q_dense_top5(sf_dir: str):
    """Dense-retrieval parity path (SURVEY.md §3.2): deterministic
    hashed-token embedder (mean pooling) over the documents table, chunked
    brute-force cosine top-5 for 3 probe queries. Rank-identity vs the
    single-threaded oracle is asserted in tests/test_embed_rerank.py."""
    from webindex.embed import dense_retrieve

    probes = ["artificial intelligence", "search index query", "river forest"]
    out = dense_retrieve(
        _docs(sf_dir), [0, 1, 2], probes, k=5, dim=32, concurrency=2
    ).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


def q_beir_roundtrip(sf_dir: str):
    """S1/S5 source-sink round-trip: documents -> corpus.jsonl -> read back
    with title normalization; returns (doc_id, n_chars) of the round-tripped
    corpus for the hash compare."""
    import tempfile

    import ray.data as rd

    from webindex.sources import read_beir_corpus

    with tempfile.NamedTemporaryFile(
        "w", suffix=".jsonl", delete=False, dir="/tmp"
    ) as f:
        import json as _json

        # stream the corpus out batch-by-batch; the driver never holds
        # the whole table (at scale this would be a write_json sink,
        # one file per block)
        for batch in _docs(sf_dir).iter_batches(batch_format="pyarrow"):
            for did, text in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                f.write(
                    _json.dumps({"_id": str(int(did)), "text": text}) + "\n"
                )
        path = f.name
    back = read_beir_corpus(path).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    os.unlink(path)
    return back[["doc_id", "n_chars"]]


SQL_BEIR_ROUNDTRIP = """
SELECT doc_id, length(text)::BIGINT AS n_chars FROM documents
"""


def q_warc_roundtrip(sf_dir: str):
    """WARC sink + source round-trip (webindex/warc.py — the Common
    Crawl storage format, ISO 28500): documents become response records
    (url carries the doc_id, payload = utf-8 text bytes, warc_ts =
    doc_id microseconds) written as gzip-member part-*.warc.gz with
    PINNED url-hash sharding, then stream back through the incremental
    WarcDatasource parser. Byte-identity of the text (and the exact
    payload byte count) proves writer + gzip member framing + parser
    end to end; the oracle is a plain SELECT over documents."""
    import ray.data as rd

    from webindex.warc import read_warc, write_warc

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-warc")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )

        def to_pages(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            texts = t.column("text").to_pylist()
            return pa.table(
                {
                    "url": pa.array(
                        [f"https://docs.example/{int(i)}" for i in ids]
                    ),
                    "warc_ts": pa.array(ids, pa.int64()).cast(
                        pa.timestamp("us")
                    ),
                    "html": pa.array(
                        [(x or "").encode("utf-8") for x in texts],
                        pa.binary(),
                    ),
                }
            )

        write_warc(
            docs.map_batches(to_pages, batch_format="pyarrow"), out,
            n_files=8,
        )
        with open(marker, "w") as f:
            f.write("ok")

    def back_to_docs(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(u.rsplit("/", 1)[1]) for u in urls], pa.int64()
                ),
                "text": pa.array(
                    [h.decode("utf-8") for h in htmls], pa.string()
                ),
                "n_bytes": pa.array(
                    [len(h) for h in htmls], pa.int64()
                ),
            }
        )

    return read_warc(out).map_batches(back_to_docs, batch_format="pyarrow")


SQL_WARC_ROUNDTRIP = """
SELECT doc_id, text, octet_length(encode(text))::BIGINT AS n_bytes
FROM documents
"""


ROBOTS_TXT = (
    "User-agent: *\nDisallow: /doc/1\nAllow: /doc/12\n"
)


def q_robots_filter(sf_dir: str):
    """robots.txt compliance filter (RFC 9309, webindex/robots.py): urls
    derive from documents (https://<source>.example/doc/<doc_id>);
    even-ending source domains publish a robots.txt whose prefix rules
    exercise longest-match-wins AND allow-beats-disallow-on-tie
    (Disallow /doc/1 vs the longer Allow /doc/12); odd-ending domains
    have no robots.txt => default allow. Rules parse once on the
    driver (bounded by domain count — a crawler's robots cache),
    broadcast via ray.put; pages stream through a stateless
    map_batches with per-domain vectorized prefix matching. The SQL
    oracle re-derives the RFC precedence with a window over matching
    rules (length DESC, allow DESC)."""
    import ray.data as rd

    from webindex.robots import robots_filter

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )

    def to_urls(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "domain": pa.array(
                    [f"{s}.example" for s in srcs], pa.string()
                ),
                "path": pa.array(
                    [f"/doc/{int(i)}" for i in ids], pa.string()
                ),
                "url": pa.array(
                    [
                        f"https://{s}.example/doc/{int(i)}"
                        for s, i in zip(srcs, ids)
                    ],
                    pa.string(),
                ),
            }
        )

    pages = docs.map_batches(to_urls, batch_format="pyarrow")
    sources = sorted(docs.unique("source"))
    robots_tab = pa.table(
        {
            "domain": pa.array(
                [
                    f"{s}.example" for s in sources
                    if s[-1] in "02468"
                ]
            ),
            "robots_txt": pa.array(
                [ROBOTS_TXT for s in sources if s[-1] in "02468"]
            ),
        }
    )
    out = robots_filter(pages, robots_tab, user_agent="webindex")
    return out.select_columns(["doc_id", "domain", "path"])


SQL_ROBOTS_FILTER = """
WITH urls AS (
  SELECT doc_id, source || '.example' AS domain,
         '/doc/' || doc_id::VARCHAR AS path
  FROM documents
),
rob AS (
  SELECT DISTINCT source || '.example' AS domain FROM documents
  WHERE right(source, 1) IN ('0','2','4','6','8')
),
rules AS (
  SELECT domain, false AS is_allow, '/doc/1' AS prefix FROM rob
  UNION ALL
  SELECT domain, true AS is_allow, '/doc/12' AS prefix FROM rob
),
m AS (
  SELECT u.doc_id, r.is_allow,
         row_number() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.prefix) DESC, r.is_allow DESC
         ) AS rn
  FROM urls u
  JOIN rules r
    ON u.domain = r.domain AND starts_with(u.path, r.prefix)
)
SELECT u.doc_id, u.domain, u.path
FROM urls u
LEFT JOIN (SELECT doc_id, is_allow FROM m WHERE rn = 1) v
  USING (doc_id)
WHERE coalesce(v.is_allow, true)
"""


# ---------------------------------------------------------------------------
# Query language: filtered search (docvalues predicate), conjunctive AND
# match, and phrase queries — the ES bool/match_phrase query surface the
# reference's BM25 stage drives through Elasticsearch
# (/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10,
# beir BM25Search; SURVEY.md §2.6 K6). BM25 stats stay corpus-global (ES
# filter context does not change scoring), so the scores CTE is reused
# verbatim and only candidate selection changes.
# ---------------------------------------------------------------------------


FILTER_PRED = (("lang", "==", "en"), ("n_chars", ">=", 200))


def q_bm25_filtered_top10(sf_dir: str):
    """BM25 top-10 restricted to docs matching a docvalues predicate
    (lang = 'en' AND n_chars >= 200) — scores identical to the unfiltered
    engine, selection masked by the docvalues bitset."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        filter_pred=FILTER_PRED,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_FILTERED_TOP10 = _sql_bm25_scores() + f"""
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s
  JOIN documents d ON d.doc_id = s.doc_id
  WHERE d.lang = 'en' AND d.n_chars >= 200
) WHERE rank <= {TOPK}
"""


def q_bm25_and_top10(sf_dir: str):
    """BM25 top-10 with AND semantics: every distinct query term must be
    present in the doc (ES ``operator: and``)."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        match="and",
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_AND_TOP10 = _sql_bm25_scores() + f"""
, nq AS (SELECT qid, count(*)::BIGINT AS nt FROM qterms GROUP BY qid),
matched AS (
  SELECT qid, doc_id, count(*)::BIGINT AS mt FROM contrib GROUP BY qid, doc_id
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s
  JOIN matched m ON m.qid = s.qid AND m.doc_id = s.doc_id
  JOIN nq ON nq.qid = s.qid
  WHERE m.mt = nq.nt
) WHERE rank <= {TOPK}
"""


def _phrase_queries_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "qid": pa.array([q for q, _ in PHRASE_QUERIES]),
                "text": pa.array([t for _, t in PHRASE_QUERIES]),
            }
        )
    )


def q_bm25_phrase_top10(sf_dir: str):
    """Phrase-query top-10 (webindex.phrase lazy verification: conjunctive
    index candidates -> corpus text semi-join -> adjacency check ->
    grouped top-k)."""
    from webindex.phrase import phrase_search

    idx = ensure_index(sf_dir, "nostem")
    runs = phrase_search(
        _phrase_queries_ds(), idx, _docs(sf_dir), top_k=TOPK
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_bm25_phrase_pos_top10(sf_dir: str):
    """Index-only phrase top-10 over a POSITIONAL index
    (store_positions=True; webindex.positional vectorized kernel) —
    checked against the same SQL oracle as the lazy-verify entry, so the
    two phrase execution models are proven result-identical at the
    contract surface too."""
    from webindex.phrase import phrase_search

    idx = ensure_index(sf_dir, "pos")
    runs = phrase_search(_phrase_queries_ds(), idx, top_k=TOPK)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _phrase_values_sql() -> str:
    rows = ", ".join(
        f"('{q}', '{' '.join(_sql_an.tokens(t))}')" for q, t in PHRASE_QUERIES
    )
    return f"(VALUES {rows}) AS p(qid, phrase)"


def _phrase_terms_values_sql() -> str:
    rows = ", ".join(f"('{q}', '{t}')" for q, t in PHRASE_TERMS)
    return f"(VALUES {rows}) AS q(qid, term)"


# phrase containment in SQL: analyzed tokens space-joined with sentinel
# spaces; tokens cannot contain spaces, so LIKE-free strpos on
# ' tok1 tok2 ' is an exact consecutive-subsequence test
SQL_BM25_PHRASE_TOP10 = _sql_bm25_scores(_phrase_terms_values_sql()) + f"""
, phr AS (SELECT * FROM {_phrase_values_sql()}),
dt AS (
  SELECT doc_id, ' ' || array_to_string({_TOK_SQL}, ' ') || ' ' AS ts
  FROM documents WHERE text <> ''
),
pm AS (
  SELECT p.qid, d.doc_id
  FROM phr p JOIN dt d ON strpos(d.ts, ' ' || p.phrase || ' ') > 0
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s
  JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


# ---------------------------------------------------------------------------
# SQL-checkable near-dup signature math: minhash and simhash with the
# "poly" base hash (polynomial over code points mod 2^61-1 — reproducible
# in DuckDB via list_reduce + HUGEINT). The production pipelines default
# to blake2b (not SQL-expressible, hence minhash_clusters/simhash_clusters
# stay rows-only); these entries prove the permutation-min and
# bit-majority math against an independent oracle.
# ---------------------------------------------------------------------------

_POLY_HASH_SQL = (
    "list_reduce(list_prepend(0::HUGEINT, "
    "list_transform(regexp_extract_all({col}, '.'), "
    "x -> ascii(x)::HUGEINT)), "
    "(acc, x) -> (acc * 1000003 + x) % 2305843009213693951)"
)

_MH_PERMS = 16


def _mh_stage():
    from webindex.dedup import MinHashStage

    return MinHashStage(
        num_perm=_MH_PERMS, shingle_k=3, seed=1, base_hash="poly"
    )


def q_minhash_sigs(sf_dir: str):
    """Exploded (doc_id, perm, mh) minhash signatures, poly base hash —
    docs with no ASCII token are excluded (they have no shingles; the
    default pipeline assigns them the sentinel all-MAX signature)."""
    st = _mh_stage()

    def explode(batch: pa.Table) -> pa.Table:
        from webindex.dedup import _mod_p_mul_add, _shingle_hashes

        dids, perms, mhs = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            sh = _shingle_hashes(t or "", st.k, "poly")
            if sh.size == 0:
                continue
            sig = _mod_p_mul_add(sh, st.a, st.b).min(axis=0)
            dids.extend([did] * st.num_perm)
            perms.extend(range(st.num_perm))
            mhs.extend(sig.astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "perm": pa.array(perms, pa.int32()),
                "mh": pa.array(mhs, pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(explode, batch_format="pyarrow")


def _mh_perms_sql() -> str:
    st = _mh_stage()
    rows = ", ".join(
        f"({i}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for i, (a, b) in enumerate(zip(st.a, st.b))
    )
    return f"(VALUES {rows}) AS pm(perm, a, b)"


SQL_MINHASH_SIGS = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
    CASE WHEN len(tk) >= 3
         THEN list_transform(range(len(tk) - 2),
                             i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
         ELSE [array_to_string(tk, ' ')] END AS gs
  FROM toks WHERE len(tk) > 0
),
sh0 AS (SELECT doc_id, unnest(gs) AS g FROM grams),
sh AS (SELECT DISTINCT doc_id, g FROM sh0),
hx AS (SELECT doc_id, {_POLY_HASH_SQL.format(col='g')} AS x FROM sh)
SELECT h.doc_id, pm.perm::INTEGER AS perm,
       min((pm.a * h.x + pm.b) % 2305843009213693951)::BIGINT AS mh
FROM hx h CROSS JOIN {_mh_perms_sql()}
GROUP BY h.doc_id, pm.perm
"""


def q_minhash_poly_clusters(sf_dir: str):
    """END-TO-END SQL-proven MinHash-LSH near-dup: the full production
    pipeline (shingle -> permutation-min signature -> band buckets ->
    candidate pairs -> exact-Jaccard verify -> connected components) run
    with the poly base hash so a DuckDB oracle reproduces every stage —
    banding included (the oracle buckets by the band SLICE itself, which
    has the same equality structure as the engine's band hash). Docs with
    no ASCII token are excluded up front (they have no shingles; the
    default pipeline gives them the sentinel signature)."""
    from webindex.dedup import minhash_dedup

    def keep_tokenful(t: pa.Table) -> pa.Table:
        has = pc.match_substring_regex(
            pc.utf8_lower(pc.coalesce(t.column("text"), pa.scalar(""))),
            "[a-z0-9]",
        )
        return t.filter(has)

    docs = _docs(sf_dir).map_batches(keep_tokenful, batch_format="pyarrow")
    return minhash_dedup(
        docs, num_perm=_MH_PERMS, bands=4, shingle_k=3, threshold=0.8,
        base_hash="poly",
    )


_MH_R = _MH_PERMS // 4  # rows per band in the poly clusters entry

SQL_MINHASH_POLY_CLUSTERS = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
    CASE WHEN len(tk) >= 3
         THEN list_transform(range(len(tk) - 2),
                             i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
         ELSE [array_to_string(tk, ' ')] END AS gs
  FROM toks WHERE len(tk) > 0
),
sh AS (SELECT DISTINCT doc_id, unnest(gs) AS g FROM grams),
hx AS (
  SELECT DISTINCT doc_id, {_POLY_HASH_SQL.format(col='g')} AS x FROM sh
),
mh AS (
  SELECT h.doc_id, pm.perm,
         min((pm.a * h.x + pm.b) % 2305843009213693951)::BIGINT AS mh
  FROM hx h CROSS JOIN {_mh_perms_sql()}
  GROUP BY h.doc_id, pm.perm
),
sig AS (SELECT doc_id, list(mh ORDER BY perm) AS sig FROM mh
        GROUP BY doc_id),
bands AS (
  SELECT doc_id, b.bi,
         list_slice(sig, b.bi * {_MH_R} + 1, b.bi * {_MH_R} + {_MH_R}) AS sl
  FROM sig, (VALUES (0), (1), (2), (3)) b(bi)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.bi = y.bi AND x.sl = y.sl AND x.doc_id < y.doc_id
),
szs AS (SELECT doc_id, count(*)::BIGINT AS sz FROM hx GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*)::BIGINT AS i
  FROM cand c
  JOIN hx ha ON ha.doc_id = c.a
  JOIN hx hb ON hb.doc_id = c.b AND hb.x = ha.x
  GROUP BY c.a, c.b
),
good AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN szs sa ON sa.doc_id = c.a
  JOIN szs sb ON sb.doc_id = c.b
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  WHERE coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)) >= 0.8
),
edges AS (SELECT a AS u, b AS v FROM good UNION SELECT b, a FROM good),
walk(node, m) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.m FROM edges e JOIN walk w ON w.node = e.v
)
SELECT node AS doc_id, min(m)::BIGINT AS cluster FROM walk GROUP BY node
"""


def q_incremental_dedup(sf_dir: str):
    """Incremental MinHash dedup (the ongoing-crawl shape): even doc_ids
    play the persisted corpus store (build_minhash_store: band-table
    index + verify payloads), odd doc_ids the incoming batch; each new
    doc that exact-Jaccard-matches a stored doc at >= 0.8 reports the
    smallest such stored docID as dup_of. Fully SQL-proven on the poly
    base hash — the oracle replays signature, banding, old x new
    bucketing and the verify, with a parity predicate standing in for
    the store split."""
    import shutil

    from webindex.dedup import (build_minhash_store,
                                minhash_dedup_incremental)

    def keep_tokenful(t: pa.Table) -> pa.Table:
        has = pc.match_substring_regex(
            pc.utf8_lower(pc.coalesce(t.column("text"), pa.scalar(""))),
            "[a-z0-9]",
        )
        return t.filter(has)

    docs = _docs(sf_dir).map_batches(
        keep_tokenful, batch_format="pyarrow"
    ).materialize()

    def parity(keep_even: bool):
        def f(t: pa.Table) -> pa.Table:
            even = pc.equal(
                pc.bit_wise_and(t.column("doc_id"), pa.scalar(1)),
                pa.scalar(0),
            )
            return t.filter(even if keep_even else pc.invert(even))
        return f

    store_dir = os.path.join(
        "/tmp/webindex-cache",
        f"mhstore-{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(store_dir, ignore_errors=True)
    build_minhash_store(
        docs.map_batches(parity(True), batch_format="pyarrow"), store_dir,
        num_perm=_MH_PERMS, bands=4, shingle_k=3, base_hash="poly",
    )
    return minhash_dedup_incremental(
        docs.map_batches(parity(False), batch_format="pyarrow"),
        store_dir, threshold=0.8,
    )


_INC_CAND_OLD = """cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.bi = y.bi AND x.sl = y.sl AND x.doc_id < y.doc_id
),"""
_INC_CAND_NEW = """cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.bi = y.bi AND x.sl = y.sl
  WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 1
),"""
_INC_TAIL_OLD = """edges AS (SELECT a AS u, b AS v FROM good UNION SELECT b, a FROM good),
walk(node, m) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.m FROM edges e JOIN walk w ON w.node = e.v
)
SELECT node AS doc_id, min(m)::BIGINT AS cluster FROM walk GROUP BY node"""
_INC_TAIL_NEW = (
    # the preceding CTE closes with a comma; absorb it with a no-op CTE
    "fin AS (SELECT 1)\n"
    "SELECT b AS doc_id, min(a)::BIGINT AS dup_of FROM good GROUP BY b"
)
assert _INC_CAND_OLD in SQL_MINHASH_POLY_CLUSTERS, "poly SQL drifted"
assert _INC_TAIL_OLD in SQL_MINHASH_POLY_CLUSTERS, "poly SQL drifted"
SQL_INCREMENTAL_DEDUP = SQL_MINHASH_POLY_CLUSTERS.replace(
    _INC_CAND_OLD, _INC_CAND_NEW
).replace(_INC_TAIL_OLD, _INC_TAIL_NEW)


def q_minhash_dedup_kept(sf_dir: str):
    """The canonical DISTRIBUTED consumption of the Dataset-native dedup
    label surface (round 4): run the SQL-proven poly MinHash pipeline,
    then apply the labels to the corpus with dedup_keep_canonical — a
    hash-partitioned anti-join that keeps every unclustered doc plus
    each cluster's min-docID canonical member. Neither corpus nor
    labels ever touch the driver; the oracle replays the full poly
    chain and subtracts the non-canonical members."""
    from webindex.dedup import dedup_keep_canonical, minhash_dedup

    def keep_tokenful(t: pa.Table) -> pa.Table:
        has = pc.match_substring_regex(
            pc.utf8_lower(pc.coalesce(t.column("text"), pa.scalar(""))),
            "[a-z0-9]",
        )
        return t.filter(has)

    # materialize once: the filtered corpus is consumed by the sig
    # stage, the verify payload join AND the anti-join rows side —
    # without this the read+regex lineage re-executes three times
    docs = _docs(sf_dir).map_batches(
        keep_tokenful, batch_format="pyarrow"
    ).materialize()
    labels = minhash_dedup(
        docs, num_perm=_MH_PERMS, bands=4, shingle_k=3, threshold=0.8,
        base_hash="poly",
    )
    kept = dedup_keep_canonical(
        docs, labels,
        rows_types={"doc_id": pa.int64(), "text": pa.string()},
    )
    return kept.select_columns(["doc_id"])


SQL_MINHASH_DEDUP_KEPT = f"""
SELECT d.doc_id
FROM (
  SELECT doc_id
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
        FROM documents)
  WHERE len(tk) > 0
) d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM ({SQL_MINHASH_POLY_CLUSTERS}) c
  WHERE c.doc_id <> c.cluster
)
"""


def q_simhash_poly_clusters(sf_dir: str):
    """END-TO-END SQL-proven SimHash near-dup: tf-weighted bit-majority
    signature (poly base hash, 61-bit) -> 4 x 16-bit band buckets ->
    hamming <= 3 verify -> connected components, each stage reproduced by
    the DuckDB oracle (bands via shift/mask, hamming via
    bit_count(xor))."""
    from webindex.dedup import simhash_dedup

    return simhash_dedup(_docs(sf_dir), max_hamming=3, base_hash="poly")


SQL_SIMHASH_POLY_CLUSTERS = f"""
WITH RECURSIVE tc AS (
  SELECT doc_id, tok, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
  GROUP BY doc_id, tok
),
hxbits AS (
  SELECT doc_id, ({_POLY_HASH_SQL.format(col='tok')})::BIGINT AS h, c
  FROM tc
),
bitsum AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN c ELSE -c END) AS acc
  FROM hxbits, (SELECT unnest(generate_series(0, 60)) AS bit) b
  GROUP BY doc_id, b.bit
),
sig0 AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
             AS simhash
  FROM bitsum GROUP BY doc_id
),
-- tokenless docs never enter tc; give them simhash 0 like the engine
sig AS (
  SELECT d.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
  FROM documents d LEFT JOIN sig0 s USING (doc_id)
),
bands AS (
  SELECT doc_id, b.bi, (simhash >> (16 * b.bi)) & 65535 AS bv
  FROM sig, (VALUES (0), (1), (2), (3)) b(bi)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id
),
good AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a
  JOIN sig sb ON sb.doc_id = c.b
  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
),
edges AS (SELECT a AS u, b AS v FROM good UNION SELECT b, a FROM good),
walk(node, m) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.m FROM edges e JOIN walk w ON w.node = e.v
)
SELECT node AS doc_id, min(m)::BIGINT AS cluster FROM walk GROUP BY node
"""


def q_simhash_sigs(sf_dir: str):
    """(doc_id, simhash) with the poly base hash (61-bit tf-weighted
    bit-majority; tokenless docs get 0)."""
    from webindex.dedup import SimHashStage

    return _docs(sf_dir).map_batches(
        SimHashStage, fn_constructor_kwargs=dict(base_hash="poly"),
        batch_format="pyarrow", concurrency=2,
    )


SQL_SIMHASH_SIGS = f"""
WITH tc AS (
  SELECT doc_id, t.tok, count(*)::BIGINT AS c
  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
  GROUP BY doc_id, t.tok
),
hx AS (SELECT doc_id, c, ({_POLY_HASH_SQL.format(col='tok')})::BIGINT AS h FROM tc),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> j) & 1 = 1 THEN c ELSE -c END) AS acc
  FROM hx CROSS JOIN (SELECT unnest(range(61)) AS j) b
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::BIGINT << j::INTEGER) ELSE 0 END)::BIGINT
           AS simhash
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# SQL-proven dense retrieval (poly token vectors): the whole bi-encoder
# parity path — tokenize → truncate → per-token unit vectors → mean pool →
# cosine top-k — reproduced by a DuckDB oracle. The default blake2b/
# Gaussian embedder (dense_top5) stays rows-only (PCG64 normals are not
# SQL-expressible); this variant swaps only the vector source.
# ---------------------------------------------------------------------------

_DENSE_PROBES = [
    (0, "merge join sort"), (1, "spark window stream"), (2, "vector column"),
]
_DENSE_DIM, _DENSE_MAXTOK = 16, 64


def q_dense_top5_poly(sf_dir: str):
    from webindex.embed import dense_retrieve

    docs = _docs(sf_dir).map_batches(
        # drop token-less docs (zero embedding; the SQL side filters the
        # same way with len(tokens) > 0 — cosine is undefined for them)
        lambda t: t.filter(
            pc.match_substring_regex(
                pc.utf8_lower(t.column("text")), "[a-z0-9]"
            )
        ),
        batch_format="pyarrow",
    )
    out = dense_retrieve(
        docs, [q for q, _ in _DENSE_PROBES], [t for _, t in _DENSE_PROBES],
        k=5, dim=_DENSE_DIM, max_tokens=_DENSE_MAXTOK, concurrency=2,
        vec_source="poly",
    ).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


def q_dense_top5_poly_left(sf_dir: str):
    """M9 left-truncation windowing (keep the TAIL when over budget;
    reference crossencoder sgptce.py:199-205), SQL-proven: the
    dense_top5_poly path with doc-side ``truncate_side="left"`` — the
    oracle slices the last {maxtok} tokens instead of the first."""
    from webindex.ann import brute_topk
    from webindex.embed import EmbedStage, embed_texts

    docs = _docs(sf_dir).map_batches(
        lambda t: t.filter(
            pc.match_substring_regex(
                pc.utf8_lower(t.column("text")), "[a-z0-9]"
            )
        ),
        batch_format="pyarrow",
    )
    emb = docs.map_batches(
        EmbedStage,
        fn_constructor_kwargs=dict(
            dim=_DENSE_DIM, pooling="mean", max_tokens=_DENSE_MAXTOK,
            truncate_side="left", vec_source="poly",
        ),
        batch_format="pyarrow", concurrency=2,
    )
    qvecs = embed_texts(
        [t for _, t in _DENSE_PROBES], dim=_DENSE_DIM,
        max_tokens=_DENSE_MAXTOK, vec_source="poly",
    )
    out = brute_topk(
        emb, [q for q, _ in _DENSE_PROBES], qvecs, 5, id_col="doc_id",
        concurrency=2,
    ).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


def q_specb_top5_poly(sf_dir: str):
    """M6 specb bracket wrapping, SQL-proven for the deterministic
    stand-in: dense_top5_poly with ``specb=True`` — docs get ``{`` ``}``
    marker TOKENS, queries ``[`` ``]`` (reference
    beir_dense_retriever.py:134-198), wrap-then-truncate. The markers
    are ordinary tokens to the poly vector generator, so the oracle
    list_concats them around the token list before the slice. (Real-HF
    exec parity stays blocked on torch; specb_pack's protected-bracket
    assembly is unit-tested in test_hf_structural.)"""
    from webindex.embed import dense_retrieve

    docs = _docs(sf_dir).map_batches(
        lambda t: t.filter(
            pc.match_substring_regex(
                pc.utf8_lower(t.column("text")), "[a-z0-9]"
            )
        ),
        batch_format="pyarrow",
    )
    out = dense_retrieve(
        docs, [q for q, _ in _DENSE_PROBES], [t for _, t in _DENSE_PROBES],
        k=5, dim=_DENSE_DIM, max_tokens=_DENSE_MAXTOK, concurrency=2,
        vec_source="poly", specb=True,
    ).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


def q_module_chain_top5(sf_dir: str):
    """T5 module pipeline, SQL-proven: the dense_top5_poly parity path
    re-expressed through the ordered-module surface (ModuleChain =
    Tokenizer -> Pooling over the poly backend; corpus side runs inside
    ModuleEncodeStage, the actor-pool wrapper) — same DuckDB oracle, so
    chain == monolithic EmbedStage == SQL end-to-end."""
    from webindex.ann import brute_topk
    from webindex.modules import (ModuleChain, ModuleEncodeStage,
                                  PoolingModule, TokenizerModule)

    def mk():
        return ModuleChain([
            TokenizerModule(dim=_DENSE_DIM, max_tokens=_DENSE_MAXTOK,
                            vec_source="poly"),
            PoolingModule("mean"),
        ])

    docs = _docs(sf_dir).map_batches(
        lambda t: t.filter(
            pc.match_substring_regex(
                pc.utf8_lower(t.column("text")), "[a-z0-9]"
            )
        ),
        batch_format="pyarrow",
    )
    emb = docs.map_batches(
        ModuleEncodeStage,
        fn_constructor_kwargs=dict(chain_spec=mk),
        batch_format="pyarrow", concurrency=2,
    )
    qvecs = mk().encode([t for _, t in _DENSE_PROBES])
    out = brute_topk(
        emb, [q for q, _ in _DENSE_PROBES], qvecs, 5, id_col="doc_id",
        concurrency=2,
    ).to_pandas()
    out["sim_r"] = out["sim"].round(6)
    return out[["query_id", "vec_id", "sim_r", "rank"]]


def _dense_probe_values_sql() -> str:
    rows = ", ".join(f"({q}, '{t}')" for q, t in _DENSE_PROBES)
    return f"(VALUES {rows}) AS q(query_id, qtext)"


SQL_DENSE_TOP5_POLY = f"""
WITH dims AS (SELECT unnest(range({_DENSE_DIM}))::INTEGER AS j),
dt AS (
  SELECT doc_id,
         list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'),
                    1, {_DENSE_MAXTOK}) AS tk
  FROM documents WHERE trim(text) <> ''
),
dnn AS (SELECT doc_id, tk, len(tk)::DOUBLE AS L FROM dt WHERE len(tk) > 0),
tf AS (
  SELECT doc_id, t.tok, count(*)::DOUBLE AS c
  FROM dnn, unnest(tk) AS t(tok) GROUP BY doc_id, t.tok
),
qv AS (SELECT * FROM {_dense_probe_values_sql()}),
qt AS (
  SELECT query_id,
         list_slice(regexp_extract_all(lower(qtext), '[a-z0-9]+'),
                    1, {_DENSE_MAXTOK}) AS tk
  FROM qv
),
qnn AS (SELECT query_id, tk, len(tk)::DOUBLE AS L FROM qt WHERE len(tk) > 0),
qtf AS (
  SELECT query_id, t.tok, count(*)::DOUBLE AS c
  FROM qnn, unnest(tk) AS t(tok) GROUP BY query_id, t.tok
),
vocab AS (SELECT DISTINCT tok FROM tf UNION SELECT DISTINCT tok FROM qtf),
raw AS (
  SELECT tok, j,
    (({_POLY_HASH_SQL.format(col="tok || chr(31) || j::VARCHAR")})::DOUBLE
      / 2305843009213693951.0) - 0.5 AS r
  FROM vocab CROSS JOIN dims
),
tnorm AS (SELECT tok, sqrt(sum(r * r)) AS nrm FROM raw GROUP BY tok),
tv AS (SELECT raw.tok, raw.j, raw.r / tnorm.nrm AS v
       FROM raw JOIN tnorm USING (tok)),
demb AS (
  SELECT tf.doc_id, tv.j, sum(tf.c * tv.v) / any_value(d.L) AS e
  FROM tf JOIN tv ON tv.tok = tf.tok JOIN dnn d ON d.doc_id = tf.doc_id
  GROUP BY tf.doc_id, tv.j
),
qemb AS (
  SELECT qtf.query_id, tv.j, sum(qtf.c * tv.v) / any_value(q.L) AS e
  FROM qtf JOIN tv ON tv.tok = qtf.tok
  JOIN qnn q ON q.query_id = qtf.query_id
  GROUP BY qtf.query_id, tv.j
),
dn AS (SELECT doc_id, sqrt(sum(e * e)) AS n FROM demb GROUP BY doc_id),
qn AS (SELECT query_id, sqrt(sum(e * e)) AS n FROM qemb GROUP BY query_id),
cos AS (
  SELECT q.query_id, d.doc_id, sum(q.e * d.e) / (dn.n * qn.n) AS sim
  FROM qemb q JOIN demb d ON d.j = q.j
  JOIN dn ON dn.doc_id = d.doc_id
  JOIN qn ON qn.query_id = q.query_id
  GROUP BY q.query_id, d.doc_id, dn.n, qn.n
)
SELECT query_id, vec_id, round(sim, 6) AS sim_r, rank FROM (
  SELECT query_id, doc_id AS vec_id, sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, doc_id
         )::INTEGER AS rank
  FROM cos
) WHERE rank <= 5
"""



_QT_PLAIN = """list_slice(regexp_extract_all(lower(qtext), '[a-z0-9]+'),
                    1, 64) AS tk"""
_SPECB_DT = """list_slice(list_concat(list_concat(['{'],
                    regexp_extract_all(lower(text), '[a-z0-9]+')), ['}']),
                    1, 64) AS tk"""
_SPECB_QT = """list_slice(list_concat(list_concat(['['],
                    regexp_extract_all(lower(qtext), '[a-z0-9]+')), [']']),
                    1, 64) AS tk"""
_DT_PLAIN = """list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'),
                    1, 64) AS tk"""
assert _DT_PLAIN in SQL_DENSE_TOP5_POLY and _QT_PLAIN in SQL_DENSE_TOP5_POLY
SQL_SPECB_TOP5_POLY = SQL_DENSE_TOP5_POLY.replace(
    _DT_PLAIN, _SPECB_DT
).replace(_QT_PLAIN, _SPECB_QT)


_DT_RIGHT = """dt AS (
  SELECT doc_id,
         list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'),
                    1, 64) AS tk
  FROM documents WHERE trim(text) <> ''
),"""
_DT_LEFT = """dt AS (
  SELECT doc_id,
         CASE WHEN len(tk0) > 64
              THEN list_slice(tk0, len(tk0) - 63, len(tk0))
              ELSE tk0 END AS tk
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS tk0
        FROM documents WHERE trim(text) <> '') t0
),"""
assert _DT_RIGHT in SQL_DENSE_TOP5_POLY, "dense poly SQL drifted"
SQL_DENSE_TOP5_POLY_LEFT = SQL_DENSE_TOP5_POLY.replace(_DT_RIGHT, _DT_LEFT)


# ---------------------------------------------------------------------------
# Faceted search (ES terms-aggregation): per query, docvalues value
# counts over the FULL match set — the aggregation surface a search UI
# drives next to top-k ranking.
# ---------------------------------------------------------------------------


def q_facet_counts(sf_dir: str):
    from webindex.search import facet_counts

    idx = ensure_index(sf_dir, "nostem")
    return facet_counts(_queries_ds(), idx, ["lang", "source"])


SQL_FACET_COUNTS = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
qterms AS (SELECT * FROM {_query_values_sql()}),
m AS (SELECT DISTINCT q.qid, tf.doc_id FROM qterms q JOIN tf ON tf.term = q.term)
SELECT qid, 'lang' AS facet, d.lang::VARCHAR AS value, count(*)::BIGINT AS cnt
FROM m JOIN documents d ON d.doc_id = m.doc_id GROUP BY qid, d.lang
UNION ALL
SELECT qid, 'source' AS facet, d.source::VARCHAR AS value, count(*)::BIGINT AS cnt
FROM m JOIN documents d ON d.doc_id = m.doc_id GROUP BY qid, d.source
"""


def q_facet_cardinality(sf_dir: str):
    """ES cardinality aggregation, EXACT: distinct count of the lang
    docvalue over each query's FULL match set (ES itself approximates
    with HLL++; exact per-shard distinct-merge here, so the SQL
    COUNT(DISTINCT) oracle hash-matches —
    webindex/search.py facet_cardinality)."""
    from webindex.search import facet_cardinality

    idx = ensure_index(sf_dir, "nostem")
    return facet_cardinality(_queries_ds(), idx, "lang")


SQL_FACET_CARDINALITY = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
qterms AS (SELECT * FROM {_query_values_sql()}),
m AS (SELECT DISTINCT q.qid, tf.doc_id FROM qterms q JOIN tf ON tf.term = q.term)
SELECT qid, count(DISTINCT d.lang)::BIGINT AS cardinality
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY qid
"""


def q_facet_cardinality_hll(sf_dir: str):
    """ES cardinality aggregation, APPROX (what ES actually runs): the
    HyperLogLog sketch path — per-shard 2^14 uint8 registers, max-merge,
    linear-counting estimate (webindex/search.py facet_cardinality
    approx=True). The sketch is deterministic (stable 64-bit value
    hash), and at contract-scale cardinalities (handful of langs,
    d << sqrt(m)) the linear-counting estimate is exactly invertible —
    m*ln(m/(m-d)) rounds to d — so the COUNT(DISTINCT) oracle
    hash-matches; at real scale the entry's semantics are the ~0.8%%
    HLL estimate (tests/test_query_lang.py gates accuracy + merge
    associativity at 50k distinct values).

    The exact-invertibility assumption is ASSERTED here (ADVICE r3): a
    register collision among a future column/scale's hash values would
    silently yield d-1 and fail the driver hash-match downstream —
    better a loud error naming the cause at the entry."""
    from webindex.search import facet_cardinality

    idx = ensure_index(sf_dir, "nostem")
    approx = facet_cardinality(
        _queries_ds(), idx, "lang", approx=True
    ).to_pandas()  # one row per query — driver-safe at any scale
    exact = facet_cardinality(_queries_ds(), idx, "lang").to_pandas()
    a = approx.sort_values("qid").reset_index(drop=True)
    e = exact.sort_values("qid").reset_index(drop=True)
    if not a["cardinality"].equals(e["cardinality"]):
        bad = a.loc[a["cardinality"] != e["cardinality"], "qid"].tolist()
        raise AssertionError(
            "facet_cardinality_hll: HLL linear-counting estimate no "
            f"longer exactly inverts the exact count for qids {bad[:5]} "
            "— a register collision at this column/scale; repoint the "
            "entry at a replayed-sketch oracle (see entry docstring)"
        )
    return approx


def q_facet_multi_terms(sf_dir: str):
    """ES multi_terms aggregation: buckets keyed by the (lang, source)
    COMPOSITE over each query's full match set; docs missing either key
    field join no bucket (ES semantics). Per-shard vectorized composite
    codes + exact Sum-merge (webindex/search.py facet_multi_terms)."""
    from webindex.search import facet_multi_terms

    idx = ensure_index(sf_dir, "nostem")
    return facet_multi_terms(_queries_ds(), idx, ["lang", "source"])


SQL_FACET_MULTI_TERMS = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
qterms AS (SELECT * FROM {_query_values_sql()}),
m AS (SELECT DISTINCT q.qid, tf.doc_id FROM qterms q JOIN tf ON tf.term = q.term)
SELECT qid, d.lang::VARCHAR AS lang, d.source::VARCHAR AS source,
       count(*)::BIGINT AS cnt
FROM m JOIN documents d ON d.doc_id = m.doc_id
WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
GROUP BY qid, d.lang, d.source
"""


RARE_MAX_DOC_COUNT = 23


def q_facet_rare_terms(sf_dir: str):
    """ES rare_terms aggregation: only source buckets whose GLOBAL
    match-set count is <= max_doc_count survive (long-tail complement of
    terms). ES documents this as approximate (CuckooFilter); exact here —
    post-merge streaming cut over facet_counts, so the SQL HAVING oracle
    hash-matches (webindex/search.py facet_rare_terms). max_doc_count=23
    keeps both branches live at sf0.01 (source counts span 21-25)."""
    from webindex.search import facet_rare_terms

    idx = ensure_index(sf_dir, "nostem")
    return facet_rare_terms(
        _queries_ds(), idx, "source", max_doc_count=RARE_MAX_DOC_COUNT
    )


SQL_FACET_RARE_TERMS = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
qterms AS (SELECT * FROM {_query_values_sql()}),
m AS (SELECT DISTINCT q.qid, tf.doc_id FROM qterms q JOIN tf ON tf.term = q.term)
SELECT qid, 'source' AS facet, d.source::VARCHAR AS value,
       count(*)::BIGINT AS cnt
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY qid, d.source
HAVING count(*) <= {{RARE_MAX_DOC_COUNT}}
""".replace("{RARE_MAX_DOC_COUNT}", str(RARE_MAX_DOC_COUNT))


HIST_INTERVAL = 100


def q_facet_histogram(sf_dir: str):
    """ES histogram aggregation: fixed-interval buckets of the n_chars
    docvalue over each query's FULL match set, min_doc_count=1 (empty
    buckets omitted) — per-shard vectorized bucket counts + exact
    Sum-merge (webindex/search.py facet_histogram)."""
    from webindex.search import facet_histogram

    idx = ensure_index(sf_dir, "nostem")
    return facet_histogram(_queries_ds(), idx, "n_chars", HIST_INTERVAL)


SQL_FACET_HISTOGRAM = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
qterms AS (SELECT * FROM {_query_values_sql()}),
m AS (SELECT DISTINCT q.qid, tf.doc_id FROM qterms q JOIN tf ON tf.term = q.term)
SELECT qid,
       CAST(floor(d.n_chars / {HIST_INTERVAL}.0) AS BIGINT)
         * {HIST_INTERVAL} AS bucket,
       count(*)::BIGINT AS cnt
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY qid, bucket
"""


TOP_HITS_K = 3


def q_top_hits_per_lang(sf_dir: str):
    """ES terms agg + top_hits sub-agg: for every lang bucket the GLOBAL
    top-3 hits by BM25, rank 1-based within the bucket — per-shard
    per-group top-k partials (proven superset, same argument as field
    collapsing) + exact merge (webindex/search.py top_hits)."""
    from webindex.search import top_hits

    idx = ensure_index(sf_dir, "nostem")
    out = top_hits(_queries_ds(), idx, "lang", per_group_k=TOP_HITS_K)
    return out.map_batches(
        lambda t: t.select(["qid", "gkey", "doc_id", "rank"]),
        batch_format="pyarrow",
    )


SQL_TOP_HITS_PER_LANG = _sql_bm25_scores() + f"""
SELECT qid, gkey, doc_id, rank FROM (
  SELECT s.qid, d.lang::VARCHAR AS gkey, s.doc_id,
         row_number() OVER (PARTITION BY s.qid, d.lang
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id
) WHERE rank <= {TOP_HITS_K}
"""


def q_facet_counts_filtered(sf_dir: str):
    """Facets compose with the bool-query constraints: AND match +
    docvalues predicate, counted over the constrained match set."""
    from webindex.search import facet_counts

    idx = ensure_index(sf_dir, "nostem")
    return facet_counts(
        _queries_ds(), idx, ["lang"], match="and",
        filter_pred=(("n_chars", ">=", 200),),
    )


SQL_FACET_COUNTS_FILTERED = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT DISTINCT doc_id, term FROM toks),
qterms AS (SELECT * FROM {_query_values_sql()}),
nq AS (SELECT qid, count(*)::BIGINT AS nt FROM qterms GROUP BY qid),
m AS (
  SELECT q.qid, tf.doc_id
  FROM qterms q JOIN tf ON tf.term = q.term JOIN nq ON nq.qid = q.qid
  GROUP BY q.qid, tf.doc_id, nq.nt
  HAVING count(*) = nt
)
SELECT m.qid, 'lang' AS facet, d.lang::VARCHAR AS value, count(*)::BIGINT AS cnt
FROM m JOIN documents d ON d.doc_id = m.doc_id
WHERE d.n_chars >= 200
GROUP BY m.qid, d.lang
"""


# ---------------------------------------------------------------------------
# Snippets (Lucene highlighter analog): best query-term-coverage token
# window per top-k hit — deterministic, so SQL-checkable end to end.
# ---------------------------------------------------------------------------

_SNIPPET_W = 8


def q_snippets_top10(sf_dir: str):
    from webindex.search import search_queries
    from webindex.snippet import snippet_runs

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8
    )
    return snippet_runs(
        runs, _docs(sf_dir), _queries_ds(), window=_SNIPPET_W, index_dir=idx
    )


SQL_SNIPPETS_TOP10 = _sql_bm25_scores() + f"""
, top AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
             AS rank
    FROM scores
  ) WHERE rank <= {TOPK}
),
dtk AS (SELECT doc_id, {_TOK_SQL} AS tk FROM documents WHERE text <> ''),
qtl AS (SELECT qid, list(DISTINCT term) AS qts FROM qterms GROUP BY qid),
wins AS (
  SELECT t.qid, t.doc_id, s.i,
         list_slice(d.tk, s.i + 1, s.i + {_SNIPPET_W}) AS win
  FROM top t JOIN dtk d USING (doc_id),
       unnest(range(greatest(len(d.tk) - {_SNIPPET_W} + 1, 1))) AS s(i)
),
cov AS (
  SELECT w.qid, w.doc_id, w.i, w.win,
         len(list_intersect(w.win, q.qts)) AS c
  FROM wins w JOIN qtl q ON q.qid = w.qid
)
SELECT qid, doc_id, array_to_string(win, ' ') AS snippet FROM (
  SELECT qid, doc_id, win,
         row_number() OVER (
           PARTITION BY qid, doc_id ORDER BY c DESC, i
         ) AS rn
  FROM cov
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# bool-query extensions: minimum_should_match + per-term boosts
# (ES bool.should/minimum_should_match and query-term ^boost syntax —
# webindex.wand.exhaustive_constrained)
# ---------------------------------------------------------------------------

MIN_MATCH = 2
BOOSTS = {"data": 2.0, "merge": 3.0, "key": 1.5}


def q_bm25_min2_top10(sf_dir: str):
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        min_match=MIN_MATCH,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_bm25_boosted_top10(sf_dir: str):
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        boosts=BOOSTS,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


_SQL_TOP10_TAIL = f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""

SQL_BM25_MIN2_TOP10 = _sql_bm25_scores(
    having=f"HAVING count(*) >= {MIN_MATCH}"
) + _SQL_TOP10_TAIL

SQL_BM25_BOOSTED_TOP10 = _sql_bm25_scores(
    boosts_values=BOOSTS
) + _SQL_TOP10_TAIL


# ---------------------------------------------------------------------------
# document lifecycle: deletes (Lucene liveDocs semantics) + compaction
# (webindex.lifecycle — the ES delete-by-id / forcemerge surface)
# ---------------------------------------------------------------------------


def _ensure_lifecycle_indexes(sf_dir: str) -> tuple[str, str]:
    """(tombstoned-copy, compacted) indexes for the pinned delete set
    ``doc_id % 7 == 0``. Built once; compaction is resumable by itself."""
    import shutil

    import pyarrow.dataset as pads

    from webindex.lifecycle import compact_index, delete_docs

    base = ensure_index(sf_dir, "nostem")
    tag = os.path.basename(os.path.normpath(sf_dir))
    live = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-del")
    comp = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-del-compacted")
    if not os.path.isdir(live):
        tmp = live + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(base, tmp)
        ids = (
            pads.dataset(os.path.join(sf_dir, "documents.parquet"))
            .to_table(columns=["doc_id"])
            .column("doc_id")
            .to_numpy()
        )
        delete_docs(tmp, ids[ids % 7 == 0])
        os.rename(tmp, live)
    compact_index(live, comp)
    return live, comp


def q_bm25_deleted_top10(sf_dir: str):
    """Top-10 over the tombstoned (NOT compacted) index: deleted docs are
    invisible but df/avgdl still count them — survivors keep their exact
    pre-delete scores (Lucene pre-merge semantics)."""
    from webindex.search import search_queries

    live, _ = _ensure_lifecycle_indexes(sf_dir)
    runs = search_queries(
        _queries_ds(), live, top_k=TOPK, concurrency=2, batch_size=8
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_bm25_compacted_top10(sf_dir: str):
    """Top-10 over the compacted index: stats recomputed — identical to an
    index built from scratch over the surviving docs."""
    from webindex.search import search_queries

    _, comp = _ensure_lifecycle_indexes(sf_dir)
    runs = search_queries(
        _queries_ds(), comp, top_k=TOPK, concurrency=2, batch_size=8
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


# tombstone semantics: scores from the FULL corpus stats, survivors only
SQL_BM25_DELETED_TOP10 = _sql_bm25_scores() + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores WHERE doc_id % 7 <> 0
) WHERE rank <= {TOPK}
"""

DBQ_TEXT = "slow"


def _ensure_dbq_index(sf_dir: str) -> str:
    """Own index copy + one _delete_by_query('slow') pass, marker-gated
    (the shared nostem cache must stay tombstone-free)."""
    from webindex.build import build_index
    from webindex.lifecycle import delete_by_query
    from webindex.pipelines.corpus import corpus_from_documents

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-dbq")
    build_index(corpus_from_documents(_docs(sf_dir)), out,
                IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=16))
    marker = os.path.join(out, "dbq.done")
    if not os.path.exists(marker):
        delete_by_query(out, DBQ_TEXT)
        with open(marker, "w") as f:
            f.write(DBQ_TEXT)
    return out


def q_bm25_dbq_top10(sf_dir: str):
    """ES _delete_by_query (webindex/lifecycle.py delete_by_query): every
    doc matching the query 'slow' tombstoned via the shard-parallel scan
    export, tombstone files written per matched block (never a
    driver-side id list); then standard BM25 over the survivors —
    liveDocs semantics, so survivor scores use the UNCOMPACTED stats and
    the oracle just excludes matching docs from the result set."""
    from webindex.search import search_queries

    idx = _ensure_dbq_index(sf_dir)
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_DBQ_TOP10 = _sql_bm25_scores() + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
  WHERE doc_id NOT IN (SELECT doc_id FROM toks WHERE term = '{DBQ_TEXT}')
) WHERE rank <= {TOPK}
"""


# compacted semantics: the surviving docs ARE the corpus
SQL_BM25_COMPACTED_TOP10 = _sql_bm25_scores(
    docs_where="AND doc_id % 7 <> 0"
) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


# ---------------------------------------------------------------------------
# multi-field best_fields (ES multi_match analog — the reference's ACTUAL
# query shape: multi_match{type: best_fields, fields:[title, txt],
# tie_breaker: 0.5}, crossencoder_beir_bm25.ipynb cell 10; SURVEY.md §3.1)
# ---------------------------------------------------------------------------


def ensure_field_indexes(sf_dir: str) -> dict:
    """Build (once, resumably) the per-field indexes for the pinned
    title/body split of the documents table (webindex.multifield)."""
    from webindex.multifield import build_field_indexes

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-mf")
    cfg = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=16)
    return build_field_indexes(_docs(sf_dir), root, cfg)


def q_mf_best_fields_top10(sf_dir: str):
    from webindex.multifield import multifield_search

    idxs = ensure_field_indexes(sf_dir)
    runs = multifield_search(
        _queries_ds(), idxs["title"], idxs["body"], top_k=TOPK,
        concurrency=2, batch_size=8,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_mf_best_fields_scores(sf_dir: str):
    """Full combined match set rounded to 6dp (no top-k boundary — robust
    to last-ulp float noise, same rationale as q_bm25_scores)."""
    from webindex.multifield import MultiFieldSearcher

    idxs = ensure_field_indexes(sf_dir)
    s = MultiFieldSearcher(idxs["title"], idxs["body"], top_k=10**9)
    rows = []
    for qid, text in DOC_QUERIES:
        ids, scores = s.search_one(qid, text)
        rows.extend(
            (qid, int(d), round(sc, 6))
            for d, sc in zip(ids.tolist(), scores.tolist())
        )
    return pd.DataFrame(rows, columns=["qid", "doc_id", "score_r"])


def _sql_mf_scores() -> str:
    """Per-field BM25 + best_fields combine. The field split is the pinned
    raw-whitespace-token rule (webindex.multifield.split_fields); slices
    past the list end are NULL in DuckDB, hence the coalesce."""

    def field_block(p: str, docs_cte: str) -> str:
        tok = f"regexp_extract_all(lower(ftext), '[a-z0-9]+')"
        return f"""
{p}toks AS (
  SELECT doc_id, t.tok AS term
  FROM {docs_cte}, unnest({tok}) AS t(tok)
),
{p}tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
          FROM {p}toks GROUP BY doc_id, term),
{p}dl AS (SELECT doc_id, len({tok})::BIGINT AS dl FROM {docs_cte}),
{p}df AS (SELECT term, count(*)::BIGINT AS df FROM {p}tf GROUP BY term),
{p}stats AS (SELECT count(*)::BIGINT AS n_docs,
                    sum(dl)::BIGINT AS total_tokens FROM {p}dl),
{p}contrib AS (
  SELECT q.qid, tf.doc_id, q.term,
    ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * (dl.dl
          / (s.total_tokens::DOUBLE / s.n_docs))))) AS c
  FROM qterms q
  JOIN {p}tf tf ON tf.term = q.term
  JOIN {p}df df ON df.term = q.term
  JOIN {p}dl dl ON dl.doc_id = tf.doc_id
  CROSS JOIN {p}stats s
),
{p}scores AS (
  SELECT qid, doc_id, list_sum(list(c ORDER BY term)) AS s
  FROM {p}contrib GROUP BY qid, doc_id
)"""

    return f"""
WITH rawtok AS (
  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\f\r]+') AS rt
  FROM documents
),
fields AS (
  SELECT doc_id,
         coalesce(array_to_string(rt[1:6], ' '), '') AS ftitle,
         coalesce(array_to_string(rt[7:], ' '), '') AS fbody
  FROM rawtok
),
tdocs AS (SELECT doc_id, ftitle AS ftext FROM fields WHERE ftitle <> ''),
bdocs AS (SELECT doc_id, fbody AS ftext FROM fields WHERE fbody <> ''),
qterms AS (SELECT * FROM {_query_values_sql()}),
{field_block("t", "tdocs")},
{field_block("b", "bdocs")},
comb AS (
  SELECT coalesce(t.qid, b.qid) AS qid,
         coalesce(t.doc_id, b.doc_id) AS doc_id,
         greatest(coalesce(t.s, 0.0), coalesce(b.s, 0.0))
           + 0.5 * least(coalesce(t.s, 0.0), coalesce(b.s, 0.0)) AS score
  FROM tscores t
  FULL OUTER JOIN bscores b ON t.qid = b.qid AND t.doc_id = b.doc_id
)
"""


SQL_MF_TOP10 = _sql_mf_scores() + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM comb
) WHERE rank <= {TOPK}
"""

SQL_MF_SCORES = _sql_mf_scores() + """
SELECT qid, doc_id, round(score, 6) AS score_r FROM comb
"""


def q_mf_combined_top10(sf_dir: str):
    """ES combined_fields (BM25F-style): ONE BM25 over weighted per-field
    term/length statistics with union df (webindex.multifield)."""
    from webindex.multifield import multifield_search

    idxs = ensure_field_indexes(sf_dir)
    runs = multifield_search(
        _queries_ds(), idxs["title"], idxs["body"], top_k=TOPK,
        concurrency=2, batch_size=8, combine="combined_fields",
        combined_dict_dir=idxs["combined_dict"],
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _sql_mf_combined(wt: float = 2.0, wb: float = 1.0) -> str:
    tok = "regexp_extract_all(lower(ftext), '[a-z0-9]+')"
    return f"""
WITH rawtok AS (
  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\f\r]+') AS rt
  FROM documents
),
fields AS (
  SELECT doc_id,
         coalesce(array_to_string(rt[1:6], ' '), '') AS ftitle,
         coalesce(array_to_string(rt[7:], ' '), '') AS fbody
  FROM rawtok
),
tdocs AS (SELECT doc_id, ftitle AS ftext FROM fields WHERE ftitle <> ''),
bdocs AS (SELECT doc_id, fbody AS ftext FROM fields WHERE fbody <> ''),
qterms AS (SELECT * FROM {_query_values_sql()}),
ttf AS (SELECT doc_id, t.tok AS term, count(*)::BIGINT AS tf
        FROM tdocs, unnest({tok}) AS t(tok) GROUP BY doc_id, t.tok),
btf AS (SELECT doc_id, t.tok AS term, count(*)::BIGINT AS tf
        FROM bdocs, unnest({tok}) AS t(tok) GROUP BY doc_id, t.tok),
tdl AS (SELECT doc_id, len({tok})::BIGINT AS dl FROM tdocs),
bdl AS (SELECT doc_id, len({tok})::BIGINT AS dl FROM bdocs),
cdl AS (SELECT t.doc_id, {wt!r} * t.dl + {wb!r} * coalesce(b.dl, 0) AS dl
        FROM tdl t LEFT JOIN bdl b USING (doc_id)),
cstats AS (SELECT (SELECT count(*) FROM tdl)::BIGINT AS n_docs,
                  ({wt!r} * (SELECT sum(dl) FROM tdl)
                   + {wb!r} * (SELECT sum(dl) FROM bdl))
                  / (SELECT count(*) FROM tdl) AS avgdl),
ctf AS (
  SELECT doc_id, term,
         {wt!r} * coalesce(t.tf, 0) + {wb!r} * coalesce(b.tf, 0) AS tf
  FROM ttf t FULL OUTER JOIN btf b USING (doc_id, term)
),
cdf AS (SELECT term, count(*)::BIGINT AS df FROM ctf GROUP BY term),
contrib AS (
  SELECT q.qid, tf.doc_id, q.term,
    ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * (dl.dl / s.avgdl)))) AS c
  FROM qterms q
  JOIN ctf tf ON tf.term = q.term
  JOIN cdf df ON df.term = q.term
  JOIN cdl dl ON dl.doc_id = tf.doc_id
  CROSS JOIN cstats s
),
scores AS (
  SELECT qid, doc_id, list_sum(list(c ORDER BY term)) AS score
  FROM contrib GROUP BY qid, doc_id
)
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


SQL_MF_COMBINED_TOP10 = _sql_mf_combined()


# ---------------------------------------------------------------------------
# dictionary-driven query operators (webindex.lexicon) + exact heavy hitters
# (webindex.sketch) — ES completion-suggester / fuzzy / MLT / _explain
# analogs and the certified two-pass top-terms, each vs a DuckDB oracle
# ---------------------------------------------------------------------------

SUGGEST_PREFIXES = ["ba", "c", "gr", "s", "zz"]
SUGGEST_K = 5


def q_suggest(sf_dir: str):
    """ES completion-suggester analog: top-k dictionary completions per
    prefix by (df desc, term asc), from a distributed dict-sidecar scan
    (webindex/lexicon.py suggest)."""
    from webindex.lexicon import suggest

    idx = ensure_index(sf_dir, "nostem")
    return suggest(idx, SUGGEST_PREFIXES, k=SUGGEST_K)


def _prefix_values_sql() -> str:
    rows = ", ".join(f"('{p}')" for p in SUGGEST_PREFIXES)
    return f"(VALUES {rows}) AS p(prefix)"


SQL_SUGGEST = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (SELECT DISTINCT doc_id, t.tok AS term
         FROM docs, unnest({_TOK_SQL}) AS t(tok)),
dft AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
pref AS (SELECT * FROM {_prefix_values_sql()})
SELECT prefix, term, df, rank FROM (
  SELECT p.prefix, d.term, d.df,
         row_number() OVER (PARTITION BY p.prefix
                            ORDER BY d.df DESC, d.term)::INTEGER AS rank
  FROM pref p JOIN dft d ON starts_with(d.term, p.prefix)
) WHERE rank <= {SUGGEST_K}
"""


FUZZY_QUERIES: list[tuple[str, str]] = [
    ("f1", "mergge"),
    ("f2", "windoww strean"),
    ("f3", "batsh"),
    ("f4", "custmer ordr"),
]
FUZZY_TOPK = 10
FUZZY_MAX_EDITS = 1
FUZZY_PREFIX_LEN = 1


def q_fuzzy_top10(sf_dir: str):
    """ES fuzzy query (Lucene FuzzyQuery rewrite): expand each analyzed
    query term to the highest-df dictionary terms within Levenshtein 1
    (first char pinned), BM25-score the expansion union — each expansion
    with its OWN idf (webindex/lexicon.py fuzzy_search)."""
    from webindex.lexicon import fuzzy_search

    idx = ensure_index(sf_dir, "nostem")
    runs = fuzzy_search(
        FUZZY_QUERIES, idx, top_k=FUZZY_TOPK, max_edits=FUZZY_MAX_EDITS,
        max_expansions=50, prefix_len=FUZZY_PREFIX_LEN,
        concurrency=2, batch_size=8,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _fuzzy_qterm_values_sql() -> str:
    # one row per analyzed (qid, qterm) — mirrors fuzzy_search's analyze
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, text in FUZZY_QUERIES
        for t in sorted(set(_sql_an.tokens(text)))
    )
    return f"(VALUES {rows}) AS v(qid, qterm)"


# the expansion subquery runs INSIDE _sql_bm25_scores' qterms CTE, where
# the df CTE is already defined; LATERAL reproduces Lucene's per-term
# top-`max_expansions` rewrite by (df desc, term asc), DISTINCT the union
_FUZZY_EXPAND_SQL = f"""(
  SELECT DISTINCT v.qid, e.term
  FROM {_fuzzy_qterm_values_sql()},
  LATERAL (
    SELECT term FROM df
    WHERE levenshtein(term, v.qterm) <= {FUZZY_MAX_EDITS}
      AND substr(term, 1, {FUZZY_PREFIX_LEN})
          = substr(v.qterm, 1, {FUZZY_PREFIX_LEN})
    ORDER BY df DESC, term LIMIT 50
  ) e
) AS fz(qid, term)"""

SQL_FUZZY_TOP10 = _sql_bm25_scores(_FUZZY_EXPAND_SQL) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {FUZZY_TOPK}
"""


MLT_SEEDS = [3, 17, 29, 42]
MLT_TOPK = 5
MLT_MAX_TERMS = 25


def q_mlt_top5(sf_dir: str):
    """ES more_like_this: per seed doc, rank its terms by tf*idf, keep the
    top 25, BM25-score them as a disjunctive query, exclude the seed
    (self-hit anti-join) — webindex/lexicon.py more_like_this."""
    from webindex.lexicon import more_like_this

    idx = ensure_index(sf_dir, "nostem")
    seed_ids = pa.array(MLT_SEEDS, pa.int64())
    seeds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.is_in(t.column("doc_id"), seed_ids)),
        batch_format="pyarrow",
    )
    runs = more_like_this(
        seeds, idx, top_k=MLT_TOPK, max_query_terms=MLT_MAX_TERMS,
        concurrency=2, batch_size=8,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


# MLT term selection in SQL: the seed's tf rows joined to global df/stats,
# ranked by (tf*idf desc, term asc) — the same float64 expression the
# engine's MltTermSelect computes — then the standard scores CTE, seed
# excluded before ranking (top-k of all-minus-seed == engine's k+1 + drop)
_MLT_QTERMS_SQL = f"""(
  SELECT CAST(m.seed AS VARCHAR) AS qid, m.term
  FROM (
    SELECT s.doc_id AS seed, tf.term,
           row_number() OVER (
             PARTITION BY s.doc_id
             ORDER BY ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
                        * tf.tf DESC,
                      tf.term
           ) AS rn
    FROM (VALUES {", ".join(f"({d})" for d in MLT_SEEDS)}) s(doc_id)
    JOIN tf ON tf.doc_id = s.doc_id
    JOIN df ON df.term = tf.term
    CROSS JOIN stats st
  ) m WHERE m.rn <= {MLT_MAX_TERMS}
) AS mq(qid, term)"""

SQL_MLT_TOP5 = _sql_bm25_scores(_MLT_QTERMS_SQL) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
  WHERE doc_id <> CAST(qid AS BIGINT)
) WHERE rank <= {MLT_TOPK}
"""


def q_explain_top3(sf_dir: str):
    """ES _explain analog: per query's top-3 docs, one row per contributing
    term with the exact quantities the ranking summed (tf, dl, df, contrib
    rounded 6dp) — webindex/lexicon.py explain_scores."""
    from webindex.lexicon import explain_scores

    idx = ensure_index(sf_dir, "nostem")
    out = explain_scores(DOC_QUERIES, idx, top_k=3)
    out["contrib_r"] = out["contrib"].round(6)
    return out.drop(columns=["contrib"])


SQL_EXPLAIN_TOP3 = _sql_bm25_scores() + """
, top3 AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id) AS rnk
    FROM scores
  ) WHERE rnk <= 3
)
SELECT c.qid, c.doc_id, c.term, c.tf, c.dl, c.df, round(c.c, 6) AS contrib_r
FROM contrib c JOIN top3 USING (qid, doc_id)
"""


def q_bm25_page2(sf_dir: str):
    """ES search_after (stateless deep pagination): page 1 = BM25 top-10;
    the cursor (score, doc_id of each query's rank-10 row) feeds
    ``search_one_after``, which returns the next 10 results STRICTLY
    after the cursor in the total order (score desc, docID asc). The SQL
    oracle is global ranks 11..20 renumbered — equal because the order is
    strict (docID tiebreak) and the cursor is the engine's own rank-10
    row."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs1 = search_queries(
        _queries_ds(), idx, top_k=TOPK, mode="auto", concurrency=2,
        batch_size=8,
    ).to_pandas()
    last = runs1[runs1["rank"] == TOPK].sort_values("qid")
    texts = dict(DOC_QUERIES)
    import ray.data as rd

    q2 = rd.from_arrow(
        pa.table(
            {
                "qid": pa.array(list(last["qid"]), pa.string()),
                "text": pa.array(
                    [texts[q] for q in last["qid"]], pa.string()
                ),
                "after_score": pa.array(
                    last["score"].to_numpy(np.float64), pa.float64()
                ),
                "after_doc": pa.array(
                    last["doc_id"].to_numpy(np.int64), pa.int64()
                ),
            }
        )
    )
    runs2 = search_queries(
        q2, idx, top_k=TOPK, mode="auto", concurrency=2, batch_size=8
    )
    return runs2.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_PAGE2 = _sql_bm25_scores() + f"""
SELECT qid, doc_id, (rank - {TOPK})::INTEGER AS rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rank
  FROM scores
) WHERE rank > {TOPK} AND rank <= {2 * TOPK}
"""


def q_termvectors(sf_dir: str):
    """ES _termvectors with term_statistics: per (doc, term) of the seed
    docs, (tf, dl, df) — tf/dl from the analyzer, global df from the
    index dictionary (webindex/lexicon.py TermVectorStage actor pool)."""
    from webindex.lexicon import term_vectors

    idx = ensure_index(sf_dir, "nostem")
    seed_ids = pa.array(MLT_SEEDS, pa.int64())
    seeds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.is_in(t.column("doc_id"), seed_ids)),
        batch_format="pyarrow",
    )
    return term_vectors(seeds, idx, concurrency=2)


SQL_TERMVECTORS = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, len({_TOK_SQL})::BIGINT AS dl FROM docs),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT tf.doc_id, tf.term, tf.tf, dl.dl, dft.df
FROM tf
JOIN dl ON dl.doc_id = tf.doc_id
JOIN dft ON dft.term = tf.term
WHERE tf.doc_id IN ({", ".join(str(d) for d in MLT_SEEDS)})
"""


def q_facet_stats(sf_dir: str):
    """ES stats aggregation: (count, sum, min, max, avg) of n_chars over
    each query's FULL match set — per-shard exact int64 partials +
    Sum/Min/Max merge, mean as one float division of exact integers
    (webindex/search.py facet_stats)."""
    from webindex.search import facet_stats

    idx = ensure_index(sf_dir, "nostem")
    return facet_stats(_queries_ds(), idx, "n_chars")


SQL_FACET_STATS = f"""
WITH docs AS (SELECT doc_id, text, n_chars FROM documents
              WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qt AS (SELECT * FROM {_query_values_sql()}),
hits AS (
  SELECT DISTINCT qt.qid, tk.doc_id
  FROM qt JOIN toks tk ON tk.term = qt.term
)
SELECT h.qid,
       count(*)::BIGINT AS count,
       sum(d.n_chars)::BIGINT AS sum,
       min(d.n_chars)::BIGINT AS min,
       max(d.n_chars)::BIGINT AS max,
       sum(d.n_chars)::BIGINT / count(*)::BIGINT AS avg
FROM hits h JOIN docs d ON d.doc_id = h.doc_id
GROUP BY h.qid
"""


# the shared hits CTE of the stats-family oracles (OR match set per qid)
_SQL_HITS_CTE = f"""
WITH docs AS (SELECT doc_id, text, lang, n_chars FROM documents
              WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qt AS (SELECT * FROM {_query_values_sql()}),
hits AS (
  SELECT DISTINCT qt.qid, tk.doc_id
  FROM qt JOIN toks tk ON tk.term = qt.term
)
"""


def q_facet_ext_stats(sf_dir: str):
    """ES extended_stats aggregation: stats + sum_of_squares, population
    variance and std of n_chars over each query's match set — int64
    partials, float tail pinned op for op to the SQL (variance =
    sum_sq/n − (sum/n)², GREATEST 0.0, sqrt correctly rounded)."""
    from webindex.search import facet_extended_stats

    idx = ensure_index(sf_dir, "nostem")
    return facet_extended_stats(_queries_ds(), idx, "n_chars")


SQL_FACET_EXT_STATS = _SQL_HITS_CTE + """
, agg AS (
  SELECT h.qid,
         count(*)::BIGINT AS count,
         sum(d.n_chars)::BIGINT AS sum,
         min(d.n_chars)::BIGINT AS min,
         max(d.n_chars)::BIGINT AS max,
         sum(d.n_chars * d.n_chars)::BIGINT AS sum_sq
  FROM hits h JOIN docs d ON d.doc_id = h.doc_id
  GROUP BY h.qid
)
SELECT qid, count, sum, min, max, sum_sq,
       sum / count AS avg,
       greatest(sum_sq / count - (sum / count) * (sum / count), 0.0)
         AS variance,
       sqrt(greatest(sum_sq / count - (sum / count) * (sum / count), 0.0))
         AS std
FROM agg
"""


def q_facet_weighted_avg(sf_dir: str):
    """ES weighted_avg aggregation: n_chars weighted by document token
    length over each query's match set — exact int64 Σ(v·dl)/Σ(dl)
    partials per shard, Sum-merge, ONE float division
    (webindex/search.py facet_weighted_avg)."""
    from webindex.search import facet_weighted_avg

    idx = ensure_index(sf_dir, "nostem")
    return facet_weighted_avg(_queries_ds(), idx, "n_chars")


SQL_FACET_WEIGHTED_AVG = _SQL_HITS_CTE + f"""
, dl AS (SELECT doc_id, len({_TOK_SQL})::BIGINT AS dl FROM docs)
SELECT h.qid,
       sum(d.n_chars * dl.dl)::BIGINT AS sum_vw,
       sum(dl.dl)::BIGINT AS sum_w,
       sum(d.n_chars * dl.dl)::BIGINT / sum(dl.dl)::BIGINT AS weighted_avg
FROM hits h
JOIN docs d ON d.doc_id = h.doc_id
JOIN dl ON dl.doc_id = h.doc_id
GROUP BY h.qid
"""


PCT_RANK_VALUES = [150, 306, 450]


def q_facet_pct_ranks(sf_dir: str):
    """ES percentile_ranks aggregation, EXACT: per probe value, the
    percentage of each query's matches with n_chars <= value — the
    facet_percentiles inverse; float tail pinned (100.0·cnt)/total."""
    from webindex.search import facet_percentile_ranks

    idx = ensure_index(sf_dir, "nostem")
    return facet_percentile_ranks(
        _queries_ds(), idx, "n_chars", PCT_RANK_VALUES
    )


SQL_FACET_PCT_RANKS = _SQL_HITS_CTE + f"""
, probes AS (SELECT * FROM (VALUES {", ".join(f"({v})" for v in PCT_RANK_VALUES)}) p(value))
SELECT h.qid, p.value::BIGINT AS value,
       (100.0 * count(*) FILTER (d.n_chars <= p.value)) / count(*) AS pct
FROM hits h
JOIN docs d ON d.doc_id = h.doc_id
CROSS JOIN probes p
GROUP BY h.qid, p.value
"""


def q_facet_boxplot(sf_dir: str):
    """ES boxplot aggregation, EXACT (ES approximates with t-digest):
    min/q1/q2/q3/max of n_chars over each query's match set — quartiles
    by the nearest-rank rule (ceil(p·n/100), the facet_percentiles rule)
    off the per-(qid, value) histogram partials (webindex/search.py
    facet_boxplot)."""
    from webindex.search import facet_boxplot

    idx = ensure_index(sf_dir, "nostem")
    return facet_boxplot(_queries_ds(), idx, "n_chars")


SQL_FACET_BOXPLOT = _SQL_HITS_CTE + """
SELECT h.qid,
       min(d.n_chars)::BIGINT AS min,
       list(d.n_chars ORDER BY d.n_chars)
           [CAST(ceil(count(*) * 25.0 / 100) AS BIGINT)]::BIGINT AS q1,
       list(d.n_chars ORDER BY d.n_chars)
           [CAST(ceil(count(*) * 50.0 / 100) AS BIGINT)]::BIGINT AS q2,
       list(d.n_chars ORDER BY d.n_chars)
           [CAST(ceil(count(*) * 75.0 / 100) AS BIGINT)]::BIGINT AS q3,
       max(d.n_chars)::BIGINT AS max
FROM hits h JOIN docs d ON d.doc_id = h.doc_id
GROUP BY h.qid
"""


def q_facet_mad(sf_dir: str):
    """ES median_absolute_deviation aggregation, EXACT: nearest-rank
    median of n_chars over the match set, then nearest-rank median of
    |v − median| — two exact histogram passes, pass-one medians
    broadcast via ray.put (webindex/search.py facet_mad)."""
    from webindex.search import facet_mad

    idx = ensure_index(sf_dir, "nostem")
    return facet_mad(_queries_ds(), idx, "n_chars")


SQL_FACET_MAD = _SQL_HITS_CTE + """
, vals AS (
  SELECT h.qid, d.n_chars AS v
  FROM hits h JOIN docs d ON d.doc_id = h.doc_id
),
med AS (
  SELECT qid,
         list(v ORDER BY v)
             [CAST(ceil(count(*) * 50.0 / 100) AS BIGINT)]::BIGINT
             AS median
  FROM vals GROUP BY qid
)
SELECT m.qid, m.median,
       list(abs(v.v - m.median) ORDER BY abs(v.v - m.median))
           [CAST(ceil(count(*) * 50.0 / 100) AS BIGINT)]::BIGINT AS mad
FROM vals v JOIN med m ON v.qid = m.qid
GROUP BY m.qid, m.median
"""


# the two t_test buckets (ascending names: a_en < b_fr)
TTEST_BUCKETS = {
    "a_en": (("lang", "==", "en"),),
    "b_fr": (("lang", "==", "fr"),),
}


def q_facet_t_test(sf_dir: str):
    """ES t_test aggregation (Welch, ES's heteroscedastic default) of
    n_chars between the en and fr lang buckets over each query's match
    set — exact int64 (n, Σv, Σv²) partials per (qid, side), float tail
    pinned op for op to the SQL (webindex/search.py facet_t_test)."""
    from webindex.search import facet_t_test

    idx = ensure_index(sf_dir, "nostem")
    return facet_t_test(_queries_ds(), idx, "n_chars", TTEST_BUCKETS)


SQL_FACET_TTEST = _SQL_HITS_CTE + """
, vals AS (
  SELECT h.qid, d.n_chars AS v, d.lang
  FROM hits h JOIN docs d ON d.doc_id = h.doc_id
),
sides AS (
  SELECT qid,
         count(*) FILTER (lang = 'en')::BIGINT AS na,
         sum(v)   FILTER (lang = 'en')::BIGINT AS sa,
         sum(v*v) FILTER (lang = 'en')::BIGINT AS qa,
         count(*) FILTER (lang = 'fr')::BIGINT AS nb,
         sum(v)   FILTER (lang = 'fr')::BIGINT AS sb,
         sum(v*v) FILTER (lang = 'fr')::BIGINT AS qb
  FROM vals GROUP BY qid
),
-- float tail pinned op for op to facet_t_test: m = Σv/n; e = Σv²/n;
-- var = greatest(0, e − m·m) · (n/(n−1)); t = (ma−mb)/sqrt(va/na+vb/nb)
tail AS (
  SELECT qid, na, nb,
         sa / na AS mean_a,
         sb / nb AS mean_b,
         greatest(0.0, qa / na - (sa / na) * (sa / na)) * (na / (na - 1))
             AS va,
         greatest(0.0, qb / nb - (sb / nb) * (sb / nb)) * (nb / (nb - 1))
             AS vb
  FROM sides WHERE na >= 2 AND nb >= 2
)
SELECT qid, na AS n_a, nb AS n_b, mean_a, mean_b,
       (mean_a - mean_b) / sqrt(va / na + vb / nb) AS t
FROM tail WHERE va / na + vb / nb > 0.0
"""


def q_facet_matrix_stats(sf_dir: str):
    """ES matrix_stats aggregation between n_chars (x) and document
    token length dl (y) over each query's match set — exact int64
    moment partials (n, Σx, Σy, Σx², Σy², Σxy), population variances /
    covariance / Pearson correlation with the float tail pinned op for
    op to the SQL (webindex/search.py facet_matrix_stats)."""
    from webindex.search import facet_matrix_stats

    idx = ensure_index(sf_dir, "nostem")
    return facet_matrix_stats(_queries_ds(), idx, "n_chars")


SQL_FACET_MATRIX = _SQL_HITS_CTE + f"""
, dl AS (SELECT doc_id, len({_TOK_SQL})::BIGINT AS dl FROM docs),
moms AS (
  SELECT h.qid,
         count(*)::BIGINT AS n,
         sum(d.n_chars)::BIGINT AS sx,
         sum(dl.dl)::BIGINT AS sy,
         sum(d.n_chars * d.n_chars)::BIGINT AS sxx,
         sum(dl.dl * dl.dl)::BIGINT AS syy,
         sum(d.n_chars * dl.dl)::BIGINT AS sxy
  FROM hits h
  JOIN docs d ON d.doc_id = h.doc_id
  JOIN dl ON dl.doc_id = h.doc_id
  GROUP BY h.qid
),
tail AS (
  SELECT qid, n,
         sx / n AS mean_x,
         sy / n AS mean_y,
         greatest(0.0, sxx / n - (sx / n) * (sx / n)) AS var_x,
         greatest(0.0, syy / n - (sy / n) * (sy / n)) AS var_y,
         sxy / n - (sx / n) * (sy / n) AS covariance
  FROM moms WHERE n > 0
)
SELECT qid, n, mean_x, mean_y, var_x, var_y, covariance,
       covariance / (sqrt(var_x) * sqrt(var_y)) AS correlation
FROM tail WHERE var_x > 0.0 AND var_y > 0.0
"""


# named predicates shared by the filters / adjacency_matrix entries
# (ascending-name pair keys: big < en < web)
AGG_FILTERS = {
    "en": (("lang", "==", "en"),),
    "big": (("n_chars", ">=", 306),),
    "web": (("source", "in", ("src1", "src2", "src3")),),
}
_F_EN = "d.lang = 'en'"
_F_BIG = "d.n_chars >= 306"
_F_WEB = "d.source IN ('src1', 'src2', 'src3')"

# hits CTE variant carrying the source docvalue (the shared one doesn't)
_SQL_HITS_SRC_CTE = f"""
WITH docs AS (SELECT doc_id, text, lang, source, n_chars FROM documents
              WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qt AS (SELECT * FROM {_query_values_sql()}),
hits AS (
  SELECT DISTINCT qt.qid, tk.doc_id
  FROM qt JOIN toks tk ON tk.term = qt.term
)
"""


def q_facet_filters(sf_dir: str):
    """ES filters aggregation: per NAMED docvalues predicate, how many of
    each query's matches satisfy it; all named buckets returned, zeros
    included (the caller-fixed bucket set, unlike terms/range)."""
    from webindex.search import facet_filters

    idx = ensure_index(sf_dir, "nostem")
    return facet_filters(_queries_ds(), idx, AGG_FILTERS)


SQL_FACET_FILTERS = _SQL_HITS_SRC_CTE + f"""
, c AS (
  SELECT h.qid,
         count(*) FILTER ({_F_EN})::BIGINT AS en,
         count(*) FILTER ({_F_BIG})::BIGINT AS big,
         count(*) FILTER ({_F_WEB})::BIGINT AS web
  FROM hits h JOIN docs d ON d.doc_id = h.doc_id
  GROUP BY h.qid
)
SELECT q.qid, f.filter,
       coalesce(CASE f.filter WHEN 'en' THEN c.en WHEN 'big' THEN c.big
                ELSE c.web END, 0)::BIGINT AS cnt
FROM (SELECT DISTINCT qid FROM qt) q
CROSS JOIN (VALUES ('en'), ('big'), ('web')) f(filter)
LEFT JOIN c ON c.qid = q.qid
"""


def q_adjacency_matrix(sf_dir: str):
    """ES adjacency_matrix aggregation: counts for every named predicate
    and every pairwise intersection ("a&b", ascending names) over each
    query's match set; empty buckets omitted."""
    from webindex.search import adjacency_matrix

    idx = ensure_index(sf_dir, "nostem")
    return adjacency_matrix(_queries_ds(), idx, AGG_FILTERS)


SQL_ADJACENCY_MATRIX = _SQL_HITS_SRC_CTE + f"""
, c AS (
  SELECT h.qid,
         count(*) FILTER ({_F_EN})::BIGINT AS en,
         count(*) FILTER ({_F_BIG})::BIGINT AS big,
         count(*) FILTER ({_F_WEB})::BIGINT AS web,
         count(*) FILTER ({_F_BIG} AND {_F_EN})::BIGINT AS big_en,
         count(*) FILTER ({_F_BIG} AND {_F_WEB})::BIGINT AS big_web,
         count(*) FILTER ({_F_EN} AND {_F_WEB})::BIGINT AS en_web
  FROM hits h JOIN docs d ON d.doc_id = h.doc_id
  GROUP BY h.qid
)
SELECT qid, key, cnt FROM (
  SELECT qid, 'en' AS key, en AS cnt FROM c
  UNION ALL SELECT qid, 'big', big FROM c
  UNION ALL SELECT qid, 'web', web FROM c
  UNION ALL SELECT qid, 'big&en', big_en FROM c
  UNION ALL SELECT qid, 'big&web', big_web FROM c
  UNION ALL SELECT qid, 'en&web', en_web FROM c
) WHERE cnt > 0
"""


def q_events_bucket_stats(sf_dir: str):
    """ES *_bucket sibling pipeline aggregations (stats_bucket =
    avg/min/max/sum/count_bucket in one) over the monthly date_histogram:
    the histogram is the distributed combiner/final pass
    (events_pipeline_aggs machinery); the bucket-array reduction runs on
    bucket-count-sized data exactly where ES runs it (coordinating
    node). avg_bucket is one int/int IEEE division."""
    import ray.data as rd

    from webindex.relational import hash_partitioned_groupby

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts"],
        override_num_blocks=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(month=df["ts"].values.astype("datetime64[M]"))
        return (
            df.groupby(["event_type", "month"], sort=False)
            .size().rename("n_p").reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["event_type", "month"], sort=False)["n_p"]
            .sum().rename("n_events").reset_index()
        )

    hist = hash_partitioned_groupby(
        ds, ["event_type", "month"], partial, final
    ).to_pandas()

    rows = []
    for et, g in hist.groupby("event_type", sort=False):
        n = g["n_events"].to_numpy(np.int64)
        rows.append({
            "event_type": et,
            "n_buckets": int(n.size),
            "sum_bucket": int(n.sum()),
            "min_bucket": int(n.min()),
            "max_bucket": int(n.max()),
            "avg_bucket": n.sum() / n.size,
        })
    return pd.DataFrame(rows)


SQL_EVENTS_BUCKET_STATS = """
WITH m AS (
  SELECT event_type, date_trunc('month', ts) AS month,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, date_trunc('month', ts)
)
SELECT event_type,
       count(*)::BIGINT AS n_buckets,
       sum(n)::BIGINT AS sum_bucket,
       min(n)::BIGINT AS min_bucket,
       max(n)::BIGINT AS max_bucket,
       sum(n)::BIGINT / count(*)::BIGINT AS avg_bucket
FROM m GROUP BY event_type
"""


FACET_RANGES: list[tuple[int | None, int | None]] = [
    (None, 250), (250, 400), (400, None), (200, 450),  # overlapping OK
]


def q_facet_range(sf_dir: str):
    """ES range aggregation: explicit [from, to) buckets (open ends,
    overlaps allowed) of n_chars per query match set, min_doc_count=1;
    string bucket labels so the hash surface is engine-portable."""
    from webindex.search import facet_range

    idx = ensure_index(sf_dir, "nostem")
    return facet_range(_queries_ds(), idx, "n_chars", FACET_RANGES)


def _ranges_values_sql() -> str:
    rows = ", ".join(
        "('{}_{}', {}, {})".format(
            "*" if lo is None else lo, "*" if hi is None else hi,
            "NULL" if lo is None else lo, "NULL" if hi is None else hi,
        )
        for lo, hi in FACET_RANGES
    )
    return f"(VALUES {rows}) AS r(label, lo, hi)"


SQL_FACET_RANGE = _SQL_HITS_CTE + f"""
SELECT h.qid, r.label AS "range", count(*)::BIGINT AS cnt
FROM hits h
JOIN docs d ON d.doc_id = h.doc_id
JOIN {_ranges_values_sql()}
  ON (r.lo IS NULL OR d.n_chars >= r.lo)
 AND (r.hi IS NULL OR d.n_chars < r.hi)
GROUP BY h.qid, r.label
"""


def q_stats_by_lang(sf_dir: str):
    """ES terms aggregation with a stats SUB-aggregation: per (query,
    lang bucket) exact count/sum/min/max/avg of n_chars over the match
    set — per-shard int64 reduceat kernels, Sum/Min/Max merge by
    (qid, value), one final division (webindex/search.py
    facet_stats_by)."""
    from webindex.search import facet_stats_by

    idx = ensure_index(sf_dir, "nostem")
    return facet_stats_by(_queries_ds(), idx, "lang", "n_chars")


SQL_STATS_BY_LANG = _SQL_HITS_CTE + """
SELECT h.qid, d.lang AS value,
       count(*)::BIGINT AS count,
       sum(d.n_chars)::BIGINT AS sum,
       min(d.n_chars)::BIGINT AS min,
       max(d.n_chars)::BIGINT AS max,
       sum(d.n_chars)::BIGINT / count(*)::BIGINT AS avg
FROM hits h JOIN docs d ON d.doc_id = h.doc_id
GROUP BY h.qid, d.lang
"""


COMPOSITE_SIZE = 5
COMPOSITE_AFTER = 150


def q_composite_page(sf_dir: str):
    """ES composite aggregation pagination: the first 5 distinct n_chars
    buckets strictly after the value-150 cursor, ascending, with exact
    doc counts — per-shard size-smallest distinct partials (proven
    superset) + Sum merge + exact ascending cut (webindex/search.py
    composite_buckets)."""
    from webindex.search import composite_buckets

    idx = ensure_index(sf_dir, "nostem")
    return composite_buckets(
        _queries_ds(), idx, "n_chars",
        size=COMPOSITE_SIZE, after=COMPOSITE_AFTER,
    )


SQL_COMPOSITE_PAGE = _SQL_HITS_CTE + f"""
SELECT qid, value, cnt FROM (
  SELECT h.qid, d.n_chars AS value, count(*)::BIGINT AS cnt,
         row_number() OVER (PARTITION BY h.qid
                            ORDER BY d.n_chars) AS rn
  FROM hits h JOIN docs d ON d.doc_id = h.doc_id
  WHERE d.n_chars > {COMPOSITE_AFTER}
  GROUP BY h.qid, d.n_chars
) WHERE rn <= {COMPOSITE_SIZE}
"""


PREFIX_QUERIES: list[tuple[str, str]] = [
    ("x1", "mer so"),
    ("x2", "wind str"),
    ("x3", "cust"),
]
REGEX_QUERIES: list[tuple[str, str]] = [
    ("r1", "m.rge s.an"),
    ("r2", "[bh]atch"),
    ("r3", "c.*er"),
]


def q_prefix_top10(sf_dir: str):
    """ES prefix query (Lucene top-terms rewrite): every prefix expands
    to the highest-df dictionary completions, scored disjunctively with
    each expansion's own idf (webindex/lexicon.py prefix_search)."""
    from webindex.lexicon import prefix_search

    idx = ensure_index(sf_dir, "nostem")
    runs = prefix_search(
        PREFIX_QUERIES, idx, top_k=TOPK, max_expansions=50,
        concurrency=2, batch_size=8,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _prefix_pat_values_sql(queries) -> str:
    rows = ", ".join(
        f"('{qid}', '{p}')" for qid, q in queries for p in sorted(q.split())
    )
    return f"(VALUES {rows}) AS v(qid, pat)"


_PREFIX_EXPAND_SQL = f"""(
  SELECT DISTINCT v.qid, e.term
  FROM {_prefix_pat_values_sql(PREFIX_QUERIES)},
  LATERAL (
    SELECT term FROM df WHERE starts_with(term, v.pat)
    ORDER BY df DESC, term LIMIT 50
  ) e
) AS pz(qid, term)"""

SQL_PREFIX_TOP10 = _sql_bm25_scores(_PREFIX_EXPAND_SQL) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


def q_regexp_top10(sf_dir: str):
    """ES regexp query: anchored whole-term regex expansion over the
    dictionary, disjunction scored with per-expansion idf
    (webindex/lexicon.py regexp_search; the oracle reproduces the
    anchored semantics with regexp_full_match)."""
    from webindex.lexicon import regexp_search

    idx = ensure_index(sf_dir, "nostem")
    runs = regexp_search(
        REGEX_QUERIES, idx, top_k=TOPK, max_expansions=50,
        concurrency=2, batch_size=8,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


_REGEX_EXPAND_SQL = f"""(
  SELECT DISTINCT v.qid, e.term
  FROM {_prefix_pat_values_sql(REGEX_QUERIES)},
  LATERAL (
    SELECT term FROM df WHERE regexp_full_match(term, v.pat)
    ORDER BY df DESC, term LIMIT 50
  ) e
) AS rz(qid, term)"""

SQL_REGEXP_TOP10 = _sql_bm25_scores(_REGEX_EXPAND_SQL) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


WILDCARD_QUERIES: list[tuple[str, str]] = [
    ("w1", "mer* s?an"),
    ("w2", "*dow"),
    ("w3", "cust*er b?tch"),
]


def q_wildcard_top10(sf_dir: str):
    """ES wildcard query: * / ? patterns translate onto the anchored
    regexp rewrite (webindex/lexicon.py wildcard_search); the oracle
    performs the identical translation inline (.* / . / escaped
    literals) via regexp_full_match."""
    from webindex.lexicon import wildcard_search

    idx = ensure_index(sf_dir, "nostem")
    runs = wildcard_search(
        WILDCARD_QUERIES, idx, top_k=TOPK, max_expansions=50,
        concurrency=2, batch_size=8,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _wildcard_regex(p: str) -> str:
    import re as _re

    return "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
        for ch in p
    )


def _wildcard_pat_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{_wildcard_regex(p)}')"
        for qid, q in WILDCARD_QUERIES
        for p in sorted(q.split())
    )
    return f"(VALUES {rows}) AS v(qid, pat)"


_WILDCARD_EXPAND_SQL = f"""(
  SELECT DISTINCT v.qid, e.term
  FROM {_wildcard_pat_values_sql()},
  LATERAL (
    SELECT term FROM df WHERE regexp_full_match(term, v.pat)
    ORDER BY df DESC, term LIMIT 50
  ) e
) AS wz(qid, term)"""

SQL_WILDCARD_TOP10 = _sql_bm25_scores(_WILDCARD_EXPAND_SQL) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


NEG_BOOST_TERMS = ["slow", "big"]
NEG_BOOST_FACTOR = 0.25


def q_bm25_boosting_top10(sf_dir: str):
    """ES boosting query: docs containing a negative term are DEMOTED
    (summed score x 0.25, one multiply), never excluded — the
    soft-penalty counterpart of must_not (webindex/search.py neg_boost
    through the constrained kernel)."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        neg_boost=(NEG_BOOST_TERMS, NEG_BOOST_FACTOR),
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_BOOSTING_TOP10 = _sql_bm25_scores() + f"""
, demoted AS (
  SELECT s.qid, s.doc_id,
         CASE WHEN s.doc_id IN (
           SELECT DISTINCT doc_id FROM tf
           WHERE term IN ({", ".join(f"'{t}'" for t in NEG_BOOST_TERMS)})
         ) THEN s.score * {NEG_BOOST_FACTOR!r} ELSE s.score END AS score
  FROM scores s
)
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM demoted
) WHERE rank <= {TOPK}
"""


def q_percolate(sf_dir: str):
    """ES percolator (reverse search): every document streams against the
    registered query set; (query_id, doc_id) emitted when the doc
    contains ALL of the query's analyzed terms. Queries broadcast once
    via ray.put; the corpus never leaves map_batches
    (webindex/percolate.py)."""
    import ray.data as rd

    from webindex.percolate import percolate

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return percolate(docs, DOC_QUERIES, analyzer=SQL_SAFE_ANALYZER)


SQL_PERCOLATE = f"""
WITH docs AS (SELECT doc_id, text FROM documents),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qterms AS (SELECT * FROM {_query_values_sql()}),
nq AS (SELECT qid, count(*)::BIGINT AS nt FROM qterms GROUP BY qid)
SELECT q.qid AS query_id, tk.doc_id
FROM qterms q JOIN toks tk ON tk.term = q.term JOIN nq ON nq.qid = q.qid
GROUP BY q.qid, tk.doc_id, nq.nt
HAVING count(*) = nt
"""


def q_sort_by_nchars(sf_dir: str):
    """ES sort clause (sort: [{n_chars: desc}]): the match set ordered by
    a docvalue instead of BM25, scoring skipped — per-shard top-k under
    the (value desc, docID) total order, exact superset merge
    (webindex/search.py sort_by_field)."""
    from webindex.search import sort_by_field

    idx = ensure_index(sf_dir, "nostem")
    return sort_by_field(_queries_ds(), idx, "n_chars", top_k=TOPK)


SQL_SORT_BY_NCHARS = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qterms AS (SELECT * FROM {_query_values_sql()}),
m AS (SELECT DISTINCT q.qid, tk.doc_id
      FROM qterms q JOIN toks tk ON tk.term = q.term)
SELECT qid, doc_id, sortval, rank FROM (
  SELECT m.qid, m.doc_id, d.n_chars::BIGINT AS sortval,
         row_number() OVER (PARTITION BY m.qid
                            ORDER BY d.n_chars DESC, m.doc_id)::INTEGER AS rank
  FROM m JOIN documents d ON d.doc_id = m.doc_id
) WHERE rank <= {TOPK}
"""


def q_unigram_logprob(sf_dir: str):
    """CCNet-style unigram-LM quality score: per doc the corpus-trained
    unigram log-probability (sum over distinct terms of tf *
    ln(cf/total)) and its per-token mean, rounded to 6dp — float fold
    order over many terms is engine-specific (measured), so the contract
    compares rounded values, like bm25_scores
    (webindex/textstats.py unigram_logprob: one term-hash shuffle for
    corpus cf, one doc-hash shuffle for the per-doc fold)."""
    import ray.data as rd

    from webindex.textstats import unigram_logprob

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    out = unigram_logprob(docs)

    def round6(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": batch.column("n_tokens"),
                "logprob_r": pa.array(
                    np.round(batch.column("logprob").to_numpy(), 6)
                ),
                "lpt_r": pa.array(
                    np.round(
                        batch.column("logprob_per_token").to_numpy(), 6
                    )
                ),
            }
        )

    return out.map_batches(round6, batch_format="pyarrow")


SQL_UNIGRAM_LOGPROB = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
toks AS (SELECT doc_id, unnest(tl) AS term FROM dt),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY doc_id, term),
cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(cf)::BIGINT AS total FROM cf),
contrib AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln(cf.cf / t.total) AS c
  FROM tf JOIN cf ON cf.term = tf.term CROSS JOIN tot t
),
agg AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         list_sum(list(c ORDER BY term)) AS lp
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, n_tokens, round(lp, 6) AS logprob_r,
       round(lp / n_tokens, 6) AS lpt_r
FROM agg
"""


CHUNK_MAX, CHUNK_OVERLAP = 40, 10
_CHUNK_STRIDE = CHUNK_MAX - CHUNK_OVERLAP


def q_chunk_docs(sf_dir: str):
    """Fixed-window document chunking with overlap (the pretraining/RAG
    corpus-prep step): windows of 40 tokens every 30, last window the
    remainder, canonical space-joined surface — exact string identity
    vs the SQL list-slice oracle (webindex/textstats.py chunk_documents,
    stateless map_batches, no shuffle)."""
    import ray.data as rd

    from webindex.textstats import chunk_documents

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return chunk_documents(docs, max_tokens=CHUNK_MAX,
                           overlap=CHUNK_OVERLAP)


SQL_CHUNK_DOCS = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents)
SELECT doc_id,
       (u.s // {_CHUNK_STRIDE})::BIGINT AS chunk_id,
       array_to_string(tl[u.s + 1: u.s + {CHUNK_MAX}], ' ') AS chunk_text,
       least(len(tl) - u.s, {CHUNK_MAX})::BIGINT AS n_tokens
FROM dt, unnest(range(0, len(tl), {_CHUNK_STRIDE})) AS u(s)
"""


BIGRAM_LAM = 0.8
# 1-lam computed ONCE and injected as the same float64 literal into both
# backends (1.0 - 0.8 != 0.2 in float64; two independent computations of
# "0.2" would hash-mismatch the ln arguments)
_BIGRAM_OML = 1.0 - BIGRAM_LAM


def q_bigram_logprob(sf_dir: str):
    """KenLM-direction CCNet quality score: per doc the corpus-trained
    INTERPOLATED BIGRAM log-probability — per adjacent pair
    p(w2|w1) = lam*(cb/cp) + (1-lam)*(cu/T) over exact int64 counts,
    ascending-(w1,w2) fold, 6dp surface (fold order is engine-specific,
    the unigram_logprob precedent). Three bounded shuffles: w1-hash for
    cb/cp, padded-union join for cu, doc-hash fold
    (webindex/textstats.py bigram_logprob)."""
    import ray.data as rd

    from webindex.textstats import bigram_logprob

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    out = bigram_logprob(docs, lam=BIGRAM_LAM)

    def round6(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": batch.column("n_bigrams"),
                "logprob_r": pa.array(
                    np.round(batch.column("logprob").to_numpy(), 6)
                ),
                "lpb_r": pa.array(
                    np.round(
                        batch.column("logprob_per_bigram").to_numpy(), 6
                    )
                ),
            }
        )

    return out.map_batches(round6, batch_format="pyarrow")


SQL_BIGRAM_LOGPROB = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
toks AS (SELECT doc_id, unnest(tl) AS term,
                unnest(range(len(tl))) AS pos FROM dt),
bg AS (SELECT a.doc_id, a.term AS w1, b.term AS w2
       FROM toks a JOIN toks b
         ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
cb AS (SELECT w1, w2, count(*)::BIGINT AS c FROM bg GROUP BY w1, w2),
cp AS (SELECT w1, sum(c)::BIGINT AS c FROM cb GROUP BY w1),
cu AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term),
tot AS (SELECT count(*)::BIGINT AS total FROM toks),
dbg AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS n
        FROM bg GROUP BY doc_id, w1, w2),
contrib AS (
  SELECT d.doc_id, d.w1, d.w2, d.n,
         d.n * ln({BIGRAM_LAM!r} * (cb.c / cp.c)
                  + {_BIGRAM_OML!r} * (cu.c / t.total)) AS c
  FROM dbg d
  JOIN cb ON cb.w1 = d.w1 AND cb.w2 = d.w2
  JOIN cp ON cp.w1 = d.w1
  JOIN cu ON cu.term = d.w2
  CROSS JOIN tot t
),
agg AS (
  SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
         list_sum(list(c ORDER BY w1, w2)) AS lp
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, n_bigrams, round(lp, 6) AS logprob_r,
       round(lp / n_bigrams, 6) AS lpb_r
FROM agg
"""


def q_scan_matches(sf_dir: str):
    """ES scroll / scan export: EVERY (qid, doc_id) match, no scoring,
    no top-k — shard-disjoint docID ranges mean no merge stage at all
    (webindex/search.py scan_matches)."""
    from webindex.search import scan_matches

    idx = ensure_index(sf_dir, "nostem")
    return scan_matches(_queries_ds(), idx)


SQL_SCAN_MATCHES = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qterms AS (SELECT * FROM {_query_values_sql()})
SELECT DISTINCT q.qid, tk.doc_id
FROM qterms q JOIN toks tk ON tk.term = q.term
"""


def q_sig_test(sf_dir: str):
    """Paired-bootstrap significance test (standard IR eval practice)
    between two systems — full BM25 vs BM25 with the boosting-query
    demotion — on per-query NDCG@10 over the derived qrels: one row of
    (n_queries, mean_delta, wins/ties/losses, p_value), seeded and
    deterministic (webindex/eval.py paired_bootstrap). Iterative
    resampling is not SQL-expressible -> rows-only; the statistic's
    properties are pytest-gated."""
    from webindex.eval import evaluate_runs_pd, paired_bootstrap

    base_metrics = q_eval_metrics(sf_dir)  # BM25 system A

    runs_b = q_bm25_boosting_top10(sf_dir).to_pandas()
    runs_b["did"] = runs_b["doc_id"].astype(str)
    qspec = [(qid, frozenset(_sql_an.tokens(text)))
             for qid, text in DOC_QUERIES]

    def qrels_batch(batch: pa.Table) -> pa.Table:
        an = Analyzer(SQL_SAFE_ANALYZER)
        out_q, out_d = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks = set(an.tokens(t or ""))
            for qid, terms in qspec:
                if terms <= toks:
                    out_q.append(qid)
                    out_d.append(str(int(did)))
        return pa.table(
            {"qid": pa.array(out_q, pa.string()),
             "did": pa.array(out_d, pa.string())}
        )

    qrels = (
        _docs(sf_dir)
        .map_batches(qrels_batch, batch_format="pyarrow")
        .to_pandas()
    )
    qrels["rel"] = 1
    metrics_b = evaluate_runs_pd(runs_b, qrels, k_values=[10])
    r = paired_bootstrap(
        base_metrics, metrics_b, metric="ndcg@10", n_boot=2000, seed=7
    )
    out = pd.DataFrame([r])
    out["mean_delta"] = out["mean_delta"].round(6)
    out["p_value"] = out["p_value"].round(6)
    return out


def q_textrank_keywords(sf_dir: str):
    """Per-doc TextRank keywords (Mihalcea & Tarau 2004): PageRank over
    each doc's own weighted co-occurrence graph in int64 FIXED-POINT
    micro-units (the webindex.graph pagerank convention — float power
    iterations are neither partition-independent nor engine-portable,
    measured), 20 rounds, top-5 by (score desc, term asc). Exact
    integers make the whole iteration SQL-expressible: the oracle
    replays all 20 rounds in a recursive CTE (webindex/textstats.py
    textrank_keywords — stateless per-doc map_batches, trivially
    partition-invariant)."""
    import ray.data as rd

    from webindex.textstats import textrank_keywords

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return textrank_keywords(docs, window=2, top_k=5)


def _sql_textrank() -> str:
    from webindex.textstats import TEXTRANK_SCALE as S

    return f"""
WITH RECURSIVE
dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents
       WHERE len({_TOK_SQL}) > 0),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pairs AS (
  SELECT t1.doc_id, t1.term AS a, t2.term AS b
  FROM pos t1 JOIN pos t2 ON t2.doc_id = t1.doc_id
   AND t2.p > t1.p AND t2.p <= t1.p + 2 AND t2.term <> t1.term
),
edges AS (
  SELECT doc_id, a, b, count(*)::BIGINT AS w FROM (
    SELECT doc_id, a, b FROM pairs
    UNION ALL
    SELECT doc_id, b AS a, a AS b FROM pairs
  ) GROUP BY doc_id, a, b
),
deg AS (
  SELECT doc_id, a AS term, sum(w)::BIGINT AS deg
  FROM edges GROUP BY doc_id, a
),
vcnt AS (
  SELECT doc_id, count(DISTINCT term)::BIGINT AS v
  FROM pos GROUP BY doc_id
),
pr AS (
  SELECT 0 AS it, n.doc_id, n.term, ({S} // v.v)::BIGINT AS pq
  FROM (SELECT DISTINCT doc_id, term FROM pos) n
  JOIN vcnt v ON v.doc_id = n.doc_id
  UNION ALL
  SELECT p.it + 1, p.doc_id, p.term,
         ((3 * {S}) // (20 * v.v)
          + (17 * coalesce(c.contrib, 0)) // 20)::BIGINT
  FROM pr p
  JOIN vcnt v ON v.doc_id = p.doc_id
  LEFT JOIN (
    SELECT e.doc_id, e.a AS term,
           sum((e.w * p2.pq) // d.deg)::BIGINT AS contrib
    FROM pr p2
    JOIN edges e ON e.doc_id = p2.doc_id AND e.b = p2.term
    JOIN deg d ON d.doc_id = e.doc_id AND d.term = e.b
    GROUP BY e.doc_id, e.a
  ) c ON c.doc_id = p.doc_id AND c.term = p.term
  WHERE p.it < 20
)
SELECT doc_id, term, score_q, rank FROM (
  SELECT doc_id, term, pq AS score_q,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY pq DESC, term)::INTEGER AS rank
  FROM pr WHERE it = 20
) WHERE rank <= 5
"""


def q_fetch_top10(sf_dir: str):
    """ES fetch phase (docvalue_fields): the BM25 top-10 hits with their
    lang/n_chars docvalues attached — rows route to the OWNING
    salt-range shard by the pinned docID->salt math; each shard resolves
    only its slice (webindex/search.py fetch_fields)."""
    from webindex.search import fetch_fields, search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8
    )
    out = fetch_fields(runs, idx, ["lang", "n_chars"])
    return out.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank", "lang", "n_chars"]),
        batch_format="pyarrow",
    )


SQL_FETCH_TOP10 = _sql_bm25_scores() + f"""
SELECT r.qid, r.doc_id, r.rank, d.lang, d.n_chars FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.rank <= {TOPK}
"""


PLAN_K = 1000
PLAN_BS = 128  # nostem index block_size (IndexConfig default)


def q_query_plan(sf_dir: str):
    """ES profile/explain-routing analog: per query the auto router's
    kernel choice and its inputs (distinct terms, estimated candidates)
    — derived from dictionary statistics alone via one distributed dict
    scan and the SAME pure route_mode function the ranked path executes
    (webindex/search.py query_plan), so a SQL oracle reproduces the
    whole plan."""
    from webindex.search import query_plan

    idx = ensure_index(sf_dir, "nostem")
    return query_plan(DOC_QUERIES, idx, top_k=PLAN_K)


SQL_QUERY_PLAN = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
qd AS (
  SELECT q.qid, q.term, coalesce(d.df, 0) AS df
  FROM {_query_values_sql()}
  LEFT JOIN dft d ON d.term = q.term
),
agg AS (
  SELECT qid, count(*)::BIGINT AS n_terms,
         sum(CASE WHEN df > 0 THEN df ELSE 0 END)::BIGINT AS est,
         sum(CASE WHEN df > 0
                  THEN CAST(ceil(df / {PLAN_BS}.0) AS BIGINT)
                  ELSE 0 END) AS blocks,
         sum(CASE WHEN df > 0 THEN 1 ELSE 0 END) AS npos
  FROM qd GROUP BY qid
)
SELECT a.qid, a.n_terms, a.est AS est_candidates,
       CASE WHEN (a.npos > 1 AND s.anysparse = 1)
              OR a.est > {PLAN_K} * 10000
            THEN 'wand' ELSE 'exhaustive' END AS mode
FROM agg a JOIN (
  SELECT qd.qid,
         max(CASE WHEN qd.df > 0 AND qd.df <= 4 * a2.blocks
             THEN 1 ELSE 0 END) AS anysparse
  FROM qd JOIN agg a2 ON a2.qid = qd.qid GROUP BY qd.qid
) s ON s.qid = a.qid
"""


PMI_W, PMI_MIN, PMI_TOPN = 3, 5, 20


def q_pmi_top20(sf_dir: str):
    """Collocation mining (Church & Hanks PMI over a +/-3 window): the
    corpus's top-20 term pairs by pointwise mutual information, exact
    int64 co-occurrence/marginal counts, one division + one scalar ln
    per pair (webindex/textstats.py pmi_collocations — pair-hash +
    term-hash shuffles, padded-union hash joins, per-block top-n cut)."""
    import ray.data as rd

    from webindex.textstats import pmi_collocations

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    out = pmi_collocations(
        docs, window=PMI_W, min_count=PMI_MIN, top_n=PMI_TOPN
    )
    out["pmi_r"] = out["pmi"].round(9)
    return out[["a", "b", "cnt", "pmi_r", "rank"]]


SQL_PMI_TOP20 = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pr AS (
  SELECT least(x.term, y.term) AS a, greatest(x.term, y.term) AS b,
         count(*)::BIGINT AS cnt
  FROM pos x JOIN pos y ON y.doc_id = x.doc_id
    AND y.p > x.p AND y.p - x.p <= {PMI_W} AND y.term <> x.term
  GROUP BY a, b
),
tot AS (SELECT sum(cnt)::BIGINT AS t FROM pr),
marg AS (
  SELECT term, sum(cnt)::BIGINT AS m FROM (
    SELECT a AS term, cnt FROM pr UNION ALL SELECT b AS term, cnt FROM pr
  ) GROUP BY term
),
scored AS (
  SELECT pr.a, pr.b, pr.cnt,
         ln((pr.cnt * t.t) / (ma.m * mb.m)) AS pmi
  FROM pr
  JOIN marg ma ON ma.term = pr.a
  JOIN marg mb ON mb.term = pr.b
  CROSS JOIN tot t
  WHERE pr.cnt >= {PMI_MIN}
)
SELECT a, b, cnt, round(pmi, 9) AS pmi_r, rank FROM (
  SELECT a, b, cnt, pmi,
         row_number() OVER (ORDER BY pmi DESC, a, b)::INTEGER AS rank
  FROM scored
) WHERE rank <= {PMI_TOPN}
"""


RRF_WINDOW = 20
RRF_K = 60


def q_hybrid_rrf_top10(sf_dir: str):
    """Reciprocal-rank fusion (the ES/OpenSearch hybrid-search combiner,
    Cormack et al. 2009): fuse two retrievers' rank windows — the
    OR-match BM25 ranking and the stricter AND-match ranking — with
    score = sum of 1/(60 + rank) per side, side order pinned
    (webindex/rerank.py rrf_fuse)."""
    from webindex.rerank import rrf_fuse
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs_a = search_queries(
        _queries_ds(), idx, top_k=RRF_WINDOW, concurrency=2, batch_size=8
    )
    runs_b = search_queries(
        _queries_ds(), idx, top_k=RRF_WINDOW, match="and", concurrency=2,
        batch_size=8,
    )
    fused = rrf_fuse([runs_a, runs_b], k_const=RRF_K, top_k=TOPK)

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": batch.column("qid"),
                "doc_id": batch.column("doc_id"),
                "score_r": pa.array(
                    np.round(batch.column("score").to_numpy(), 9)
                ),
                "rank": batch.column("rank"),
            }
        )

    return fused.map_batches(out, batch_format="pyarrow")


SQL_HYBRID_RRF_TOP10 = _sql_bm25_scores() + f"""
, nq AS (SELECT qid, count(*)::BIGINT AS nt FROM qterms GROUP BY qid),
hits AS (
  SELECT qid, doc_id, count(*)::BIGINT AS npresent
  FROM contrib GROUP BY qid, doc_id
),
ra AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS r
  FROM scores
),
rb AS (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id) AS r
  FROM scores s
  JOIN hits h ON h.qid = s.qid AND h.doc_id = s.doc_id
  JOIN nq ON nq.qid = s.qid
  WHERE h.npresent = nq.nt
),
fused AS (
  SELECT coalesce(a.qid, b.qid) AS qid,
         coalesce(a.doc_id, b.doc_id) AS doc_id,
         coalesce(1.0 / ({RRF_K} + a.r), 0.0)
           + coalesce(1.0 / ({RRF_K} + b.r), 0.0) AS score
  FROM (SELECT * FROM ra WHERE r <= {RRF_WINDOW}) a
  FULL OUTER JOIN (SELECT * FROM rb WHERE r <= {RRF_WINDOW}) b
    ON a.qid = b.qid AND a.doc_id = b.doc_id
)
SELECT qid, doc_id, round(score, 9) AS score_r, rank FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM fused
) WHERE rank <= {TOPK}
"""


PHRASE_SUGGEST_QUERIES: list[tuple[str, str]] = [
    ("g1", "mergge the stream"),
    ("g2", "custmer order windoww"),
    ("g3", "batch scan"),
    ("g4", "qzqzq zzzz"),
]


def q_phrase_suggest(sf_dir: str):
    """ES phrase suggester (whole-query did-you-mean): per position,
    dictionary terms pass through, absent terms take their single best
    edit-distance-1 correction by (df desc, term asc), no-candidate
    terms stay as typed (webindex/lexicon.py phrase_suggest — the term
    suggester's dict scans + a bounded per-query assembly)."""
    from webindex.lexicon import phrase_suggest

    idx = ensure_index(sf_dir, "nostem")
    return phrase_suggest(idx, PHRASE_SUGGEST_QUERIES)


def _psg_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', {pos}, '{t}')"
        for qid, text in PHRASE_SUGGEST_QUERIES
        for pos, t in enumerate(_sql_an.tokens(text))
    )
    return f"(VALUES {rows}) AS v(qid, pos, term)"


SQL_PHRASE_SUGGEST = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
v AS (SELECT * FROM {_psg_values_sql()}),
sel AS (
  SELECT v.qid, v.pos,
         CASE WHEN EXISTS (SELECT 1 FROM dft d WHERE d.term = v.term)
              THEN v.term
              ELSE coalesce(
                (SELECT term FROM dft
                 WHERE levenshtein(term, v.term) <= 1
                   AND substr(term, 1, 1) = substr(v.term, 1, 1)
                 ORDER BY df DESC, term LIMIT 1), v.term)
         END AS out_term,
         CASE WHEN EXISTS (SELECT 1 FROM dft d WHERE d.term = v.term)
              THEN 0
              WHEN EXISTS (SELECT 1 FROM dft
                           WHERE levenshtein(term, v.term) <= 1
                             AND substr(term, 1, 1) = substr(v.term, 1, 1))
              THEN 1 ELSE 0 END AS corrected
  FROM v
)
SELECT qid, string_agg(out_term, ' ' ORDER BY pos) AS suggestion,
       sum(corrected)::BIGINT AS n_corrected
FROM sel GROUP BY qid
"""


SRC_SHORT_TOKENS = 40
SRC_MAX_SHORT_FRAC = 0.35


def q_source_filter(sf_dir: str):
    """Domain-level curation (RefinedWeb/Dolma-style): judge each SOURCE
    by its share of short documents, then annotate every doc with its
    source's verdict — exact int64 source partials, one division per
    ratio, bounded per-source table broadcast once
    (webindex/textstats.py source_level_filter)."""
    import ray.data as rd

    from webindex.textstats import source_level_filter

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return source_level_filter(
        docs, short_tokens=SRC_SHORT_TOKENS,
        max_short_frac=SRC_MAX_SHORT_FRAC,
    )


SQL_SOURCE_FILTER = f"""
WITH dt AS (
  SELECT doc_id, source, len({_TOK_SQL})::BIGINT AS n_tok FROM documents
),
src AS (
  SELECT source, count(*)::BIGINT AS src_docs,
         sum(CASE WHEN n_tok < {SRC_SHORT_TOKENS} THEN 1 ELSE 0 END)::BIGINT
           AS n_short
  FROM dt GROUP BY source
)
SELECT d.doc_id, d.source, s.src_docs,
       s.n_short / s.src_docs AS src_short_frac,
       (s.n_short / s.src_docs) <= {SRC_MAX_SHORT_FRAC!r} AS keep
FROM dt d JOIN src s ON s.source = d.source
"""


def q_props_stats(sf_dir: str):
    """Semi-structured extraction (the log-pipeline JSON-path op): parse
    the k field out of the events.props JSON strings in a stateless
    vectorized map_batches (one stdlib parse per row, schema-on-read),
    then exact int64 per-event_type aggregates — count, sum, min, max of
    k, mean as ONE final division."""
    import json

    import ray.data as rd

    from ray.data.aggregate import Count, Max, Min, Sum

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "props"],
    )

    def parse(batch: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (int(json.loads(p)["k"])
             for p in batch.column("props").to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return pa.table(
            {"event_type": batch.column("event_type"),
             "k": pa.array(ks)}
        )

    agg = (
        ev.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"),
            Max("k", alias_name="max_k"),
        )
    )

    def add_mean(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.int64)
        sm = batch.column("sum_k").to_numpy().astype(np.int64)
        return batch.append_column(
            "mean_k", pa.array(sm / n, pa.float64())
        )

    return agg.map_batches(add_mean, batch_format="pyarrow")


SQL_PROPS_STATS = """
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT
         / count(*)::BIGINT AS mean_k
FROM events GROUP BY event_type
"""


def q_temperature_mix(sf_dir: str):
    """Temperature-based corpus mixing at T=0.5 (the PaLM/GPT data-mix
    recipe): each source keeps the deterministic md5-prefix fraction
    sqrt(n_min/n_s) of its docs, flattening source imbalance — sqrt is
    the one libm op IEEE requires correctly rounded, so the derived
    thresholds (and hence the sampled SET) are engine-portable
    (webindex/relational.py temperature_mix)."""
    import ray.data as rd

    from webindex.relational import temperature_mix

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return temperature_mix(docs)


SQL_TEMPERATURE_MIX = f"""
WITH dt AS (
  SELECT doc_id, source, len({_TOK_SQL})::BIGINT AS n_tok FROM documents
),
cnts AS (SELECT source, sum(n_tok)::BIGINT AS n FROM dt GROUP BY source),
mn AS (SELECT min(n) AS nmin FROM cnts),
th AS (
  SELECT source,
         printf('%08x', LEAST(
           CAST(floor(sqrt(CAST(mn.nmin AS DOUBLE) / n) * 4294967296.0)
                AS BIGINT), 4294967295)) AS t
  FROM cnts CROSS JOIN mn
)
SELECT d.doc_id, d.source
FROM documents d JOIN th ON th.source = d.source
WHERE substr(md5(d.doc_id::VARCHAR), 1, 8) < th.t
"""


CUR2_DUP_MAX = 0.7
CUR2_CONTAM_MAX = 0.05


def q_curation_v2(sf_dir: str):
    """Round-2 curation capstone (the Dolma/RefinedWeb filter chain over
    the NEW signals): source-level verdict (short-doc share) AND
    cross-corpus dup-trigram fraction <= 0.7 AND benchmark-contamination
    overlap <= 0.05 -> per-source surviving doc counts. Every signal is
    the standalone operator its own entry verifies; the joins are the
    repo's padded-union hash joins; the composition hash-checks against
    one SQL expression end to end."""
    import pyarrow as _pa
    import ray.data as rd

    from ray.data.aggregate import Count

    from webindex.dedup import contamination, cross_doc_dup_ngrams
    from webindex.relational import hash_join_attach
    from webindex.textstats import source_level_filter

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    base = source_level_filter(
        docs, short_tokens=SRC_SHORT_TOKENS,
        max_short_frac=SRC_MAX_SHORT_FRAC,
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "keep_i": t.column("keep").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    d2 = docs.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
    )
    dup = cross_doc_dup_ngrams(d2, n=DUPNG_N, min_count=DUPNG_MIN)
    ev_rows = d2.sort("doc_id").limit(CONTAM_EVAL_K).take_all()
    contam = contamination(
        d2, [(r["doc_id"], r["text"]) for r in ev_rows], n=CONTAM_N
    )

    rows_types = {"doc_id": _pa.int64(), "source": _pa.string(),
                  "keep_i": _pa.int64()}
    j1 = hash_join_attach(
        base, "doc_id", dup, ["dup_frac"], rows_types=rows_types,
        val_types={"dup_frac": _pa.float64()}, out_prefix="d_",
    )
    rows_types2 = dict(rows_types)
    rows_types2["d_dup_frac"] = _pa.float64()
    j2 = hash_join_attach(
        j1, "doc_id", contam, ["overlap_frac"], rows_types=rows_types2,
        val_types={"overlap_frac": _pa.float64()}, out_prefix="c_",
    )

    def keep(batch: pa.Table) -> pa.Table:
        ok = (
            (batch.column("keep_i").to_numpy(zero_copy_only=False) > 0)
            & (batch.column("d_dup_frac").to_numpy(zero_copy_only=False)
               <= CUR2_DUP_MAX)
            & (batch.column("c_overlap_frac").to_numpy(
                zero_copy_only=False) <= CUR2_CONTAM_MAX)
        )
        return batch.filter(pa.array(ok)).select(["doc_id", "source"])

    kept = j2.map_batches(keep, batch_format="pyarrow")
    return kept.groupby("source").aggregate(Count(alias_name="n_docs"))


SESSION_GAP_US = 300_000_000  # 5 minutes


def q_user_sessions(sf_dir: str):
    """Gap-based sessionization (Flink/Beam session windows; no native
    Ray Data analog): per user, events split into sessions wherever the
    inter-event gap exceeds 5 minutes; one row per session with
    start/end/count (webindex/temporal.py session_windows — one key
    shuffle, vectorized diff+cumsum kernel)."""
    import ray.data as rd

    from webindex.temporal import session_windows

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"],
    )
    return session_windows(
        ev, key="user_id", ts_col="ts", gap_us=SESSION_GAP_US
    )


SQL_USER_SESSIONS = f"""
WITH b AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
  FROM b
)
SELECT user_id, session_id::BIGINT AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, session_id
"""


CONTAM_N = 3
CONTAM_EVAL_K = 5


def q_contamination(sf_dir: str):
    """Benchmark-decontamination scan (GPT-3/PaLM-style n-gram overlap):
    the CONTAM_EVAL_K lowest-doc_id documents stand in for a held-out
    eval set; per corpus doc, the count/fraction of trigram positions
    occurring anywhere in that set. Eval shingles broadcast once via
    ray.put; the corpus streams through one vectorized searchsorted
    probe per batch (webindex/dedup.py contamination)."""
    import ray.data as rd

    from webindex.dedup import contamination

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    ev_rows = docs.sort("doc_id").limit(CONTAM_EVAL_K).take_all()
    evals = [(r["doc_id"], r["text"]) for r in ev_rows]
    return contamination(docs, evals, n=CONTAM_N)


SQL_CONTAMINATION = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
sh AS (
  SELECT doc_id, array_to_string(tl[u.p + 1: u.p + {CONTAM_N}], ' ') AS s
  FROM dt, unnest(range(len(tl) - {CONTAM_N} + 1)) AS u(p)
),
ev AS (
  SELECT DISTINCT s FROM sh
  WHERE doc_id IN (SELECT doc_id FROM documents
                   ORDER BY doc_id LIMIT {CONTAM_EVAL_K})
)
SELECT sh.doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_overlap,
       sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         / count(*)::BIGINT AS overlap_frac
FROM sh LEFT JOIN ev ON ev.s = sh.s
GROUP BY sh.doc_id
"""


MPP_QUERIES: list[tuple[str, str]] = [
    ("mpp1", "merge str"),
    ("mpp2", "customer ord"),
    ("mpp3", "the fast k"),
]
MPP_MAXEXP = 50


def _mpp_parts() -> list[tuple[str, list[str], str]]:
    out = []
    for qid, text in MPP_QUERIES:
        toks = _sql_an.tokens(text)
        out.append((qid, toks[:-1], toks[-1]))
    return out


def q_match_phrase_prefix(sf_dir: str):
    """ES match_phrase_prefix (autocomplete): last term is a prefix,
    completed by its top-50 dictionary expansions (df desc, term asc);
    per-doc score = MAX over matched expansions of the exact phrase
    score of base+[e] (webindex/lexicon.py match_phrase_prefix — one
    dict scan, positional phrase kernel per variant, Max merge)."""
    from webindex.lexicon import match_phrase_prefix

    idx = ensure_index(sf_dir, "pos")
    out = match_phrase_prefix(
        MPP_QUERIES, idx, top_k=TOPK, max_expansions=MPP_MAXEXP,
        concurrency=2, batch_size=8,
    )
    return out.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _mpp_expn_lateral() -> str:
    rows = ", ".join(
        f"('{qid}', '{pre}')" for qid, _b, pre in _mpp_parts()
    )
    return f"""
  SELECT v.qid, e.term AS eterm
  FROM (VALUES {rows}) AS v(qid, pre),
  LATERAL (
    SELECT term FROM df WHERE starts_with(term, v.pre)
    ORDER BY df DESC, term LIMIT {MPP_MAXEXP}
  ) e"""


def _mpp_base_values() -> str:
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, base, _p in _mpp_parts()
        for t in sorted(set(base))
    )
    return f"(VALUES {rows}) AS b(qid, term)"


def _mpp_phrase_values() -> str:
    rows = ", ".join(
        f"('{qid}', '{' '.join(base)}')" for qid, base, _p in _mpp_parts()
    )
    return f"(VALUES {rows}) AS p(qid, phrase)"


_MPP_QTERMS_SQL = f"""(
  SELECT qid, term FROM {_mpp_base_values()}
  UNION
  SELECT * FROM ({_mpp_expn_lateral()}) x(qid, term)
) AS q(qid, term)"""

SQL_MATCH_PHRASE_PREFIX = _sql_bm25_scores(_MPP_QTERMS_SQL) + f"""
, expn AS ({_mpp_expn_lateral()}),
baset AS (SELECT * FROM {_mpp_base_values()}),
qe_terms AS (
  SELECT b.qid, x.eterm, b.term FROM baset b JOIN expn x ON x.qid = b.qid
  UNION
  SELECT qid, eterm, eterm FROM expn
),
escore AS (
  SELECT qt.qid, qt.eterm, c.doc_id,
         list_sum(list(c.c ORDER BY c.term)) AS score
  FROM qe_terms qt JOIN contrib c ON c.qid = qt.qid AND c.term = qt.term
  GROUP BY qt.qid, qt.eterm, c.doc_id
),
dt AS (
  SELECT doc_id, ' ' || array_to_string({_TOK_SQL}, ' ') || ' ' AS ts
  FROM documents WHERE text <> ''
),
phr AS (SELECT * FROM {_mpp_phrase_values()}),
pm AS (
  SELECT x.qid, x.eterm, d.doc_id
  FROM expn x JOIN phr p ON p.qid = x.qid
  JOIN dt d ON strpos(d.ts, ' ' || p.phrase || ' ' || x.eterm || ' ') > 0
),
best AS (
  SELECT pm.qid, pm.doc_id, max(s.score) AS score
  FROM pm JOIN escore s
    ON s.qid = pm.qid AND s.eterm = pm.eterm AND s.doc_id = pm.doc_id
  GROUP BY pm.qid, pm.doc_id
)
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM best
) WHERE rank <= {TOPK}
"""


DISMAX_TB = 0.3


def q_bm25_dismax_top10(sf_dir: str):
    """ES dis_max query: score = best term clause + tie_breaker * (sum of
    the other clauses), computed as max + tb * (pinned ascending-term sum
    - max) so the SQL oracle reproduces the float ops exactly
    (webindex/wand.py exhaustive_constrained dis_max)."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        dis_max=DISMAX_TB,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_DISMAX_TOP10 = _sql_bm25_scores() + f"""
, dm AS (
  SELECT qid, doc_id,
         list_max(list(c ORDER BY term))
           + {DISMAX_TB!r} * (list_sum(list(c ORDER BY term))
                              - list_max(list(c ORDER BY term))) AS score
  FROM contrib GROUP BY qid, doc_id
)
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM dm
) WHERE rank <= {TOPK}
"""


DUPNG_N = 3
DUPNG_MIN = 2


def q_dup_ngrams(sf_dir: str):
    """Cross-document duplicate n-gram statistics (Lee et al. 2022
    span-dedup signal): per doc the total trigram positions, positions
    whose trigram occurs >= 2x corpus-wide (across AND within docs), and
    the one-division fraction (webindex/dedup.py cross_doc_dup_ngrams:
    one pinned hash shuffle, vectorized reduceat partition kernel,
    per-doc Sum merge)."""
    import ray.data as rd

    from webindex.dedup import cross_doc_dup_ngrams

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return cross_doc_dup_ngrams(docs, n=DUPNG_N, min_count=DUPNG_MIN)


SQL_DUP_NGRAMS = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
sh AS (
  SELECT doc_id, array_to_string(tl[u.p + 1: u.p + {DUPNG_N}], ' ') AS s
  FROM dt, unnest(range(len(tl) - {DUPNG_N} + 1)) AS u(p)
),
cnt AS (SELECT s, count(*)::BIGINT AS c FROM sh GROUP BY s)
SELECT sh.doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN cnt.c >= {DUPNG_MIN} THEN 1 ELSE 0 END)::BIGINT AS n_dup,
       sum(CASE WHEN cnt.c >= {DUPNG_MIN} THEN 1 ELSE 0 END)::BIGINT
         / count(*)::BIGINT AS dup_frac
FROM sh JOIN cnt ON cnt.s = sh.s
GROUP BY sh.doc_id
"""


def q_dedup_spans(sf_dir: str):
    """Span-level dedup REMOVAL (Lee et al. 2022 ExactSubstr direction):
    each doc rewritten with every token covered by a corpus-duplicated
    trigram removed; output is the canonical space-joined kept-token
    surface + exact counts, so the hash check is exact string identity
    (webindex/dedup.py dedup_spans: one shingle-hash shuffle isolates
    duplicated positions, one doc-hash padded-union rebuild)."""
    import ray.data as rd

    from webindex.dedup import dedup_spans

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return dedup_spans(docs, n=DUPNG_N, min_count=DUPNG_MIN)


SQL_DEDUP_SPANS = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
toks AS (SELECT doc_id, unnest(tl) AS term,
                unnest(range(len(tl))) AS pos FROM dt),
sh AS (
  SELECT doc_id, u.p AS pos,
         array_to_string(tl[u.p + 1: u.p + {DUPNG_N}], ' ') AS s
  FROM dt, unnest(range(len(tl) - {DUPNG_N} + 1)) AS u(p)
),
dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= {DUPNG_MIN}),
dpos AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup ON dup.s = sh.s),
kept AS (
  SELECT t.doc_id, t.pos, t.term
  FROM toks t
  WHERE NOT EXISTS (
    SELECT 1 FROM dpos d
    WHERE d.doc_id = t.doc_id
      AND t.pos BETWEEN d.pos AND d.pos + {DUPNG_N - 1})
),
agg AS (
  SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT dt.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       len(dt.tl)::BIGINT AS n_tokens,
       (len(dt.tl) - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM dt LEFT JOIN agg a ON a.doc_id = dt.doc_id
"""


FVF_WEIGHT = 0.01


def q_bm25_fvf_top10(sf_dir: str):
    """ES function_score field_value_factor (score_mode=multiply):
    final = BM25 * (1.0 + 0.01 * n_chars docvalue), missing -> factor 1
    — pinned float-op order so the SQL oracle reproduces it bit for bit
    (webindex/wand.py exhaustive_constrained field_factor)."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        field_factor=("n_chars", FVF_WEIGHT),
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_FVF_TOP10 = _sql_bm25_scores() + f"""
, boosted AS (
  SELECT s.qid, s.doc_id,
         s.score * (1.0 + {FVF_WEIGHT!r} * d.n_chars) AS score
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM boosted
) WHERE rank <= {TOPK}
"""


SPANF_TERMS = ["merge", "customer", "window"]
SPANF_END = 5


def q_span_first_top10(sf_dir: str):
    """ES span_first: docs whose term occurs strictly before position 5
    (opening-window relevance), scored with the term's own BM25
    contribution (webindex/positional.py span_first_topk)."""
    from webindex.positional import span_first_topk
    from webindex.segments import SegmentReader

    idx = ensure_index(sf_dir, "pos")
    r = SegmentReader(idx)
    r.preload()
    rows = []
    for term in SPANF_TERMS:
        ids, _scores = span_first_topk(r, term, TOPK, end=SPANF_END)
        rows.extend(
            (term, int(d), i + 1) for i, d in enumerate(ids.tolist())
        )
    return pd.DataFrame(rows, columns=["term", "doc_id", "rank"])


def _spanf_values_sql() -> str:
    rows = ", ".join(f"('{t}')" for t in SPANF_TERMS)
    return f"(VALUES {rows}) AS v(term)"


SQL_SPAN_FIRST_TOP10 = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM docs),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
toks AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         FROM pos GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(tl)::BIGINT AS dl FROM dt),
dft AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
stats AS (SELECT count(*)::BIGINT AS n_docs,
                 sum(dl)::BIGINT AS total_tokens FROM dl),
pm AS (
  SELECT DISTINCT v.term, pos.doc_id
  FROM {_spanf_values_sql()} JOIN pos
    ON pos.term = v.term AND pos.p < {SPANF_END}
),
sc AS (
  SELECT pm.term, pm.doc_id,
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (t.tf / (t.tf + {K1} * (1.0 - {B} + {B} * (dl.dl
          / (s.total_tokens::DOUBLE / s.n_docs))))) AS score
  FROM pm
  JOIN toks t ON t.doc_id = pm.doc_id AND t.term = pm.term
  JOIN dft d ON d.term = pm.term
  JOIN dl ON dl.doc_id = pm.doc_id
  CROSS JOIN stats s
)
SELECT term, doc_id, rank FROM (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM sc
) WHERE rank <= {TOPK}
"""


SPAN_SLOP = 2
SPAN_QUERIES: list[tuple[str, str]] = [
    ("n1", "merge join"),
    ("n2", "customer order"),
    ("n3", "the fast key"),
]


def q_span_near_top10(sf_dir: str):
    """ES/Lucene span_near(in_order=true, slop=2) over the positional
    index: tokens in order at increasing positions with total stretch
    <= slop (slop=0 would be exact match_phrase) — greedy-chain kernel
    vectorized across all start positions
    (webindex/positional.py span_near_topk)."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "pos")
    runs = search_queries(
        _span_queries_ds(), idx, top_k=TOPK, query_kind="phrase",
        slop=SPAN_SLOP,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _span_queries_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "qid": pa.array([q for q, _ in SPAN_QUERIES]),
                "text": pa.array([t for _, t in SPAN_QUERIES]),
            }
        )
    )


def _span_terms_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, text in SPAN_QUERIES
        for t in sorted(set(_sql_an.tokens(text)))
    )
    return f"(VALUES {rows}) AS q(qid, term)"


def _span_match_sql(qid: str, text: str, slop: int) -> str:
    """Exists-in-order-within-slop as an m-way self-join of the zipped
    (doc_id, term, position) unnest — exhaustive over position
    combinations, independent of the engine's greedy chain."""
    ts = _sql_an.tokens(text)
    m = len(ts)
    joins = "".join(
        f" JOIN pos t{i} ON t{i}.doc_id = t0.doc_id" for i in range(1, m)
    )
    conds = [f"t{i}.term = '{t}'" for i, t in enumerate(ts)]
    conds += [f"t{i}.p > t{i - 1}.p" for i in range(1, m)]
    conds.append(f"(t{m - 1}.p - t0.p) - {m - 1} <= {slop}")
    return (
        f"SELECT DISTINCT '{qid}' AS qid, t0.doc_id FROM pos t0{joins} "
        f"WHERE {' AND '.join(conds)}"
    )


SQL_SPAN_NEAR_TOP10 = _sql_bm25_scores(_span_terms_values_sql()) + f"""
, dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents WHERE text <> ''),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pm AS (
  {" UNION ALL ".join(_span_match_sql(q, t, SPAN_SLOP) for q, t in SPAN_QUERIES)}
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


def q_span_unordered_top10(sf_dir: str):
    """ES/Lucene span_near(in_order=false, slop=2): all tokens in ANY
    order within the span-extent window — the window-existence kernel
    vectorized over every occurrence as the candidate window minimum
    (webindex/positional.py span_near_unordered_topk). Matches a
    superset of the ordered entry on the same queries."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "pos")
    runs = search_queries(
        _span_queries_ds(), idx, top_k=TOPK, query_kind="phrase",
        slop=SPAN_SLOP, in_order=False,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _span_unordered_match_sql(qid: str, text: str, slop: int) -> str:
    """Exists-within-window (any order) as an m-way position self-join:
    greatest - least over one position per distinct term <= m-1+slop."""
    ts = _sql_an.tokens(text)
    m = len(ts)
    joins = "".join(
        f" JOIN pos t{i} ON t{i}.doc_id = t0.doc_id" for i in range(1, m)
    )
    conds = [f"t{i}.term = '{t}'" for i, t in enumerate(ts)]
    ps = ", ".join(f"t{i}.p" for i in range(m))
    conds.append(f"greatest({ps}) - least({ps}) <= {m - 1 + slop}")
    return (
        f"SELECT DISTINCT '{qid}' AS qid, t0.doc_id FROM pos t0{joins} "
        f"WHERE {' AND '.join(conds)}"
    )


SQL_SPAN_UNORDERED_TOP10 = _sql_bm25_scores(_span_terms_values_sql()) + f"""
, dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents WHERE text <> ''),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pm AS (
  {" UNION ALL ".join(_span_unordered_match_sql(q, t, SPAN_SLOP)
                      for q, t in SPAN_QUERIES)}
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


# span_not: include phrase, exclusion term, pre/post window widening
SPAN_NOT_QUERIES: list[tuple[str, str, str, int, int]] = [
    ("x1", "merge join", "fast", 1, 1),
    ("x2", "customer order", "table", 0, 2),
    ("x3", "fast key", "value", 0, 0),
]


def q_span_not_top10(sf_dir: str):
    """ES/Lucene span_not: the include phrase matches only where its
    span, widened by pre/post, contains NO occurrence of the exclusion
    term — vectorized interval-emptiness test over the exclusion's
    position keys (webindex/positional.py span_not_topk). Scored like
    the phrase kernels (include clause only)."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "pos")
    outs = []
    for qid, text, ex, pre, post in SPAN_NOT_QUERIES:
        runs = search_queries(
            _queries_ds_of([(qid, text)]), idx, top_k=TOPK,
            query_kind="phrase", span=("not", ex, pre, post),
        )
        outs.append(runs.map_batches(
            lambda t: t.select(["qid", "doc_id", "rank"]),
            batch_format="pyarrow",
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def _queries_ds_of(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "qid": pa.array([q for q, _ in pairs]),
                "text": pa.array([t for _, t in pairs]),
            }
        )
    )


def _span_not_match_sql(qid: str, text: str, ex: str, pre: int,
                        post: int) -> str:
    """Exists a consecutive phrase start whose [start-pre, end+post]
    window holds no exclusion occurrence."""
    ts = _sql_an.tokens(text)
    m = len(ts)
    ex_t = _sql_an.tokens(ex)[0]
    joins = "".join(
        f" JOIN pos t{i} ON t{i}.doc_id = t0.doc_id" for i in range(1, m)
    )
    conds = [f"t{i}.term = '{t}'" for i, t in enumerate(ts)]
    conds += [f"t{i}.p = t0.p + {i}" for i in range(1, m)]
    conds.append(
        f"NOT EXISTS (SELECT 1 FROM pos e WHERE e.doc_id = t0.doc_id "
        f"AND e.term = '{ex_t}' "
        f"AND e.p BETWEEN t0.p - {pre} AND t0.p + {m - 1 + post})"
    )
    return (
        f"SELECT DISTINCT '{qid}' AS qid, t0.doc_id FROM pos t0{joins} "
        f"WHERE {' AND '.join(conds)}"
    )


def _span_not_terms_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, text, _ex, _pre, _post in SPAN_NOT_QUERIES
        for t in sorted(set(_sql_an.tokens(text)))
    )
    return f"(VALUES {rows}) AS q(qid, term)"


SQL_SPAN_NOT_TOP10 = _sql_bm25_scores(_span_not_terms_values_sql()) + f"""
, dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents WHERE text <> ''),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pm AS (
  {" UNION ALL ".join(_span_not_match_sql(q, t, e, pr, po)
                      for q, t, e, pr, po in SPAN_NOT_QUERIES)}
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


# span_containing: (big a, big b, little, slop)
SPAN_CONTAINING_QUERIES: list[tuple[str, str, str, int]] = [
    ("c1", "merge join", "fast", 6),
    ("c2", "customer order", "value", 4),
    ("c3", "scan table", "key", 8),
]


def q_span_containing_top10(sf_dir: str):
    """ES/Lucene span_containing: matches of the two-term big span
    (span_near in_order, slop) that CONTAIN an occurrence of the little
    term — vectorized tightest-pair test anchored at every little
    occurrence (webindex/positional.py span_containing_topk); scored
    over all three clause terms."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "pos")
    outs = []
    for qid, big, little, slop in SPAN_CONTAINING_QUERIES:
        runs = search_queries(
            _queries_ds_of([(qid, big)]), idx, top_k=TOPK,
            query_kind="phrase", slop=slop, span=("containing", little),
        )
        outs.append(runs.map_batches(
            lambda t: t.select(["qid", "doc_id", "rank"]),
            batch_format="pyarrow",
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def _span_containing_match_sql(qid: str, big: str, little: str,
                               slop: int) -> str:
    a, b = _sql_an.tokens(big)
    lt = _sql_an.tokens(little)[0]
    return (
        f"SELECT DISTINCT '{qid}' AS qid, ta.doc_id FROM pos ta "
        f"JOIN pos tb ON tb.doc_id = ta.doc_id "
        f"JOIN pos tq ON tq.doc_id = ta.doc_id "
        f"WHERE ta.term = '{a}' AND tb.term = '{b}' AND tq.term = '{lt}' "
        f"AND ta.p < tb.p AND (tb.p - ta.p) - 1 <= {slop} "
        f"AND tq.p BETWEEN ta.p AND tb.p"
    )


def _span_containing_terms_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, big, little, _slop in SPAN_CONTAINING_QUERIES
        for t in sorted(set(_sql_an.tokens(big) + _sql_an.tokens(little)))
    )
    return f"(VALUES {rows}) AS q(qid, term)"


SQL_SPAN_CONTAINING_TOP10 = (
    _sql_bm25_scores(_span_containing_terms_values_sql()) + f"""
, dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents WHERE text <> ''),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pm AS (
  {" UNION ALL ".join(_span_containing_match_sql(q, bg, lt, sl)
                      for q, bg, lt, sl in SPAN_CONTAINING_QUERIES)}
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""
)


# span_or_near: slot syntax "a|x b" (alternatives per proximity slot)
SPAN_OR_QUERIES: list[tuple[str, str, int]] = [
    ("o1", "merge|hash join", 2),
    ("o2", "customer|supplier order", 3),
    ("o3", "fast|slow scan|key", 1),
]


def q_span_or_near_top10(sf_dir: str):
    """ES/Lucene span_near whose clauses are span_or alternatives
    ("a|x b" slot syntax): in-order proximity where each slot accepts
    any of its terms — per-slot merged position-key arrays through the
    greedy chain (webindex/positional.py span_or_near_topk); scored
    OR-style over the union of slot terms."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "pos")
    outs = []
    for qid, text, slop in SPAN_OR_QUERIES:
        runs = search_queries(
            _queries_ds_of([(qid, text)]), idx, top_k=TOPK,
            query_kind="phrase", slop=slop, span=("or_near",),
        )
        outs.append(runs.map_batches(
            lambda t: t.select(["qid", "doc_id", "rank"]),
            batch_format="pyarrow",
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def _span_or_slots(text: str) -> list[list[str]]:
    return [
        [t for alt in slot.split("|") for t in _sql_an.tokens(alt)]
        for slot in text.split()
    ]


def _span_or_match_sql(qid: str, text: str, slop: int) -> str:
    slots = _span_or_slots(text)
    m = len(slots)
    joins = "".join(
        f" JOIN pos t{i} ON t{i}.doc_id = t0.doc_id" for i in range(1, m)
    )
    conds = [
        "t{}.term IN ({})".format(
            i, ", ".join(f"'{t}'" for t in sorted(set(s)))
        )
        for i, s in enumerate(slots)
    ]
    conds += [f"t{i}.p > t{i - 1}.p" for i in range(1, m)]
    conds.append(f"(t{m - 1}.p - t0.p) - {m - 1} <= {slop}")
    return (
        f"SELECT DISTINCT '{qid}' AS qid, t0.doc_id FROM pos t0{joins} "
        f"WHERE {' AND '.join(conds)}"
    )


def _span_or_terms_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, text, _slop in SPAN_OR_QUERIES
        for t in sorted({t for s in _span_or_slots(text) for t in s})
    )
    return f"(VALUES {rows}) AS q(qid, term)"


SQL_SPAN_OR_NEAR_TOP10 = _sql_bm25_scores(_span_or_terms_values_sql()) + f"""
, dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents WHERE text <> ''),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pm AS (
  {" UNION ALL ".join(_span_or_match_sql(q, t, sl)
                      for q, t, sl in SPAN_OR_QUERIES)}
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


def q_terms_set_top10(sf_dir: str):
    """ES terms_set with minimum_should_match_field: each doc requires
    (n_chars % 3) + 1 distinct query terms present (pinned per-doc rule
    both engines re-derive), scored as the OR-match BM25 sum of present
    terms (webindex/search.py terms_set_queries)."""
    from webindex.search import terms_set_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = terms_set_queries(_queries_ds(), idx, "n_chars", top_k=TOPK)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]),
        batch_format="pyarrow",
    )


SQL_TERMS_SET_TOP10 = _sql_bm25_scores() + f"""
, dterms AS (SELECT DISTINCT doc_id, term FROM toks),
mt AS (
  SELECT q.qid, d.doc_id, count(DISTINCT q.term)::BIGINT AS c
  FROM qterms q JOIN dterms d ON d.term = q.term
  GROUP BY q.qid, d.doc_id
),
keep AS (
  SELECT m.qid, m.doc_id
  FROM mt m JOIN documents dd ON dd.doc_id = m.doc_id
  WHERE m.c >= (dd.n_chars % 3) + 1
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER
             AS rank
  FROM scores s JOIN keep k ON k.qid = s.qid AND k.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


MBP_QUERIES = [("mb1", "merge jo"), ("mb2", "customer ord"),
               ("mb3", "fast sl")]


def q_match_bool_prefix_top10(sf_dir: str):
    """ES match_bool_prefix: base terms score OR-match BM25, the last
    term is a PREFIX contributing constant 1.0 when any of its top-50
    dictionary expansions is present (Lucene PrefixQuery CONSTANT_SCORE
    rewrite inside the bool — unlike match_phrase_prefix, the open-ended
    clause gets no idf). One dict scan + shard fan-out
    (webindex/lexicon.py match_bool_prefix)."""
    from webindex.lexicon import match_bool_prefix

    idx = ensure_index(sf_dir, "nostem")
    runs = match_bool_prefix(MBP_QUERIES, idx, top_k=TOPK,
                             max_expansions=50)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]),
        batch_format="pyarrow",
    )


def _mbp_base_values_sql() -> str:
    rows = [
        f"('{qid}', '{t}')"
        for qid, text in MBP_QUERIES
        for t in sorted(set(_sql_an.tokens(text)[:-1]))
    ]
    rows = rows or ["('__none__', '__none__')"]
    return f"(VALUES {', '.join(rows)}) AS q(qid, term)"


def _mbp_prefix_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{_sql_an.tokens(text)[-1]}')"
        for qid, text in MBP_QUERIES
    )
    return f"(VALUES {rows}) AS v(qid, pat)"


SQL_MATCH_BOOL_PREFIX = _sql_bm25_scores(_mbp_base_values_sql()) + f"""
, pexp AS (
  SELECT DISTINCT v.qid, e.term
  FROM {_mbp_prefix_values_sql()},
  LATERAL (
    SELECT term FROM df WHERE starts_with(term, v.pat)
    ORDER BY df DESC, term LIMIT 50
  ) e
),
pdocs AS (
  SELECT DISTINCT px.qid, tk.doc_id
  FROM pexp px JOIN toks tk ON tk.term = px.term
),
un AS (
  SELECT coalesce(s.qid, p.qid) AS qid,
         coalesce(s.doc_id, p.doc_id) AS doc_id,
         coalesce(s.score, 0.0)
         + CASE WHEN p.qid IS NOT NULL THEN 1.0 ELSE 0.0 END AS score
  FROM scores s
  FULL JOIN pdocs p ON p.qid = s.qid AND p.doc_id = s.doc_id
)
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM un
) WHERE rank <= {TOPK}
"""


SQ8_K, SQ8_OVERSAMPLE = 5, 4


def q_ann_sq8_top5(sf_dir: str):
    """ES dense_vector int8 scalar quantization + exact rescore: the
    uint8 code table (exact global per-dim min/max of the normalized
    vectors, floor(x+0.5) rounding — the rounding both engines share)
    is scanned for approximate sims, the global top k*4 candidates
    rescore with exact cosine (broadcast candidate semi-join), exact
    top-5 out (webindex/ann.py sq8_train/encode/topk)."""
    import ray.data as rd

    from webindex.ann import sq8_encode, sq8_topk, sq8_train

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    qdf = emb.filter(lambda r: r["vec_id"] < 3).to_pandas()
    qids = qdf["vec_id"].tolist()
    qvecs = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    params = sq8_train(emb)
    codes = sq8_encode(emb, params)
    out = sq8_topk(codes, emb, params, qids, qvecs, SQ8_K,
                   oversample=SQ8_OVERSAMPLE)

    def round_sim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sim_r"] = df["sim"].round(6)
        return df[["query_id", "vec_id", "sim_r", "rank"]]

    return out.map_batches(round_sim, batch_format="pandas")


SQL_ANN_SQ8_TOP5 = f"""
WITH nrm AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             AS nv
  FROM embeddings
),
el AS (
  SELECT n.vec_id, g.i, n.v[g.i] / n.nv AS x
  FROM nrm n, unnest(generate_series(1, len(n.v))) AS g(i)
),
params AS (
  SELECT i, min(x) AS lo, max(x) AS hi FROM el GROUP BY i
),
codes AS (
  SELECT e.vec_id, e.i,
         CASE WHEN p.hi - p.lo <= 0 THEN 0
              ELSE least(greatest(
                  floor((e.x - p.lo) / (p.hi - p.lo) * 255.0 + 0.5),
                  0), 255)
         END AS code
  FROM el e JOIN params p ON p.i = e.i
),
dec AS (
  SELECT c.vec_id, c.i,
         p.lo + c.code * ((p.hi - p.lo) / 255.0) AS d
  FROM codes c JOIN params p ON p.i = c.i
),
q AS (SELECT vec_id AS query_id, i, x AS qx FROM el WHERE vec_id IN (0, 1, 2)),
asim AS (
  SELECT q.query_id, d.vec_id, sum(q.qx * d.d) AS a
  FROM q JOIN dec d ON d.i = q.i
  GROUP BY q.query_id, d.vec_id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY a DESC, vec_id) AS r
    FROM asim
  ) WHERE r <= {SQ8_K * SQ8_OVERSAMPLE}
),
exact AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(qe.embedding::DOUBLE[],
                                ve.embedding::DOUBLE[]) AS sim
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ve ON ve.vec_id = c.vec_id
)
SELECT query_id, vec_id, round(sim, 6) AS sim_r, rank FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id)::INTEGER AS rank
  FROM exact
) WHERE rank <= {SQ8_K}
"""


CHILD_TOKENS = 20
_CHILD_PACK = 1 << 12


def ensure_child_index(sf_dir: str) -> str:
    """Build (once, resumably) the parent-child join-field child index:
    documents chunked into 20-token children, child docID packs
    parent << 12 | chunk_id (co-location invariant, webindex/joinfield)."""
    import ray.data as rd

    from webindex.build import build_index
    from webindex.joinfield import child_corpus

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-children")
    cfg = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=16)
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    kids = child_corpus(docs, chunk_tokens=CHILD_TOKENS)
    build_index(
        kids.select_columns(["doc_id", "text"]), out, cfg,
        docvalues_ds=kids.select_columns(["doc_id", "parent_id"]),
    )
    return out


def q_has_child_top10(sf_dir: str):
    """ES has_child(score_mode=max): parents ranked by the best BM25
    score among their matching children (documents chunked to 20-token
    child docs; child co-location is structural — webindex/joinfield.py
    has_child_topk)."""
    from webindex.joinfield import has_child_topk

    idx = ensure_child_index(sf_dir)
    return has_child_topk(_queries_ds(), idx, k=TOPK, score_mode="max")


def q_has_child_sum_top10(sf_dir: str):
    """ES has_child(score_mode=sum): parents ranked by the SUM of their
    matching children's scores — sequential ascending-child-docID fold,
    6dp surface, ranked on the rounded value in both engines."""
    from webindex.joinfield import has_child_topk

    idx = ensure_child_index(sf_dir)
    return has_child_topk(_queries_ds(), idx, k=TOPK, score_mode="sum")


_CHILD_DOCS_SQL = f"""
SELECT d.doc_id * {_CHILD_PACK} + (u.s // {CHILD_TOKENS}) AS doc_id,
       array_to_string(d.tl[u.s + 1: u.s + {CHILD_TOKENS}], ' ') AS text
FROM (SELECT doc_id, {_TOK_SQL} AS tl FROM documents) d,
     unnest(range(0, len(d.tl), {CHILD_TOKENS})) AS u(s)
"""


def _sql_has_child(mode_expr: str) -> str:
    return _sql_bm25_scores(docs_sql=_CHILD_DOCS_SQL) + f"""
, combined AS (
  SELECT qid, doc_id // {_CHILD_PACK} AS parent_id,
         {mode_expr} AS score,
         count(*)::BIGINT AS n_children
  FROM scores GROUP BY qid, doc_id // {_CHILD_PACK}
)
SELECT qid, parent_id, score, n_children, rank FROM (
  SELECT qid, parent_id, score, n_children,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, parent_id)::INTEGER
             AS rank
  FROM combined
) WHERE rank <= {TOPK}
"""


SQL_HAS_CHILD_TOP10 = _sql_has_child("round(max(score), 6)")
SQL_HAS_CHILD_SUM_TOP10 = _sql_has_child(
    "round(list_sum(list(score ORDER BY doc_id)), 6)"
)


HAS_PARENT_K = 5


def q_has_parent_children(sf_dir: str):
    """ES has_parent(score=true): every child of each query's top-5
    matching parents, carrying the parent's (6dp) BM25 score, ranked
    (parent score desc, child docID asc) — parent runs broadcast once,
    the child corpus streams through one stateless semi-join
    (webindex/joinfield.py has_parent_children)."""
    import ray.data as rd

    from webindex.joinfield import has_parent_children

    idx = ensure_index(sf_dir, "nostem")
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return has_parent_children(
        _queries_ds(), idx, docs, parent_k=HAS_PARENT_K,
        chunk_tokens=CHILD_TOKENS,
    )


SQL_HAS_PARENT_CHILDREN = _sql_bm25_scores() + f"""
, parents AS (
  SELECT qid, doc_id AS parent_id, round(score, 6) AS parent_score
  FROM (
    SELECT qid, doc_id, score,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id) AS r
    FROM scores
  ) WHERE r <= {HAS_PARENT_K}
),
kids AS ({_CHILD_DOCS_SQL})
SELECT qid, doc_id, parent_id, parent_score, rank FROM (
  SELECT p.qid, k.doc_id, p.parent_id, p.parent_score,
         row_number() OVER (PARTITION BY p.qid
                            ORDER BY p.parent_score DESC,
                                     k.doc_id)::INTEGER AS rank
  FROM parents p
  JOIN kids k ON k.doc_id // {_CHILD_PACK} = p.parent_id
)
"""


def q_perplexity_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.2): per LANGUAGE the corpus cuts into terciles of the unigram-LM
    per-token log-probability (6dp contract surface so the cutoffs are
    engine-portable); tercile cutoffs by exact distributed nearest-rank
    selection (webindex/quantile.py grouped_quantile_disc), assignment
    one stateless pass (webindex/textstats.py perplexity_buckets)."""
    import ray.data as rd

    from webindex.textstats import perplexity_buckets

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return perplexity_buckets(docs)


SQL_PERPLEXITY_BUCKETS = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
toks AS (SELECT doc_id, unnest(tl) AS term FROM dt),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY doc_id, term),
cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(cf)::BIGINT AS total FROM cf),
contrib AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln(cf.cf / t.total) AS c
  FROM tf JOIN cf ON cf.term = tf.term CROSS JOIN tot t
),
agg AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         list_sum(list(c ORDER BY term)) AS lp
  FROM contrib GROUP BY doc_id
),
scored AS (
  SELECT a.doc_id, d.lang, round(a.lp / a.n_tokens, 6) AS lpt_r
  FROM agg a JOIN documents d ON d.doc_id = a.doc_id
),
cuts AS (
  SELECT lang,
         list(lpt_r ORDER BY lpt_r)
             [CAST(ceil(count(*) / 3.0) AS BIGINT)] AS c1,
         list(lpt_r ORDER BY lpt_r)
             [CAST(ceil(count(*) * 2 / 3.0) AS BIGINT)] AS c2
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.lpt_r,
       CASE WHEN s.lpt_r <= c.c1 THEN 'tail'
            WHEN s.lpt_r <= c.c2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM scored s JOIN cuts c ON c.lang = s.lang
"""


PARA_TOKENS = 20


def q_paragraph_dedup(sf_dir: str):
    """Dolma-style paragraph-level exact dedup: docs split into pinned
    20-token paragraphs, each distinct paragraph keeps only its globally
    FIRST occurrence (min (doc_id, para_id)), docs REWRITTEN from their
    kept paragraphs — one paragraph-hash shuffle with min-key combiners
    + one doc-hash rebuild (webindex/dedup.py paragraph_dedup). Exact
    string identity vs the SQL list-slice + window-min oracle."""
    import ray.data as rd

    from webindex.dedup import paragraph_dedup

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return paragraph_dedup(docs, para_tokens=PARA_TOKENS)


SQL_PARAGRAPH_DEDUP = f"""
WITH dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents),
paras AS (
  SELECT doc_id, (u.s // {PARA_TOKENS})::BIGINT AS para_id,
         array_to_string(tl[u.s + 1: u.s + {PARA_TOKENS}], ' ') AS ptext
  FROM dt, unnest(range(0, len(tl), {PARA_TOKENS})) AS u(s)
),
win AS (
  SELECT ptext, min(doc_id * 1048576 + para_id) AS k
  FROM paras GROUP BY ptext
),
kept AS (
  SELECT p.doc_id, p.para_id, p.ptext
  FROM paras p JOIN win w
    ON w.ptext = p.ptext AND p.doc_id * 1048576 + p.para_id = w.k
)
SELECT d.doc_id,
       coalesce(string_agg(k.ptext, ' ' ORDER BY k.para_id), '') AS text,
       count(k.ptext)::BIGINT AS n_kept,
       ((len(d.tl) + {PARA_TOKENS} - 1) // {PARA_TOKENS})::BIGINT
           AS n_paras
FROM dt d LEFT JOIN kept k ON k.doc_id = d.doc_id
GROUP BY d.doc_id, len(d.tl)
"""


AUTO_DH_TARGET = 50


def q_events_auto_histogram(sf_dir: str):
    """ES auto_date_histogram: the engine picks the interval from a
    pinned ladder (smallest rung whose bucket-count bound fits the
    target), then runs the fixed-interval histogram at that rung — exact
    int64 min/max pass + the hash-partitioned combiner/final shape
    (webindex/temporal.py auto_date_histogram). The interval CHOICE is
    part of the verified contract: the SQL oracle re-derives it with the
    same integer arithmetic over the same ladder."""
    import ray.data as rd

    from webindex.temporal import auto_date_histogram

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"],
        override_num_blocks=16,
    )
    return auto_date_histogram(ds, "ts", target_buckets=AUTO_DH_TARGET)


def _sql_auto_dh() -> str:
    from webindex.temporal import AUTO_DH_LADDER_US

    iv_case = " ".join(
        f"WHEN (hi // {iv}) - (lo // {iv}) + 1 <= {AUTO_DH_TARGET} "
        f"THEN {iv}"
        for _label, iv in AUTO_DH_LADDER_US
    )
    lb_case = " ".join(
        f"WHEN (hi // {iv}) - (lo // {iv}) + 1 <= {AUTO_DH_TARGET} "
        f"THEN '{label}'"
        for label, iv in AUTO_DH_LADDER_US
    )
    last_iv = AUTO_DH_LADDER_US[-1][1]
    last_lb = AUTO_DH_LADDER_US[-1][0]
    return f"""
WITH us AS (SELECT epoch_us(ts)::BIGINT AS us FROM events),
mm AS (SELECT min(us) AS lo, max(us) AS hi FROM us),
iv AS (
  SELECT CASE {iv_case} ELSE {last_iv} END AS iv,
         CASE {lb_case} ELSE '{last_lb}' END AS label
  FROM mm
)
SELECT i.label AS interval,
       make_timestamp((e.us // i.iv) * i.iv) AS bucket,
       count(*)::BIGINT AS n_events
FROM us e, iv i
GROUP BY i.label, make_timestamp((e.us // i.iv) * i.iv)
"""


DATE_RANGES: list[tuple[str, str, str]] = [
    ("week1", "2024-01-01", "2024-01-08"),
    ("mid", "2024-01-08", "2024-01-20"),
    ("tail", "2024-01-20", ""),
    ("all", "", ""),
    ("empty", "2030-01-01", "2030-02-01"),
]


def q_events_date_range(sf_dir: str):
    """ES date_range aggregation: NAMED half-open [from, to) timestamp
    buckets with open ends, overlaps allowed, empty named buckets kept
    at 0 (the caller-fixed bucket set, like the filters aggregation) —
    per-batch vectorized membership counts + one tiny Sum groupby
    (webindex/temporal.py date_range_agg)."""
    import ray.data as rd

    from webindex.temporal import date_range_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"],
        override_num_blocks=16,
    )
    return date_range_agg(ds, "ts", DATE_RANGES)


def _sql_date_range() -> str:
    parts = []
    for name, lo, hi in DATE_RANGES:
        conds = []
        if lo:
            conds.append(f"ts >= TIMESTAMP '{lo}'")
        if hi:
            conds.append(f"ts < TIMESTAMP '{hi}'")
        filt = f" FILTER ({' AND '.join(conds)})" if conds else ""
        parts.append(
            f"SELECT '{name}' AS range, "
            f"coalesce(count(*){filt}, 0)::BIGINT AS n_events FROM events"
        )
    return " UNION ALL ".join(parts)


SAMPLER_SIZE = 25
SAMPLER_CAP = 5


def q_sampler_terms(sf_dir: str):
    """ES sampler aggregation + terms sub-agg: lang value counts over
    each query's pinned GLOBAL top-25 best-scoring matches (ES samples
    per shard — shard-count-dependent; the global sample is
    deterministic, the rescore-window precedent). Per-shard top-25
    partials are a proven superset (webindex/search.py sampler_terms)."""
    from webindex.search import sampler_terms

    idx = ensure_index(sf_dir, "nostem")
    return sampler_terms(
        _queries_ds(), idx, "lang", shard_size=SAMPLER_SIZE
    )


def q_diversified_terms(sf_dir: str):
    """ES diversified_sampler + terms sub-agg: the sampler walk keeps at
    most 5 docs per lang (de-biasing the sample) — equivalent to the
    non-recursive "value-rank <= cap, then first 25 by global order"
    rule both engines replay; per-shard per-value top-cap partials are
    the top_hits superset (webindex/search.py sampler_terms)."""
    from webindex.search import sampler_terms

    idx = ensure_index(sf_dir, "nostem")
    return sampler_terms(
        _queries_ds(), idx, "lang", shard_size=SAMPLER_SIZE,
        max_docs_per_value=SAMPLER_CAP,
    )


SQL_SAMPLER_TERMS = _sql_bm25_scores() + f"""
, sv AS (
  SELECT s.qid, s.doc_id, s.score, d.lang AS value
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id
),
kept AS (
  SELECT qid, value,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rg
  FROM sv
)
SELECT qid, value, count(*)::BIGINT AS cnt
FROM kept WHERE rg <= {SAMPLER_SIZE}
GROUP BY qid, value
"""


SQL_DIVERSIFIED_TERMS = _sql_bm25_scores() + f"""
, sv AS (
  SELECT s.qid, s.doc_id, s.score, d.lang AS value
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id
),
rv AS (
  SELECT qid, doc_id, score, value,
         row_number() OVER (PARTITION BY qid, value
                            ORDER BY score DESC, doc_id) AS r_val
  FROM sv
),
kept AS (
  SELECT qid, value,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rg
  FROM rv WHERE r_val <= {SAMPLER_CAP}
)
SELECT qid, value, count(*)::BIGINT AS cnt
FROM kept WHERE rg <= {SAMPLER_SIZE}
GROUP BY qid, value
"""


SIG_FG_K = 20
SIG_TOP_N = 10


def q_sig_terms(sf_dir: str):
    """ES significant_terms over a sampled foreground: per query, the
    terms most overrepresented in its top-20 BM25 hits vs the corpus,
    JLH-scored (webindex/lexicon.py significant_terms)."""
    from webindex.lexicon import significant_terms

    idx = ensure_index(sf_dir, "nostem")
    return significant_terms(
        _queries_ds(), _docs(sf_dir), idx, fg_k=SIG_FG_K, top_n=SIG_TOP_N,
        concurrency=2, batch_size=8,
    )


SQL_SIG_TERMS = _sql_bm25_scores() + f"""
, fgdocs AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id) AS rn
    FROM scores
  ) WHERE rn <= {SIG_FG_K}
),
fgn AS (SELECT qid, count(*)::BIGINT AS fg_n FROM fgdocs GROUP BY qid),
dterms AS (SELECT DISTINCT doc_id, term FROM toks),
fgdf AS (
  SELECT f.qid, t.term, count(*)::BIGINT AS fg_df
  FROM fgdocs f JOIN dterms t ON t.doc_id = f.doc_id
  GROUP BY f.qid, t.term
),
bg AS (SELECT term, count(*)::BIGINT AS df FROM dterms GROUP BY term),
scored AS (
  SELECT g.qid, g.term,
         round(((g.fg_df / n.fg_n) - (b.df / s.n_docs))
               * ((g.fg_df / n.fg_n) / (b.df / s.n_docs)), 9) AS score_r,
         (g.fg_df / n.fg_n) AS fgr, (b.df / s.n_docs) AS bgr
  FROM fgdf g
  JOIN fgn n ON n.qid = g.qid
  JOIN bg b ON b.term = g.term
  CROSS JOIN stats s
)
SELECT qid, term, score_r, rank FROM (
  SELECT qid, term, score_r,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_r DESC, term)::INTEGER AS rank
  FROM scored WHERE fgr > bgr
) WHERE rank <= {SIG_TOP_N}
"""


def q_collapse_top5(sf_dir: str):
    """ES collapse (field collapsing / host dedup): BM25 top-5 with at
    most one hit per ``source`` value, scores untouched
    (webindex/search.py collapse_queries; exact shard merge — see its
    docstring's superset argument)."""
    from webindex.search import collapse_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = collapse_queries(_queries_ds(), idx, "source", top_k=5)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "ckey", "rank"]),
        batch_format="pyarrow",
    )


SQL_COLLAPSE_TOP5 = _sql_bm25_scores() + """
, keyed AS (
  SELECT s.qid, s.doc_id, s.score, d.source AS ckey,
         row_number() OVER (PARTITION BY s.qid, d.source
                            ORDER BY s.score DESC, s.doc_id) AS grp_rn
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT qid, doc_id, ckey, rank FROM (
  SELECT qid, doc_id, ckey,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM keyed WHERE grp_rn = 1
) WHERE rank <= 5
"""


PCT_PS = (25, 50, 75, 95)


def q_facet_pcts(sf_dir: str):
    """ES percentiles aggregation, EXACT (nearest-rank) instead of
    t-digest: per-shard per-(qid, value) match-count histograms merged
    with an exact Sum, percentile read off the merged histogram
    (webindex/search.py facet_percentiles)."""
    from webindex.search import facet_percentiles

    idx = ensure_index(sf_dir, "nostem")
    return facet_percentiles(_queries_ds(), idx, "n_chars", ps=PCT_PS)


SQL_FACET_PCTS = f"""
WITH docs AS (SELECT doc_id, text, n_chars FROM documents
              WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qt AS (SELECT * FROM {_query_values_sql()}),
hits AS (
  SELECT DISTINCT qt.qid, tk.doc_id
  FROM qt JOIN toks tk ON tk.term = qt.term
),
vals AS (
  SELECT h.qid, d.n_chars AS value
  FROM hits h JOIN docs d ON d.doc_id = h.doc_id
),
ordv AS (
  SELECT qid, value,
         row_number() OVER (PARTITION BY qid ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY qid) AS n
  FROM vals
)
SELECT o.qid, p.p, o.value
FROM (VALUES {", ".join(f"({p})" for p in PCT_PS)}) p(p)
JOIN ordv o
  ON o.rn = greatest(1, least(o.n, (p.p * o.n + 99) // 100))
"""


PACK_CAP = 128
PACK_BUCKETS = 8


def q_packed_seqs(sf_dir: str):
    """Token-budget sequence packing (LLM pretraining data prep,
    webindex/pack.py): docs bucketed by doc_id % 8 pack greedily in
    ascending doc_id order into 128-token sequences; oversized docs get a
    sequence of their own. Deterministic per spec, so the DuckDB
    recursive-CTE oracle replays the greedy scan row for row."""
    from webindex.pack import pack_sequences

    def with_tokens(batch: pa.Table) -> pa.Table:
        an = Analyzer(SQL_SAFE_ANALYZER)
        nt = [
            len(an.tokens(t or ""))
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_tokens": pa.array(nt, pa.int64())}
        )

    docs = _docs(sf_dir).map_batches(with_tokens, batch_format="pyarrow")
    return pack_sequences(
        docs, max_tokens=PACK_CAP, n_buckets=PACK_BUCKETS
    )


SQL_PACKED_SEQS = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, len({_TOK_SQL})::BIGINT AS nt,
         (doc_id % {PACK_BUCKETS})::INTEGER AS bucket
  FROM documents
),
ord AS (
  SELECT doc_id, nt, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM toks
),
state(bucket, rn, doc_id, nt, seq, off, cum) AS (
  SELECT bucket, rn, doc_id, nt, 0::BIGINT, 0::BIGINT, nt
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.nt,
         CASE WHEN s.cum > 0 AND s.cum + o.nt > {PACK_CAP}
              THEN s.seq + 1 ELSE s.seq END,
         CASE WHEN s.cum > 0 AND s.cum + o.nt > {PACK_CAP}
              THEN 0 ELSE s.cum END,
         CASE WHEN s.cum > 0 AND s.cum + o.nt > {PACK_CAP}
              THEN o.nt ELSE s.cum + o.nt END
  FROM state s JOIN ord o ON o.bucket = s.bucket AND o.rn = s.rn + 1
)
SELECT doc_id, bucket, seq, off AS "offset" FROM state
"""


SAMPLE_FRAC = 0.2
STRATA_FRACS = {"en": 0.5, "de": 0.1}


def q_sample_docs(sf_dir: str):
    """Deterministic content-hash sampling (md5-prefix threshold —
    partition/engine-independent, repeatable; webindex/relational.py
    deterministic_sample): keep ~20% of documents by doc_id hash."""
    from webindex.relational import deterministic_sample

    return deterministic_sample(
        _docs(sf_dir).select_columns(["doc_id"]), SAMPLE_FRAC
    )


_SAMPLE_TH = format(int(SAMPLE_FRAC * 16**8), "08x")

SQL_SAMPLE_DOCS = f"""
SELECT doc_id FROM documents
WHERE substr(md5(doc_id::VARCHAR), 1, 8) < '{_SAMPLE_TH}'
"""


def q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling (per-language corpus-mix
    quotas): en at 50%, de at 10%, everything else dropped
    (webindex/relational.py stratified_sample)."""
    import ray.data as rd

    from webindex.relational import stratified_sample

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )
    return stratified_sample(docs, "lang", STRATA_FRACS)


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5(doc_id::VARCHAR), 1, 8) < CASE lang
  {" ".join(
      f"WHEN '{k}' THEN '{format(int(f * 16**8), '08x')}'"
      for k, f in sorted(STRATA_FRACS.items())
  )}
  ELSE '00000000' END
"""


MUST_NOT_TERMS = ["slow", "big"]


def q_bm25_not_top10(sf_dir: str):
    """ES bool must_not: BM25 top-10 excluding every doc that contains any
    negated term; survivor scores unchanged (must_not is filter-context —
    it never contributes to the score). Routed to the constrained
    exhaustive kernel; exclusion is per-document, so the sharded
    scatter-gather merge composes exactly."""
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        must_not=MUST_NOT_TERMS,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_BM25_NOT_TOP10 = _sql_bm25_scores() + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
  WHERE doc_id NOT IN (
    SELECT DISTINCT doc_id FROM tf
    WHERE term IN ({", ".join(f"'{t}'" for t in MUST_NOT_TERMS)})
  )
) WHERE rank <= {TOPK}
"""


def q_search_count(sf_dir: str):
    """ES _count / track_total_hits: each query's FULL match count (OR
    semantics), sharded count + exact Sum merge
    (webindex/search.py count_queries)."""
    from webindex.search import count_queries

    idx = ensure_index(sf_dir, "nostem")
    return count_queries(_queries_ds(), idx)


SQL_SEARCH_COUNT = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
qt AS (SELECT * FROM {_query_values_sql()}),
hits AS (
  SELECT qt.qid, tk.doc_id
  FROM qt JOIN toks tk ON tk.term = qt.term
)
-- LEFT JOIN from the query list: a zero-match query still emits a 0 row
-- (the engine always emits one row per qid, like ES _count)
SELECT q.qid, count(DISTINCT h.doc_id)::BIGINT AS total
FROM (SELECT DISTINCT qid FROM qt) q
LEFT JOIN hits h ON h.qid = q.qid
GROUP BY q.qid
"""


SPELL_TERMS = ["mergge", "windoww", "batch", "qzqzq", "custmer"]
SPELL_K = 3


def q_spell_correct(sf_dir: str):
    """ES term suggester, suggest_mode=missing (did-you-mean): top-3
    dictionary corrections within edit distance 1 (first char pinned) for
    the query terms absent from the dictionary; in-dictionary terms emit
    nothing (webindex/lexicon.py spell_correct)."""
    from webindex.lexicon import spell_correct

    idx = ensure_index(sf_dir, "nostem")
    return spell_correct(
        idx, SPELL_TERMS, max_edits=1, prefix_len=1, k=SPELL_K
    )


SQL_SPELL_CORRECT = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
miss AS (
  SELECT v.qterm
  FROM (VALUES {", ".join(f"('{t}')" for t in sorted(set(SPELL_TERMS)))})
       v(qterm)
  WHERE NOT EXISTS (SELECT 1 FROM dft d WHERE d.term = v.qterm)
)
SELECT m.qterm, e.term, e.df,
       row_number() OVER (PARTITION BY m.qterm
                          ORDER BY e.df DESC, e.term)::INTEGER AS rank
FROM miss m,
LATERAL (
  SELECT term, df FROM dft
  WHERE levenshtein(term, m.qterm) <= 1
    AND substr(term, 1, 1) = substr(m.qterm, 1, 1)
  ORDER BY df DESC, term LIMIT {SPELL_K}
) e
"""


SYNONYMS: dict[str, list[str]] = {
    "merge": ["join"],
    "sort": ["order"],
    "stream": ["window"],
    "big": ["large"],
    "fast": ["quick"],
    "row": ["line"],
}
SYN_QUERIES: list[tuple[str, str]] = [
    ("y1", "merge sort"),
    ("y2", "fast stream"),
    ("y3", "big row table"),
]


def q_synonym_top10(sf_dir: str):
    """ES query-time synonym expansion (expand=true): each analyzed term
    ORs in its mapped synonyms, every term scored with its own idf
    (webindex/lexicon.py synonym_search via the pre_tokenized path). The
    SQL oracle performs the same expansion with a relational join against
    the synonym VALUES table."""
    from webindex.lexicon import synonym_search

    idx = ensure_index(sf_dir, "nostem")
    runs = synonym_search(
        SYN_QUERIES, idx, SYNONYMS, top_k=TOPK, concurrency=2, batch_size=8
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _syn_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, text in SYN_QUERIES
        for t in sorted(set(_sql_an.tokens(text)))
    )
    syn_rows = ", ".join(
        f"('{t}', '{e}')"
        for t, exps in sorted(SYNONYMS.items())
        for e in sorted({t, *exps})
    )
    # identity rows for terms with no mapping come from the LEFT JOIN
    return f"""(
  SELECT DISTINCT b.qid, coalesce(s.exp, b.term) AS term
  FROM (VALUES {rows}) b(qid, term)
  LEFT JOIN (VALUES {syn_rows}) s(term, exp) ON s.term = b.term
) AS sy(qid, term)"""


SQL_SYNONYM_TOP10 = _sql_bm25_scores(_syn_values_sql()) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


def q_repetition(sf_dir: str):
    """Gopher-style repetition signals (dup-line / dup-line-char / top
    bigram / dup 3-gram / dup 5-gram fractions) per document — the
    repetition filters of a Common-Crawl curation pipeline
    (webindex/textstats.py repetition_signals). Every fraction is one
    int/int IEEE division, so the SQL oracle is bit-exact."""
    from webindex.textstats import repetition_signals

    return repetition_signals(_docs(sf_dir))


SQL_REPETITION = f"""
WITH docs AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
lines AS (
  SELECT doc_id, l.ln
  FROM docs, unnest(string_split(text, chr(10))) AS l(ln)
),
linestats AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
         count(DISTINCT ln)::BIGINT AS n_dist,
         sum(len(ln))::BIGINT AS tot_chars
  FROM lines GROUP BY doc_id
),
dlc AS (
  SELECT doc_id, sum(len(ln))::BIGINT AS dist_chars
  FROM (SELECT DISTINCT doc_id, ln FROM lines) GROUP BY doc_id
),
toks AS (SELECT doc_id, {_TOK_SQL} AS tk FROM docs),
g2 AS (
  SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS g
  FROM (SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)
),
g2s AS (
  SELECT doc_id, max(c)::BIGINT AS topc, sum(c)::BIGINT AS total
  FROM (SELECT doc_id, g, count(*)::BIGINT AS c FROM g2
        GROUP BY doc_id, g)
  GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS g
  FROM (SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - 2)) AS i FROM toks)
),
g3s AS (SELECT doc_id, count(*)::BIGINT AS total,
               count(DISTINCT g)::BIGINT AS dist
        FROM g3 GROUP BY doc_id),
g5 AS (
  SELECT doc_id,
         tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] || ' ' ||
         tk[i + 3] || ' ' || tk[i + 4] AS g
  FROM (SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - 4)) AS i FROM toks)
),
g5s AS (SELECT doc_id, count(*)::BIGINT AS total,
               count(DISTINCT g)::BIGINT AS dist
        FROM g5 GROUP BY doc_id)
SELECT d.doc_id,
       ls.n_lines,
       CASE WHEN ls.n_lines > 0
            THEN (ls.n_lines - ls.n_dist) / ls.n_lines ELSE 0.0
       END AS dup_line_frac,
       CASE WHEN ls.tot_chars > 0
            THEN (ls.tot_chars - dlc.dist_chars) / ls.tot_chars ELSE 0.0
       END AS dup_line_char_frac,
       CASE WHEN g2s.total > 0 THEN g2s.topc / g2s.total ELSE 0.0
       END AS top2gram_frac,
       CASE WHEN g3s.total > 0
            THEN (g3s.total - g3s.dist) / g3s.total ELSE 0.0
       END AS dup3gram_frac,
       CASE WHEN g5s.total > 0
            THEN (g5s.total - g5s.dist) / g5s.total ELSE 0.0
       END AS dup5gram_frac
FROM docs d
JOIN linestats ls USING (doc_id)
JOIN dlc USING (doc_id)
LEFT JOIN g2s USING (doc_id)
LEFT JOIN g3s USING (doc_id)
LEFT JOIN g5s USING (doc_id)
"""


PAGERANK_ITERS = 5


def q_pagerank(sf_dir: str):
    """Distributed fixed-point PageRank (webindex/graph.py) over the
    deterministic synthetic link graph derived from the documents table
    (doc i -> (i + off + n_chars_i) % N for off in LINK_OFFSETS). Integer
    micro-unit arithmetic makes the result bit-identical across
    partitionings and engines, so the DuckDB oracle replays the exact
    update rule. Returns (node, pr_q, rank)."""
    import ray.data as rd

    from webindex.graph import pagerank, synth_links

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )
    n = docs.count()
    pr = pagerank(
        synth_links(docs, n), iters=PAGERANK_ITERS, n_parts=16, n_nodes=n
    )
    out = pr.to_pandas().sort_values(
        ["pr_q", "node"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out


def _sql_pagerank(iters: int) -> str:
    from webindex.graph import LINK_OFFSETS, SCALE

    offs = ", ".join(f"({o})" for o in LINK_OFFSETS)
    ctes = [f"""
WITH nodes AS (SELECT doc_id AS node FROM documents),
cnt AS (SELECT count(*)::BIGINT AS n FROM nodes),
edges AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id + o.off + n_chars) % (SELECT n FROM cnt) AS dst
  FROM documents, (VALUES {offs}) o(off)
  WHERE (doc_id + o.off + n_chars) % (SELECT n FROM cnt) <> doc_id
),
deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
pr0 AS (SELECT node, ({SCALE} // (SELECT n FROM cnt))::BIGINT AS pr_q
        FROM nodes)"""]
    for t in range(1, iters + 1):
        p = t - 1
        ctes.append(f"""
dm{t} AS (SELECT coalesce(sum(p.pr_q), 0) // (SELECT n FROM cnt) AS m
          FROM pr{p} p LEFT JOIN deg d ON d.src = p.node
          WHERE d.src IS NULL),
pr{t} AS (
  SELECT n.node,
         ((3 * {SCALE}) // (20 * (SELECT n FROM cnt))
          + (17 * (coalesce(s.sq, 0) + (SELECT m FROM dm{t}))) // 20
         )::BIGINT AS pr_q
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr_q // d.outdeg) AS sq
    FROM edges e
    JOIN pr{p} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)""")
    return (
        ",".join(ctes)
        + f"""
SELECT node, pr_q,
       row_number() OVER (ORDER BY pr_q DESC, node)::INTEGER AS rank
FROM pr{iters}
"""
    )


SQL_PAGERANK = _sql_pagerank(PAGERANK_ITERS)


URL_CAP = 30  # per-host keep budget (bites at sf0.01: ~38 docs/host)


def _messy_url(doc_id: int, lang: str) -> str:
    """Deterministic messy URL re-derived identically by the oracle."""
    return (
        f"HTTPS://WWW.Site{doc_id % 13}.Example.COM:443/Wiki/{lang}/"
        f"{doc_id}?b={doc_id % 7}&utm_source=feed&a=1&fbclid=x{doc_id}"
        f"#sec{doc_id % 5}"
    )


def q_url_curation(sf_dir: str):
    """URL canonicalization + per-domain cap (webindex/urlnorm.py — the
    C4/RefinedWeb crawl-curation front door): scheme/host lowercase,
    www./default-port strip, fragment drop, tracking params removed and
    the rest sorted; then keep the URL_CAP lowest doc_ids per host (the
    deterministic cap-per-domain rule, per-batch superset cut + one
    host-hash shuffle). Deterministic messy URLs are re-derived from
    (doc_id, lang) by BOTH engines; the oracle replays every
    canonicalization step with string/list functions. Hash check is
    exact string identity on the canonical URLs."""
    import ray.data as rd

    from webindex.urlnorm import canonicalize, domain_cap

    def synth(batch: pa.Table) -> pa.Table:
        urls = [
            _messy_url(d, la)
            for d, la in zip(batch.column("doc_id").to_pylist(),
                             batch.column("lang").to_pylist())
        ]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    ).map_batches(synth, batch_format="pyarrow")
    out = domain_cap(canonicalize(ds), k=URL_CAP, n_parts=16)
    return out.map_batches(
        lambda t: t.select(
            ["doc_id", "url_canon", "host", "domain", "path_depth"]
        ),
        batch_format="pyarrow",
    )


def _sql_url_curation() -> str:
    from webindex.urlnorm import TRACKING_KEYS

    tk = ", ".join(f"'{k}'" for k in sorted(TRACKING_KEYS))
    return f"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://WWW.Site' || (doc_id % 13)::VARCHAR
           || '.Example.COM:443/Wiki/' || lang || '/' || doc_id::VARCHAR
           || '?b=' || (doc_id % 7)::VARCHAR
           || '&utm_source=feed&a=1&fbclid=x' || doc_id::VARCHAR
           || '#sec' || (doc_id % 5)::VARCHAR AS url
  FROM documents
),
split1 AS (
  SELECT doc_id, lower(str_split(url, '://')[1]) AS scheme,
         str_split(url, '://')[2] AS rest
  FROM raw
),
split2 AS (
  SELECT *, str_split(rest, '/')[1] AS hp,
         substr(rest, len(str_split(rest, '/')[1]) + 1) AS tail
  FROM split1
),
split3 AS (
  SELECT doc_id, scheme,
         regexp_replace(regexp_replace(
           lower(str_split(hp, ':')[1]), '^(www\\.)+', ''), '\\.$', ''
         ) AS host,
         CASE WHEN len(str_split(hp, ':')) > 1
              THEN str_split(hp, ':')[2] ELSE '' END AS port,
         str_split(tail, '#')[1] AS path_q
  FROM split2
),
split4 AS (
  SELECT doc_id, scheme, host,
         CASE WHEN (scheme = 'https' AND port = '443')
                OR (scheme = 'http' AND port = '80')
              THEN '' ELSE port END AS port,
         CASE WHEN str_split(path_q, '?')[1] = '' THEN '/'
              ELSE str_split(path_q, '?')[1] END AS path,
         CASE WHEN len(str_split(path_q, '?')) > 1
              THEN str_split(path_q, '?')[2] ELSE NULL END AS query
  FROM split3
),
canon AS (
  SELECT doc_id, host,
         scheme || '://' || host
           || (CASE WHEN port <> '' THEN ':' || port ELSE '' END)
           || path
           || (CASE WHEN qcanon IS NOT NULL AND qcanon <> ''
                    THEN '?' || qcanon ELSE '' END) AS url_canon,
         array_to_string(
           list_slice(str_split(host, '.'),
                      greatest(len(str_split(host, '.')) - 1, 1),
                      len(str_split(host, '.'))), '.') AS domain,
         len(list_filter(str_split(path, '/'), s -> s <> ''))::BIGINT
           AS path_depth
  FROM (
    SELECT *, array_to_string(list_sort(list_filter(
             str_split(query, '&'),
             p -> NOT (starts_with(str_split(p, '=')[1], 'utm_')
                       OR str_split(p, '=')[1] IN ({tk})))), '&') AS qcanon
    FROM split4
  )
)
SELECT doc_id, url_canon, host, domain, path_depth FROM (
  SELECT *, row_number() OVER (PARTITION BY host
                               ORDER BY doc_id) AS rn
  FROM canon
) WHERE rn <= {URL_CAP}
"""


SQL_URL_CURATION = _sql_url_curation()


ANCHOR_TOKENS, ANCHOR_CAP = 4, 2


def _anchor_corpus_ds(sf_dir: str):
    import ray.data as rd

    from webindex.anchor import anchor_corpus

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )
    return anchor_corpus(docs, docs.count(), n_tokens=ANCHOR_TOKENS,
                         max_inlinks=ANCHOR_CAP, n_parts=16)


def _sql_anchor_docs() -> str:
    from webindex.graph import LINK_OFFSETS

    offs = ", ".join(f"({o})" for o in LINK_OFFSETS)
    tl = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return f"""
SELECT dst AS doc_id, string_agg(anchor, ' ' ORDER BY src) AS text,
       count(*)::BIGINT AS n_anchors
FROM (
  SELECT dst, src, anchor,
         row_number() OVER (PARTITION BY dst ORDER BY src) AS rn
  FROM (
    SELECT DISTINCT sa.src,
           (sa.src + o.off + sa.n_chars)
             % (SELECT count(*) FROM documents) AS dst,
           sa.anchor
    FROM (SELECT doc_id AS src, n_chars,
                 array_to_string(list_slice({tl}, 1, {ANCHOR_TOKENS}),
                                 ' ') AS anchor
          FROM documents WHERE len({tl}) > 0) sa,
         (VALUES {offs}) o(off)
    WHERE (sa.src + o.off + sa.n_chars)
            % (SELECT count(*) FROM documents) <> sa.src
  )
) WHERE rn <= {ANCHOR_CAP}
GROUP BY dst
"""


def q_anchor_docs(sf_dir: str):
    """Anchor-text propagation (webindex/anchor.py): each page's ANCHOR
    field = space-join of its in-links' source snippets (first
    ANCHOR_TOKENS tokens), ascending src, capped at ANCHOR_CAP in-links
    by the deterministic lowest-src rule (per-batch superset cut before
    the one dst-hash shuffle). Hash check is exact string identity."""
    return _anchor_corpus_ds(sf_dir)


SQL_ANCHOR_DOCS = _sql_anchor_docs()


def ensure_anchor_index(sf_dir: str) -> str:
    """Build (once, resumably) the anchor-field index for ``sf_dir``."""
    from webindex.build import build_index

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_INDEX_CACHE_ROOT, f"{tag}-anchor")
    cfg = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=16)
    corpus = _anchor_corpus_ds(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
    )
    build_index(corpus, out, cfg)
    return out


def q_anchor_top10(sf_dir: str):
    """BM25 over the anchor field with the FIELD'S OWN statistics (its
    df/avgdl/N — the Lucene per-field scoring model): the anchor corpus
    (q_anchor_docs) indexed by the standard builder, searched with the
    standard query set. The web-ranking signal pipeline end to end."""
    from webindex.search import search_queries

    idx = ensure_anchor_index(sf_dir)
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, mode="wand", concurrency=2,
        batch_size=8,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_ANCHOR_TOP10 = _sql_bm25_scores(
    docs_sql="SELECT doc_id, text FROM (" + SQL_ANCHOR_DOCS + ")"
) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


def q_gopher_rules(sf_dir: str):
    """Gopher quality-rule filter (Rae et al. 2021 — the canonical
    LLM-corpus rule set; webindex/textstats.py gopher_rules): word
    count / mean word length / symbol ratio / alpha-word fraction /
    required-stopword hits, keep = AND of the published thresholds.
    Each ratio is one int/int IEEE division, so thresholds and the keep
    verdict are engine-portable without rounding tricks."""
    from webindex.textstats import gopher_rules

    return gopher_rules(_docs(sf_dir))


def _sql_gopher_rules() -> str:
    from webindex.textstats import (GOPHER_MAX_MWL, GOPHER_MAX_SYMBOL_RATIO,
                                    GOPHER_MAX_WORDS, GOPHER_MIN_ALPHA_FRAC,
                                    GOPHER_MIN_MWL, GOPHER_MIN_STOP_HITS,
                                    GOPHER_MIN_WORDS, GOPHER_STOPSET)

    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPSET)
    return f"""
WITH w AS (
  SELECT doc_id, text,
         regexp_extract_all(text, '[^ \t\n\f\r]+') AS ws
  FROM documents
),
m AS (
  SELECT doc_id,
         len(ws)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(ws, x -> len(x))), 0)::BIGINT
           AS n_chars_w,
         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
           AS n_alpha,
         len(list_distinct(list_filter(
           list_transform(ws, x -> lower(x)),
           x -> x IN ({stops}))))::BIGINT AS n_stop_hits,
         (length(text) - length(replace(text, '#', '')))::BIGINT
           + (length(text) - length(replace(text, '...', ''))) // 3
           AS n_sym
  FROM w
),
r AS (
  SELECT doc_id, n_words, n_stop_hits,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE n_chars_w::DOUBLE / n_words END AS mwl,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE n_sym::DOUBLE / n_words END AS sym,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE n_alpha::DOUBLE / n_words END AS alpha
  FROM m
)
SELECT doc_id, n_words,
       round(mwl, 6) AS mean_word_len_r,
       round(sym, 6) AS symbol_ratio_r,
       round(alpha, 6) AS alpha_frac_r,
       n_stop_hits,
       (CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                  AND n_words <= {GOPHER_MAX_WORDS}
                  AND mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL}
                  AND sym <= {GOPHER_MAX_SYMBOL_RATIO}
                  AND alpha >= {GOPHER_MIN_ALPHA_FRAC}
                  AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}
             THEN 1 ELSE 0 END)::BIGINT AS keep
FROM r
"""


SQL_GOPHER_RULES = _sql_gopher_rules()


SYNIDX_MAP = (("slow", ("fast",)), ("scan", ("query", "lookup")))


def q_bm25_synidx_top10(sf_dir: str):
    """BM25 over an index built with INDEX-TIME synonym injection (the ES
    synonym token-filter analog, AnalyzerConfig.synonyms): every doc
    token additionally emits its mapped synonyms, so df/tf/doclen — and
    therefore idf and length norms — all shift; a query for 'fast' now
    matches docs that only said 'slow'. The oracle replays the expanded
    token stream with list_transform/flatten in SQL. Queries run
    pre-tokenized WITHOUT expansion — the standard ES pairing (index
    analyzer with the synonym filter, search_analyzer without)."""
    import ray.data as rd

    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "synidx")
    tok = re.compile(r"[a-z0-9]+")
    qrows = [
        (qid, " ".join(dict.fromkeys(tok.findall(text.lower()))))
        for qid, text in DOC_QUERIES
    ]
    qds = rd.from_items([{"qid": q, "text": t} for q, t in qrows])
    runs = search_queries(
        qds, idx, top_k=TOPK, mode="wand", concurrency=2,
        batch_size=8, pre_tokenized=True,
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _sql_synidx_tok_expr() -> str:
    arms = " ".join(
        "WHEN t = '{0}' THEN [{1}]".format(
            term, ", ".join(f"'{s}'" for s in syns)
        )
        for term, syns in SYNIDX_MAP
    )
    return (
        f"list_concat({_TOK_SQL}, flatten(list_transform({_TOK_SQL}, "
        f"t -> CASE {arms} ELSE []::VARCHAR[] END)))"
    )


SQL_BM25_SYNIDX_TOP10 = _sql_bm25_scores(
    tok_expr=_sql_synidx_tok_expr()
) + f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
"""


RM3_FB_DOCS, RM3_EXP_TERMS, RM3_LAMBDA = 5, 3, 0.4


def q_rm3_top10(sf_dir: str):
    """RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 direction;
    Lucene/Anserini's standard query-expansion baseline): pass 1 BM25 ->
    top RM3_FB_DOCS feedback docs -> candidate terms scored
    w(t) = sum over fb docs (ascending doc_id) of tf * idf, rounded to
    6dp -> top RM3_EXP_TERMS expansions not in the analyzed query
    (w_r desc, term asc) -> final = pass1 + RM3_LAMBDA * BM25(expansion
    terms) over the union match set, 6dp, rank on the rounded score.
    BM25's per-term additivity makes pass 2 exactly two full-set scores
    composed with one multiply-add — both engines pin that op order.
    At scale the fb-doc gather is the rerank join (J2) and term stats
    come from the dictionary actor (lexicon); the 80-query contract set
    uses the resident-searcher loop (mf_best_fields_scores precedent)."""
    import glob as _glob
    import json as _json
    import math
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from webindex.search import SearcherActor

    idx = ensure_index(sf_dir, "nostem")
    s = SearcherActor(idx, top_k=10**9, mode="exhaustive")
    dfs: dict[str, int] = {}
    for f in _glob.glob(os.path.join(idx, "dict", "**", "*.parquet"),
                        recursive=True):
        t = pq.read_table(f, columns=["term", "df"])
        dfs.update(zip(t.column("term").to_pylist(),
                       t.column("df").to_pylist()))
    with open(os.path.join(idx, "stats.json")) as fh:
        n_docs = _json.load(fh)["N"]
    idf = {t: math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
           for t, d in dfs.items()}
    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    text_of = dict(zip(texts.column("doc_id").to_pylist(),
                       texts.column("text").to_pylist()))
    tok = re.compile(r"[a-z0-9]+")

    rows = []
    for qid, text in DOC_QUERIES:
        ids, scores = s.search_one(qid, text)
        fb = sorted(ids[:RM3_FB_DOCS].tolist())
        qset = set(tok.findall(text.lower()))
        w: dict[str, float] = defaultdict(float)
        for d in fb:  # ascending doc_id fold, pinned
            for t, f in Counter(tok.findall(text_of[d].lower())).items():
                w[t] += f * idf[t]
        cand = sorted(
            ((round(v, 6), t) for t, v in w.items() if t not in qset),
            key=lambda x: (-x[0], x[1]),
        )
        exp_terms = [t for _, t in cand[:RM3_EXP_TERMS]]
        base = dict(zip(ids.tolist(), scores.tolist()))
        if exp_terms:
            e_ids, e_sc = s.search_one(qid, " ".join(exp_terms))
            ed = dict(zip(e_ids.tolist(), e_sc.tolist()))
        else:
            ed = {}
        comb = sorted(
            ((d, round(base.get(d, 0.0) + RM3_LAMBDA * ed.get(d, 0.0), 6))
             for d in set(base) | set(ed)),
            key=lambda x: (-x[1], x[0]),
        )
        rows.extend(
            (qid, d, sc, r + 1) for r, (d, sc) in enumerate(comb[:TOPK])
        )
    out = pd.DataFrame(rows, columns=["qid", "doc_id", "score_r", "rank"])
    out["rank"] = out["rank"].astype(np.int32)
    return out


def _sql_rm3() -> str:
    idf = "ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))"
    tfn = (f"(tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * "
           f"(dl.dl / (s.total_tokens::DOUBLE / s.n_docs)))))")
    return _sql_bm25_scores() + f""",
fb AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id) AS rn
    FROM scores
  ) WHERE rn <= {RM3_FB_DOCS}
),
cand AS (
  SELECT f.qid, tf.term,
         round(list_sum(list(tf.tf * {idf} ORDER BY tf.doc_id)), 6) AS w_r
  FROM fb f
  JOIN tf ON tf.doc_id = f.doc_id
  JOIN df ON df.term = tf.term
  CROSS JOIN stats s
  GROUP BY f.qid, tf.term
),
expn AS (
  SELECT qid, term FROM (
    SELECT c.qid, c.term,
           row_number() OVER (PARTITION BY c.qid
                              ORDER BY c.w_r DESC, c.term) AS rn
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM qterms q
                      WHERE q.qid = c.qid AND q.term = c.term)
  ) WHERE rn <= {RM3_EXP_TERMS}
),
contrib2 AS (
  SELECT e.qid, tf.doc_id, e.term, {idf} * {tfn} AS c
  FROM expn e
  JOIN tf ON tf.term = e.term
  JOIN df ON df.term = e.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
exps AS (
  SELECT qid, doc_id, list_sum(list(c ORDER BY term)) AS score
  FROM contrib2 GROUP BY qid, doc_id
),
comb AS (
  SELECT coalesce(p.qid, e.qid) AS qid,
         coalesce(p.doc_id, e.doc_id) AS doc_id,
         round(coalesce(p.score, 0.0)
               + {RM3_LAMBDA} * coalesce(e.score, 0.0), 6) AS score_r
  FROM scores p
  FULL OUTER JOIN exps e ON e.qid = p.qid AND e.doc_id = p.doc_id
)
SELECT qid, doc_id, score_r, rank FROM (
  SELECT qid, doc_id, score_r,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_r DESC, doc_id)::INTEGER AS rank
  FROM comb
) WHERE rank <= {TOPK}
"""


SQL_RM3 = _sql_rm3()


WEB_RANK_ANCHOR_W, WEB_RANK_PR_W = 0.5, 2.0


def q_web_rank_top10(sf_dir: str):
    """The classic web-ranking composite (Brin & Page 1998): per query,
    score = body_bm25 + 0.5 * anchor_bm25 + 2.0 * pagerank_norm over the
    UNION of body and anchor match sets, where pagerank_norm =
    pr_q * N / SCALE (mean 1.0, exact int numerator < 2^53 so the one
    float division is engine-portable). Float op order pinned
    left-to-right; 6dp surface; rank on the ROUNDED score (ties by
    doc_id) so both engines cut the same top-10. Composes three
    independently-verified entries (bm25_scores, anchor_top10,
    pagerank); at scale the merge is a runs-table outer join + a pr
    broadcast — here the 80-query contract set uses the resident
    searcher loop (mf_best_fields_scores precedent)."""
    from webindex.graph import SCALE, pagerank, synth_links
    from webindex.search import SearcherActor

    import ray.data as rd

    body = SearcherActor(ensure_index(sf_dir, "nostem"), top_k=10**9,
                         mode="exhaustive")
    anch = SearcherActor(ensure_anchor_index(sf_dir), top_k=10**9,
                         mode="exhaustive")

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )
    n = docs.count()
    pr = pagerank(synth_links(docs, n), iters=PAGERANK_ITERS, n_parts=16,
                  n_nodes=n).to_pandas()
    pr_norm = dict(zip(pr["node"].astype(int),
                       (pr["pr_q"].astype(object) * n) / SCALE))

    rows = []
    for qid, text in DOC_QUERIES:
        b_ids, b_sc = body.search_one(qid, text)
        a_ids, a_sc = anch.search_one(qid, text)
        bd = dict(zip(b_ids.tolist(), b_sc.tolist()))
        ad = dict(zip(a_ids.tolist(), a_sc.tolist()))
        scored = []
        for d in set(bd) | set(ad):
            s = (bd.get(d, 0.0) + WEB_RANK_ANCHOR_W * ad.get(d, 0.0)
                 + WEB_RANK_PR_W * pr_norm[d])
            scored.append((d, round(s, 6)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        rows.extend(
            (qid, d, s, r + 1) for r, (d, s) in enumerate(scored[:TOPK])
        )
    out = pd.DataFrame(rows, columns=["qid", "doc_id", "score_r", "rank"])
    out["rank"] = out["rank"].astype(np.int32)
    return out


def _sql_web_rank() -> str:
    from webindex.graph import SCALE

    body_sel = (_sql_bm25_scores()
                + "SELECT qid, doc_id, score FROM scores")
    anch_sel = (_sql_bm25_scores(
        docs_sql="SELECT doc_id, text FROM (" + SQL_ANCHOR_DOCS + ")"
    ) + "SELECT qid, doc_id, score FROM scores")
    pr_sel = _sql_pagerank(PAGERANK_ITERS)
    return f"""
WITH body AS (SELECT * FROM ({body_sel})),
anch AS (SELECT * FROM ({anch_sel})),
pr AS (SELECT node, pr_q FROM ({pr_sel})),
cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
comb AS (
  SELECT coalesce(b.qid, a.qid) AS qid,
         coalesce(b.doc_id, a.doc_id) AS doc_id,
         round(coalesce(b.score, 0.0)
               + {WEB_RANK_ANCHOR_W} * coalesce(a.score, 0.0)
               + {WEB_RANK_PR_W} * ((pr.pr_q * cnt.n)::DOUBLE / {SCALE}),
               6) AS score_r
  FROM body b
  FULL OUTER JOIN anch a ON a.qid = b.qid AND a.doc_id = b.doc_id
  JOIN pr ON pr.node = coalesce(b.doc_id, a.doc_id)
  CROSS JOIN cnt
)
SELECT qid, doc_id, score_r, rank FROM (
  SELECT qid, doc_id, score_r,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_r DESC, doc_id)::INTEGER AS rank
  FROM comb
) WHERE rank <= {TOPK}
"""


SQL_WEB_RANK = _sql_web_rank()


PPR_SEED_MOD = 20


def q_ppr_trust(sf_dir: str):
    """Personalized PageRank (TrustRank direction, Gyongyi et al. 2004):
    teleport + dangling mass restricted to a deterministic seed set
    (doc_id % PPR_SEED_MOD == 0) — the link-spam / topical-authority
    variant of the pagerank entry, same int64 fixed-point arithmetic
    (webindex/graph.py pagerank(seeds=...)). Oracle replays the seeded
    update rule. Returns (node, pr_q, rank)."""
    import ray.data as rd

    from webindex.graph import pagerank, synth_links

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )
    n = docs.count()
    seeds = np.arange(0, n, PPR_SEED_MOD, dtype=np.int64)
    pr = pagerank(
        synth_links(docs, n), iters=PAGERANK_ITERS, n_parts=16,
        n_nodes=n, seeds=seeds,
    )
    out = pr.to_pandas().sort_values(
        ["pr_q", "node"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out


def _sql_ppr(iters: int) -> str:
    from webindex.graph import LINK_OFFSETS, SCALE

    offs = ", ".join(f"({o})" for o in LINK_OFFSETS)
    seed = f"(n.node % {PPR_SEED_MOD} = 0)"
    ctes = [f"""
WITH nodes AS (SELECT doc_id AS node FROM documents),
cnt AS (SELECT count(*)::BIGINT AS n FROM nodes),
tcnt AS (SELECT count(*)::BIGINT AS t FROM nodes n WHERE {seed}),
edges AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id + o.off + n_chars) % (SELECT n FROM cnt) AS dst
  FROM documents, (VALUES {offs}) o(off)
  WHERE (doc_id + o.off + n_chars) % (SELECT n FROM cnt) <> doc_id
),
deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
pr0 AS (SELECT node, ({SCALE} // (SELECT n FROM cnt))::BIGINT AS pr_q
        FROM nodes)"""]
    for t in range(1, iters + 1):
        p = t - 1
        ctes.append(f"""
dm{t} AS (SELECT coalesce(sum(p.pr_q), 0) // (SELECT t FROM tcnt) AS m
          FROM pr{p} p LEFT JOIN deg d ON d.src = p.node
          WHERE d.src IS NULL),
pr{t} AS (
  SELECT n.node,
         ((CASE WHEN {seed}
                THEN (3 * {SCALE}) // (20 * (SELECT t FROM tcnt))
                ELSE 0 END)
          + (17 * (coalesce(s.sq, 0)
                   + (CASE WHEN {seed} THEN (SELECT m FROM dm{t})
                      ELSE 0 END))) // 20
         )::BIGINT AS pr_q
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr_q // d.outdeg) AS sq
    FROM edges e
    JOIN pr{p} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)""")
    return (
        ",".join(ctes)
        + f"""
SELECT node, pr_q,
       row_number() OVER (ORDER BY pr_q DESC, node)::INTEGER AS rank
FROM pr{iters}
"""
    )


SQL_PPR = _sql_ppr(PAGERANK_ITERS)


HITS_ITERS = 5


def q_hits(sf_dir: str):
    """Fixed-point HITS hubs & authorities (webindex/graph.py hits) over
    the same deterministic synthetic link graph as pagerank. L1-normalized
    int64 micro-unit arithmetic (HITS_SCALE) with an int64-safe exact
    normalizing division — bit-identical across partitionings and
    engines; the DuckDB oracle replays the update rule with HUGEINT.
    Returns (node, hub_q, auth_q, rank) ranked by (auth_q desc, node)."""
    import ray.data as rd

    from webindex.graph import hits, synth_links

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )
    n = docs.count()
    out = hits(
        synth_links(docs, n), iters=HITS_ITERS, n_parts=16
    ).to_pandas().sort_values(
        ["auth_q", "node"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out


def _sql_hits(iters: int) -> str:
    from webindex.graph import HITS_SCALE, LINK_OFFSETS

    offs = ", ".join(f"({o})" for o in LINK_OFFSETS)
    s = HITS_SCALE
    ctes = [f"""
WITH nodes AS (SELECT doc_id AS node FROM documents),
cnt AS (SELECT count(*)::BIGINT AS n FROM nodes),
edges AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id + o.off + n_chars) % (SELECT n FROM cnt) AS dst
  FROM documents, (VALUES {offs}) o(off)
  WHERE (doc_id + o.off + n_chars) % (SELECT n FROM cnt) <> doc_id
),
h0 AS (SELECT node, ({s} // (SELECT n FROM cnt))::BIGINT AS v FROM nodes)"""]
    for t in range(1, iters + 1):
        p = t - 1
        ctes.append(f"""
a{t} AS (
  SELECT node, ((raw * {s}) // sum(raw) OVER ())::BIGINT AS v
  FROM (SELECT e.dst AS node, sum(h.v)::HUGEINT AS raw
        FROM edges e JOIN h{p} h ON h.node = e.src GROUP BY e.dst)
),
h{t} AS (
  SELECT node, ((raw * {s}) // sum(raw) OVER ())::BIGINT AS v
  FROM (SELECT e.src AS node, sum(a.v)::HUGEINT AS raw
        FROM edges e JOIN a{t} a ON a.node = e.dst GROUP BY e.src)
)""")
    return (
        ",".join(ctes)
        + f"""
SELECT n.node, coalesce(h.v, 0)::BIGINT AS hub_q,
       coalesce(a.v, 0)::BIGINT AS auth_q,
       row_number() OVER (ORDER BY coalesce(a.v, 0) DESC, n.node
                          )::INTEGER AS rank
FROM nodes n
LEFT JOIN h{iters} h ON h.node = n.node
LEFT JOIN a{iters} a ON a.node = n.node
"""
    )


SQL_HITS = _sql_hits(HITS_ITERS)


TOP_TERMS_K = 20


def q_top_terms(sf_dir: str):
    """Exact global top-k terms by collection frequency via the two-pass
    candidates + certified-recount pattern (webindex/sketch.py top_terms)
    — never a full-vocabulary shuffle; the certificate makes the result
    exact, hence hash-matchable against a plain GROUP BY oracle."""
    from webindex.sketch import top_terms

    return top_terms(_docs(sf_dir), k=TOP_TERMS_K)


SQL_TOP_TERMS = f"""
SELECT term, cnt, rank FROM (
  SELECT term, count(*)::BIGINT AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, term)::INTEGER AS rank
  FROM (SELECT t.tok AS term
        FROM documents, unnest({_TOK_SQL}) AS t(tok))
  GROUP BY term
) WHERE rank <= {TOP_TERMS_K}
"""


# composed AFTER its component SQL strings exist in module order
SQL_CURATION_V2 = f"""
WITH sf AS (SELECT * FROM ({SQL_SOURCE_FILTER})),
dg AS (SELECT * FROM ({SQL_DUP_NGRAMS})),
ct AS (SELECT * FROM ({SQL_CONTAMINATION}))
SELECT sf.source, count(*)::BIGINT AS n_docs
FROM sf
JOIN dg ON dg.doc_id = sf.doc_id
JOIN ct ON ct.doc_id = sf.doc_id
WHERE sf.keep AND dg.dup_frac <= {CUR2_DUP_MAX!r}
  AND ct.overlap_frac <= {CUR2_CONTAM_MAX!r}
GROUP BY sf.source
"""


# ---------------------------------------------------------------------------
# pluggable similarity modules  (ES `similarity` setting: LM Dirichlet,
# LM Jelinek-Mercer, classic TF-IDF, boolean — webindex/similarity.py;
# the reference's ES invocation point is crossencoder_beir_bm25.ipynb
# cell 10, where these are drop-in per-field alternatives to BM25)
# ---------------------------------------------------------------------------


def _sql_sim_scores(contrib_expr: str, select: str) -> str:
    """The bm25_scores CTE skeleton with a pluggable per-term contribution
    expression (tf.tf, dl.dl, df.df, df.cf, s.n_docs, s.total_tokens in
    scope). Summation order matches the engine: ascending term, float64."""
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, len({_TOK_SQL})::BIGINT AS dl FROM docs),
df AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens FROM dl),
qterms AS (SELECT * FROM {_query_values_sql()}),
contrib AS (
  SELECT q.qid, tf.doc_id, q.term, {contrib_expr} AS c
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT qid, doc_id, list_sum(list(c ORDER BY term)) AS score
  FROM contrib GROUP BY qid, doc_id
)
{select}
"""


_SEL_SCORES_R = "SELECT qid, doc_id, round(score, 6) AS score_r FROM scores"

# expressions mirror webindex/similarity.py's pinned formulas op-for-op
# (BIGINT/BIGINT divides to DOUBLE in DuckDB = float64 int division)
_LMD_EXPR = (
    "greatest(0.0, ln(1.0 + tf.tf / (2000.0 * (df.cf / s.total_tokens)))"
    " + ln(2000.0 / (dl.dl + 2000.0)))"
)
_LMJM_EXPR = (
    "ln(1.0 + ((1.0 - 0.1) / 0.1) * (tf.tf / dl.dl)"
    " / (df.cf / s.total_tokens))"
)
_TFIDF_EXPR = (
    "sqrt(tf.tf) * ((1.0 + ln(s.n_docs / (df.df + 1)))"
    " * (1.0 + ln(s.n_docs / (df.df + 1)))) / sqrt(dl.dl)"
)

SQL_LMD_SCORES = _sql_sim_scores(_LMD_EXPR, _SEL_SCORES_R)
SQL_LMJM_SCORES = _sql_sim_scores(_LMJM_EXPR, _SEL_SCORES_R)
SQL_TFIDF_SCORES = _sql_sim_scores(_TFIDF_EXPR, _SEL_SCORES_R)
SQL_BOOL_SCORES = _sql_sim_scores(
    "1.0", "SELECT qid, doc_id, score FROM scores"
)
SQL_LMD_TOP10 = _sql_sim_scores(_LMD_EXPR, f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM scores
) WHERE rank <= {TOPK}
""")


def _q_sim_scores(sf_dir: str, similarity: str):
    """All matching (qid, doc) scores under the similarity, rounded to
    6dp at the contract surface (the bm25_scores float-fold precedent)."""
    from webindex.similarity import similarity_search

    idx = ensure_index(sf_dir, "nostem")
    out = similarity_search(_queries_ds(), idx, similarity)

    def rnd(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "score_r": pa.array(sc, pa.float64()),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow")


def q_lmd_scores(sf_dir: str):
    return _q_sim_scores(sf_dir, "lmdirichlet")


def q_lmjm_scores(sf_dir: str):
    return _q_sim_scores(sf_dir, "lmjm")


def q_tfidf_scores(sf_dir: str):
    return _q_sim_scores(sf_dir, "tfidf")


def q_bool_scores(sf_dir: str):
    """Boolean similarity: score = matched unique query terms — exact
    small-int floats, hash-exact with NO rounding."""
    from webindex.similarity import similarity_search

    idx = ensure_index(sf_dir, "nostem")
    return similarity_search(_queries_ds(), idx, "boolean").map_batches(
        lambda t: t.select(["qid", "doc_id", "score"]),
        batch_format="pyarrow",
    )


def q_lmd_top10(sf_dir: str):
    """Ranked top-10 under LM Dirichlet (rank-identity check: unrounded
    engine floats vs unrounded SQL floats must order identically)."""
    from webindex.similarity import similarity_search

    idx = ensure_index(sf_dir, "nostem")
    return similarity_search(
        _queries_ds(), idx, "lmdirichlet", top_k=TOPK
    ).map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# query_string (Lucene syntax: AND/OR/NOT, +/-, ^boost, parens) — one AST,
# two backends: webindex/querystring.py compiles the SAME parse to the
# numpy shard kernel AND to the SQL below (op-for-op float identity)
# ---------------------------------------------------------------------------

QS_QUERIES: list[tuple[str, str]] = [
    ("s1", "merge AND join"),
    ("s2", "fast OR slow"),
    ("s3", "table -scan"),
    ("s4", "+key value"),
    ("s5", "(merge OR sort) AND join"),
    ("s6", "query^2 big"),
    ("s7", "customer AND NOT order"),
    ("s8", "row group agg"),
]

_SQL_QS_CTE = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text <> ''),
toks AS (
  SELECT doc_id, t.tok AS term
  FROM docs, unnest({_TOK_SQL}) AS t(tok)
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, len({_TOK_SQL})::BIGINT AS dl FROM docs),
df AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens FROM dl),
contrib AS (
  SELECT tf.doc_id, tf.term, {{CONTRIB}} AS c
  FROM tf
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
qs AS (
{{BODY}}
)
"""

_QS_BM25_EXPR = (
    "ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))"
    f" * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B}"
    " * (dl.dl / (s.total_tokens::DOUBLE / s.n_docs)))))"
)


def _sql_qs(select: str, contrib_expr: str = _QS_BM25_EXPR) -> str:
    from webindex.querystring import bind, parse_query_string, to_sql

    body = "\n  UNION ALL\n".join(
        to_sql(bind(parse_query_string(q), _sql_an), qid)
        for qid, q in QS_QUERIES
    )
    return (
        _SQL_QS_CTE.replace("{CONTRIB}", contrib_expr)
        .replace("{BODY}", body) + select
    )


SQL_QS_TOP10 = _sql_qs(f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM qs
) WHERE rank <= {TOPK}
""")
SQL_QS_SCORES = _sql_qs(
    "SELECT qid, doc_id, round(score, 6) AS score_r FROM qs"
)
# composability: the same parsed ASTs scored under LM Dirichlet — the
# engine threads similarity= through the boolean-tree kernel, the oracle
# swaps the contrib CTE expression; everything else is shared
SQL_QS_LMD_TOP10 = _sql_qs(f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM qs
) WHERE rank <= {TOPK}
""", _LMD_EXPR)


def q_qs_top10(sf_dir: str):
    """Lucene query_string top-10: AND/OR/NOT, +must/-must_not clause
    prefixes, ^boosts, and parenthesized groups over the BM25 index —
    SQL re-derived from the SAME parsed AST (webindex/querystring.py
    to_sql), so parser and kernel are both under the hash check."""
    from webindex.querystring import query_string_search

    idx = ensure_index(sf_dir, "nostem")
    runs = query_string_search(QS_QUERIES, idx, top_k=TOPK)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_qs_scores(sf_dir: str):
    """Every (query_string, doc) match score, 6dp at the surface."""
    from webindex.querystring import query_string_search

    idx = ensure_index(sf_dir, "nostem")
    runs = query_string_search(QS_QUERIES, idx, top_k=10**9)

    def rnd(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "score_r": pa.array(sc, pa.float64()),
            }
        )

    return runs.map_batches(rnd, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ES rescore API (webindex/rescore.py): global top-window re-scored by a
# secondary query, final = qw * primary + rw * secondary (score_mode=total)
# ---------------------------------------------------------------------------

RESCORE_QUERIES: list[tuple[str, str, str]] = [
    ("r1", "merge join", "sort"),
    ("r2", "fast key", "the slow"),
    ("r3", "customer order", "line big"),
    ("r4", "table scan", "hash"),
]
RESCORE_WINDOW = 20
RESCORE_RW = 2.0


def _rescore_values(idx: int) -> str:
    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, *texts in RESCORE_QUERIES
        for t in sorted(set(_sql_an.tokens(texts[idx])))
    )
    return f"(VALUES {rows})"


SQL_RESCORE_TOP10 = (
    _SQL_QS_CTE.replace("{CONTRIB}", _QS_BM25_EXPR)
    .replace("qs AS (\n{BODY}\n)", f"""pq AS (SELECT * FROM {_rescore_values(0)} pq(qid, term)),
rq AS (SELECT * FROM {_rescore_values(1)} rq(qid, term)),
p AS (
  SELECT pq.qid, c.doc_id, list_sum(list(c.c ORDER BY pq.term)) AS score
  FROM pq JOIN contrib c ON c.term = pq.term GROUP BY pq.qid, c.doc_id
),
w AS (
  SELECT qid, doc_id, score FROM (
    SELECT qid, doc_id, score,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id) AS prank
    FROM p
  ) WHERE prank <= {RESCORE_WINDOW}
),
sec AS (
  SELECT rq.qid, c.doc_id, list_sum(list(c.c ORDER BY rq.term)) AS score
  FROM rq JOIN contrib c ON c.term = rq.term GROUP BY rq.qid, c.doc_id
),
fin AS (
  SELECT w.qid, w.doc_id,
         w.score + {RESCORE_RW!r} * coalesce(sec.score, 0.0) AS score
  FROM w LEFT JOIN sec ON sec.qid = w.qid AND sec.doc_id = w.doc_id
)""")
    + f"""
SELECT qid, doc_id, rank, score_r FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank,
         round(score, 6) AS score_r
  FROM fin
) WHERE rank <= {TOPK}
"""
)


def q_rescore_top10(sf_dir: str):
    """ES rescore: primary BM25 global top-{window} per query, re-scored
    by the secondary query, final = primary + 2.0 * secondary, re-ranked
    top-10 (webindex/rescore.py; pinned GLOBAL window for determinism —
    ES's per-shard window makes results shard-count-dependent)."""
    from webindex.rescore import rescore_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = rescore_queries(
        RESCORE_QUERIES, idx, top_k=TOPK, window_size=RESCORE_WINDOW,
        rescore_query_weight=RESCORE_RW,
    )

    def proj(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "rank": t.column("rank"),
                "score_r": pa.array(sc, pa.float64()),
            }
        )

    return runs.map_batches(proj, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 hard-negative mining (webindex/eval.py mine_hard_negatives): the
# bi-encoder training-data prep of the reference's ecosystem — top-scoring
# docs per query that are NOT judged relevant. Judged set here is the
# portable rule doc_id % 11 == <query index> (reproducible at any sf).
# ---------------------------------------------------------------------------

HN_DEPTH, HN_K = 30, 10


def q_hard_negatives(sf_dir: str):
    import ray.data as rd

    from webindex.eval import mine_hard_negatives

    idx = ensure_index(sf_dir, "nostem")
    qnum = {qid: i + 1 for i, (qid, _) in enumerate(DOC_QUERIES)}

    def qrels_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        qs, ds = [], []
        for qid, i in qnum.items():
            hit = ids[ids % 11 == i]
            qs.extend([qid] * hit.size)
            ds.append(hit)
        import numpy as np

        return pa.table(
            {
                "qid": pa.array(qs, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(ds) if ds else np.empty(0, np.int64)
                ),
            }
        )

    qrels = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    ).map_batches(qrels_batch, batch_format="pyarrow")
    out = mine_hard_negatives(
        _queries_ds(), qrels, idx, k=HN_K, depth=HN_DEPTH
    )

    def rnd(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "score_r": pa.array(sc, pa.float64()),
                "neg_rank": t.column("neg_rank"),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow")


def _hn_qrels_values() -> str:
    return ", ".join(
        f"('{qid}', {i + 1})" for i, (qid, _) in enumerate(DOC_QUERIES)
    )


SQL_HARD_NEGATIVES = _sql_bm25_scores() + f"""
, qrels AS (
  SELECT q.qid, d.doc_id
  FROM (VALUES {_hn_qrels_values()}) q(qid, i)
  JOIN dl d ON d.doc_id % 11 = q.i
),
window_rows AS (
  SELECT qid, doc_id, score FROM (
    SELECT qid, doc_id, score,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id) AS rnk
    FROM scores
  ) WHERE rnk <= {HN_DEPTH}
),
neg AS (
  SELECT w.qid, w.doc_id, w.score
  FROM window_rows w
  LEFT JOIN qrels r ON r.qid = w.qid AND r.doc_id = w.doc_id
  WHERE r.doc_id IS NULL
)
SELECT qid, doc_id, score_r, neg_rank FROM (
  SELECT qid, doc_id, round(score, 6) AS score_r,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS neg_rank
  FROM neg
) WHERE neg_rank <= {HN_K}
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (webindex/textstats.py dsir_weights): data
# selection by log importance ratio target/raw over bigram features
# ---------------------------------------------------------------------------


def q_dsir_weights(sf_dir: str):
    import ray.data as rd

    from webindex.textstats import dsir_weights

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    out = dsir_weights(docs, target_col="lang", target_value="en")

    def round6(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "dsir_w_r": pa.array(
                    np.round(batch.column("dsir_w").to_numpy(), 6)
                ),
            }
        )

    return out.map_batches(round6, batch_format="pyarrow")


SQL_DSIR_WEIGHTS = f"""
WITH dt AS (SELECT doc_id, lang, {_TOK_SQL} AS tl FROM documents),
bg AS (
  SELECT doc_id, lang, tl[u.p + 1] || ' ' || tl[u.p + 2] AS f
  FROM dt, unnest(range(len(tl) - 1)) AS u(p)
),
docf AS (SELECT doc_id, f, count(*)::BIGINT AS n,
                sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_tgt
         FROM bg GROUP BY doc_id, f),
cnt AS (SELECT f, sum(n)::BIGINT AS c_raw, sum(n_tgt)::BIGINT AS c_tgt
        FROM docf GROUP BY f),
tot AS (SELECT sum(c_raw)::BIGINT AS t_raw, sum(c_tgt)::BIGINT AS t_tgt,
               count(*)::BIGINT AS v FROM cnt),
contrib AS (
  SELECT d.doc_id, d.f,
         d.n * (ln((c.c_tgt + 1) / (t.t_tgt + t.v))
              - ln((c.c_raw + 1) / (t.t_raw + t.v))) AS w
  FROM docf d JOIN cnt c ON c.f = d.f CROSS JOIN tot t
)
SELECT doc_id, round(list_sum(list(w ORDER BY f)), 6) AS dsir_w_r
FROM contrib GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# ES function_score decay (search.decay_queries): gauss decay on a numeric
# docvalue multiplying BM25 — the recency/length-proximity boost.
# DuckDB exp() measured bit-identical to math.exp on this host.
# ---------------------------------------------------------------------------

DECAY_ORIGIN, DECAY_SCALE, DECAY_RATE = 400.0, 300.0, 0.5


def q_decay_top10(sf_dir: str):
    from webindex.search import decay_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = decay_queries(
        _queries_ds(), idx, "n_chars", origin=DECAY_ORIGIN,
        scale=DECAY_SCALE, decay=DECAY_RATE, kind="gauss", top_k=TOPK,
    )

    def proj(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "rank": t.column("rank"),
                "score_r": pa.array(sc, pa.float64()),
            }
        )

    return runs.map_batches(proj, batch_format="pyarrow")


_DECAY_D = (
    f"greatest(0.0, abs(nc.n_chars - {DECAY_ORIGIN!r}) - 0.0)"
)
SQL_DECAY_TOP10 = _sql_bm25_scores() + f"""
, nc AS (SELECT doc_id, n_chars FROM documents),
dec AS (
  SELECT s.qid, s.doc_id,
         s.score * exp((ln({DECAY_RATE!r}) / ({DECAY_SCALE!r} * {DECAY_SCALE!r}))
                       * ({_DECAY_D} * {_DECAY_D})) AS score
  FROM scores s JOIN nc ON nc.doc_id = s.doc_id
)
SELECT qid, doc_id, rank, score_r FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank,
         round(score, 6) AS score_r
  FROM dec
) WHERE rank <= {TOPK}
"""


# ---------------------------------------------------------------------------
# SemDeDup (ann.semdedup, Abbas et al. 2023): clustered semantic dedup —
# seeded coarse clusters, within-cluster upper-triangular thresholded
# pairwise cosine in (cent_sim ASC, id ASC) order. 6dp-rounded cosines
# at BOTH the ordering key and the threshold make the decision boundary
# engine-portable; the oracle replays assignment, ordering and the
# earlier-row self-join exactly.
# ---------------------------------------------------------------------------

SEMDEDUP_EPS, SEMDEDUP_K = 0.93, 8


def q_semdedup(sf_dir: str):
    import ray.data as rd

    from webindex.ann import semdedup

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return semdedup(ds, n_clusters=SEMDEDUP_K, eps=SEMDEDUP_EPS)


SQL_SEMDEDUP = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT {SEMDEDUP_K}
),
cid_idx AS (
  SELECT cid, cvec, row_number() OVER (ORDER BY cid) - 1 AS cidx FROM cent
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cidx, c.cvec,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                 c.cvec::DOUBLE[]), 6)
                    DESC, c.cidx
         ) AS rn
  FROM embeddings e CROSS JOIN cid_idx c
),
assigned AS (
  SELECT vec_id, embedding, cidx,
         round(list_cosine_similarity(embedding::DOUBLE[],
                                      cvec::DOUBLE[]), 6) AS cs
  FROM assign WHERE rn = 1
),
ranked AS (
  SELECT vec_id, embedding, cidx, cs,
         row_number() OVER (PARTITION BY cidx ORDER BY cs, vec_id) AS pos
  FROM assigned
),
dups AS (
  SELECT r1.vec_id, r1.cidx, r1.cs,
         max(CASE WHEN round(list_cosine_similarity(
                    r1.embedding::DOUBLE[], r2.embedding::DOUBLE[]), 6)
                    > {SEMDEDUP_EPS!r} THEN 1 ELSE 0 END) AS dup
  FROM ranked r1
  LEFT JOIN ranked r2 ON r2.cidx = r1.cidx AND r2.pos < r1.pos
  GROUP BY r1.vec_id, r1.cidx, r1.cs
)
SELECT vec_id, cidx::BIGINT AS centroid, cs AS cent_sim_r,
       coalesce(dup, 0)::BIGINT AS dup
FROM dups
"""


# ---------------------------------------------------------------------------
# ES exists / missing queries (SegmentReader.filter_mask "exists" /
# "missing" ops) over the PARTIAL-docvalues index variant ("pdv":
# n_chars present only for doc_id % 3 != 0) — missing-field semantics
# need genuinely absent values. Scores untouched; selection only.
# ---------------------------------------------------------------------------


def q_bm25_exists_top10(sf_dir: str):
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "pdv")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        filter_pred=(("n_chars", "exists", None),),
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_bm25_missing_top10(sf_dir: str):
    from webindex.search import search_queries

    idx = ensure_index(sf_dir, "pdv")
    runs = search_queries(
        _queries_ds(), idx, top_k=TOPK, concurrency=2, batch_size=8,
        filter_pred=(("n_chars", "missing", None),),
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _sql_exists_missing(cond: str) -> str:
    return _sql_bm25_scores() + f"""
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s
  WHERE {cond}
) WHERE rank <= {TOPK}
"""


SQL_BM25_EXISTS_TOP10 = _sql_exists_missing("s.doc_id % 3 <> 0")
SQL_BM25_MISSING_TOP10 = _sql_exists_missing("s.doc_id % 3 = 0")


# ---------------------------------------------------------------------------
# Lucene index_phrases (phrase.shingle_phrase_search): two-word phrases
# through a word-BIGRAM shingle index — matching is one posting read
# (exact: the bigram term exists iff the adjacency occurs), scoring
# stays on the main index, ranks bit-identical to the positional and
# lazy-verify phrase paths (same adjacency oracle).
# ---------------------------------------------------------------------------

SHINGLE_PHRASES = [(q, t) for q, t in PHRASE_QUERIES
                   if len(_sql_an.tokens(t)) == 2]


def q_bm25_phrase_shingle_top10(sf_dir: str):
    from webindex.phrase import shingle_phrase_search

    main = ensure_index(sf_dir, "nostem")
    shingle = ensure_index(sf_dir, "shingle")
    runs = shingle_phrase_search(
        _queries_ds_of(SHINGLE_PHRASES), main, shingle, top_k=TOPK
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _sql_phrase_shingle() -> str:
    terms = ", ".join(
        f"('{q}', '{t}')"
        for q, text in SHINGLE_PHRASES
        for t in sorted(set(_sql_an.tokens(text)))
    )
    phrases = ", ".join(
        f"('{q}', '{' '.join(_sql_an.tokens(t))}')"
        for q, t in SHINGLE_PHRASES
    )
    return _sql_bm25_scores(f"(VALUES {terms}) AS q(qid, term)") + f"""
, phr AS (SELECT * FROM (VALUES {phrases}) p(qid, phrase)),
dt AS (
  SELECT doc_id, ' ' || array_to_string({_TOK_SQL}, ' ') || ' ' AS ts
  FROM documents WHERE text <> ''
),
pm AS (
  SELECT p.qid, d.doc_id
  FROM phr p JOIN dt d ON strpos(d.ts, ' ' || p.phrase || ' ') > 0
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s
  JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


SQL_BM25_PHRASE_SHINGLE_TOP10 = _sql_phrase_shingle()


# ---------------------------------------------------------------------------
# ES pinned query (search.pinned_queries): promoted ids rank first in
# the given order (even when they don't match the organic query), then
# the organic BM25 ranking fills the rest, pins excluded.
# ---------------------------------------------------------------------------

PINNED_IDS: dict[str, list[int]] = {
    "q1": [371, 42],      # 42 likely unmatched by q1 -> score 0.0 pin
    "q3": [7],
    "q6": [123, 9, 450],
}


def q_pinned_top10(sf_dir: str):
    from webindex.search import pinned_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = pinned_queries(_queries_ds(), idx, PINNED_IDS, top_k=TOPK)

    def proj(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "score_r": pa.array(sc, pa.float64()),
                "pinned": t.column("pinned"),
                "rank": t.column("rank"),
            }
        )

    return runs.map_batches(proj, batch_format="pyarrow")


def _sql_pinned_top10() -> str:
    rows = ", ".join(
        f"('{qid}', {did}, {pos})"
        for qid, ids in sorted(PINNED_IDS.items())
        for pos, did in enumerate(ids)
    )
    return _sql_bm25_scores() + f"""
, pins AS (SELECT * FROM (VALUES {rows}) p(qid, doc_id, pos)),
pin_rows AS (
  SELECT p.qid, p.doc_id, coalesce(s.score, 0.0) AS score, p.pos
  FROM pins p
  LEFT JOIN scores s ON s.qid = p.qid AND s.doc_id = p.doc_id
  WHERE EXISTS (SELECT 1 FROM docs d WHERE d.doc_id = p.doc_id)
),
org AS (
  SELECT s.qid, s.doc_id, s.score,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id) AS r
  FROM scores s
  WHERE NOT EXISTS (SELECT 1 FROM pins p
                    WHERE p.qid = s.qid AND p.doc_id = s.doc_id)
),
npins AS (SELECT qid, count(*) AS n FROM pin_rows GROUP BY qid),
unioned AS (
  SELECT qid, doc_id, score, 1 AS pinned,
         row_number() OVER (PARTITION BY qid ORDER BY pos)::INTEGER AS rank
  FROM pin_rows
  UNION ALL
  SELECT o.qid, o.doc_id, o.score, 0,
         (o.r + coalesce(n.n, 0))::INTEGER
  FROM org o LEFT JOIN npins n ON n.qid = o.qid
)
SELECT qid, doc_id, round(score, 6) AS score_r, pinned::BIGINT AS pinned,
       rank
FROM unioned WHERE rank <= {TOPK}
"""


SQL_PINNED_TOP10 = _sql_pinned_top10()


# ---------------------------------------------------------------------------
# C4 cleaning rules (textstats.c4_filters, Raffel et al. 2020 §2.2): the
# documents table is deterministically re-lined (7-word lines; terminal
# '.' when (doc_id+ln)%3 != 0; pinned trigger lines appended by doc_id
# mod) so the LINE-level rules act non-trivially, then the full rule set
# runs in both engines over identical strings — kept_text string identity
# is part of the hash.
# ---------------------------------------------------------------------------

from webindex.textstats import C4_MIN_KEPT_LINES as _C4_MINL
from webindex.textstats import C4_MIN_LINE_WORDS as _C4_MINW

C4_LINE_WORDS = 7
C4_EXTRAS = [
    (89, "lorem ipsum dolor sit amet.", 5),
    (97, "var x = { a };", 6),
    (101, "this page has badword1 content.", 5),
    (83, "click here to enable javascript now.", 6),
]


def _c4_lined(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out = []
    for did, text in zip(ids, texts):
        # same explicit word class as the oracle's regexp_extract_all
        words = re.findall(r"[^ \t\n\f\r]+", text or "")
        lines = []
        for ln in range(0, (len(words) + C4_LINE_WORDS - 1)
                        // C4_LINE_WORDS):
            lt = " ".join(
                words[ln * C4_LINE_WORDS:(ln + 1) * C4_LINE_WORDS]
            )
            if (did + ln) % 3 != 0:
                lt += "."
            lines.append(lt)
        for mod, extra, _nw in C4_EXTRAS:
            if did % mod == 0:
                lines.append(extra)
        out.append("\n".join(lines))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out, pa.string()),
        }
    )


def q_c4_filters(sf_dir: str):
    import ray.data as rd

    from webindex.textstats import c4_filters

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    ).filter(expr="text != ''")
    # drop docs that produced zero lines (whitespace-only text, no
    # extras) — the oracle's flags CTE groups over lines and emits no
    # row for them, so the engine must not either
    lined = docs.map_batches(_c4_lined, batch_format="pyarrow").filter(
        expr="text != ''"
    )
    return c4_filters(lined, badwords={"badword1"})


_C4_WORDSET = (
    "list_transform(str_split(lt, ' '), x -> rtrim(lower(x), '.!?\"'))"
)
SQL_C4_FILTERS = f"""
WITH dt AS (
  SELECT doc_id, regexp_extract_all(text, '[^ \\t\\n\\f\\r]+') AS wl
  FROM documents WHERE text <> ''
),
words AS (
  SELECT doc_id, unnest(wl) AS w, unnest(range(len(wl))) AS i FROM dt
),
lines0 AS (
  SELECT doc_id, i // {C4_LINE_WORDS} AS ln,
         string_agg(w, ' ' ORDER BY i) AS lt0, count(*)::BIGINT AS nw
  FROM words GROUP BY doc_id, (i // {C4_LINE_WORDS})
),
lines1 AS (
  SELECT doc_id, ln,
         CASE WHEN (doc_id + ln) % 3 <> 0 THEN lt0 || '.' ELSE lt0 END AS lt,
         nw
  FROM lines0
),
extras AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {1000000 + j} AS ln, '{extra}' AS lt, "
      f"{nw}::BIGINT AS nw FROM dt WHERE doc_id % {mod} = 0"
      for j, (mod, extra, nw) in enumerate(C4_EXTRAS)
  )}
),
lines AS (SELECT * FROM lines1 UNION ALL SELECT * FROM extras),
flags AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
    max(CASE WHEN contains(lower(lt), 'lorem ipsum')
             THEN 1 ELSE 0 END)::BIGINT AS has_lorem,
    max(CASE WHEN contains(lt, '{{') THEN 1 ELSE 0 END)::BIGINT AS has_brace,
    max(CASE WHEN list_contains({_C4_WORDSET}, 'badword1')
             THEN 1 ELSE 0 END)::BIGINT AS has_badword
  FROM lines GROUP BY doc_id
),
kept AS (
  SELECT doc_id, ln, lt, nw FROM lines
  WHERE regexp_matches(lt, '[.!?"]$') AND nw >= {_C4_MINW}
    AND NOT list_contains({_C4_WORDSET}, 'javascript')
),
ka AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept_lines,
         sum(nw)::BIGINT AS n_kept_words,
         string_agg(lt, chr(10) ORDER BY ln) AS kept_text
  FROM kept GROUP BY doc_id
)
SELECT f.doc_id, f.n_lines,
  coalesce(k.n_kept_lines, 0)::BIGINT AS n_kept_lines,
  coalesce(k.n_kept_words, 0)::BIGINT AS n_kept_words,
  f.has_badword, f.has_lorem, f.has_brace,
  (CASE WHEN coalesce(k.n_kept_lines, 0) >= {_C4_MINL}
        AND f.has_badword = 0 AND f.has_lorem = 0 AND f.has_brace = 0
        THEN 1 ELSE 0 END)::BIGINT AS keep,
  coalesce(k.kept_text, '') AS kept_text
FROM flags f LEFT JOIN ka k ON k.doc_id = f.doc_id
"""


# ---------------------------------------------------------------------------
# Lucene/ES intervals query family (webindex/intervals.py): minimal-
# interval algebra (match/any_of/all_of + containing-family filters) over
# the positional index. The oracle replays existence (and, for the
# NOT-filter, MINIMALITY via a NOT EXISTS contained-chain subquery)
# with exhaustive position self-joins over the pos CTE; matched docs
# rank by the shared OR-match BM25 scores over each query's leaf terms.
# ---------------------------------------------------------------------------

INTERVAL_QUERIES: list[tuple[str, dict]] = [
    ("i1", {"match": {"query": "merge join", "ordered": True,
                      "max_gaps": 3}}),
    ("i2", {"any_of": {"intervals": [
        {"match": {"query": "fast key", "ordered": True, "max_gaps": 0}},
        {"match": {"query": "slow query", "ordered": True, "max_gaps": 0}},
    ]}}),
    ("i3", {"all_of": {"ordered": True, "max_gaps": 4, "intervals": [
        {"match": {"query": "merge join", "ordered": True, "max_gaps": 0}},
        {"match": {"query": "sort"}},
    ]}}),
    ("i4", {"match": {"query": "hash table", "ordered": True, "max_gaps": 3,
            "filter": {"not_containing": {"match": {"query": "scan"}}}}}),
    ("i5", {"match": {"query": "window stream", "max_gaps": 5}}),
]


def q_intervals_top10(sf_dir: str):
    from webindex.intervals import intervals_search

    idx = ensure_index(sf_dir, "pos")
    runs = intervals_search(INTERVAL_QUERIES, idx, top_k=TOPK)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def _interval_terms_values_sql() -> str:
    from webindex.intervals import leaf_terms, parse_intervals

    rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, spec in INTERVAL_QUERIES
        for t in leaf_terms(parse_intervals(spec, _sql_an))
    )
    return f"(VALUES {rows}) AS q(qid, term)"


_INTERVAL_MATCH_SQLS = [
    # i1: ordered match, gaps (p1-p0)-1 <= 3 (existence; gaps cut is
    # monotone under containment so minimality is immaterial)
    "SELECT DISTINCT 'i1' AS qid, t0.doc_id FROM pos t0 "
    "JOIN pos t1 ON t1.doc_id = t0.doc_id "
    "WHERE t0.term = 'merge' AND t1.term = 'join' AND t1.p > t0.p "
    "AND (t1.p - t0.p) - 1 <= 3",
    # i2: any_of of two exact adjacencies
    "SELECT DISTINCT 'i2' AS qid, t0.doc_id FROM pos t0 "
    "JOIN pos t1 ON t1.doc_id = t0.doc_id "
    "WHERE (t0.term = 'fast' AND t1.term = 'key' AND t1.p = t0.p + 1) "
    "OR (t0.term = 'slow' AND t1.term = 'query' AND t1.p = t0.p + 1)",
    # i3: all_of(ordered, max_gaps=4) of [adjacent 'merge join', 'sort']:
    # envelope coverage gaps = (ps - pa + 1) - 3
    "SELECT DISTINCT 'i3' AS qid, t0.doc_id FROM pos t0 "
    "JOIN pos t1 ON t1.doc_id = t0.doc_id "
    "JOIN pos t2 ON t2.doc_id = t0.doc_id "
    "WHERE t0.term = 'merge' AND t1.term = 'join' AND t1.p = t0.p + 1 "
    "AND t2.term = 'sort' AND t2.p > t1.p "
    "AND (t2.p - t0.p + 1) - 3 <= 4",
    # i4: MINIMAL ordered 'hash table' chains (no contained chain),
    # gaps <= 3, not containing a 'scan' occurrence
    "SELECT DISTINCT 'i4' AS qid, a.doc_id FROM pos a "
    "JOIN pos b ON b.doc_id = a.doc_id "
    "WHERE a.term = 'hash' AND b.term = 'table' AND b.p > a.p "
    "AND (b.p - a.p) - 1 <= 3 "
    "AND NOT EXISTS (SELECT 1 FROM pos a2 JOIN pos b2 "
    "  ON b2.doc_id = a2.doc_id WHERE a2.doc_id = a.doc_id "
    "  AND a2.term = 'hash' AND b2.term = 'table' AND b2.p > a2.p "
    "  AND a2.p >= a.p AND b2.p <= b.p "
    "  AND NOT (a2.p = a.p AND b2.p = b.p)) "
    "AND NOT EXISTS (SELECT 1 FROM pos g WHERE g.doc_id = a.doc_id "
    "  AND g.term = 'scan' AND g.p BETWEEN a.p AND b.p)",
    # i5: unordered match, window gaps = |pw-ps|+1-2 <= 5
    "SELECT DISTINCT 'i5' AS qid, t0.doc_id FROM pos t0 "
    "JOIN pos t1 ON t1.doc_id = t0.doc_id "
    "WHERE t0.term = 'window' AND t1.term = 'stream' "
    "AND abs(t1.p - t0.p) <= 6",
]


def _sql_intervals_top10() -> str:
    return _sql_bm25_scores(_interval_terms_values_sql()) + f"""
, dt AS (SELECT doc_id, {_TOK_SQL} AS tl FROM documents WHERE text <> ''),
pos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS p FROM dt
),
pm AS (
  {" UNION ALL ".join(_INTERVAL_MATCH_SQLS)}
)
SELECT qid, doc_id, rank FROM (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id)::INTEGER AS rank
  FROM scores s JOIN pm ON pm.qid = s.qid AND pm.doc_id = s.doc_id
) WHERE rank <= {TOPK}
"""


SQL_INTERVALS_TOP10 = _sql_intervals_top10()


# ---------------------------------------------------------------------------
# ES rank_feature / distance_feature (search.rank_feature_queries /
# distance_feature_queries): ADDITIVE static-signal boosts over a numeric
# docvalue — final = bm25 + contrib(v). Single adds/divides are
# engine-portable; ln is per-distinct math.log (bit-identical to DuckDB).
# ---------------------------------------------------------------------------

RF_PIVOT, RF_BOOST = 300.0, 1.5
RF_LOG_SCALING, RF_LOG_BOOST = 1.0, 0.7
DF_ORIGIN, DF_PIVOT, DF_BOOST = 350.0, 120.0, 2.0


def _runs_round6_proj(t: pa.Table) -> pa.Table:
    sc = [round(x, 6) for x in t.column("score").to_pylist()]
    return pa.table(
        {
            "qid": t.column("qid"),
            "doc_id": t.column("doc_id"),
            "rank": t.column("rank"),
            "score_r": pa.array(sc, pa.float64()),
        }
    )


def q_rank_feature_top10(sf_dir: str):
    from webindex.search import rank_feature_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = rank_feature_queries(
        _queries_ds(), idx, "n_chars", function="saturation",
        pivot=RF_PIVOT, boost=RF_BOOST, top_k=TOPK,
    )
    return runs.map_batches(_runs_round6_proj, batch_format="pyarrow")


def q_rank_feature_log_top10(sf_dir: str):
    from webindex.search import rank_feature_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = rank_feature_queries(
        _queries_ds(), idx, "n_chars", function="log",
        scaling=RF_LOG_SCALING, boost=RF_LOG_BOOST, top_k=TOPK,
    )
    return runs.map_batches(_runs_round6_proj, batch_format="pyarrow")


def q_distance_feature_top10(sf_dir: str):
    from webindex.search import distance_feature_queries

    idx = ensure_index(sf_dir, "nostem")
    runs = distance_feature_queries(
        _queries_ds(), idx, "n_chars", origin=DF_ORIGIN, pivot=DF_PIVOT,
        boost=DF_BOOST, top_k=TOPK,
    )
    return runs.map_batches(_runs_round6_proj, batch_format="pyarrow")


def _sql_additive_feature(contrib_sql: str) -> str:
    return _sql_bm25_scores() + f"""
, nc AS (SELECT doc_id, n_chars FROM documents),
rf AS (
  SELECT s.qid, s.doc_id, s.score + {contrib_sql} AS score
  FROM scores s JOIN nc ON nc.doc_id = s.doc_id
)
SELECT qid, doc_id, rank, score_r FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank,
         round(score, 6) AS score_r
  FROM rf
) WHERE rank <= {TOPK}
"""


SQL_RANK_FEATURE_TOP10 = _sql_additive_feature(
    f"{RF_BOOST!r} * (nc.n_chars / (nc.n_chars + {RF_PIVOT!r}))"
)
SQL_RANK_FEATURE_LOG_TOP10 = _sql_additive_feature(
    f"{RF_LOG_BOOST!r} * ln({RF_LOG_SCALING!r} * nc.n_chars + 1)"
)
SQL_DISTANCE_FEATURE_TOP10 = _sql_additive_feature(
    f"{DF_BOOST!r} * ({DF_PIVOT!r} / "
    f"({DF_PIVOT!r} + abs(nc.n_chars - {DF_ORIGIN!r})))"
)


# query_string docvalue leaves: field:value / field:[LO TO HI] are
# constant-score predicates over the index's attribute sidecar (lang,
# source, n_chars) — ES's filter-in-query-context. Same two-backend
# contract: to_sql renders each distinct predicate as ONE LEFT JOIN
# against the documents view, match/score CASE-mirrored op for op.
QS_DV_QUERIES: list[tuple[str, str]] = [
    ("d1", "merge AND lang:en"),
    ("d2", "join n_chars:[250 TO 450]^2"),
    ("d3", "+table -lang:de"),
    ("d4", "(fast OR slow) AND source:src3"),
    ("d5", "key lang:fr^1.5 n_chars:[* TO 300]"),
    ("d6", "scan AND n_chars:[400 TO *] -source:src7"),
]


def _sql_qs_dv(select: str) -> str:
    from webindex.querystring import bind, parse_query_string, to_sql

    body = "\n  UNION ALL\n".join(
        to_sql(bind(parse_query_string(q), _sql_an), qid)
        for qid, q in QS_DV_QUERIES
    )
    return (
        _SQL_QS_CTE.replace("{CONTRIB}", _QS_BM25_EXPR)
        .replace("{BODY}", body) + select
    )


SQL_QS_DV_TOP10 = _sql_qs_dv(f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM qs
) WHERE rank <= {TOPK}
""")
SQL_QS_DV_SCORES = _sql_qs_dv(
    "SELECT qid, doc_id, round(score, 6) AS score_r FROM qs"
)


def q_qs_dv_top10(sf_dir: str):
    """query_string with docvalue leaves, ranked: lang:/source: equality
    and n_chars:[..] ranges composed under every boolean role."""
    from webindex.querystring import query_string_search

    idx = ensure_index(sf_dir, "nostem")
    runs = query_string_search(QS_DV_QUERIES, idx, top_k=TOPK)
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_qs_dv_scores(sf_dir: str):
    """Every (dv query_string, doc) match score, 6dp at the surface."""
    from webindex.querystring import query_string_search

    idx = ensure_index(sf_dir, "nostem")
    runs = query_string_search(QS_DV_QUERIES, idx, top_k=10**9)

    def rnd(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "score_r": pa.array(sc, pa.float64()),
            }
        )

    return runs.map_batches(rnd, batch_format="pyarrow")


# Lucene FIELDED query_string: title:/body: words score with the
# per-field index's own BM25 statistics (the multifield split), other
# field: names stay docvalue predicates — one query string composing all
# three leaf families plus default-field terms.
QS_FIELD_QUERIES: list[tuple[str, str]] = [
    ("f1", "title:merge join"),
    ("f2", "+title:fast body:slow"),
    ("f3", "body:customer -title:order"),
    ("f4", "(title:table OR body:scan) lang:en"),
    ("f5", "title:key^2 value"),
    ("f6", "body:row AND n_chars:[250 TO *]"),
]


def _qs_field_block(p: str, field: str, docs_cte: str) -> str:
    tok = "regexp_extract_all(lower(ftext), '[a-z0-9]+')"
    return f"""
{p}toks AS (
  SELECT doc_id, t.tok AS term
  FROM {docs_cte}, unnest({tok}) AS t(tok)
),
{p}tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
          FROM {p}toks GROUP BY doc_id, term),
{p}dl AS (SELECT doc_id, len({tok})::BIGINT AS dl FROM {docs_cte}),
{p}df AS (SELECT term, count(*)::BIGINT AS df FROM {p}tf GROUP BY term),
{p}stats AS (SELECT count(*)::BIGINT AS n_docs,
                    sum(dl)::BIGINT AS total_tokens FROM {p}dl),
contrib_{field} AS (
  SELECT tf.doc_id, tf.term, {_QS_BM25_EXPR} AS c
  FROM {p}tf tf
  JOIN {p}df df ON df.term = tf.term
  JOIN {p}dl dl ON dl.doc_id = tf.doc_id
  CROSS JOIN {p}stats s
)"""


def _sql_qs_fields(select: str) -> str:
    from webindex.querystring import bind, parse_query_string, to_sql

    body = "\n  UNION ALL\n".join(
        to_sql(
            bind(parse_query_string(q), _sql_an,
                 text_fields=("title", "body")),
            qid,
        )
        for qid, q in QS_FIELD_QUERIES
    )
    head = _SQL_QS_CTE.replace("{CONTRIB}", _QS_BM25_EXPR).replace(
        "\nqs AS (\n{BODY}\n)",
        f"""
rawtok AS (
  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\f\r]+') AS rt
  FROM documents
),
fs AS (
  SELECT doc_id,
         coalesce(array_to_string(rt[1:6], ' '), '') AS ftitle,
         coalesce(array_to_string(rt[7:], ' '), '') AS fbody
  FROM rawtok
),
tdocs AS (SELECT doc_id, ftitle AS ftext FROM fs WHERE ftitle <> ''),
bdocs AS (SELECT doc_id, fbody AS ftext FROM fs WHERE fbody <> ''),
{_qs_field_block("t", "title", "tdocs")},
{_qs_field_block("b", "body", "bdocs")},
qs AS (
{body}
)""",
    )
    return head + select


SQL_QS_FIELDS_TOP10 = _sql_qs_fields(f"""
SELECT qid, doc_id, rank FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::INTEGER AS rank
  FROM qs
) WHERE rank <= {TOPK}
""")
SQL_QS_FIELDS_SCORES = _sql_qs_fields(
    "SELECT qid, doc_id, round(score, 6) AS score_r FROM qs"
)


def q_qs_fields_top10(sf_dir: str):
    """Fielded query_string, ranked: title:/body: terms score with the
    per-field indexes' own stats (ES per-field scoring), composed with
    default-field terms and docvalue predicates in one boolean tree
    (webindex/querystring.py FieldTerm + field_dirs)."""
    from webindex.querystring import query_string_search

    idx = ensure_index(sf_dir, "nostem")
    fidx = ensure_field_indexes(sf_dir)
    runs = query_string_search(
        QS_FIELD_QUERIES, idx, top_k=TOPK,
        field_dirs={"title": fidx["title"], "body": fidx["body"]},
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


def q_qs_fields_scores(sf_dir: str):
    """Every (fielded query_string, doc) match score, 6dp surface."""
    from webindex.querystring import query_string_search

    idx = ensure_index(sf_dir, "nostem")
    fidx = ensure_field_indexes(sf_dir)
    runs = query_string_search(
        QS_FIELD_QUERIES, idx, top_k=10**9,
        field_dirs={"title": fidx["title"], "body": fidx["body"]},
    )

    def rnd(t: pa.Table) -> pa.Table:
        sc = [round(x, 6) for x in t.column("score").to_pylist()]
        return pa.table(
            {
                "qid": t.column("qid"),
                "doc_id": t.column("doc_id"),
                "score_r": pa.array(sc, pa.float64()),
            }
        )

    return runs.map_batches(rnd, batch_format="pyarrow")


def q_qs_lmd_top10(sf_dir: str):
    """query_string x similarity composability: the s1..s8 ASTs ranked
    under LM Dirichlet instead of BM25."""
    from webindex.querystring import query_string_search

    idx = ensure_index(sf_dir, "nostem")
    runs = query_string_search(
        QS_QUERIES, idx, top_k=TOPK, similarity="lmdirichlet"
    )
    return runs.map_batches(
        lambda t: t.select(["qid", "doc_id", "rank"]), batch_format="pyarrow"
    )


SQL_NAIVE_BAYES = _sql_naive_bayes()


def _sql_langid_nb() -> str:
    from webindex.classify import langid_nb_sql

    return langid_nb_sql()


SQL_LANGID_NB = _sql_langid_nb()


REGISTRY: dict[str, tuple] = {
    "corpus_stats": (q_corpus_stats, SQL_CORPUS_STATS),
    "doclens": (q_doclens, SQL_DOCLENS),
    "term_df": (q_term_df, SQL_TERM_DF),
    "bm25_top10": (q_bm25_top10, SQL_BM25_TOP10),
    "bm25_scores": (q_bm25_scores, SQL_BM25_SCORES),
    "lmd_scores": (q_lmd_scores, SQL_LMD_SCORES),
    "lmd_top10": (q_lmd_top10, SQL_LMD_TOP10),
    "lmjm_scores": (q_lmjm_scores, SQL_LMJM_SCORES),
    "tfidf_scores": (q_tfidf_scores, SQL_TFIDF_SCORES),
    "bool_scores": (q_bool_scores, SQL_BOOL_SCORES),
    "qs_top10": (q_qs_top10, SQL_QS_TOP10),
    "qs_scores": (q_qs_scores, SQL_QS_SCORES),
    "qs_lmd_top10": (q_qs_lmd_top10, SQL_QS_LMD_TOP10),
    "qs_dv_top10": (q_qs_dv_top10, SQL_QS_DV_TOP10),
    "qs_dv_scores": (q_qs_dv_scores, SQL_QS_DV_SCORES),
    "qs_fields_top10": (q_qs_fields_top10, SQL_QS_FIELDS_TOP10),
    "qs_fields_scores": (q_qs_fields_scores, SQL_QS_FIELDS_SCORES),
    "rescore_top10": (q_rescore_top10, SQL_RESCORE_TOP10),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "decay_top10": (q_decay_top10, SQL_DECAY_TOP10),
    "rank_feature_top10": (q_rank_feature_top10, SQL_RANK_FEATURE_TOP10),
    "rank_feature_log_top10": (q_rank_feature_log_top10,
                               SQL_RANK_FEATURE_LOG_TOP10),
    "distance_feature_top10": (q_distance_feature_top10,
                               SQL_DISTANCE_FEATURE_TOP10),
    "rerank_overlap": (q_rerank_overlap, SQL_RERANK_OVERLAP),
    "docs_by_lang": (q_docs_by_lang, SQL_DOCS_BY_LANG),
    "top_longest": (q_top_longest, SQL_TOP_LONGEST),
    "exact_dedup_docs": (q_exact_dedup_docs, SQL_EXACT_DEDUP),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_calendar": (q_events_calendar, SQL_EVENTS_CALENDAR),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "max_query_tokens": (q_max_query_tokens, SQL_MAX_QUERY_TOKENS),
    "truncation_counters": (q_truncation_counters, SQL_TRUNCATION_COUNTERS),
    "unique_first_seen": (q_unique_first_seen, SQL_UNIQUE_FIRST_SEEN),
    "giant_json_extract": (q_giant_json_extract, SQL_GIANT_JSON_EXTRACT),
    "fetch_unzip_roundtrip": (q_fetch_unzip_roundtrip,
                              SQL_FETCH_UNZIP_ROUNDTRIP),
    "publish_roundtrip": (q_publish_roundtrip, SQL_PUBLISH_ROUNDTRIP),
    "clean_truncate_docs": (q_clean_truncate_docs, SQL_CLEAN_TRUNCATE_DOCS),
    "model_ranking": (q_model_ranking, SQL_MODEL_RANKING),
    "best_ckpt": (q_best_ckpt, SQL_BEST_CKPT),
    "metrics_accumulator_roundtrip": (q_metrics_accumulator_roundtrip,
                                      SQL_METRICS_ACCUMULATOR),
    "fingerprints": (q_fingerprints, SQL_FINGERPRINTS),
    "ann_top5": (q_ann_top5, SQL_ANN_TOP5),
    "hnsw_top5": (q_hnsw_top5, SQL_ANN_TOP5),
    "ann_filtered_top5": (q_ann_filtered_top5, SQL_ANN_FILTERED_TOP5),
    "distinct_langs": (q_distinct_langs, SQL_DISTINCT_LANGS),
    "simulate_rerank": (q_simulate_rerank, SQL_SIMULATE_RERANK),
    "chars_histogram": (q_chars_histogram, SQL_CHARS_HISTOGRAM),
    "orders_by_nation": (q_orders_by_nation, SQL_ORDERS_BY_NATION),
    "rerank_scored": (q_rerank_scored, SQL_RERANK_SCORED),
    "lineitem_pricing": (q_lineitem_pricing, SQL_LINEITEM_PRICING),
    "sharded_bm25_top10": (q_sharded_bm25_top10, SQL_BM25_TOP10),
    "alias_top10": (q_alias_top10, SQL_BM25_TOP10),
    "alias_scores": (q_alias_scores, SQL_BM25_SCORES),
    "facet_weighted_avg": (q_facet_weighted_avg, SQL_FACET_WEIGHTED_AVG),
    "facet_pct_ranks": (q_facet_pct_ranks, SQL_FACET_PCT_RANKS),
    "facet_filters": (q_facet_filters, SQL_FACET_FILTERS),
    "adjacency_matrix": (q_adjacency_matrix, SQL_ADJACENCY_MATRIX),
    "events_bucket_stats": (q_events_bucket_stats, SQL_EVENTS_BUCKET_STATS),
    "bm25_filtered_top10": (q_bm25_filtered_top10, SQL_BM25_FILTERED_TOP10),
    "bm25_and_top10": (q_bm25_and_top10, SQL_BM25_AND_TOP10),
    "bm25_phrase_top10": (q_bm25_phrase_top10, SQL_BM25_PHRASE_TOP10),
    "mf_best_fields_top10": (q_mf_best_fields_top10, SQL_MF_TOP10),
    "mf_best_fields_scores": (q_mf_best_fields_scores, SQL_MF_SCORES),
    "mf_combined_top10": (q_mf_combined_top10, SQL_MF_COMBINED_TOP10),
    "bm25_min2_top10": (q_bm25_min2_top10, SQL_BM25_MIN2_TOP10),
    "bm25_boosted_top10": (q_bm25_boosted_top10, SQL_BM25_BOOSTED_TOP10),
    "bm25_deleted_top10": (q_bm25_deleted_top10, SQL_BM25_DELETED_TOP10),
    "bm25_dbq_top10": (q_bm25_dbq_top10, SQL_BM25_DBQ_TOP10),
    "events_pipeline_aggs": (q_events_pipeline_aggs,
                             SQL_EVENTS_PIPELINE_AGGS),
    "events_bucket_pipeline": (q_events_bucket_pipeline,
                               SQL_EVENTS_BUCKET_PIPELINE),
    "bm25_compacted_top10": (q_bm25_compacted_top10,
                             SQL_BM25_COMPACTED_TOP10),
    "bm25_phrase_pos_top10": (q_bm25_phrase_pos_top10, SQL_BM25_PHRASE_TOP10),
    "facet_counts": (q_facet_counts, SQL_FACET_COUNTS),
    "facet_cardinality": (q_facet_cardinality, SQL_FACET_CARDINALITY),
    "facet_cardinality_hll": (q_facet_cardinality_hll,
                              SQL_FACET_CARDINALITY),
    "facet_multi_terms": (q_facet_multi_terms, SQL_FACET_MULTI_TERMS),
    "facet_rare_terms": (q_facet_rare_terms, SQL_FACET_RARE_TERMS),
    "top_hits_per_lang": (q_top_hits_per_lang, SQL_TOP_HITS_PER_LANG),
    "facet_histogram": (q_facet_histogram, SQL_FACET_HISTOGRAM),
    "facet_counts_filtered": (q_facet_counts_filtered,
                              SQL_FACET_COUNTS_FILTERED),
    "snippets_top10": (q_snippets_top10, SQL_SNIPPETS_TOP10),
    "beir_roundtrip": (q_beir_roundtrip, SQL_BEIR_ROUNDTRIP),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "robots_filter": (q_robots_filter, SQL_ROBOTS_FILTER),
    "dense_top5": (q_dense_top5, None),
    "dense_top5_poly": (q_dense_top5_poly, SQL_DENSE_TOP5_POLY),
    "module_chain_top5": (q_module_chain_top5, SQL_DENSE_TOP5_POLY),
    "dense_top5_poly_left": (q_dense_top5_poly_left, SQL_DENSE_TOP5_POLY_LEFT),
    "specb_top5_poly": (q_specb_top5_poly, SQL_SPECB_TOP5_POLY),
    "langid": (q_langid, SQL_LANGID),
    "quality": (q_quality, SQL_QUALITY),
    "eval_metrics": (q_eval_metrics, SQL_EVAL_METRICS),
    "cc_chain_clusters": (q_cc_chain_clusters, SQL_CC_CHAIN),
    "paraphrase_top": (q_paraphrase_top, SQL_PARAPHRASE_TOP),
    "ngram_jaccard_clusters": (q_ngram_jaccard_clusters, SQL_NGRAM_JACCARD),
    "curation_pipeline": (q_curation_pipeline, SQL_CURATION),
    "ivf_seed_top5": (q_ivf_seed_top5, SQL_IVF_SEED_TOP5),
    "events_asof_orders": (q_events_asof_orders, SQL_EVENTS_ASOF),
    "events_range_pairs": (q_events_range_pairs, SQL_EVENTS_RANGE),
    "bpe_token_counts": (q_bpe_token_counts, SQL_BPE_TOKEN_COUNTS),
    "bpe_word_counts": (q_bpe_word_counts, SQL_BPE_WORD_COUNTS),
    "bpe_pair_counts": (q_bpe_pair_counts, SQL_BPE_PAIR_COUNTS),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "events_median": (q_events_median, SQL_EVENTS_MEDIAN),
    "top_longest_per_lang": (q_top_longest_per_lang, SQL_TOP_PER_LANG),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "suggest": (q_suggest, SQL_SUGGEST),
    "fuzzy_top10": (q_fuzzy_top10, SQL_FUZZY_TOP10),
    "mlt_top5": (q_mlt_top5, SQL_MLT_TOP5),
    "explain_top3": (q_explain_top3, SQL_EXPLAIN_TOP3),
    "top_terms": (q_top_terms, SQL_TOP_TERMS),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "hits": (q_hits, SQL_HITS),
    "ppr_trust": (q_ppr_trust, SQL_PPR),
    "anchor_docs": (q_anchor_docs, SQL_ANCHOR_DOCS),
    "url_curation": (q_url_curation, SQL_URL_CURATION),
    "web_rank_top10": (q_web_rank_top10, SQL_WEB_RANK),
    "rm3_top10": (q_rm3_top10, SQL_RM3),
    "bm25_synidx_top10": (q_bm25_synidx_top10, SQL_BM25_SYNIDX_TOP10),
    "gopher_rules": (q_gopher_rules, SQL_GOPHER_RULES),
    "anchor_top10": (q_anchor_top10, SQL_ANCHOR_TOP10),
    "bm25_page2": (q_bm25_page2, SQL_BM25_PAGE2),
    "termvectors": (q_termvectors, SQL_TERMVECTORS),
    "repetition": (q_repetition, SQL_REPETITION),
    "synonym_top10": (q_synonym_top10, SQL_SYNONYM_TOP10),
    "search_count": (q_search_count, SQL_SEARCH_COUNT),
    "bm25_not_top10": (q_bm25_not_top10, SQL_BM25_NOT_TOP10),
    "sample_docs": (q_sample_docs, SQL_SAMPLE_DOCS),
    "packed_seqs": (q_packed_seqs, SQL_PACKED_SEQS),
    "facet_stats": (q_facet_stats, SQL_FACET_STATS),
    "facet_ext_stats": (q_facet_ext_stats, SQL_FACET_EXT_STATS),
    "facet_boxplot": (q_facet_boxplot, SQL_FACET_BOXPLOT),
    "facet_mad": (q_facet_mad, SQL_FACET_MAD),
    "facet_t_test": (q_facet_t_test, SQL_FACET_TTEST),
    "facet_matrix_stats": (q_facet_matrix_stats, SQL_FACET_MATRIX),
    "facet_range": (q_facet_range, SQL_FACET_RANGE),
    "stats_by_lang": (q_stats_by_lang, SQL_STATS_BY_LANG),
    "composite_page": (q_composite_page, SQL_COMPOSITE_PAGE),
    "facet_pcts": (q_facet_pcts, SQL_FACET_PCTS),
    "collapse_top5": (q_collapse_top5, SQL_COLLAPSE_TOP5),
    "sig_terms": (q_sig_terms, SQL_SIG_TERMS),
    "prefix_top10": (q_prefix_top10, SQL_PREFIX_TOP10),
    "regexp_top10": (q_regexp_top10, SQL_REGEXP_TOP10),
    "wildcard_top10": (q_wildcard_top10, SQL_WILDCARD_TOP10),
    "span_near_top10": (q_span_near_top10, SQL_SPAN_NEAR_TOP10),
    "intervals_top10": (q_intervals_top10, SQL_INTERVALS_TOP10),
    "c4_filters": (q_c4_filters, SQL_C4_FILTERS),
    "pinned_top10": (q_pinned_top10, SQL_PINNED_TOP10),
    "bm25_phrase_shingle_top10": (q_bm25_phrase_shingle_top10,
                                  SQL_BM25_PHRASE_SHINGLE_TOP10),
    "bm25_exists_top10": (q_bm25_exists_top10, SQL_BM25_EXISTS_TOP10),
    "semdedup": (q_semdedup, SQL_SEMDEDUP),
    "bm25_missing_top10": (q_bm25_missing_top10, SQL_BM25_MISSING_TOP10),
    "span_unordered_top10": (q_span_unordered_top10,
                             SQL_SPAN_UNORDERED_TOP10),
    "span_first_top10": (q_span_first_top10, SQL_SPAN_FIRST_TOP10),
    "paragraph_dedup": (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
    "perplexity_buckets": (q_perplexity_buckets, SQL_PERPLEXITY_BUCKETS),
    "ann_sq8_top5": (q_ann_sq8_top5, SQL_ANN_SQ8_TOP5),
    "match_bool_prefix": (q_match_bool_prefix_top10,
                          SQL_MATCH_BOOL_PREFIX),
    "terms_set_top10": (q_terms_set_top10, SQL_TERMS_SET_TOP10),
    "has_child_top10": (q_has_child_top10, SQL_HAS_CHILD_TOP10),
    "has_child_sum_top10": (q_has_child_sum_top10,
                            SQL_HAS_CHILD_SUM_TOP10),
    "has_parent_children": (q_has_parent_children,
                            SQL_HAS_PARENT_CHILDREN),
    "events_auto_histogram": (q_events_auto_histogram, _sql_auto_dh()),
    "events_date_range": (q_events_date_range, _sql_date_range()),
    "sampler_terms": (q_sampler_terms, SQL_SAMPLER_TERMS),
    "diversified_terms": (q_diversified_terms, SQL_DIVERSIFIED_TERMS),
    "span_not_top10": (q_span_not_top10, SQL_SPAN_NOT_TOP10),
    "span_containing_top10": (q_span_containing_top10,
                              SQL_SPAN_CONTAINING_TOP10),
    "span_or_near_top10": (q_span_or_near_top10, SQL_SPAN_OR_NEAR_TOP10),
    "bm25_fvf_top10": (q_bm25_fvf_top10, SQL_BM25_FVF_TOP10),
    "dup_ngrams": (q_dup_ngrams, SQL_DUP_NGRAMS),
    "dedup_spans": (q_dedup_spans, SQL_DEDUP_SPANS),
    "contamination": (q_contamination, SQL_CONTAMINATION),
    "user_sessions": (q_user_sessions, SQL_USER_SESSIONS),
    "curation_v2": (q_curation_v2, SQL_CURATION_V2),
    "temperature_mix": (q_temperature_mix, SQL_TEMPERATURE_MIX),
    "props_stats": (q_props_stats, SQL_PROPS_STATS),
    "unigram_logprob": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "bigram_logprob": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "chunk_docs": (q_chunk_docs, SQL_CHUNK_DOCS),
    "source_filter": (q_source_filter, SQL_SOURCE_FILTER),
    "scan_matches": (q_scan_matches, SQL_SCAN_MATCHES),
    "bm25_dismax_top10": (q_bm25_dismax_top10, SQL_BM25_DISMAX_TOP10),
    "hybrid_rrf_top10": (q_hybrid_rrf_top10, SQL_HYBRID_RRF_TOP10),
    "pmi_top20": (q_pmi_top20, SQL_PMI_TOP20),
    "textrank_keywords": (q_textrank_keywords, _sql_textrank()),
    "sig_test": (q_sig_test, None),
    "query_plan": (q_query_plan, SQL_QUERY_PLAN),
    "fetch_top10": (q_fetch_top10, SQL_FETCH_TOP10),
    "percolate": (q_percolate, SQL_PERCOLATE),
    "sort_by_nchars": (q_sort_by_nchars, SQL_SORT_BY_NCHARS),
    "match_phrase_prefix": (q_match_phrase_prefix,
                            SQL_MATCH_PHRASE_PREFIX),
    "bm25_boosting_top10": (q_bm25_boosting_top10,
                            SQL_BM25_BOOSTING_TOP10),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "spell_correct": (q_spell_correct, SQL_SPELL_CORRECT),
    "phrase_suggest": (q_phrase_suggest, SQL_PHRASE_SUGGEST),
    "minhash_poly_clusters": (q_minhash_poly_clusters,
                              SQL_MINHASH_POLY_CLUSTERS),
    "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "minhash_dedup_kept": (q_minhash_dedup_kept, SQL_MINHASH_DEDUP_KEPT),
    "simhash_poly_clusters": (q_simhash_poly_clusters,
                              SQL_SIMHASH_POLY_CLUSTERS),
    "naive_bayes": (q_naive_bayes, SQL_NAIVE_BAYES),
    "langid_nb": (q_langid_nb, SQL_LANGID_NB),
    # rows-only (non-SQL-expressible; gated by pytest oracles)
    "bm25_stemmed_top10": (q_bm25_stemmed_top10, SQL_BM25_STEMMED_TOP10),
    "minhash_clusters": (q_minhash_clusters, None),
    "simhash_clusters": (q_simhash_clusters, None),
    "minhash_sigs": (q_minhash_sigs, SQL_MINHASH_SIGS),
    "simhash_sigs": (q_simhash_sigs, SQL_SIMHASH_SIGS),
    "embedding_dedup": (q_embedding_dedup, SQL_EMBEDDING_DEDUP),
    "ivf_top5": (q_ivf_top5, None),
    "pq_top5": (q_pq_top5, SQL_PQ_TOP5),
    "ivfpq_top5": (q_ivfpq_top5, SQL_IVFPQ_TOP5),
    "openai_search": (q_openai_search, None),
    "media_features": (q_media_features, None),
    "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "bpe_subword_counts": (q_bpe_subword_counts, SQL_BPE_SUBWORD_COUNTS),
    "quality_classifier": (q_quality_classifier, None),
}
