"""Dictionary-driven query operators: prefix suggest, fuzzy match, MLT,
and the per-term score explanation.

ES analogs the reference's BM25 baseline gets for free from Elasticsearch
(the reference delegates every query shape to ES — see
/root/reference/crossencoder_beir_bm25.ipynb cell 10 and SURVEY.md §3.1):

- ``suggest``        — completion suggester / ``match_phrase_prefix``:
  top-k dictionary completions of a prefix ranked by document frequency.
- ``fuzzy_expand`` / ``fuzzy_search`` — ``fuzzy`` query: Lucene's
  FuzzyQuery rewrites to the ``max_expansions`` highest-df dictionary
  terms within ``max_edits`` Levenshtein distance, then scores the
  disjunction; we reproduce exactly that rewrite.
- ``more_like_this`` — MLT query: rank the seed document's terms by
  tf·idf, keep ``max_query_terms``, re-run them as a disjunctive BM25
  query, exclude the seed (the engine's self-hit anti-join).
- ``explain_scores`` — the ``_explain`` API: per-(query, doc, term)
  BM25 contribution breakdown (tf, dl, df, contribution), bit-identical
  to what the ranking summed.

Scale shape: every operator is a distributed scan of the index's ``dict``
sidecar (term, df, cf) — per-batch vectorized work emits only per-batch
top-k partials, so the final exact merge sees k x n_blocks rows, never the
vocabulary. Query execution reuses ``search_queries``'s sharded
scatter-gather path with ``pre_tokenized=True`` (expansion terms come from
the dictionary already analyzed; re-analysis would re-stem).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from webindex.analyze import Analyzer
from webindex.scoring import idf as bm25_idf


def _dict_ds(index_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(index_dir, "dict"), columns=["term", "df"]
    )


# ---------------------------------------------------------------------------
# prefix suggest (ES completion suggester)
# ---------------------------------------------------------------------------


def suggest(index_dir: str, prefixes: list[str], k: int = 10) -> pd.DataFrame:
    """Top-k dictionary completions per prefix by (df desc, term asc).

    Returns a frame (prefix, term, df, rank). Distributed scan of the dict
    sidecar; each batch contributes at most k rows per prefix, so the
    driver-side exact merge is bounded by k x n_blocks x n_prefixes.
    """
    pref = sorted(set(prefixes))

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch.column("term")
        dfs = batch.column("df").to_numpy()
        out = {"prefix": [], "term": [], "df": []}
        for p in pref:
            mask = pc.starts_with(terms, pattern=p).to_numpy(
                zero_copy_only=False
            )
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            cand = sorted(
                ((int(-dfs[i]), terms[i].as_py()) for i in idx)
            )[:k]
            out["prefix"].extend([p] * len(cand))
            out["term"].extend(t for _, t in cand)
            out["df"].extend(-n for n, _ in cand)
        return pa.table(
            {
                "prefix": pa.array(out["prefix"], pa.string()),
                "term": pa.array(out["term"], pa.string()),
                "df": pa.array(out["df"], pa.int64()),
            }
        )

    parts = _dict_ds(index_dir).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"prefix": pd.Series(dtype=str), "term": pd.Series(dtype=str),
             "df": pd.Series(dtype=np.int64),
             "rank": pd.Series(dtype=np.int32)}
        )
    top = (
        parts.sort_values(
            ["prefix", "df", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        .groupby("prefix", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = (top.groupby("prefix").cumcount() + 1).astype(np.int32)
    return top


# ---------------------------------------------------------------------------
# fuzzy query (Lucene FuzzyQuery rewrite)
# ---------------------------------------------------------------------------


def levenshtein_batch(terms: list[str], query: str) -> np.ndarray:
    """Vectorized Levenshtein distance of one query term against a batch of
    dictionary terms. Classic DP, vectorized across the whole batch: for
    each query character one substitution/deletion row, then the insertion
    closure as a running minimum of (row - column index) — no per-term
    Python loop. O(len(query) * max_len) numpy ops on batch-sized arrays.
    """
    n = len(terms)
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.fromiter((len(t) for t in terms), np.int64, n)
    lmax = int(lens.max())
    # padded codepoint matrix (n, lmax); pad value never equals a query char
    chars = np.zeros((n, lmax), np.int32)
    for i, t in enumerate(terms):
        chars[i, : len(t)] = np.frombuffer(
            t.encode("utf-32-le"), np.uint32
        ).astype(np.int32)
    col = np.arange(lmax + 1, dtype=np.int64)
    prev = np.broadcast_to(col, (n, lmax + 1)).copy()
    for i, qc in enumerate(query, 1):
        base = np.empty_like(prev)
        base[:, 0] = i
        sub = prev[:, :-1] + (chars != ord(qc))
        base[:, 1:] = np.minimum(prev[:, 1:] + 1, sub)
        # insertion closure: cur[j] = min over m<=j of base[m] + (j - m)
        base -= col
        np.minimum.accumulate(base, axis=1, out=base)
        base += col
        prev = base
    return prev[np.arange(n), lens]


def fuzzy_expand(index_dir: str, qterms: list[str], *, max_edits: int = 1,
                 max_expansions: int = 50,
                 prefix_len: int = 0) -> pd.DataFrame:
    """One distributed dict scan expands ALL query terms at once.

    Returns (qterm, term, df): per query term the ``max_expansions``
    dictionary terms within ``max_edits`` Levenshtein distance, ranked by
    (df desc, term asc) — Lucene's top-terms fuzzy rewrite order. The
    ``prefix_len`` first characters must match exactly (Lucene's
    ``prefix_length``), which also prunes the scan cheaply.
    """
    qs = sorted(set(qterms))

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_numpy()
        lens = np.fromiter((len(t) for t in terms), np.int64, len(terms))
        out_q, out_t, out_d = [], [], []
        for q in qs:
            # cheap vectorized prefilters: length band + fixed prefix
            cand = np.flatnonzero(np.abs(lens - len(q)) <= max_edits)
            if prefix_len:
                p = q[:prefix_len]
                cand = cand[
                    np.fromiter(
                        (terms[i].startswith(p) for i in cand), bool,
                        cand.size,
                    )
                ]
            if cand.size == 0:
                continue
            sub = [terms[i] for i in cand]
            dist = levenshtein_batch(sub, q)
            hit = cand[dist <= max_edits]
            if hit.size == 0:
                continue
            top = sorted(
                ((int(-dfs[i]), terms[i]) for i in hit)
            )[:max_expansions]
            out_q.extend([q] * len(top))
            out_t.extend(t for _, t in top)
            out_d.extend(-n for n, _ in top)
        return pa.table(
            {
                "qterm": pa.array(out_q, pa.string()),
                "term": pa.array(out_t, pa.string()),
                "df": pa.array(out_d, pa.int64()),
            }
        )

    parts = _dict_ds(index_dir).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"qterm": pd.Series(dtype=str), "term": pd.Series(dtype=str),
             "df": pd.Series(dtype=np.int64)}
        )
    return (
        parts.sort_values(
            ["qterm", "df", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        .groupby("qterm", sort=True)
        .head(max_expansions)
        .reset_index(drop=True)
    )


def fuzzy_search(queries: list[tuple[str, str]], index_dir: str, *,
                 top_k: int = 10, max_edits: int = 1,
                 max_expansions: int = 50, prefix_len: int = 0,
                 **search_kwargs):
    """ES ``fuzzy`` query: analyze each query, expand every term against
    the dictionary, BM25-score the union of expansions (each expansion
    contributes with its OWN idf — the Lucene rewrite semantics), exclude
    nothing. Returns the runs Dataset of ``search_queries``.
    """
    import ray.data as rd

    from webindex.config import IndexConfig
    from webindex.search import search_queries
    from webindex.util import read_json

    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    an = Analyzer(cfg.analyzer)
    toks = {qid: sorted(set(an.tokens(text or ""))) for qid, text in queries}
    all_terms = sorted({t for ts in toks.values() for t in ts})
    exp = fuzzy_expand(
        index_dir, all_terms, max_edits=max_edits,
        max_expansions=max_expansions, prefix_len=prefix_len,
    )
    by_qterm: dict[str, list[str]] = (
        exp.groupby("qterm")["term"].apply(list).to_dict()
    )
    rows_q, rows_t = [], []
    for qid, _ in queries:
        terms = sorted({t for qt in toks[qid] for t in by_qterm.get(qt, ())})
        if not terms:
            continue
        rows_q.append(qid)
        rows_t.append(" ".join(terms))
    q_ds = rd.from_arrow(
        pa.table({"qid": pa.array(rows_q, pa.string()),
                  "text": pa.array(rows_t, pa.string())})
    )
    return search_queries(
        q_ds, index_dir, top_k=top_k, pre_tokenized=True, **search_kwargs
    )


# ---------------------------------------------------------------------------
# more_like_this
# ---------------------------------------------------------------------------


class MltTermSelect:
    """Actor stage: seed (doc_id, text) rows -> (qid, text) MLT queries.

    Per seed: analyze the text, rank its terms by tf·idf
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)) from the GLOBAL dictionary),
    keep the top ``max_query_terms`` by (tf·idf desc, term asc). Emits
    qid = str(doc_id) so the search stage's self-hit anti-join
    (SURVEY.md §2.4 J4) drops the seed from its own results, and a
    space-joined pre-analyzed term list as the query text.

    The SegmentReader here is used only for its dict + stats (df/N);
    postings stay on disk. One reader per pool actor (setup in __init__).
    """

    def __init__(self, index_dir: str, max_query_terms: int = 25):
        from webindex.segments import SegmentReader

        self.reader = SegmentReader(index_dir)
        self.an = Analyzer(self.reader.cfg.analyzer)
        self.max_terms = max_query_terms

    def __call__(self, batch: pa.Table) -> pa.Table:
        N = self.reader.N
        qids, texts = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            tfs = self.an.term_freqs(text or "")
            scored = []
            for t, tf in tfs.items():
                df = self.reader.df(t)
                if df <= 0:
                    continue
                scored.append((-(bm25_idf(N, df) * tf), t))
            scored.sort()
            top = [t for _, t in scored[: self.max_terms]]
            if not top:
                continue
            qids.append(str(doc_id))
            texts.append(" ".join(top))
        return pa.table(
            {"qid": pa.array(qids, pa.string()),
             "text": pa.array(texts, pa.string())}
        )


def more_like_this(seeds_ds, index_dir: str, *, top_k: int = 10,
                   max_query_terms: int = 25, concurrency=2,
                   **search_kwargs):
    """ES ``more_like_this``: seeds(doc_id, text) Dataset -> runs Dataset
    of each seed's BM25 neighbors (qid = str(seed doc_id), seed excluded).
    Term selection is an actor-pool ``map_batches`` (dict resident per
    actor); scoring reuses the sharded batch query path.
    """
    from webindex.search import search_queries

    if isinstance(concurrency, int):
        # autoscaling pool (min=1): a fixed-size pool here plus the
        # downstream searcher pool can overcommit small CPU budgets and
        # stall each other; min=1 always makes progress
        concurrency = (1, concurrency)
    q_ds = seeds_ds.map_batches(
        MltTermSelect,
        fn_constructor_kwargs=dict(
            index_dir=index_dir, max_query_terms=max_query_terms
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return search_queries(
        q_ds, index_dir, top_k=top_k, self_hit_filter=True,
        pre_tokenized=True, **search_kwargs
    )


def _rewrite_expand(index_dir: str, patterns: list[str], match_fn,
                    max_expansions: int) -> pd.DataFrame:
    """Shared Lucene multi-term rewrite: one distributed dict scan maps
    every pattern to its top-``max_expansions`` matching dictionary terms
    by (df desc, term asc). ``match_fn(term, pattern) -> bool``."""
    pats = sorted(set(patterns))

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_numpy()
        out_p, out_t, out_d = [], [], []
        for p in pats:
            hit = [i for i, t in enumerate(terms) if match_fn(t, p)]
            top = sorted(((int(-dfs[i]), terms[i]) for i in hit))[
                :max_expansions
            ]
            out_p.extend([p] * len(top))
            out_t.extend(t for _, t in top)
            out_d.extend(-n for n, _ in top)
        return pa.table(
            {"pattern": pa.array(out_p, pa.string()),
             "term": pa.array(out_t, pa.string()),
             "df": pa.array(out_d, pa.int64())}
        )

    parts = _dict_ds(index_dir).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"pattern": pd.Series(dtype=str), "term": pd.Series(dtype=str),
             "df": pd.Series(dtype=np.int64)}
        )
    return (
        parts.sort_values(
            ["pattern", "df", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        .groupby("pattern", sort=True)
        .head(max_expansions)
        .reset_index(drop=True)
    )


def _rewrite_search(queries: list[tuple[str, str]], index_dir: str,
                    exp: pd.DataFrame, top_k: int, **search_kwargs):
    """Score each query's expansion union disjunctively (each expansion
    with its OWN idf — the Lucene top-terms rewrite) via the
    ``pre_tokenized`` path. ``queries`` are (qid, space-joined patterns);
    ``exp`` is the (pattern, term, df) frame of :func:`_rewrite_expand`."""
    import ray.data as rd

    from webindex.search import search_queries

    by_pat: dict[str, list[str]] = (
        exp.groupby("pattern")["term"].apply(list).to_dict()
    )
    rows_q, rows_t = [], []
    for qid, pats in queries:
        terms = sorted(
            {t for p in pats.split() for t in by_pat.get(p, ())}
        )
        if not terms:
            continue
        rows_q.append(qid)
        rows_t.append(" ".join(terms))
    q_ds = rd.from_arrow(
        pa.table({"qid": pa.array(rows_q, pa.string()),
                  "text": pa.array(rows_t, pa.string())})
    )
    return search_queries(
        q_ds, index_dir, top_k=top_k, pre_tokenized=True, **search_kwargs
    )


def prefix_search(queries: list[tuple[str, str]], index_dir: str, *,
                  top_k: int = 10, max_expansions: int = 50,
                  **search_kwargs):
    """ES ``prefix`` query (Lucene top-terms rewrite): each
    space-separated prefix in the query expands to the
    ``max_expansions`` highest-df dictionary terms starting with it;
    the union is scored disjunctively, each term with its own idf.
    Prefixes are matched against INDEX terms (analyzed space)."""
    pats = sorted({p for _, q in queries for p in q.split()})
    exp = _rewrite_expand(
        index_dir, pats, lambda t, p: t.startswith(p), max_expansions
    )
    return _rewrite_search(queries, index_dir, exp, top_k, **search_kwargs)


def regexp_search(queries: list[tuple[str, str]], index_dir: str, *,
                  top_k: int = 10, max_expansions: int = 50,
                  **search_kwargs):
    """ES ``regexp`` query: each whitespace-separated pattern must match
    a WHOLE dictionary term (Lucene's anchored regexp semantics); the
    expansion union scores disjunctively like :func:`prefix_search`."""
    import re as _re

    pats = sorted({p for _, q in queries for p in q.split()})
    compiled = {p: _re.compile(p) for p in pats}
    exp = _rewrite_expand(
        index_dir, pats,
        lambda t, p: compiled[p].fullmatch(t) is not None, max_expansions,
    )
    return _rewrite_search(queries, index_dir, exp, top_k, **search_kwargs)


def match_phrase_prefix(queries: list[tuple[str, str]], index_dir: str, *,
                        top_k: int = 10, max_expansions: int = 50,
                        **search_kwargs):
    """ES ``match_phrase_prefix`` (autocomplete / search-as-you-type):
    the LAST analyzed term is a prefix; a doc matches when the phrase
    completes consecutively with ANY of the prefix's
    top-``max_expansions`` dictionary expansions (df desc, term asc —
    the same Lucene rewrite as :func:`prefix_search`). Per-doc score =
    MAX over matched expansions ``e`` of the exact phrase score of
    ``base + [e]`` (BM25 sum over the variant's unique terms, pinned
    ascending order) — per-document, so the sharded merge composes and a
    SQL oracle reproduces it.

    Execution: expansions come from the one distributed dict scan; each
    (query, expansion) variant runs the index-only positional phrase
    kernel through the standard batch path; per-variant top-k partials
    are a proven superset of the global top-k under max-combine (a doc's
    global rank-i means fewer than i docs beat its best variant score in
    that variant's own ranking), merged by one small
    ``groupby(qid, doc_id).Max``."""
    import ray.data as rd

    from ray.data.aggregate import Max

    from webindex.config import IndexConfig
    from webindex.search import search_queries
    from webindex.util import read_json

    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    an = Analyzer(cfg.analyzer)
    parsed = []  # (qid, base_tokens, prefix)
    for qid, text in queries:
        toks = an.tokens(text or "")
        if not toks:
            continue
        parsed.append((qid, toks[:-1], toks[-1]))
    if not parsed:
        return rd.from_arrow(_EMPTY_RUNS)
    prefixes = sorted({p for _, _, p in parsed})
    exp = _rewrite_expand(
        index_dir, prefixes, lambda t, p: t.startswith(p), max_expansions
    )
    by_pre: dict[str, list[str]] = (
        exp.groupby("pattern")["term"].apply(list).to_dict()
    )
    SEP = "\x1f"
    v_qids, v_texts = [], []
    for qid, base, pre in parsed:
        for e in by_pre.get(pre, ()):
            v_qids.append(f"{qid}{SEP}{e}")
            v_texts.append(" ".join(base + [e]))
    if not v_qids:
        return rd.from_arrow(_EMPTY_RUNS)
    variants = rd.from_arrow(
        pa.table({"qid": pa.array(v_qids), "text": pa.array(v_texts)})
    )
    runs = search_queries(
        variants, index_dir, top_k=top_k, query_kind="phrase",
        pre_tokenized=True, **search_kwargs,
    )

    def split_variant(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"qid": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        qids = [q.split(SEP, 1)[0] for q in batch.column("qid").to_pylist()]
        return pa.table(
            {"qid": pa.array(qids, pa.string()),
             "doc_id": batch.column("doc_id"),
             "score": batch.column("score")}
        )

    best = (
        runs.map_batches(split_variant, batch_format="pyarrow")
        .groupby(["qid", "doc_id"])
        .aggregate(Max("score", alias_name="score"))
    )

    def rank_group(g):
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "rank"]]

    return best.groupby("qid").map_groups(rank_group, batch_format="pandas")


_EMPTY_RUNS = pa.table(
    {"qid": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64()),
     "score": pa.array([], pa.float64()),
     "rank": pa.array([], pa.int32())}
)


def wildcard_translate(p: str) -> str:
    """Shell-glob -> anchored regex: ``*`` to ``.*``, ``?`` to ``.``,
    everything else escaped literally (the ES wildcard-query pattern
    grammar; property-tested against fnmatch)."""
    import re as _re

    out = []
    for ch in p:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def wildcard_search(queries: list[tuple[str, str]], index_dir: str, *,
                    top_k: int = 10, max_expansions: int = 50,
                    **search_kwargs):
    """ES ``wildcard`` query: ``*`` matches any run, ``?`` any single
    character, anchored to the whole term — translated onto the regexp
    rewrite (every other character is escaped literally)."""
    translated = [
        (qid, " ".join(wildcard_translate(p) for p in q.split()))
        for qid, q in queries
    ]
    return regexp_search(
        translated, index_dir, top_k=top_k,
        max_expansions=max_expansions, **search_kwargs
    )


def spell_correct(index_dir: str, terms: list[str], *, max_edits: int = 1,
                  prefix_len: int = 1, k: int = 3) -> pd.DataFrame:
    """ES term suggester with ``suggest_mode=missing`` ("did you mean"):
    for query terms ABSENT from the dictionary, the top-``k`` dictionary
    terms within ``max_edits`` Levenshtein distance ranked by
    (df desc, term asc). Terms present in the dictionary produce no rows
    (they need no correction). Returns (qterm, term, df, rank).

    Two distributed dict scans: a membership check (is_in over the dict
    sidecar) and the fuzzy expansion of the missing terms — both
    per-batch vectorized with bounded partials.
    """
    qs = sorted(set(terms))

    def member(batch: pa.Table, want=pa.array(qs, pa.string())) -> pa.Table:
        hit = batch.filter(pc.is_in(batch.column("term"), want))
        return hit.select(["term"])

    present = set()
    for b in (
        _dict_ds(index_dir)
        .map_batches(member, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        present.update(b.column("term").to_pylist())
    missing = [t for t in qs if t not in present]
    if not missing:
        return pd.DataFrame(
            {"qterm": pd.Series(dtype=str), "term": pd.Series(dtype=str),
             "df": pd.Series(dtype=np.int64),
             "rank": pd.Series(dtype=np.int32)}
        )
    exp = fuzzy_expand(
        index_dir, missing, max_edits=max_edits, max_expansions=k,
        prefix_len=prefix_len,
    )
    exp = exp.reset_index(drop=True)
    exp["rank"] = (exp.groupby("qterm").cumcount() + 1).astype(np.int32)
    return exp


def phrase_suggest(index_dir: str, queries: list[tuple[str, str]], *,
                   max_edits: int = 1, prefix_len: int = 1) -> pd.DataFrame:
    """ES phrase suggester (whole-query did-you-mean): every analyzed
    term of the query keeps its position; terms ABSENT from the
    dictionary are replaced by their single best correction (edit
    distance <= ``max_edits``, first ``prefix_len`` chars pinned, ranked
    df desc then term asc — the unigram-confidence mode); terms with no
    candidate stay as typed. Returns one row per query:
    ``(qid, suggestion, n_corrected)``.

    Reuses the term suggester's two distributed dict scans (membership +
    fuzzy expansion of only the missing terms); the per-query assembly
    is a driver-side join over the query's own tokens (bounded by the
    query length, never the dictionary)."""
    from webindex.config import IndexConfig
    from webindex.util import read_json

    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    an = Analyzer(cfg.analyzer)
    toks_by_qid = {
        qid: an.tokens(text or "") for qid, text in queries
    }
    uniq = sorted({t for ts in toks_by_qid.values() for t in ts})

    def member(batch: pa.Table,
               want=pa.array(uniq, pa.string())) -> pa.Table:
        hit = batch.filter(pc.is_in(batch.column("term"), want))
        return hit.select(["term"])

    present: set[str] = set()
    if uniq:
        for b in (
            _dict_ds(index_dir)
            .map_batches(member, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            present.update(b.column("term").to_pylist())
    missing = [t for t in uniq if t not in present]
    best: dict[str, str] = {}
    if missing:
        exp = fuzzy_expand(
            index_dir, missing, max_edits=max_edits, max_expansions=1,
            prefix_len=prefix_len,
        )
        best = dict(zip(exp["qterm"], exp["term"]))
    rows = []
    for qid, _text in queries:
        toks = toks_by_qid[qid]
        out, fixed = [], 0
        for t in toks:
            if t in present:
                out.append(t)
            elif t in best:
                out.append(best[t])
                fixed += 1
            else:
                out.append(t)
        rows.append((qid, " ".join(out), fixed))
    return pd.DataFrame(
        rows, columns=["qid", "suggestion", "n_corrected"]
    ).astype({"n_corrected": np.int64})


# ---------------------------------------------------------------------------
# query-time synonym expansion (ES synonym filter, expand=true)
# ---------------------------------------------------------------------------


def synonym_search(queries: list[tuple[str, str]], index_dir: str,
                   synonyms: dict[str, list[str]], *, top_k: int = 10,
                   **search_kwargs):
    """ES query-time synonyms with ``expand=true`` (match-query
    semantics): each analyzed query term expands to itself plus its
    mapped synonyms; the union is scored as a disjunction where every
    term contributes with its OWN idf — exactly what ES's query-time
    ``synonym`` token filter produces for a ``match`` query.

    ``synonyms`` maps ANALYZED terms to lists of ANALYZED terms (the
    mapping lives in index-term space, like an ES synonyms file after
    analysis) — which is why scoring goes through the ``pre_tokenized``
    path: re-analysis would re-stem. Returns the runs Dataset of
    ``search_queries``.
    """
    import ray.data as rd

    from webindex.config import IndexConfig
    from webindex.search import search_queries
    from webindex.util import read_json

    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    an = Analyzer(cfg.analyzer)
    rows_q, rows_t = [], []
    for qid, text in queries:
        base = sorted(set(an.tokens(text or "")))
        exp = sorted(
            {t for qt in base for t in [qt, *synonyms.get(qt, ())]}
        )
        if not exp:
            continue
        rows_q.append(qid)
        rows_t.append(" ".join(exp))
    q_ds = rd.from_arrow(
        pa.table({"qid": pa.array(rows_q, pa.string()),
                  "text": pa.array(rows_t, pa.string())})
    )
    return search_queries(
        q_ds, index_dir, top_k=top_k, pre_tokenized=True, **search_kwargs
    )


# ---------------------------------------------------------------------------
# significant terms (ES significant_terms aggregation)
# ---------------------------------------------------------------------------


def significant_terms(queries_ds, docs_ds, index_dir: str, *,
                      fg_k: int = 20, top_n: int = 10,
                      **search_kwargs) -> pd.DataFrame:
    """ES ``significant_terms`` over a sampled foreground (the standard
    ``sampler`` > ``significant_terms`` composition): per query, the
    terms most OVERrepresented in its top-``fg_k`` BM25 hits relative to
    the whole corpus, scored with the JLH heuristic

        score = (fg_rate - bg_rate) * (fg_rate / bg_rate)
        fg_rate = fg_df / fg_n      bg_rate = df / N

    (doc-frequency rates; only terms with fg_rate > bg_rate qualify).
    Returns (qid, term, score_r, rank) with score rounded to 9dp, rank
    by (score desc, term asc).

    Scale shape: the foreground is BOUNDED (queries x fg_k doc ids) and
    broadcast once; the corpus STREAMS through one ``map_batches`` that
    emits only fg-doc (qid, term) membership rows; df/N come from the
    dictionary-resident reader. Nothing corpus-sized leaves the stream.
    """
    import ray

    from webindex.search import search_queries
    from webindex.segments import SegmentReader

    runs = search_queries(
        queries_ds, index_dir, top_k=fg_k, **search_kwargs
    ).to_pandas()  # bounded: n_queries x fg_k rows
    fg_pairs: dict[int, list[str]] = {}
    for qid, did in zip(runs["qid"], runs["doc_id"]):
        fg_pairs.setdefault(int(did), []).append(qid)
    fg_n = runs.groupby("qid")["doc_id"].nunique().to_dict()
    ref = ray.put(fg_pairs)

    reader = SegmentReader(index_dir)
    an = Analyzer(reader.cfg.analyzer)
    an_cfg = reader.cfg.analyzer

    def member_terms(batch: pa.Table) -> pa.Table:
        pairs = ray.get(ref)
        local_an = Analyzer(an_cfg)
        qs, ts = [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            qids = pairs.get(int(did))
            if not qids:
                continue
            terms = sorted(set(local_an.tokens(text or "")))
            for q in qids:
                qs.extend([q] * len(terms))
                ts.extend(terms)
        return pa.table(
            {"qid": pa.array(qs, pa.string()),
             "term": pa.array(ts, pa.string())}
        )

    fg = (
        docs_ds.map_batches(member_terms, batch_format="pyarrow")
        .groupby(["qid", "term"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "fg_df"})
    )
    if fg.empty:
        return pd.DataFrame(
            {"qid": pd.Series(dtype=str), "term": pd.Series(dtype=str),
             "score_r": pd.Series(dtype=np.float64),
             "rank": pd.Series(dtype=np.int32)}
        )
    N = reader.N
    del an
    fg["df"] = [reader.df(t) for t in fg["term"]]
    fg["fg_n"] = [fg_n[q] for q in fg["qid"]]
    fg_rate = fg["fg_df"].to_numpy(np.int64) / fg["fg_n"].to_numpy(np.int64)
    bg_rate = fg["df"].to_numpy(np.int64) / N
    score = (fg_rate - bg_rate) * (fg_rate / bg_rate)
    fg["score_r"] = np.round(score, 9)
    fg = fg[fg_rate > bg_rate]
    out = (
        fg.sort_values(["qid", "score_r", "term"],
                       ascending=[True, False, True], kind="mergesort")
        .groupby("qid", sort=True)
        .head(top_n)
        .reset_index(drop=True)
    )
    out["rank"] = (out.groupby("qid").cumcount() + 1).astype(np.int32)
    return out[["qid", "term", "score_r", "rank"]]


# ---------------------------------------------------------------------------
# term vectors (ES _termvectors API)
# ---------------------------------------------------------------------------


class TermVectorStage:
    """Actor stage: (doc_id, text) rows -> per-(doc, term) statistics
    (tf, dl, df) — the ES ``_termvectors`` API with ``term_statistics``.
    The dict/stats-resident SegmentReader supplies global df; postings
    stay on disk (same shape as :class:`MltTermSelect`). Rows emit in
    ascending (doc_id within batch order, term) order."""

    def __init__(self, index_dir: str):
        from webindex.segments import SegmentReader

        self.reader = SegmentReader(index_dir)
        self.an = Analyzer(self.reader.cfg.analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dids, terms, tfs, dls, dfs = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            freqs = self.an.term_freqs(text or "")
            dl = sum(freqs.values())
            for t in sorted(freqs):
                dids.append(doc_id)
                terms.append(t)
                tfs.append(int(freqs[t]))
                dls.append(int(dl))
                dfs.append(int(self.reader.df(t)))
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
            }
        )


def term_vectors(docs_ds, index_dir: str, *, concurrency=2):
    """(doc_id, text) Dataset -> per-(doc, term) (tf, dl, df) Dataset."""
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)
    return docs_ds.map_batches(
        TermVectorStage,
        fn_constructor_kwargs=dict(index_dir=index_dir),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# explain (per-term score breakdown)
# ---------------------------------------------------------------------------


def explain_scores(queries: list[tuple[str, str]], index_dir: str, *,
                   top_k: int = 3) -> pd.DataFrame:
    """ES ``_explain`` analog: for each query's top-k docs, one row per
    contributing term with the exact quantities the ranking summed:
    (qid, doc_id, term, tf, dl, df, contrib). ``sum(contrib)`` over a
    (qid, doc_id) group reproduces the ranking score bit-for-bit (same
    float64 expression via webindex.scoring.term_contrib).
    """
    from webindex.scoring import term_contrib
    from webindex.search import SearcherActor

    s = SearcherActor(index_dir, top_k=top_k, mode="auto")
    reader, cfg = s.reader, s.reader.cfg
    rows = []
    for qid, text in queries:
        ids, _ = s.search_one(qid, text)
        if ids.size == 0:
            continue
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        dls = reader.doclen(sorted_ids)
        dl_by_id = dict(zip(sorted_ids.tolist(), dls.tolist()))
        for term in sorted(set(s.an.tokens(text or ""))):
            pl = reader.postings(term)
            if pl is None:
                continue
            pos = np.searchsorted(pl.ids, sorted_ids)
            pos = np.clip(pos, 0, len(pl.ids) - 1)
            hit = pl.ids[pos] == sorted_ids
            for d, p in zip(sorted_ids[hit].tolist(), pos[hit].tolist()):
                tf = int(pl.tfs[p])
                dl = dl_by_id[d]
                rows.append(
                    (qid, d, term, tf, dl, pl.df,
                     term_contrib(tf, dl, reader.avgdl, cfg.k1, cfg.b,
                                  pl.idf))
                )
    out = pd.DataFrame(
        rows, columns=["qid", "doc_id", "term", "tf", "dl", "df", "contrib"]
    )
    return out.sort_values(
        ["qid", "doc_id", "term"], kind="mergesort"
    ).reset_index(drop=True)


def match_bool_prefix(queries: list[tuple[str, str]], index_dir: str, *,
                      top_k: int = 10, max_expansions: int = 50,
                      n_shards: int = 8):
    """ES ``match_bool_prefix`` (search-as-you-type's bool sibling): the
    LAST analyzed term is a prefix; a doc matches when it contains ANY
    base term OR ANY of the prefix's top-``max_expansions`` dictionary
    expansions (df desc, term asc — the shared Lucene rewrite). Score =
    OR-match BM25 sum over the base terms (ascending unicode, only
    doc-present terms contribute) PLUS a constant 1.0 when any expansion
    is present — Lucene's PrefixQuery CONSTANT_SCORE rewrite inside the
    bool: the open-ended prefix clause gets no idf (unlike
    match_phrase_prefix, where each expansion completes a positional
    phrase and scores with its own statistics).

    Execution: one distributed dict scan for the expansions, then the
    standard salt-range shard fan-out — per shard one scatter-add over
    the union candidate set + one membership test, per-shard top-k
    partials, exact (score desc, docID asc) merge."""
    import ray.data as rd

    from webindex.config import IndexConfig
    from webindex.search import _qtext_explode, _shard_searcher
    from webindex.serve import shard_salt_bounds
    from webindex.util import read_json
    from webindex.wand import _dense, _rank_topk

    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    an = Analyzer(cfg.analyzer)
    plan: dict[str, tuple[list[str], str]] = {}
    for qid, text in queries:
        toks = an.tokens(text or "")
        if not toks:
            continue
        plan[qid] = (sorted(set(toks[:-1])), toks[-1])
    if not plan:
        return rd.from_arrow(_EMPTY_RUNS)
    prefixes = sorted({p for _, p in plan.values()})
    exp = _rewrite_expand(
        index_dir, prefixes, lambda t, p: t.startswith(p), max_expansions
    )
    by_pre: dict[str, list[str]] = (
        exp.groupby("pattern")["term"].apply(list).to_dict()
    )
    full = {
        qid: (base, sorted(set(by_pre.get(pre, ()))))
        for qid, (base, pre) in plan.items()
    }
    bounds = shard_salt_bounds(index_dir, n_shards)

    def mbp_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, top_k, "auto", False)
        reader = searcher.inner.reader
        q_out, id_out, sc_out = [], [], []
        for qid in g.column("qid").to_pylist():
            base_terms, exps = full.get(qid, ((), ()))
            pls_base = [
                (t, reader.postings(t)) for t in base_terms
            ]
            pls_base = [(t, pl) for t, pl in pls_base if pl is not None]
            pls_exp = [reader.postings(t) for t in exps]
            pls_exp = [pl for pl in pls_exp if pl is not None]
            arrays = [pl.ids for _t, pl in pls_base] + [
                pl.ids for pl in pls_exp
            ]
            if not arrays:
                continue
            cand = arrays[0]
            for arr in arrays[1:]:
                cand = np.union1d(cand, arr)
            scores = np.zeros(cand.size, dtype=np.float64)
            for _t, pl in pls_base:  # ascending term order
                _dense(pl, reader)
                idx = np.searchsorted(pl.ids, cand)
                ok = idx < pl.ids.size
                ok[ok] &= pl.ids[np.minimum(idx, pl.ids.size - 1)][
                    ok
                ] == cand[ok]
                scores[ok] += pl.dense_contrib[idx[ok]]
            if pls_exp:
                eids = pls_exp[0].ids
                for pl in pls_exp[1:]:
                    eids = np.union1d(eids, pl.ids)
                pos = np.searchsorted(eids, cand)
                member = pos < eids.size
                member[member] &= eids[np.minimum(pos, eids.size - 1)][
                    member
                ] == cand[member]
                scores[member] += 1.0
            ids, sc = _rank_topk(cand, scores, top_k)
            q_out.extend([qid] * ids.size)
            id_out.append(ids)
            sc_out.append(sc)
        return pa.table(
            {
                "qid": pa.array(q_out, pa.string()),
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

    def merge(g):
        import pandas as pd  # noqa: F401

        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["did"] = g["doc_id"].astype(str)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "did", "doc_id", "score", "rank"]]

    qds = rd.from_arrow(
        pa.table(
            {
                "qid": pa.array(sorted(full)),
                "text": pa.array([""] * len(full)),
            }
        )
    )
    return (
        qds.map_batches(_qtext_explode(bounds), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(mbp_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )
