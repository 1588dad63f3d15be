"""Query execution as a stateful actor-pool ``map_batches`` stage.

The reference batches 128 queries per ES msearch round-trip
(/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 via
beir BM25Search — SURVEY.md §2.6 K6); here a pool of ``SearcherActor``s
holds the hot dictionary / doclens / decoded-postings cache (loaded once in
``__init__``, SURVEY.md §2.3 T4) and processes Arrow query batches.

Output is the flat runs table (FIXTURES.md F4):
``(qid:string, did:string, doc_id:int64, score:float64, rank:int32)`` —
the reference's nested ``Dict[qid, Dict[did, score]]`` results JSON
(/root/reference/biencoder/beir/beir_dense_retriever.py:443-445) made
columnar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webindex.analyze import Analyzer
from webindex.segments import SegmentReader
from webindex.wand import block_max_wand, exhaustive_constrained, exhaustive_topk


def route_mode(dfs: list[int], k: int, block_size: int, *,
               sparse_factor: int = 4, ratio: int = 10_000) -> str:
    """The auto-mode kernel router, as a pure function of the query
    terms' document frequencies (shared by the ranked path and the
    query_plan observability surface; constants mirror
    SearcherActor.SPARSE_FACTOR / AUTO_WAND_RATIO)."""
    dfs = [d for d in dfs if d > 0]
    est = sum(dfs)
    n_blocks = sum(-(-d // block_size) for d in dfs)
    has_sparse = len(dfs) > 1 and any(
        d <= sparse_factor * n_blocks for d in dfs
    )
    return "wand" if has_sparse or est > k * ratio else "exhaustive"


class SearcherActor:
    """``mode``:
    - ``"wand"``       — block-max WAND (document-at-a-time with skipping);
    - ``"exhaustive"`` — vectorized scatter-add over full posting lists;
    - ``"auto"``       — WAND only when the heap can actually prune:
      estimated candidate count (sum of query-term dfs) must exceed
      ``top_k`` by a wide margin, otherwise the vectorized exhaustive path
      is strictly faster (WAND visits nearly every candidate anyway, at
      Python-loop cost). Both paths are rank- and score-identical
      (tests/test_build_search.py), so the switch is purely physical.
    """

    # WAND must be able to skip ~98% of candidates to beat vectorized
    # scoring; below this candidates/k ratio, score everything.
    AUTO_WAND_RATIO = 10_000
    # ...OR the query must contain a sparse (rare) term: the block-max
    # interval engine adds per-posting boundaries for terms whose posting
    # count is within 4x the query's total block count, which is exactly
    # when interval pruning collapses the scored set (webindex/wand.py).
    SPARSE_FACTOR = 4

    def __init__(self, index_dir: str, top_k: int = 1000,
                 mode: str = "auto", self_hit_filter: bool = False,
                 preload: bool = True, segments_ref=None,
                 doc_id_range=None, filter_pred=None, match: str = "or",
                 query_kind: str = "match", min_match: int | None = None,
                 boosts: dict[str, float] | None = None,
                 pre_tokenized: bool = False,
                 must_not: list[str] | None = None,
                 neg_boost: tuple[list[str], float] | None = None,
                 slop: int = 0,
                 in_order: bool = True,
                 field_factor: tuple[str, float] | None = None,
                 dis_max: float | None = None,
                 span: tuple | None = None,
                 request_cache: bool = True,
                 global_stats: dict | None = None):
        self.request_cache = bool(request_cache)
        self.reader = SegmentReader(index_dir, doc_id_range=doc_id_range)
        if global_stats is not None:
            # dfs_query_then_fetch: score with cross-index-merged stats
            self.reader.set_stats_override(global_stats)
        if preload:
            # resident segments (T4): per-query latency pays decode + score,
            # never cold parquet scans. When the pool driver put the
            # segments table in the object store, every actor preloads from
            # the SAME zero-copy Arrow buffers — the parquet files are read
            # once per node, not once per actor.
            tab = None
            if segments_ref is not None:
                import ray

                tab = ray.get(segments_ref)
            self.reader.preload(table=tab)
        self.an = Analyzer(self.reader.cfg.analyzer)
        self.top_k = top_k
        self.mode = mode
        self.self_hit = self_hit_filter
        # query constraints (ES bool-query analog): a conjunctive docvalues
        # predicate — tuple of (col, op, value) clauses — AND match
        # semantics (every query term required), minimum_should_match,
        # per-term boosts, and/or the phrase query kind
        # (positional index, webindex.positional)
        self.set_constraints(filter_pred, match, query_kind,
                             min_match=min_match, boosts=boosts,
                             pre_tokenized=pre_tokenized, must_not=must_not,
                             neg_boost=neg_boost, slop=slop,
                             in_order=in_order,
                             field_factor=field_factor, dis_max=dis_max,
                             span=span)

    def set_constraints(self, filter_pred=None, match: str = "or",
                        query_kind: str = "match",
                        min_match: int | None = None,
                        boosts: dict[str, float] | None = None,
                        pre_tokenized: bool = False,
                        must_not: list[str] | None = None,
                        neg_boost: tuple[list[str], float] | None = None,
                        slop: int = 0,
                        in_order: bool = True,
                        field_factor: tuple[str, float] | None = None,
                        dis_max: float | None = None,
                        span: tuple | None = None):
        """Swap the query constraints on a live (preloaded) searcher —
        cheap: predicate bitsets are cached per-predicate on the reader,
        so the cached shard searchers of the batch path serve any mix of
        constrained and unconstrained workloads without re-preloading."""
        self.filter_pred = (
            tuple(tuple(c) for c in filter_pred) if filter_pred else None
        )
        if match not in ("or", "and"):
            raise ValueError(f"match must be 'or' or 'and', got {match!r}")
        if query_kind not in ("match", "phrase"):
            raise ValueError(
                f"query_kind must be 'match' or 'phrase', got {query_kind!r}"
            )
        if query_kind == "phrase" and (min_match or boosts):
            raise ValueError(
                "min_match/boosts do not compose with phrase queries "
                "(a phrase is already an exact positional conjunction)"
            )
        self.match = match
        self.query_kind = query_kind
        self.min_match = min_match
        self.boosts = dict(boosts) if boosts else None
        # pre_tokenized: query text is a space-joined list of ALREADY
        # analyzed terms (e.g. straight from the dict sidecar, as the
        # MLT / fuzzy expansion paths produce). Bypassing the analyzer
        # matters for stemmed indexes: Porter is not idempotent, so
        # re-analyzing a stem can change it.
        self.pre_tokenized = bool(pre_tokenized)
        # must_not (ES bool negation): analyzed once here; docs containing
        # ANY of these terms are excluded from every match-query result.
        # Filter-context semantics: exclusion never changes a survivor's
        # score. match queries only (phrase negation would need positions).
        self.must_not = (
            sorted({t for m in must_not for t in self.an.tokens(m or "")})
            if must_not else None
        )
        # ES boosting query: (terms, factor) — matching docs are DEMOTED
        # by one multiply of their summed score, never excluded
        self.neg_boost = None
        if neg_boost is not None:
            nb_terms, factor = neg_boost
            if not 0 < factor < 1:
                raise ValueError("neg_boost factor must be in (0, 1)")
            self.neg_boost = (
                sorted({t for m in nb_terms
                        for t in self.an.tokens(m or "")}),
                float(factor),
            )
        # span_near slop (query_kind="phrase"): 0 = exact match_phrase
        if slop < 0:
            raise ValueError("slop must be >= 0")
        self.slop = int(slop)
        self.in_order = bool(in_order)
        # span-family clause (query_kind="phrase" only):
        #   ("not", exclude_text, pre, post) — span_not: the analyzed
        #     query is the include phrase, spans overlapping the analyzed
        #     exclusion term (window widened by pre/post) are rejected;
        #   ("containing", little_text) — span_containing: the analyzed
        #     query must be a two-term big span (span_near, self.slop),
        #     matches only where it contains the little term;
        #   ("or_near",) — span_near whose clauses are span_or
        #     alternatives: the RAW query text is slot syntax
        #     "a|x b c|y" (whitespace-separated slots, '|'-separated
        #     alternatives, each alternative analyzed independently).
        self.span = None
        if span is not None:
            if query_kind != "phrase":
                raise ValueError("span clauses require query_kind='phrase'")
            kind = span[0]
            if kind == "not":
                _, ex_text, pre, post = span
                ex = self.an.tokens(ex_text or "")
                if len(ex) != 1:
                    raise ValueError(
                        "span_not exclusion must analyze to one term"
                    )
                if pre < 0 or post < 0:
                    raise ValueError("span_not pre/post must be >= 0")
                self.span = ("not", ex[0], int(pre), int(post))
            elif kind == "containing":
                _, little_text = span
                lt = self.an.tokens(little_text or "")
                if len(lt) != 1:
                    raise ValueError(
                        "span_containing little must analyze to one term"
                    )
                self.span = ("containing", lt[0])
            elif kind == "or_near":
                self.span = ("or_near",)
            else:
                raise ValueError(f"unknown span kind {kind!r}")
        # ES function_score field_value_factor: (docvalues col, weight)
        self.field_factor = None
        if field_factor is not None:
            col, w = field_factor
            if w < 0:
                raise ValueError("field_factor weight must be >= 0 "
                                 "(scores stay positive)")
            self.field_factor = (str(col), float(w))
        # ES dis_max: tie_breaker in [0, 1]; None = plain bool sum
        self.dis_max = None if dis_max is None else float(dis_max)
        # ES shard request cache: constraint changes drop it wholesale;
        # per-entry keys carry the tombstone version (see search_one)
        from collections import OrderedDict

        self._req_cache: OrderedDict = OrderedDict()
        self.cache_hits = 0
        self.cache_misses = 0

    def _mask(self):
        """Composed keep-bitset: docvalues predicate AND live (non-deleted)
        docs. ``None`` when neither constrains — the hot unconstrained
        path pays nothing. Queries with any mask route to the constrained
        exhaustive kernel: WAND/MAXSCORE θ bounds derive from UNfiltered
        top-k scores and are not valid lower bounds for a filtered k-th
        score (see wand.exhaustive_constrained)."""
        m = (
            self.reader.filter_mask(self.filter_pred)
            if self.filter_pred is not None
            else None
        )
        live = self.reader.live_mask()
        if live is None:
            return m
        return live if m is None else (m & live)

    _REQ_CACHE_CAP = 1024

    def set_stats_override(self, stats: dict | None):
        """dfs_query_then_fetch statistics swap (webindex.rollover):
        delegates to the reader; a CHANGE also drops the request cache
        (ranked arrays bake idf), same wholesale rule as constraint
        swaps. None restores index-local stats."""
        from collections import OrderedDict as _OD

        if self.reader.set_stats_override(stats):
            self._req_cache = _OD()

    def _live_version(self):
        """Tombstone version for cache keys: the deletes sidecar's mtime
        (the same signal live_mask re-reads on) or None when absent."""
        import os as _os

        try:
            return _os.stat(
                _os.path.join(self.reader.dir, "deletes")
            ).st_mtime_ns
        except FileNotFoundError:
            return None

    def _terms(self, text: str):
        """Analyzed query terms; for span_or_near, the slot syntax
        "a|x b c|y" parses to a tuple of alternative-term tuples (each
        alternative analyzed independently; stopword-analyzed
        alternatives drop out)."""
        if self.span is not None and self.span[0] == "or_near":
            return tuple(
                tuple(t for alt in slot.split("|")
                      for t in self.an.tokens(alt))
                for slot in (text or "").split()
            )
        return (
            (text or "").split() if self.pre_tokenized
            else self.an.tokens(text or "")
        )

    def search_one(self, qid: str, text: str):
        terms = self._terms(text)
        # self-hit anti-join (SURVEY.md §2.4 J4): fetch k+1 then drop did==qid
        k = self.top_k + 1 if self.self_hit else self.top_k
        # ES shard request cache: identical (terms, k) under the same
        # constraints and tombstone version reuse the ranked arrays —
        # qid-independent (the per-qid self-hit cut happens in _post on a
        # slice, never mutating the cached arrays). Bounded LRU; new
        # deletes change the key, so staleness is impossible.
        if not self.request_cache:
            ids, scores = self._ranked(terms, k)
            return self._post(qid, ids, scores)
        ck = (tuple(terms), k, self._live_version())
        hit = self._req_cache.get(ck)
        if hit is not None:
            self._req_cache.move_to_end(ck)
            self.cache_hits += 1
            ids, scores = hit
        else:
            self.cache_misses += 1
            ids, scores = self._ranked(terms, k)
            self._req_cache[ck] = (ids, scores)
            if len(self._req_cache) > self._REQ_CACHE_CAP:
                self._req_cache.popitem(last=False)
        return self._post(qid, ids, scores)

    def search_one_after(self, qid: str, text: str, after_score: float,
                         after_doc: int):
        """ES ``search_after``: the next ``top_k`` results STRICTLY after
        the cursor in the total order (score desc, docID asc). Stateless —
        the caller passes the last row of the previous page. Routed to the
        full exhaustive ranking (θ-pruning bounds are one-sided: WAND can
        skip docs scoring BELOW a floor, and a cursor needs docs below a
        ceiling), then a vectorized cursor cut; in the sharded batch path
        each shard returns only ``top_k`` after-cursor rows, so deep pages
        never fan (offset + size) rows into the merge — the ES
        search_after saving, exactly."""
        terms = (
            (text or "").split() if self.pre_tokenized
            else self.an.tokens(text or "")
        )
        full_k = max(int(self.reader._dl_ids.size), 1)
        ids, scores = self._ranked(terms, full_k, force_exhaustive=True)
        keep = (scores < after_score) | (
            (scores == after_score) & (ids > after_doc)
        )
        ids, scores = ids[keep], scores[keep]
        if self.self_hit and ids.size:
            m = np.array([str(d) != qid for d in ids])
            ids, scores = ids[m], scores[m]
        return ids[: self.top_k], scores[: self.top_k]

    def _ranked(self, terms: list[str], k: int,
                force_exhaustive: bool = False):
        """Kernel routing shared by top-k search and cursor pagination."""
        if self.query_kind == "phrase":
            from webindex.positional import phrase_topk, span_near_topk

            mask = self._mask()
            if self.span is not None:
                kind = self.span[0]
                if kind == "or_near":
                    from webindex.positional import span_or_near_topk

                    return span_or_near_topk(
                        self.reader, [list(s) for s in terms], k,
                        slop=self.slop, mask=mask,
                    )
                if kind == "not":
                    from webindex.positional import span_not_topk

                    return span_not_topk(
                        self.reader, list(terms), self.span[1], k,
                        pre=self.span[2], post=self.span[3], mask=mask,
                    )
                if len(terms) != 2:
                    raise ValueError(
                        "span_containing needs a two-term big clause"
                    )
                from webindex.positional import span_containing_topk

                return span_containing_topk(
                    self.reader, (terms[0], terms[1]), self.span[1], k,
                    slop=self.slop, mask=mask,
                )
            if self.slop:
                if not self.in_order:
                    from webindex.positional import span_near_unordered_topk

                    return span_near_unordered_topk(
                        self.reader, terms, k, slop=self.slop, mask=mask
                    )
                return span_near_topk(
                    self.reader, terms, k, slop=self.slop, mask=mask
                )
            return phrase_topk(self.reader, terms, k, mask=mask)
        mask = self._mask()
        if (self.match == "and" or self.min_match
                or self.boosts or self.must_not or self.neg_boost
                or self.field_factor or self.dis_max is not None):
            # score-shaping / conjunctive constraints (AND match,
            # minimum_should_match, boosts, must_not, dis_max, ...) take
            # the dedicated exhaustive kernel (pruning θ bounds are
            # invalid under boosts — see wand.exhaustive_constrained).
            # A PURE filter mask (docvalues predicate and/or tombstones)
            # does NOT route here anymore: the pruned kernels accept the
            # mask directly with masked-θ validity, so an index with
            # pending deletes keeps its pruned fast path.
            return exhaustive_constrained(
                self.reader, terms, k, mask=mask,
                require_all=self.match == "and",
                min_match=self.min_match, boosts=self.boosts,
                neg_terms=self.must_not, neg_boost=self.neg_boost,
                field_factor=self.field_factor, dis_max=self.dis_max,
            )
        mode = "exhaustive" if force_exhaustive else self.mode
        if mode == "auto":
            dfs = [self.reader.df(t) for t in set(terms)]
            mode = route_mode(
                dfs, k, max(1, self.reader.cfg.block_size)
            )
        if mode == "wand":
            return block_max_wand(self.reader, terms, k, mask=mask)
        return exhaustive_topk(self.reader, terms, k, mask=mask)

    def facet_one(self, text: str, facet_cols: list[str]):
        """ES terms-aggregation analog: per docvalues column, value counts
        over ALL docs matching the query (not just top-k), under the
        searcher's match semantics and filter predicate. Returns parallel
        lists (facet, value:str, count)."""
        import pyarrow.compute as pc

        terms = self.an.tokens(text or "")
        mask = self._mask()
        from webindex.wand import match_positions

        sel = match_positions(
            self.reader, terms, mask=mask, require_all=self.match == "and"
        )
        self.reader._load_docvalues(facet_cols)
        facets, values, counts = [], [], []
        for col in facet_cols:
            arr, valid = self.reader._dv[col]
            take = sel[valid[sel]]  # docs lacking this docvalue don't count
            vals = pc.cast(
                arr.take(pa.array(take, pa.int64())), pa.string()
            )
            vc = pc.value_counts(vals)
            for ent in vc:
                facets.append(col)
                values.append(ent["values"].as_py())
                counts.append(ent["counts"].as_py())
        return facets, values, counts

    def _post(self, qid: str, ids, scores):
        if self.self_hit and ids.size:
            keep = np.array([str(d) != qid for d in ids])
            ids, scores = ids[keep], scores[keep]
        return ids[: self.top_k], scores[: self.top_k]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out, dids_out, docid_out, score_out, rank_out = [], [], [], [], []
        has_cursor = "after_score" in batch.column_names
        a_scores = (
            batch.column("after_score").to_pylist() if has_cursor else None
        )
        a_docs = batch.column("after_doc").to_pylist() if has_cursor else None
        for i, (qid, text) in enumerate(zip(
            batch.column("qid").to_pylist(), batch.column("text").to_pylist()
        )):
            if has_cursor:
                ids, scores = self.search_one_after(
                    qid, text, a_scores[i], a_docs[i]
                )
            else:
                ids, scores = self.search_one(qid, text)
            n = ids.size
            qids_out.extend([qid] * n)
            dids_out.extend(str(d) for d in ids)
            docid_out.append(ids)
            score_out.append(scores)
            rank_out.append(np.arange(1, n + 1, dtype=np.int32))
        return pa.table(
            {
                "qid": pa.array(qids_out, pa.string()),
                "did": pa.array(dids_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(docid_out) if docid_out else
                    np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(score_out) if score_out else
                    np.empty(0, np.float64)
                ),
                "rank": pa.array(
                    np.concatenate(rank_out) if rank_out else
                    np.empty(0, np.int32)
                ),
            }
        )


# Pinned LOGICAL shard count for the batch query path (results are
# shard-count-independent — the merge is exact — but the count is never
# derived from CPU count, per the repo's partitioning invariant).
SEARCH_SHARDS = 16

# process-global shard-searcher cache: Ray reuses worker processes, so a
# shard's segment subset is loaded once per worker, not once per task
_SHARD_SEARCHERS: dict = {}


def _shard_searcher(index_dir: str, salt_lo: int, salt_hi: int,
                    top_k: int, mode: str, self_hit: bool,
                    global_stats: dict | None = None):
    import os

    from webindex.serve import _ShardSearcherImpl

    cfg_m = os.stat(os.path.join(index_dir, "config.json")).st_mtime_ns
    # top_k is NOT part of the key: it is a cheap per-call attribute while
    # the resident segment subset is the expensive part — different-k
    # workloads (e.g. search top-1000 + facet passes) share one searcher
    key = (index_dir, cfg_m, salt_lo, salt_hi, mode, self_hit)
    s = _SHARD_SEARCHERS.get(key)
    if s is None:
        for k in [k for k in _SHARD_SEARCHERS if k[0] == index_dir
                  and k[1] != cfg_m]:
            del _SHARD_SEARCHERS[k]  # stale rebuilds at the same path
        s = _SHARD_SEARCHERS[key] = _ShardSearcherImpl(
            index_dir, salt_lo, salt_hi, top_k=top_k, mode=mode,
            self_hit_filter=self_hit,
        )
    s.inner.top_k = top_k
    # dfs_query_then_fetch stats are applied (or RESTORED to index-local,
    # the default) here, at the cache boundary: a cached searcher must
    # never leak an alias search's merged stats into a plain query on the
    # same worker. No-op when the override key is unchanged, so repeat
    # alias msearch calls keep their warm resident postings.
    s.inner.set_stats_override(global_stats)
    return s


# below this segments-directory size the whole-index actor pool is
# cheaper than shard fan-out (two groupby shuffles + per-shard loads);
# data-dependent, never CPU-dependent — both paths are bit-identical
SHARDED_MIN_SEGMENT_BYTES = 64 << 20


def search_queries(queries_ds, index_dir: str, *, top_k: int = 1000,
                   mode: str = "auto", self_hit_filter: bool = False,
                   concurrency=None, batch_size: int = 128,
                   impl: str = "auto", n_shards: int = SEARCH_SHARDS,
                   filter_pred=None, match: str = "or",
                   query_kind: str = "match", min_match: int | None = None,
                   boosts: dict[str, float] | None = None,
                   pre_tokenized: bool = False,
                   must_not: list[str] | None = None,
                   neg_boost: tuple[list[str], float] | None = None,
                   slop: int = 0,
                   in_order: bool = True,
                   field_factor: tuple[str, float] | None = None,
                   dis_max: float | None = None,
                   span: tuple | None = None,
                   global_stats: dict | None = None):
    """queries(qid, text) Dataset -> runs Dataset.

    ``impl="sharded"`` (the default above ``SHARDED_MIN_SEGMENT_BYTES``
    of segment data): each query fans out to pinned salt-range shards
    (``groupby(shard).map_groups``); a shard task loads ONLY its
    segment subset (cached per worker process), scores its partial top-k,
    and an exact per-qid merge (score desc, docID asc — the serve.py
    proof) reassembles global runs. Total index-load work is one full
    read split across shards, independent of cluster size — the
    whole-index-per-actor preload of ``impl="pool"`` made added actors
    pay full preload and capped batch scaling.

    ``impl="pool"`` keeps the resident actor-pool path (steady-state
    latency serving, and the default for small indexes where fan-out
    overhead exceeds the preload it saves). Routing is by index SIZE —
    a data property — so results and runs hashes never depend on
    cluster shape; the paths are bit-identical
    (tests/test_build_search.py::test_sharded_batch_path_identical_to_pool).

    qids must identify a unique query text: the sharded merge groups by
    qid, so duplicate qid rows collapse to one result set.

    ``filter_pred`` (conjunctive docvalues predicate, tuple of
    ``(col, op, value)`` clauses) and ``match="and"`` (require every query
    term) apply the same constraints on both impls — per-shard masks
    compose exactly with the scatter-gather merge because filtering and
    conjunction are per-document properties.

    ``global_stats`` (``{"N", "avgdl", "dfs": {term: df}}``) scores with
    cross-index-merged statistics instead of this index's own — the ES
    ``dfs_query_then_fetch`` phase used by alias search over
    time-partitioned indices (webindex.rollover). Identical on both impls
    (the override is per-document arithmetic, so shard partials compose).
    """
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    if impl == "auto":
        import os

        seg_root = os.path.join(index_dir, "segments")
        nbytes = 0
        if os.path.isdir(seg_root):
            for root, _, names in os.walk(seg_root):
                for name in names:
                    nbytes += os.path.getsize(os.path.join(root, name))
        impl = (
            "sharded" if nbytes >= SHARDED_MIN_SEGMENT_BYTES else "pool"
        )
    if impl == "pool":
        return _search_queries_pool(
            queries_ds, index_dir, top_k=top_k, mode=mode,
            self_hit_filter=self_hit_filter, concurrency=concurrency,
            batch_size=batch_size, filter_pred=filter_pred, match=match,
            query_kind=query_kind, min_match=min_match, boosts=boosts,
            pre_tokenized=pre_tokenized, must_not=must_not,
            neg_boost=neg_boost, slop=slop, in_order=in_order,
            field_factor=field_factor,
            dis_max=dis_max,
            span=span,
            global_stats=global_stats,
        )

    import pandas as pd

    from webindex.serve import shard_salt_bounds

    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        # replicate every query column to every shard (cursor pagination
        # rides along as after_score/after_doc when present)
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
        searcher = _shard_searcher(
            index_dir, lo, hi, top_k, mode, self_hit_filter,
            global_stats=global_stats,
        )
        searcher.inner.set_constraints(filter_pred, match, query_kind,
                                       min_match=min_match, boosts=boosts,
                                       pre_tokenized=pre_tokenized,
                                       must_not=must_not,
                                       neg_boost=neg_boost, slop=slop,
                                       in_order=in_order,
                                       field_factor=field_factor,
                                       dis_max=dis_max, span=span)
        has_cursor = "after_score" in g.column_names
        a_scores = g.column("after_score").to_pylist() if has_cursor else None
        a_docs = g.column("after_doc").to_pylist() if has_cursor else None
        qid_out, id_out, sc_out = [], [], []
        for i, (qid, text) in enumerate(zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        )):
            if has_cursor:
                # per-shard after-cursor top-k: the cursor cut is a
                # per-document predicate, so shard partials compose
                # exactly under the global (score desc, docID asc) merge
                ids, scores = searcher.inner.search_one_after(
                    qid, text, a_scores[i], a_docs[i]
                )
            else:
                ids, scores = searcher.inner.search_one(qid, text)
            qid_out.extend([qid] * ids.size)
            id_out.append(ids)
            sc_out.append(scores)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out else np.empty(0, np.int64)
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
        g["did"] = g["doc_id"].astype(str)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "did", "doc_id", "score", "rank"]]

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(score_shard, batch_format="pyarrow")
    )
    return partial.groupby("qid").map_groups(merge, batch_format="pandas")


def _search_queries_pool(queries_ds, index_dir: str, *, top_k: int = 1000,
                         mode: str = "auto", self_hit_filter: bool = False,
                         concurrency=None, batch_size: int = 128,
                         filter_pred=None, match: str = "or",
                         query_kind: str = "match",
                         min_match: int | None = None,
                         boosts: dict[str, float] | None = None,
                         pre_tokenized: bool = False,
                         must_not: list[str] | None = None,
                         neg_boost: tuple[list[str], float] | None = None,
                         slop: int = 0,
                         in_order: bool = True,
                         field_factor: tuple[str, float] | None = None,
                         dis_max: float | None = None,
                         span: tuple | None = None,
                         global_stats: dict | None = None):
    """Resident actor-pool path: every actor holds the whole index
    (preloaded from one shared ``ray.put`` of the segments table)."""
    import os

    import pyarrow.dataset as pads
    import ray

    if concurrency is None:
        # autoscaling (min=1) pool: a fixed-size pool chained after
        # another actor stage can deadlock when min actors overcommit
        # the CPU budget (each pool waits for the other's release);
        # min=1 always makes progress and scales up when CPUs free up
        concurrency = (
            1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
        )
    # one read of the segments dataset, shared with every pool actor
    # through the object store (zero-copy Arrow buffers)
    seg_root = os.path.join(index_dir, "segments")
    segments_ref = (
        ray.put(pads.dataset(seg_root).to_table())
        if os.path.isdir(seg_root)
        else None
    )
    return queries_ds.map_batches(
        SearcherActor,
        fn_constructor_kwargs=dict(
            index_dir=index_dir, top_k=top_k, mode=mode,
            self_hit_filter=self_hit_filter, segments_ref=segments_ref,
            filter_pred=filter_pred, match=match, query_kind=query_kind,
            min_match=min_match, boosts=boosts, pre_tokenized=pre_tokenized,
            must_not=must_not, neg_boost=neg_boost, slop=slop,
            in_order=in_order,
            field_factor=field_factor, dis_max=dis_max, span=span,
            global_stats=global_stats,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def scan_matches(queries_ds, index_dir: str, *, match: str = "or",
                 filter_pred=None, n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, doc_id): EVERY matching document, no
    scoring, no top-k — the ES scroll / ``_search`` scan export (feeding
    a downstream bulk job with a query's full match set).

    Same shard fan-out as :func:`count_queries`; each salt-range shard
    emits its own matches directly (docID ranges are disjoint across
    shards, so there is NO merge stage at all — the output streams
    shard-parallel into whatever consumes it). Respects ``match="and"``,
    docvalues filter predicates, and tombstones."""
    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def scan_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        dl_ids = s.reader._dl_ids
        qid_out, id_out = [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            if sel.size == 0:
                continue
            qid_out.extend([qid] * sel.size)
            id_out.append(dl_ids[sel])
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out
                    else np.empty(0, np.int64)
                ),
            }
        )

    return (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(scan_shard, batch_format="pyarrow")
    )


def count_queries(queries_ds, index_dir: str, *, match: str = "or",
                  filter_pred=None, n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, total): each query's FULL match count
    (the ES ``track_total_hits=true`` / ``_count`` surface — no scoring,
    no top-k).

    Same shard fan-out as :func:`facet_counts`: each salt-range shard
    counts its own matches (one int16 scatter over the query's postings,
    ``wand.match_positions``) and an exact Sum-merge by qid reassembles
    the global total; per-doc membership makes shard partials compose
    exactly. Respects ``match="and"``, docvalues filter predicates, and
    tombstones, like the ranked paths."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def count_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        qid_out, c_out = [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            qid_out.append(qid)
            c_out.append(int(sel.size))
        return pa.table(
            {"qid": pa.array(qid_out, pa.string()),
             "total_p": pa.array(c_out, pa.int64())}
        )

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(count_shard, batch_format="pyarrow")
    )
    return partial.groupby("qid").aggregate(
        Sum("total_p", alias_name="total")
    )


def facet_stats(queries_ds, index_dir: str, col: str, *,
                match: str = "or", filter_pred=None,
                n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, count, sum, min, max, avg) of an
    integer docvalues column over each query's FULL match set — the ES
    ``stats`` aggregation.

    Shard fan-out like :func:`facet_counts`; per-shard partials are
    (count, sum, min, max) over the shard's matches (exact int64), merged
    with Sum/Sum/Min/Max — per-doc membership makes the merge exact. The
    mean is ONE float division of exact integers at the end, so the SQL
    oracle matches bit for bit. Docs lacking the docvalue don't count
    (ES missing-field semantics)."""
    from ray.data.aggregate import Max, Min, Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def stats_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        rows = {"qid": [], "count_p": [], "sum_p": [],
                "min_p": [], "max_p": []}
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            v = vals_np[sel].astype(np.int64)
            rows["qid"].append(qid)
            rows["count_p"].append(int(v.size))
            rows["sum_p"].append(int(v.sum()))
            rows["min_p"].append(int(v.min()))
            rows["max_p"].append(int(v.max()))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.string()),
                "count_p": pa.array(rows["count_p"], pa.int64()),
                "sum_p": pa.array(rows["sum_p"], pa.int64()),
                "min_p": pa.array(rows["min_p"], pa.int64()),
                "max_p": pa.array(rows["max_p"], pa.int64()),
            }
        )

    merged = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(stats_shard, batch_format="pyarrow")
        .groupby("qid")
        .aggregate(
            Sum("count_p", alias_name="count"),
            Sum("sum_p", alias_name="sum"),
            Min("min_p", alias_name="min"),
            Max("max_p", alias_name="max"),
        )
    )

    def add_avg(batch: pa.Table) -> pa.Table:
        c = batch.column("count").to_numpy().astype(np.int64)
        sm = batch.column("sum").to_numpy().astype(np.int64)
        avg = sm / c  # exact-int inputs, one IEEE division
        return batch.append_column("avg", pa.array(avg, pa.float64()))

    return merged.map_batches(add_avg, batch_format="pyarrow")


def collapse_queries(queries_ds, index_dir: str, collapse_col: str, *,
                     top_k: int = 10, match: str = "or", filter_pred=None,
                     n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> runs with at most ONE hit per value of a
    docvalues column — the ES ``collapse`` API (host/domain collapsing in
    web search). Scores are the untouched BM25 scores of each group's
    best hit; ranking and tie-breaks follow the standard total order.

    Exactness of the shard merge: a collapse group's global best lives in
    exactly one shard and is that shard's best for the group, and any
    group displaced below a shard's local top-k is outranked by >= k
    other groups' bests globally — so per-shard (best-per-group, then
    local top-k) partials are a valid superset, and the merge
    (best-per-group again, then global top-k) is exact."""
    import pandas as pd

    from webindex.serve import shard_salt_bounds

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def collapse_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, top_k, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([collapse_col])
        arr, valid = s.reader._dv[collapse_col]
        import pyarrow.compute as pc

        keys_np = pc.cast(arr, pa.string()).to_numpy(zero_copy_only=False)
        dl_ids = s.reader._dl_ids
        qid_out, id_out, sc_out, key_out = [], [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            terms = s.an.tokens(text or "")
            # full shard ranking (exhaustive: the collapse cut needs every
            # group's best, and theta pruning may drop a group's only hit)
            ids, scores = s._ranked(
                terms, max(int(dl_ids.size), 1), force_exhaustive=True
            )
            if ids.size == 0:
                continue
            pos = np.searchsorted(dl_ids, ids)
            ok = valid[pos]  # docs lacking the key don't collapse-group
            ids, scores, pos = ids[ok], scores[ok], pos[ok]
            if ids.size == 0:
                continue
            keys = keys_np[pos]
            # ids arrive in (score desc, docID asc) order: the FIRST
            # occurrence of each key is that group's shard best
            _, first = np.unique(keys, return_index=True)
            first.sort()
            first = first[:top_k]
            n_hit = first.size
            qid_out.extend([qid] * n_hit)
            id_out.append(ids[first])
            sc_out.append(scores[first])
            key_out.extend(keys[first].tolist())
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
                "ckey": pa.array(key_out, pa.string()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        g = g.drop_duplicates("ckey", keep="first").head(top_k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "ckey", "rank"]]

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(collapse_shard, batch_format="pyarrow")
    )
    return partial.groupby("qid").map_groups(merge, batch_format="pandas")


def sampler_terms(queries_ds, index_dir: str, facet_col: str, *,
                  shard_size: int = 100,
                  max_docs_per_value: int | None = None,
                  match: str = "or", filter_pred=None,
                  n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, value, cnt): the ES ``sampler`` (and,
    with ``max_docs_per_value``, ``diversified_sampler``) aggregation
    with a ``terms`` sub-aggregation — value counts of a docvalues
    column over the top-``shard_size`` BEST-SCORING matches per query
    instead of the full match set.

    Sample semantics are pinned GLOBAL (the rescore-window precedent):
    walk the global ranking (score desc, docID asc), keep at most
    ``max_docs_per_value`` docs per facet value (the diversified
    de-bias), stop after ``shard_size`` kept. ES samples per shard,
    which makes results shard-count-dependent; the global sample is
    deterministic and SQL-reproducible. The walk is equivalent to the
    non-recursive rule "value-rank <= max_docs_per_value, then first
    shard_size by global order", which is what the SQL oracle replays
    with two window functions.

    Scale shape: per-shard partials are that shard's per-value
    top-``max_docs_per_value`` rows (diversified; the top_hits superset
    proof: a doc in the global sample has value-rank < cap within its
    own shard too) or its top-``shard_size`` rows (plain sampler), so
    the per-qid merge sees at most values x cap (or shard_size) rows
    per shard — never the match count. Docs lacking the docvalue are
    omitted (ES missing-field semantics)."""
    import pandas as pd

    from webindex.serve import shard_salt_bounds

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)
    cap = max_docs_per_value

    def sample_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, shard_size, "auto",
                                   False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([facet_col])
        arr, valid = s.reader._dv[facet_col]
        keys_np = pc.cast(arr, pa.string()).to_numpy(zero_copy_only=False)
        dl_ids = s.reader._dl_ids
        qid_out, id_out, sc_out, key_out = [], [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            terms = s.an.tokens(text or "")
            # full shard ranking (exhaustive: the diversified cut needs
            # every value's best rows, which theta pruning may drop)
            ids, scores = s._ranked(
                terms, max(int(dl_ids.size), 1), force_exhaustive=True
            )
            if ids.size == 0:
                continue
            pos = np.searchsorted(dl_ids, ids)
            ok = valid[pos]
            ids, scores, pos = ids[ok], scores[ok], pos[ok]
            if ids.size == 0:
                continue
            keys = keys_np[pos]
            if cap is None:
                take = np.arange(min(ids.size, shard_size))
            else:
                # rows arrive (score desc, docID asc): per-value rank =
                # occurrence index of the value seen so far
                order = np.argsort(keys, kind="stable")
                ranks = np.empty(ids.size, np.int64)
                grp_starts = np.flatnonzero(
                    np.concatenate(([True], keys[order][1:]
                                    != keys[order][:-1]))
                )
                within = np.arange(ids.size) - np.repeat(
                    grp_starts,
                    np.diff(np.concatenate((grp_starts, [ids.size])))
                )
                ranks[order] = within
                take = np.flatnonzero(ranks < cap)
            qid_out.extend([qid] * take.size)
            id_out.append(ids[take])
            sc_out.append(scores[take])
            key_out.extend(keys[take].tolist())
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
                "value": pa.array(key_out, pa.string()),
            }
        )

    def sample_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        if cap is not None:
            g = g[g.groupby("value", sort=False).cumcount() < cap]
        g = g.head(shard_size)
        out = (
            g.groupby("value", sort=False).size().reset_index(name="cnt")
        )
        out.insert(0, "qid", g["qid"].iloc[0] if len(g) else "")
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[out["cnt"] > 0]

    partial = (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(sample_shard, batch_format="pyarrow")
    )
    return partial.groupby("qid").map_groups(
        sample_merge, batch_format="pandas"
    )


def top_hits(queries_ds, index_dir: str, group_col: str, *,
             per_group_k: int = 3, match: str = "or", filter_pred=None,
             n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, gkey, doc_id, score, rank): for every
    value of a docvalues column, the GLOBAL top ``per_group_k`` hits in
    that group — the ES ``terms`` aggregation with a ``top_hits``
    sub-aggregation (every bucket returns its best documents; ``rank``
    is 1-based within the (qid, gkey) bucket).

    Exactness of the shard merge (same argument as field collapsing): a
    group's global i-th best hit (i <= k) is outranked within its group
    by fewer than i docs globally, hence by fewer than i docs in its own
    shard — so it survives that shard's per-group top-k cut, and the
    per-shard partials are a superset of every group's global top-k.
    Output size is bounded by the column's value domain x per_group_k
    per query, never the match count. Docs lacking the docvalue are
    omitted (ES missing-field semantics)."""
    import pandas as pd

    from webindex.serve import shard_salt_bounds

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def hits_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([group_col])
        arr, valid = s.reader._dv[group_col]
        import pyarrow.compute as pc

        keys_np = pc.cast(arr, pa.string()).to_numpy(zero_copy_only=False)
        dl_ids = s.reader._dl_ids
        qid_out, id_out, sc_out, key_out = [], [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            terms = s.an.tokens(text or "")
            # full shard ranking: every group's top-k is needed, and theta
            # pruning may drop a small group's only hits
            ids, scores = s._ranked(
                terms, max(int(dl_ids.size), 1), force_exhaustive=True
            )
            if ids.size == 0:
                continue
            pos = np.searchsorted(dl_ids, ids)
            ok = valid[pos]
            ids, scores, pos = ids[ok], scores[ok], pos[ok]
            if ids.size == 0:
                continue
            keys = keys_np[pos]
            # ids arrive (score desc, docID asc): occurrence index within
            # each key = rank within the group. Stable key-sort groups
            # rows while preserving ranked order inside each group.
            order = np.argsort(keys, kind="stable")
            sk = keys[order]
            new_grp = np.empty(sk.size, dtype=bool)
            new_grp[0] = True
            new_grp[1:] = sk[1:] != sk[:-1]
            grp_id = np.cumsum(new_grp) - 1
            starts = np.flatnonzero(new_grp)
            occ = np.arange(sk.size) - starts[grp_id]
            keep = np.sort(order[occ < per_group_k])  # ranked order back
            qid_out.extend([qid] * keep.size)
            id_out.append(ids[keep])
            sc_out.append(scores[keep])
            key_out.extend(keys[keep].tolist())
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "gkey": pa.array(key_out, pa.string()),
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
            ["gkey", "score", "doc_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        g = g.groupby("gkey", sort=False).head(per_group_k)
        g = g.reset_index(drop=True)
        g["rank"] = g.groupby("gkey", sort=False).cumcount().astype(
            np.int32
        ) + 1
        return g[["qid", "gkey", "doc_id", "score", "rank"]]

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(hits_shard, batch_format="pyarrow")
    )
    return partial.groupby("qid").map_groups(merge, batch_format="pandas")


def sort_by_field(queries_ds, index_dir: str, col: str, *,
                  top_k: int = 10, descending: bool = True,
                  match: str = "or", filter_pred=None,
                  n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, doc_id, sortval, rank): the query's
    match set ordered by an integer docvalues column instead of BM25 —
    the ES ``sort`` clause (``sort: [{col: desc}]``; relevance scoring
    skipped entirely, as ES does when a sort replaces _score). Ties break
    by ascending docID; docs lacking the docvalue are omitted (ES
    ``missing`` handling is _last — below any top-k here).

    Exact shard merge: the global i-th row (i <= k) under the total order
    is within its own shard's top-k, so per-shard top-k partials are a
    superset; the merge re-sorts and cuts."""
    import pandas as pd

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def sort_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        dl_ids = s.reader._dl_ids
        qid_out, id_out, v_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            v = vals_np[sel].astype(np.int64)
            ids = dl_ids[sel]
            # shard-local top-k under (sortval, docID): lexsort is
            # ascending — negate the value column for descending
            order = np.lexsort((ids, -v if descending else v))[:top_k]
            qid_out.extend([qid] * order.size)
            id_out.append(ids[order])
            v_out.append(v[order])
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out
                    else np.empty(0, np.int64)
                ),
                "sortval": pa.array(
                    np.concatenate(v_out) if v_out
                    else np.empty(0, np.int64)
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sortval", "doc_id"],
            ascending=[not descending, True], kind="mergesort",
        ).head(top_k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "sortval", "rank"]]

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(sort_shard, batch_format="pyarrow")
    )
    return partial.groupby("qid").map_groups(merge, batch_format="pandas")


def facet_percentiles(queries_ds, index_dir: str, col: str,
                      ps: list[int] = (25, 50, 75, 95), *,
                      match: str = "or", filter_pred=None,
                      n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, p, value): EXACT nearest-rank
    percentiles (value = ceil(p/100 * n)-th smallest, 1-based) of an
    integer docvalues column over each query's FULL match set — the ES
    ``percentiles`` aggregation, exact instead of t-digest-approximate.

    Scale shape: per-shard partials are per-(qid, value) match-count
    HISTOGRAMS (bounded by the column's distinct values, not the match
    count — doc-length-like columns have small domains), merged with an
    exact Sum; each qid's percentile then reads off its merged histogram
    in one vectorized cumsum inside ``map_groups``. Exact integer counts
    make the result partition-independent and SQL-reproducible."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    ps = sorted(set(int(p) for p in ps))
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def hist_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        qs, vs, cs = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            u, c = np.unique(vals_np[sel].astype(np.int64),
                             return_counts=True)
            qs.extend([qid] * u.size)
            vs.extend(u.tolist())
            cs.extend(c.astype(np.int64).tolist())
        return pa.table(
            {"qid": pa.array(qs, pa.string()),
             "value": pa.array(vs, pa.int64()),
             "cnt_p": pa.array(cs, pa.int64())}
        )

    merged = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(hist_shard, batch_format="pyarrow")
        .groupby(["qid", "value"])
        .aggregate(Sum("cnt_p", alias_name="cnt"))
    )

    def pcts(g, ps=tuple(ps)):
        import pandas as pd

        g = g.sort_values("value")
        vals = g["value"].to_numpy(np.int64)
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        out_p, out_v = [], []
        for p in ps:
            k = -(-p * n // 100)  # ceil(p*n/100), 1-based nearest rank
            k = min(max(k, 1), n)
            out_p.append(p)
            out_v.append(int(vals[np.searchsorted(cum, k)]))
        return pd.DataFrame(
            {"qid": [g["qid"].iloc[0]] * len(ps),
             "p": np.array(out_p, np.int32),
             "value": np.array(out_v, np.int64)}
        )

    return merged.groupby("qid").map_groups(pcts, batch_format="pandas")


def _value_hist(queries_ds, index_dir: str, col: str, *, match: str,
                filter_pred, n_shards: int, center_ref=None):
    """Merged per-(qid, value) match-count histogram of an integer
    docvalues column — the shared partial shape of the exact
    percentile-family aggregations (the :func:`facet_percentiles`
    recipe: per-shard ``np.unique`` partials bounded by the column's
    distinct-value domain, one exact Sum merge).

    With ``center_ref`` (a ``ray.put`` ObjectRef of ``{qid: int}``),
    each match histograms as ``|v - center[qid]|`` instead — the second
    pass of the median-absolute-deviation aggregation. Queries whose qid
    is absent from the center map are skipped (they had no matches in
    pass one). Returns a Dataset ``(qid, value, cnt)``."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def hist_shard(g: pa.Table) -> pa.Table:
        import ray

        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        center = ray.get(center_ref) if center_ref is not None else None
        qs, vs, cs = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            if center is not None and qid not in center:
                continue
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            v = vals_np[sel].astype(np.int64)
            if center is not None:
                v = np.abs(v - np.int64(center[qid]))
            u, c = np.unique(v, return_counts=True)
            qs.extend([qid] * u.size)
            vs.extend(u.tolist())
            cs.extend(c.astype(np.int64).tolist())
        return pa.table(
            {"qid": pa.array(qs, pa.string()),
             "value": pa.array(vs, pa.int64()),
             "cnt_p": pa.array(cs, pa.int64())}
        )

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(hist_shard, batch_format="pyarrow")
        .groupby(["qid", "value"])
        .aggregate(Sum("cnt_p", alias_name="cnt"))
    )


def _nearest_rank(vals: np.ndarray, cum: np.ndarray, p: int) -> int:
    """ceil(p·n/100)-th smallest (1-based) off a sorted value histogram —
    the exact nearest-rank rule shared with :func:`facet_percentiles`."""
    n = int(cum[-1])
    k = min(max(-(-p * n // 100), 1), n)
    return int(vals[np.searchsorted(cum, k)])


def facet_boxplot(queries_ds, index_dir: str, col: str, *,
                  match: str = "or", filter_pred=None,
                  n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, min, q1, q2, q3, max): the ES
    ``boxplot`` aggregation over each query's FULL match set, EXACT
    (ES approximates with t-digest) — q1/q2/q3 are nearest-rank
    (ceil(p·n/100), the :func:`facet_percentiles` rule, = DuckDB
    ``quantile_disc``), min/max read off the histogram ends.

    Scale shape identical to facet_percentiles: per-shard per-(qid,
    value) count partials bounded by the column's distinct-value domain,
    one exact Sum merge, one vectorized cumsum readoff per qid."""
    hist = _value_hist(queries_ds, index_dir, col, match=match,
                       filter_pred=filter_pred, n_shards=n_shards)

    def box(g):
        import pandas as pd

        g = g.sort_values("value")
        vals = g["value"].to_numpy(np.int64)
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        return pd.DataFrame(
            {
                "qid": [g["qid"].iloc[0]],
                "min": np.array([vals[0]], np.int64),
                "q1": np.array([_nearest_rank(vals, cum, 25)], np.int64),
                "q2": np.array([_nearest_rank(vals, cum, 50)], np.int64),
                "q3": np.array([_nearest_rank(vals, cum, 75)], np.int64),
                "max": np.array([vals[-1]], np.int64),
            }
        )

    return hist.groupby("qid").map_groups(box, batch_format="pandas")


def facet_mad(queries_ds, index_dir: str, col: str, *,
              match: str = "or", filter_pred=None,
              n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, median, mad): the ES
    ``median_absolute_deviation`` aggregation over each query's FULL
    match set, EXACT (ES approximates with t-digest): median = exact
    nearest-rank 50th percentile, mad = nearest-rank median of
    |v − median|.

    Two histogram passes: pass one is the facet_percentiles shape and
    yields one median row per query (bounded by the query count — the
    same driver-resident budget as the query table itself), which
    broadcasts via ``ray.put`` into pass two's |v − median| histogram.
    Both passes are exact integer counts, so the result is
    partition-independent and SQL-reproducible."""
    import ray

    hist = _value_hist(queries_ds, index_dir, col, match=match,
                       filter_pred=filter_pred, n_shards=n_shards)

    def readoff(g, out_col):
        import pandas as pd

        g = g.sort_values("value")
        vals = g["value"].to_numpy(np.int64)
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        return pd.DataFrame(
            {"qid": [g["qid"].iloc[0]],
             out_col: np.array([_nearest_rank(vals, cum, 50)], np.int64)}
        )

    med_pd = (
        hist.groupby("qid")
        .map_groups(lambda g: readoff(g, "median"), batch_format="pandas")
        .to_pandas()  # one row per query with matches — driver-bounded
    )
    centers = dict(
        zip(med_pd["qid"].tolist(), med_pd["median"].astype(int).tolist())
    )
    center_ref = ray.put(centers)
    dev = _value_hist(queries_ds, index_dir, col, match=match,
                      filter_pred=filter_pred, n_shards=n_shards,
                      center_ref=center_ref)
    mad = dev.groupby("qid").map_groups(
        lambda g: readoff(g, "mad"), batch_format="pandas"
    )

    def attach_median(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(center_ref)
        med = [c[q] for q in batch.column("qid").to_pylist()]
        return batch.append_column("median", pa.array(med, pa.int64()))

    out = mad.map_batches(attach_median, batch_format="pyarrow")
    return out.select_columns(["qid", "median", "mad"])


def facet_t_test(queries_ds, index_dir: str, col: str, buckets: dict, *,
                 match: str = "or", filter_pred=None,
                 n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, n_a, n_b, mean_a, mean_b, t): the ES
    ``t_test`` aggregation (heteroscedastic / Welch, ES's default) of an
    integer docvalues column between two NAMED conjunctive docvalues
    predicates (the ES two-filter form), over each query's FULL match
    set.

    ``buckets`` maps exactly two names to predicates; the
    lexicographically smaller name is side a. Per-shard partials are
    exact int64 (n, Σv, Σv²) per (qid, side) — the facet_stats recipe —
    merged with Sum; the float tail is pinned op for op so the SQL
    oracle matches bit for bit:
        m = Σv/n;  e = Σv²/n;  var = max(0, e − m·m) · (n/(n−1))
        t = (m_a − m_b) / sqrt(var_a/n_a + var_b/n_b)
    Queries where either side has n < 2, or where both variances are 0,
    produce no row (a t-statistic is undefined there). Exactness bound:
    Σv² < 2⁶³."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    if len(buckets) != 2:
        raise ValueError("t_test needs exactly two named buckets")
    named = sorted(
        (name, tuple(tuple(c) for c in pred))
        for name, pred in buckets.items()
    )
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def ttest_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        masks = [(name, s.reader.filter_mask(pred)) for name, pred in named]
        rows = {"qid": [], "side": [], "n_p": [], "sum_p": [], "sumsq_p": []}
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            for name, m in masks:
                v = vals_np[sel[m[sel]]].astype(np.int64)
                if v.size == 0:
                    continue
                rows["qid"].append(qid)
                rows["side"].append(name)
                rows["n_p"].append(int(v.size))
                rows["sum_p"].append(int(v.sum()))
                rows["sumsq_p"].append(int((v * v).sum()))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.string()),
                "side": pa.array(rows["side"], pa.string()),
                "n_p": pa.array(rows["n_p"], pa.int64()),
                "sum_p": pa.array(rows["sum_p"], pa.int64()),
                "sumsq_p": pa.array(rows["sumsq_p"], pa.int64()),
            }
        )

    merged = (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(ttest_shard, batch_format="pyarrow")
        .groupby(["qid", "side"])
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("sum_p", alias_name="sum"),
            Sum("sumsq_p", alias_name="sumsq"),
        )
    )
    name_a, name_b = named[0][0], named[1][0]

    def welch(g):
        import math

        import pandas as pd

        empty = pd.DataFrame(
            {"qid": pd.Series([], dtype=str),
             "n_a": pd.Series([], dtype=np.int64),
             "n_b": pd.Series([], dtype=np.int64),
             "mean_a": pd.Series([], dtype=np.float64),
             "mean_b": pd.Series([], dtype=np.float64),
             "t": pd.Series([], dtype=np.float64)}
        )
        by = {r["side"]: r for _, r in g.iterrows()}
        if name_a not in by or name_b not in by:
            return empty
        a, b = by[name_a], by[name_b]
        na, nb = int(a["n"]), int(b["n"])
        if na < 2 or nb < 2:
            return empty
        ma = int(a["sum"]) / na
        mb = int(b["sum"]) / nb
        ea = int(a["sumsq"]) / na
        eb = int(b["sumsq"]) / nb
        va = max(0.0, ea - ma * ma) * (na / (na - 1.0))
        vb = max(0.0, eb - mb * mb) * (nb / (nb - 1.0))
        denom_sq = va / na + vb / nb
        if denom_sq <= 0.0:
            return empty
        t = (ma - mb) / math.sqrt(denom_sq)
        return pd.DataFrame(
            {"qid": [g["qid"].iloc[0]],
             "n_a": np.array([na], np.int64),
             "n_b": np.array([nb], np.int64),
             "mean_a": np.array([ma], np.float64),
             "mean_b": np.array([mb], np.float64),
             "t": np.array([t], np.float64)}
        )

    return merged.groupby("qid").map_groups(welch, batch_format="pandas")


def facet_matrix_stats(queries_ds, index_dir: str, col: str, *,
                       match: str = "or", filter_pred=None,
                       n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> per-query count, means, population
    variances, covariance and Pearson correlation between an integer
    docvalues column (x) and document token length dl (y, resident in
    the reader — the facet_weighted_avg weight) over the FULL match set:
    the ES ``matrix_stats`` aggregation on two fields.

    Per-shard partials are exact int64 (n, Σx, Σy, Σx², Σy², Σxy) —
    merged with Sum, so the moment matrix is partition-independent. The
    float tail is pinned op for op (the facet_extended_stats recipe):
        mx = Σx/n;  var_x = max(0, Σx²/n − mx·mx)   (population)
        cov = Σxy/n − mx·my;   corr = cov / (sqrt(var_x)·sqrt(var_y))
    Queries with n = 0 or a zero variance on either field produce no
    row (correlation undefined). ES's skewness/kurtosis are omitted:
    their Σx³/Σx⁴ partials overflow int64 at corpus scale, and this
    module's exactness contract forbids float partials (summation order
    is engine- and partition-specific, measured — CLAUDE.md). Exactness
    bound: Σx², Σxy < 2⁶³."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def moments_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        dl = s.reader._dl
        rows = {"qid": [], "n_p": [], "sx_p": [], "sy_p": [],
                "sxx_p": [], "syy_p": [], "sxy_p": []}
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            x = vals_np[sel].astype(np.int64)
            y = dl[sel].astype(np.int64)
            rows["qid"].append(qid)
            rows["n_p"].append(int(x.size))
            rows["sx_p"].append(int(x.sum()))
            rows["sy_p"].append(int(y.sum()))
            rows["sxx_p"].append(int((x * x).sum()))
            rows["syy_p"].append(int((y * y).sum()))
            rows["sxy_p"].append(int((x * y).sum()))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.string()),
                "n_p": pa.array(rows["n_p"], pa.int64()),
                "sx_p": pa.array(rows["sx_p"], pa.int64()),
                "sy_p": pa.array(rows["sy_p"], pa.int64()),
                "sxx_p": pa.array(rows["sxx_p"], pa.int64()),
                "syy_p": pa.array(rows["syy_p"], pa.int64()),
                "sxy_p": pa.array(rows["sxy_p"], pa.int64()),
            }
        )

    merged = (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(moments_shard, batch_format="pyarrow")
        .groupby("qid")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("sx_p", alias_name="sx"),
            Sum("sy_p", alias_name="sy"),
            Sum("sxx_p", alias_name="sxx"),
            Sum("syy_p", alias_name="syy"),
            Sum("sxy_p", alias_name="sxy"),
        )
    )

    def tail(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.int64)
        sx = batch.column("sx").to_numpy().astype(np.int64)
        sy = batch.column("sy").to_numpy().astype(np.int64)
        sxx = batch.column("sxx").to_numpy().astype(np.int64)
        syy = batch.column("syy").to_numpy().astype(np.int64)
        sxy = batch.column("sxy").to_numpy().astype(np.int64)
        mx = sx / n
        my = sy / n
        var_x = np.maximum(0.0, sxx / n - mx * mx)
        var_y = np.maximum(0.0, syy / n - my * my)
        cov = sxy / n - mx * my
        keep = (n > 0) & (var_x > 0.0) & (var_y > 0.0)
        corr = np.zeros(len(n), np.float64)
        corr[keep] = cov[keep] / (np.sqrt(var_x[keep]) * np.sqrt(var_y[keep]))
        out = pa.table(
            {
                "qid": batch.column("qid"),
                "n": pa.array(n, pa.int64()),
                "mean_x": pa.array(mx, pa.float64()),
                "mean_y": pa.array(my, pa.float64()),
                "var_x": pa.array(var_x, pa.float64()),
                "var_y": pa.array(var_y, pa.float64()),
                "covariance": pa.array(cov, pa.float64()),
                "correlation": pa.array(corr, pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return merged.map_batches(tail, batch_format="pyarrow")


def facet_counts(queries_ds, index_dir: str, facet_cols: list[str], *,
                 match: str = "or", filter_pred=None,
                 n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, facet, value, cnt): value counts of the
    given docvalues columns over each query's FULL match set (the ES
    terms-aggregation surface).

    Same shard fan-out as ``search_queries(impl="sharded")`` — each
    salt-range shard counts its own matches over its shard-bounded
    docvalues (cached per worker), and an exact Sum-merge by
    (qid, facet, value) reassembles global counts. Counting is per-doc, so
    per-shard partial counts compose exactly; nothing corpus-sized moves.
    """
    import numpy as np  # noqa: F401  (kept: closure uses pa only)

    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def count_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        qid_out, f_out, v_out, c_out = [], [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            fs, vs, cs = searcher.inner.facet_one(text, facet_cols)
            qid_out.extend([qid] * len(fs))
            f_out.extend(fs)
            v_out.extend(vs)
            c_out.extend(cs)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "facet": pa.array(f_out, pa.string()),
                "value": pa.array(v_out, pa.string()),
                "cnt_p": pa.array(c_out, pa.int64()),
            }
        )

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(count_shard, batch_format="pyarrow")
    )
    return partial.groupby(["qid", "facet", "value"]).aggregate(
        Sum("cnt_p", alias_name="cnt")
    )


#: exact facet_cardinality circuit breaker: max distinct values ONE
#: shard may emit for ONE query before the merge is declared a scale
#: hazard (an unbounded-domain column — URLs, ids — would otherwise
#: OOM the distinct-merge; ES uses HLL++ for exactly this reason).
FACET_CARDINALITY_MAX_DISTINCT = 2_000_000


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """64-bit hashes -> 2**p uint8 HyperLogLog registers (max-merge).

    Register index = top ``p`` hash bits; rho = 1 + leading zeros of the
    remaining ``64-p``-bit window. Pure integer state — deterministic
    and partition-order-independent under elementwise max."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if hashes.size == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    bl = np.zeros(w.shape, np.int64)  # bit_length(w) - 1 where w > 0
    nz = w > 0
    bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    # float conversion can round w up across a power of two; verify the
    # candidate with an exact integer shift and correct downward
    over = nz & ((w >> bl.clip(0, 63).astype(np.uint64)) == 0)
    bl[over] -= 1
    rho = np.where(nz, (64 - p) - bl, (64 - p) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    """Classic HLL estimate with the small-range linear-counting
    correction (64-bit hashes need no large-range correction)."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return int(round(e))


def facet_cardinality(queries_ds, index_dir: str, col: str, *,
                      match: str = "or", filter_pred=None,
                      n_shards: int = SEARCH_SHARDS, approx: bool = False,
                      hll_p: int = 14,
                      max_distinct: int = FACET_CARDINALITY_MAX_DISTINCT):
    """queries(qid, text) -> (qid, cardinality): the number of distinct
    values of a docvalues column over each query's FULL match set — the
    ES ``cardinality`` aggregation.

    Default = EXACT distinct merge, hash-matching the SQL
    ``COUNT(DISTINCT ...)`` oracle. Each salt-range shard emits only its
    DISTINCT (qid, value) rows — bounded by the column's VALUE DOMAIN,
    never the match count — so the exact path is safe for enumerable
    fields (lang, tld, status) but a scale hazard on an
    unbounded-domain column (URL-like). A shard that would emit more
    than ``max_distinct`` values for one query raises and points at
    ``approx=True`` instead of silently OOMing the merge.

    ``approx=True`` = HyperLogLog sketch (what ES actually runs:
    HLL++-style, ``2**hll_p`` uint8 registers/query). Shards emit fixed
    ~16 KiB register blobs regardless of cardinality; the merge is an
    elementwise max — exact-merge semantics over sketches, so the
    estimate is partition-count-independent and deterministic (stable
    64-bit value hash). Typical error ~1.04/sqrt(2**hll_p) ≈ 0.8 % at
    the default p=14.

    Docs lacking the docvalue don't contribute (ES missing-field
    semantics) on either path.
    """
    from ray.data.aggregate import Count

    from webindex.serve import shard_salt_bounds
    from webindex.util import stable_hash64
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def distinct_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        qid_out, v_out = [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            uniq = np.unique(vals_np[sel].astype(str))
            if uniq.size > max_distinct:
                raise ValueError(
                    f"facet_cardinality(col={col!r}): one shard matched "
                    f"{uniq.size} distinct values for qid {qid!r} > "
                    f"max_distinct={max_distinct}; this column's value "
                    "domain is too large for the exact distinct merge — "
                    "pass approx=True (HLL sketch) or raise max_distinct"
                )
            qid_out.extend([qid] * uniq.size)
            v_out.extend(uniq.tolist())
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "value": pa.array(v_out, pa.string()),
            }
        )

    def hll_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        qid_out, reg_out = [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            uniq = np.unique(vals_np[sel].astype(str))
            hs = np.fromiter(
                (stable_hash64(v) for v in uniq.tolist()),
                dtype=np.uint64, count=uniq.size,
            )
            qid_out.append(qid)
            reg_out.append(_hll_registers(hs, hll_p).tobytes())
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "regs": pa.array(reg_out, pa.binary()),
            }
        )

    def hll_merge(g: pa.Table) -> pa.Table:
        regs = np.frombuffer(
            g.column("regs")[0].as_py(), np.uint8
        ).copy()
        for blob in g.column("regs").to_pylist()[1:]:
            np.maximum(regs, np.frombuffer(blob, np.uint8), out=regs)
        return pa.table(
            {
                "qid": g.column("qid").slice(0, 1),
                "cardinality": pa.array(
                    [_hll_estimate(regs)], pa.int64()
                ),
            }
        )

    exploded = queries_ds.map_batches(explode, batch_format="pyarrow")
    if approx:
        return (
            exploded.groupby("shard")
            .map_groups(hll_shard, batch_format="pyarrow")
            .groupby("qid")
            .map_groups(hll_merge, batch_format="pyarrow")
        )
    return (
        exploded.groupby("shard")
        .map_groups(distinct_shard, batch_format="pyarrow")
        .groupby(["qid", "value"])
        .aggregate(Count(alias_name="_n"))  # dedup across shards
        .drop_columns(["_n", "value"])
        .groupby("qid")
        .aggregate(Count(alias_name="cardinality"))
    )


def facet_multi_terms(queries_ds, index_dir: str, cols: list[str], *,
                      match: str = "or", filter_pred=None,
                      n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, <col1>, <col2>, ..., cnt): value counts
    of the TUPLE of docvalues columns over each query's FULL match set —
    the ES ``multi_terms`` aggregation (buckets keyed by the composite
    value). ES semantics preserved: a doc missing ANY of the key fields
    joins no bucket.

    Same exact-merge shape as :func:`facet_counts`: counting is per-doc,
    so per-shard partial tuple counts compose exactly under the
    (qid, *cols) Sum-merge; nothing corpus-sized moves.
    """
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)
    cols = list(cols)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def count_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues(cols)
        vals, valids = [], []
        for c in cols:
            arr, valid = s.reader._dv[c]
            vals.append(arr.to_numpy(zero_copy_only=False))
            valids.append(valid)
        qid_out = []
        col_out: list[list] = [[] for _ in cols]
        cnt_out: list[int] = []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            ok = np.ones(sel.size, dtype=bool)
            for valid in valids:
                ok &= valid[sel]
            sel = sel[ok]
            if sel.size == 0:
                continue
            # Composite bucket key: per-column codes combined into one
            # int64, counted in a single bincount-equivalent pass.
            uniqs, code = [], np.zeros(sel.size, dtype=np.int64)
            for v in vals:
                u, inv = np.unique(v[sel].astype(str), return_inverse=True)
                uniqs.append(u)
                code = code * len(u) + inv
            ucode, cnts = np.unique(code, return_counts=True)
            parts = []
            rem = ucode
            for u in reversed(uniqs):
                parts.append(u[rem % len(u)])
                rem = rem // len(u)
            parts.reverse()
            qid_out.extend([qid] * ucode.size)
            for i, p in enumerate(parts):
                col_out[i].extend(p.tolist())
            cnt_out.extend(cnts.tolist())
        tbl = {"qid": pa.array(qid_out, pa.string())}
        for c, v in zip(cols, col_out):
            tbl[c] = pa.array(v, pa.string())
        tbl["cnt_p"] = pa.array(cnt_out, pa.int64())
        return pa.table(tbl)

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(count_shard, batch_format="pyarrow")
    )
    return partial.groupby(["qid", *cols]).aggregate(
        Sum("cnt_p", alias_name="cnt")
    )


def facet_rare_terms(queries_ds, index_dir: str, col: str, *,
                     max_doc_count: int = 1, match: str = "or",
                     filter_pred=None, n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, facet, value, cnt): the ES
    ``rare_terms`` aggregation — the long-tail complement of ``terms``:
    only buckets whose GLOBAL match-set doc count is <= ``max_doc_count``
    survive. ES implements this with a CuckooFilter and documents it as
    approximate; per-doc docvalues make the exact answer one streaming
    filter over the exact Sum-merged counts, so the SQL HAVING oracle
    hash-matches.

    The cut must happen AFTER the global merge (a term rare in one shard
    may be common corpus-wide) — it composes :func:`facet_counts` with a
    distributed post-merge filter; nothing leaves the Dataset.
    """
    counts = facet_counts(
        queries_ds, index_dir, [col], match=match,
        filter_pred=filter_pred, n_shards=n_shards,
    )

    def cut(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch.column("cnt"), max_doc_count)
        return batch.filter(keep)

    return counts.map_batches(cut, batch_format="pyarrow")


def facet_histogram(queries_ds, index_dir: str, col: str, interval: int, *,
                    match: str = "or", filter_pred=None,
                    n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, bucket, cnt): fixed-interval histogram
    of an integer docvalues column over each query's FULL match set — the
    ES ``histogram`` aggregation (bucket key = floor(v / interval) *
    interval; empty buckets omitted, ES ``min_doc_count=1``).

    Same exact-merge shape as :func:`facet_counts`: per-shard vectorized
    bucket counts over the shard's matches, Sum-merged by (qid, bucket).
    Bucketing is per-doc, so partials compose exactly."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    if interval <= 0:
        raise ValueError("interval must be a positive integer")
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def hist_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        qid_out, b_out, c_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            v = vals_np[sel].astype(np.int64)
            # int64 floor division floors toward -inf via np.floor_divide
            buckets = np.floor_divide(v, interval) * interval
            uniq, cnts = np.unique(buckets, return_counts=True)
            qid_out.extend([qid] * uniq.size)
            b_out.extend(uniq.tolist())
            c_out.extend(cnts.tolist())
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "bucket": pa.array(b_out, pa.int64()),
                "cnt_p": pa.array(c_out, pa.int64()),
            }
        )

    return (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(hist_shard, batch_format="pyarrow")
        .groupby(["qid", "bucket"])
        .aggregate(Sum("cnt_p", alias_name="cnt"))
    )


def _qtext_explode(bounds):
    """(qid, text) batch -> one copy per salt-range shard (the shared
    fan-out head of every facet/aggregation pipeline)."""

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    return explode


def _match_vals(s, text, col):
    """Matching docs' docvalues for one query on one shard searcher:
    (values ndarray restricted to docs that HAVE the docvalue)."""
    from webindex.wand import match_positions

    s.reader._load_docvalues([col])
    arr, valid = s.reader._dv[col]
    vals_np = arr.to_numpy(zero_copy_only=False)
    sel = match_positions(
        s.reader, s.an.tokens(text or ""), mask=s._mask(),
        require_all=s.match == "and",
    )
    sel = sel[valid[sel]]
    return vals_np[sel]


def facet_extended_stats(queries_ds, index_dir: str, col: str, *,
                         match: str = "or", filter_pred=None,
                         n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, count, sum, min, max, sum_sq, avg,
    variance, std) of an integer docvalues column over each query's FULL
    match set — the ES ``extended_stats`` aggregation.

    Partials are exact int64 (count, sum, min, max, sum of squares) per
    shard, merged with Sum/Min/Max; the float tail is pinned to the SQL
    oracle op for op: avg = sum/count (one IEEE division of exact ints),
    variance = sum_sq/count − (sum/count)·(sum/count) (the ES population
    variance), clamped at 0.0 against rounding (both sides GREATEST), and
    std = sqrt(variance) — sqrt is correctly rounded, so engine-portable
    (the temperature_mix precedent). Exactness bound: partials hold while
    n·max(v)² < 2⁶³; wider columns need per-shard big-int partials."""
    from ray.data.aggregate import Max, Min, Sum

    from webindex.serve import shard_salt_bounds

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def stats_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        rows = {"qid": [], "count_p": [], "sum_p": [], "min_p": [],
                "max_p": [], "sum_sq_p": []}
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            v = _match_vals(s, text, col).astype(np.int64)
            if v.size == 0:
                continue
            rows["qid"].append(qid)
            rows["count_p"].append(int(v.size))
            rows["sum_p"].append(int(v.sum()))
            rows["min_p"].append(int(v.min()))
            rows["max_p"].append(int(v.max()))
            rows["sum_sq_p"].append(int((v * v).sum()))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.string()),
                "count_p": pa.array(rows["count_p"], pa.int64()),
                "sum_p": pa.array(rows["sum_p"], pa.int64()),
                "min_p": pa.array(rows["min_p"], pa.int64()),
                "max_p": pa.array(rows["max_p"], pa.int64()),
                "sum_sq_p": pa.array(rows["sum_sq_p"], pa.int64()),
            }
        )

    merged = (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(stats_shard, batch_format="pyarrow")
        .groupby("qid")
        .aggregate(
            Sum("count_p", alias_name="count"),
            Sum("sum_p", alias_name="sum"),
            Min("min_p", alias_name="min"),
            Max("max_p", alias_name="max"),
            Sum("sum_sq_p", alias_name="sum_sq"),
        )
    )

    def add_floats(batch: pa.Table) -> pa.Table:
        c = batch.column("count").to_numpy().astype(np.int64)
        sm = batch.column("sum").to_numpy().astype(np.int64)
        sq = batch.column("sum_sq").to_numpy().astype(np.int64)
        avg = sm / c
        var = np.maximum(sq / c - (sm / c) * (sm / c), 0.0)
        batch = batch.append_column("avg", pa.array(avg, pa.float64()))
        batch = batch.append_column("variance", pa.array(var, pa.float64()))
        return batch.append_column("std", pa.array(np.sqrt(var),
                                                   pa.float64()))

    return merged.map_batches(add_floats, batch_format="pyarrow")


def facet_range(queries_ds, index_dir: str, col: str,
                ranges: list[tuple[int | None, int | None]], *,
                match: str = "or", filter_pred=None,
                n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, range, cnt): explicit-edge buckets of
    an integer docvalues column over each query's FULL match set — the ES
    ``range`` aggregation (``from`` inclusive, ``to`` exclusive, ends
    open via None; ranges may overlap, a doc counts in each it falls in).

    ``range`` labels are ``"lo_hi"`` with ``*`` for an open end (string
    keys hash engine-portably; NULL ints don't). Empty buckets are
    omitted (the min_doc_count=1 surface, like facet_histogram). One
    vectorized mask count per (query, range) per shard; Sum-merge."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds

    if not ranges:
        raise ValueError("ranges must be non-empty")
    labels = [
        f"{'*' if lo is None else lo}_{'*' if hi is None else hi}"
        for lo, hi in ranges
    ]
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def range_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo_s, hi_s = bounds[sid]
        searcher = _shard_searcher(index_dir, lo_s, hi_s, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        qid_out, r_out, c_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            v = _match_vals(s, text, col).astype(np.int64)
            if v.size == 0:
                continue
            for (lo, hi), label in zip(ranges, labels):
                m = np.ones(v.size, dtype=bool)
                if lo is not None:
                    m &= v >= lo
                if hi is not None:
                    m &= v < hi
                n = int(m.sum())
                if n:
                    qid_out.append(qid)
                    r_out.append(label)
                    c_out.append(n)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "range": pa.array(r_out, pa.string()),
                "cnt_p": pa.array(c_out, pa.int64()),
            }
        )

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(range_shard, batch_format="pyarrow")
        .groupby(["qid", "range"])
        .aggregate(Sum("cnt_p", alias_name="cnt"))
    )


def facet_weighted_avg(queries_ds, index_dir: str, col: str, *,
                       match: str = "or", filter_pred=None,
                       n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, sum_vw, sum_w, weighted_avg): the ES
    ``weighted_avg`` aggregation of an integer docvalues column over each
    query's FULL match set, weighted by document token length (the dl the
    reader already holds resident — "big documents count more", the
    field-length weighting ES examples use).

    Per-shard partials are exact int64 Σ(v·dl) and Σ(dl) over matches
    that HAVE the docvalue; Sum-merged, then ONE IEEE division — the
    facet_stats float recipe, so the SQL oracle matches bit for bit.
    Exactness bound: Σ v·dl < 2⁶³."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def wavg_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        dl = s.reader._dl
        qid_out, vw_out, w_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            v = vals_np[sel].astype(np.int64)
            w = dl[sel].astype(np.int64)
            qid_out.append(qid)
            vw_out.append(int((v * w).sum()))
            w_out.append(int(w.sum()))
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "sum_vw_p": pa.array(vw_out, pa.int64()),
                "sum_w_p": pa.array(w_out, pa.int64()),
            }
        )

    merged = (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(wavg_shard, batch_format="pyarrow")
        .groupby("qid")
        .aggregate(
            Sum("sum_vw_p", alias_name="sum_vw"),
            Sum("sum_w_p", alias_name="sum_w"),
        )
    )

    def add_avg(batch: pa.Table) -> pa.Table:
        vw = batch.column("sum_vw").to_numpy().astype(np.int64)
        w = batch.column("sum_w").to_numpy().astype(np.int64)
        return batch.append_column(
            "weighted_avg", pa.array(vw / w, pa.float64())
        )

    return merged.map_batches(add_avg, batch_format="pyarrow")


def facet_percentile_ranks(queries_ds, index_dir: str, col: str,
                           values: list[int], *, match: str = "or",
                           filter_pred=None,
                           n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, value, pct): for each probe value, the
    percentage of the query's matched docs whose docvalue is <= value —
    the ES ``percentile_ranks`` aggregation, EXACT instead of
    t-digest-approximate (the facet_percentiles inverse).

    Per-shard partials per (qid, value) are exact int64 (count <= value,
    total); Sum-merged; the float tail is pinned to the SQL op for op:
    pct = (100.0 · cnt_le) / total — multiply THEN divide, one of each."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    values = sorted(set(int(v) for v in values))
    if not values:
        raise ValueError("values must be non-empty")
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def ranks_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False)
        qid_out, v_out, le_out, n_out = [], [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[valid[sel]]
            if sel.size == 0:
                continue
            v = np.sort(vals_np[sel].astype(np.int64))
            # one vectorized searchsorted answers every probe at once
            les = np.searchsorted(v, np.array(values, np.int64),
                                  side="right")
            for probe, le in zip(values, les.tolist()):
                qid_out.append(qid)
                v_out.append(probe)
                le_out.append(int(le))
                n_out.append(int(v.size))
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "value": pa.array(v_out, pa.int64()),
                "cnt_le_p": pa.array(le_out, pa.int64()),
                "total_p": pa.array(n_out, pa.int64()),
            }
        )

    merged = (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(ranks_shard, batch_format="pyarrow")
        .groupby(["qid", "value"])
        .aggregate(
            Sum("cnt_le_p", alias_name="cnt_le"),
            Sum("total_p", alias_name="total"),
        )
    )

    def add_pct(batch: pa.Table) -> pa.Table:
        le = batch.column("cnt_le").to_numpy().astype(np.int64)
        n = batch.column("total").to_numpy().astype(np.int64)
        pct = (100.0 * le) / n  # multiply then divide — the SQL op order
        t = batch.select(["qid", "value"])
        return t.append_column("pct", pa.array(pct, pa.float64()))

    return merged.map_batches(add_pct, batch_format="pyarrow")


def facet_filters(queries_ds, index_dir: str, filters: dict, *,
                  match: str = "or", filter_pred=None,
                  n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, filter, cnt): the ES ``filters``
    aggregation — per NAMED docvalues predicate (each a conjunctive
    ``(col, op, value)`` clause tuple), how many of the query's matches
    satisfy it. Every named bucket is returned, zero counts included
    (ES filters-agg semantics — unlike terms/range, the bucket set is
    caller-fixed), so per-shard partials always emit all names and the
    Sum-merge preserves the full bucket set."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    if not filters:
        raise ValueError("filters must be non-empty")
    named = sorted(
        (name, tuple(tuple(c) for c in pred))
        for name, pred in filters.items()
    )
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def filters_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        masks = [(name, s.reader.filter_mask(pred)) for name, pred in named]
        qid_out, f_out, c_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            for name, m in masks:
                qid_out.append(qid)
                f_out.append(name)
                c_out.append(int(m[sel].sum()) if sel.size else 0)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "filter": pa.array(f_out, pa.string()),
                "cnt_p": pa.array(c_out, pa.int64()),
            }
        )

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(filters_shard, batch_format="pyarrow")
        .groupby(["qid", "filter"])
        .aggregate(Sum("cnt_p", alias_name="cnt"))
    )


def adjacency_matrix(queries_ds, index_dir: str, filters: dict, *,
                     match: str = "or", filter_pred=None,
                     n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, key, cnt): the ES ``adjacency_matrix``
    aggregation — over the query's match set, counts for every named
    docvalues predicate AND every pairwise intersection (key ``"a&b"``
    in ascending name order, the ES separator). Buckets that end up
    EMPTY after the cross-shard Sum-merge are dropped (ES omits empty
    intersections); intersection is a per-doc property, so shard
    partials compose exactly."""
    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    if not filters:
        raise ValueError("filters must be non-empty")
    named = sorted(
        (name, tuple(tuple(c) for c in pred))
        for name, pred in filters.items()
    )
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def adj_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        masks = [(name, s.reader.filter_mask(pred)) for name, pred in named]
        qid_out, k_out, c_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            if sel.size == 0:
                continue
            hit = [(name, m[sel]) for name, m in masks]
            for i, (na, ma) in enumerate(hit):
                n = int(ma.sum())
                if n:
                    qid_out.append(qid)
                    k_out.append(na)
                    c_out.append(n)
                for nb, mb in hit[i + 1:]:
                    n2 = int((ma & mb).sum())
                    if n2:
                        qid_out.append(qid)
                        k_out.append(f"{na}&{nb}")
                        c_out.append(n2)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "key": pa.array(k_out, pa.string()),
                "cnt_p": pa.array(c_out, pa.int64()),
            }
        )

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(adj_shard, batch_format="pyarrow")
        .groupby(["qid", "key"])
        .aggregate(Sum("cnt_p", alias_name="cnt"))
    )


def facet_stats_by(queries_ds, index_dir: str, group_col: str,
                   stat_col: str, *, match: str = "or", filter_pred=None,
                   n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, value, count, sum, min, max, avg): the
    ES ``terms`` aggregation with a ``stats`` SUB-aggregation — per query,
    per distinct ``group_col`` docvalue, exact stats of ``stat_col`` over
    the match set (the "avg length by language" shape).

    Per-shard: matches grouped by value with one stable argsort +
    int64 ``reduceat`` kernels (add/min/max — exact on ints, unlike float
    folds); merged by (qid, value) with Sum/Sum/Min/Max; mean is one
    final IEEE division of exact ints, bit-matching the SQL oracle. Docs
    missing EITHER docvalue are excluded (ES missing-field semantics)."""
    from ray.data.aggregate import Max, Min, Sum

    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def stats_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([group_col, stat_col])
        g_arr, g_valid = s.reader._dv[group_col]
        v_arr, v_valid = s.reader._dv[stat_col]
        gvals = np.asarray(g_arr.to_numpy(zero_copy_only=False))
        vvals = v_arr.to_numpy(zero_copy_only=False)
        both = g_valid & v_valid
        rows = {"qid": [], "value": [], "count_p": [], "sum_p": [],
                "min_p": [], "max_p": []}
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            sel = match_positions(
                s.reader, s.an.tokens(text or ""), mask=s._mask(),
                require_all=s.match == "and",
            )
            sel = sel[both[sel]]
            if sel.size == 0:
                continue
            keys = gvals[sel]
            vals = vvals[sel].astype(np.int64)
            uniq, inv = np.unique(keys, return_inverse=True)
            order = np.argsort(inv, kind="stable")
            v_sorted = vals[order]
            starts = np.searchsorted(inv[order], np.arange(uniq.size))
            sums = np.add.reduceat(v_sorted, starts)
            mins = np.minimum.reduceat(v_sorted, starts)
            maxs = np.maximum.reduceat(v_sorted, starts)
            cnts = np.bincount(inv, minlength=uniq.size)
            rows["qid"].extend([qid] * uniq.size)
            rows["value"].extend(str(u) for u in uniq.tolist())
            rows["count_p"].extend(cnts.tolist())
            rows["sum_p"].extend(sums.tolist())
            rows["min_p"].extend(mins.tolist())
            rows["max_p"].extend(maxs.tolist())
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.string()),
                "value": pa.array(rows["value"], pa.string()),
                "count_p": pa.array(rows["count_p"], pa.int64()),
                "sum_p": pa.array(rows["sum_p"], pa.int64()),
                "min_p": pa.array(rows["min_p"], pa.int64()),
                "max_p": pa.array(rows["max_p"], pa.int64()),
            }
        )

    merged = (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(stats_shard, batch_format="pyarrow")
        .groupby(["qid", "value"])
        .aggregate(
            Sum("count_p", alias_name="count"),
            Sum("sum_p", alias_name="sum"),
            Min("min_p", alias_name="min"),
            Max("max_p", alias_name="max"),
        )
    )

    def add_avg(batch: pa.Table) -> pa.Table:
        c = batch.column("count").to_numpy().astype(np.int64)
        sm = batch.column("sum").to_numpy().astype(np.int64)
        return batch.append_column("avg", pa.array(sm / c, pa.float64()))

    return merged.map_batches(add_avg, batch_format="pyarrow")


def composite_buckets(queries_ds, index_dir: str, col: str, *,
                      size: int = 10, after: int | None = None,
                      match: str = "or", filter_pred=None,
                      n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> (qid, value, cnt): the first ``size``
    distinct integer-docvalue buckets STRICTLY AFTER the ``after`` cursor
    in ascending value order, with exact doc counts — the ES ``composite``
    aggregation's stateless bucket pagination (walk all buckets of an
    unbounded-cardinality aggregation in fixed-size pages, no deep
    bucket-list materialization).

    Per shard: distinct post-cursor values with counts, locally cut to
    the ``size`` smallest — a proven superset (a value in the global
    first-``size`` page ranks ≤ size in every shard where it occurs,
    values being per-doc properties); Sum-merge by (qid, value), then an
    exact per-qid ascending cut. Page cost is size×shards rows regardless
    of how many buckets precede the cursor (the search_after argument,
    applied to aggregation buckets)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from webindex.serve import shard_salt_bounds

    if size <= 0:
        raise ValueError("size must be positive")
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def page_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        qid_out, v_out, c_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            v = _match_vals(s, text, col).astype(np.int64)
            if after is not None:
                v = v[v > after]
            if v.size == 0:
                continue
            uniq, cnts = np.unique(v, return_counts=True)
            uniq, cnts = uniq[:size], cnts[:size]  # np.unique sorts asc
            qid_out.extend([qid] * uniq.size)
            v_out.extend(uniq.tolist())
            c_out.extend(cnts.tolist())
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "value": pa.array(v_out, pa.int64()),
                "cnt_p": pa.array(c_out, pa.int64()),
            }
        )

    def page_cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value", kind="mergesort").head(size)
        return g[["qid", "value", "cnt"]].reset_index(drop=True)

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(page_shard, batch_format="pyarrow")
        .groupby(["qid", "value"])
        .aggregate(Sum("cnt_p", alias_name="cnt"))
        .groupby("qid")
        .map_groups(page_cut, batch_format="pandas")
    )


def fetch_fields(runs_ds, index_dir: str, cols: list[str], *,
                 n_shards: int = SEARCH_SHARDS):
    """The ES fetch phase (``docvalue_fields``): attach docvalues columns
    to a runs table — hits leave the ranking phase as bare docIDs; this
    stage makes them documents again.

    Scale shape: runs rows route to their OWNING salt-range shard by
    docID (the same pinned shard math the query fan-out uses), each
    shard task loads only ITS docvalues slice (reader cached per worker)
    and resolves rows with one vectorized searchsorted — no broadcast of
    the corpus-sized docvalues table, no driver materialization. Docs
    lacking a value yield nulls (ES missing-field semantics)."""
    import os

    import pyarrow.compute as pc

    from webindex.config import IndexConfig
    from webindex.serve import shard_salt_bounds
    from webindex.util import read_json

    bounds = shard_salt_bounds(index_dir, n_shards)
    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    salt_lows = np.array([lo for lo, _hi in bounds], dtype=np.int64)
    shift, sps = cfg.salt_doc_shift, cfg.shards_per_salt

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        salt = (ids >> shift) // sps  # the pinned docID->salt math
        shard = np.clip(
            np.searchsorted(salt_lows, salt, side="right") - 1,
            0, len(bounds) - 1,
        ).astype(np.int32)
        return batch.append_column("_shard", pa.array(shard))

    def attach_shard(g: pa.Table) -> pa.Table:
        sid = g.column("_shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        r = searcher.inner.reader
        r._load_docvalues(cols)
        ids = g.column("doc_id").to_numpy()
        pos = np.searchsorted(r._dl_ids, ids)
        pos_c = np.minimum(pos, max(r._dl_ids.size - 1, 0))
        known = (
            r._dl_ids[pos_c] == ids if r._dl_ids.size
            else np.zeros(ids.size, dtype=bool)
        )
        out = g.drop_columns(["_shard"])
        for c in cols:
            arr, valid = r._dv[c]
            vals = arr.take(pa.array(pos_c, pa.int64()))
            keep = known & valid[pos_c]
            vals = pc.if_else(pa.array(keep), vals, pa.nulls(
                ids.size, arr.type if not isinstance(arr, pa.ChunkedArray)
                else arr.type
            ))
            out = out.append_column(c, vals)
        return out

    return (
        runs_ds.map_batches(route, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(attach_shard, batch_format="pyarrow")
    )


def query_plan(queries: list[tuple[str, str]], index_dir: str, *,
               top_k: int = 1000) -> "pd.DataFrame":
    """The ES ``_search?profile`` / explain-routing analog: per query the
    kernel the auto router would pick and why — distinct analyzed term
    count, per-term document frequencies (one distributed dict-sidecar
    scan, bounded partials), the estimated candidate count, and the
    chosen mode (:func:`route_mode`, the SAME pure function the ranked
    path calls). Fully derivable from dictionary statistics, so a SQL
    oracle reproduces the whole plan. Returns
    ``(qid, n_terms, est_candidates, mode)``."""
    import pandas as pd
    import pyarrow.compute as pc

    from webindex.config import IndexConfig
    from webindex.lexicon import _dict_ds
    from webindex.util import read_json

    import os

    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    an = Analyzer(cfg.analyzer)
    terms_by_qid = {
        qid: sorted(set(an.tokens(text or ""))) for qid, text in queries
    }
    uniq = sorted({t for ts in terms_by_qid.values() for t in ts})
    dfs: dict[str, int] = {}
    if uniq:
        want = pa.array(uniq, pa.string())

        def lookup(batch: pa.Table) -> pa.Table:
            hit = batch.filter(pc.is_in(batch.column("term"), want))
            return hit.select(["term", "df"])

        for b in (
            _dict_ds(index_dir)
            .map_batches(lookup, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            dfs.update(
                zip(b.column("term").to_pylist(),
                    b.column("df").to_pylist())
            )
    rows = []
    bs = max(1, cfg.block_size)
    for qid, _text in queries:
        ts = terms_by_qid[qid]
        d = [dfs.get(t, 0) for t in ts]
        rows.append(
            (
                qid,
                len(ts),
                int(sum(x for x in d if x > 0)),
                route_mode(d, top_k, bs),
            )
        )
    return pd.DataFrame(
        rows, columns=["qid", "n_terms", "est_candidates", "mode"]
    ).astype({"n_terms": np.int64, "est_candidates": np.int64})


def decay_queries(queries_ds, index_dir: str, col: str, *,
                  origin: float, scale: float, offset: float = 0.0,
                  decay: float = 0.5, kind: str = "gauss",
                  top_k: int = 10, match: str = "or", filter_pred=None,
                  n_shards: int = SEARCH_SHARDS):
    """ES function_score decay functions (gauss / exp / linear on a
    numeric docvalue — the recency/proximity boost of web ranking):

        d      = max(0, |value - origin| - offset)
        gauss  : factor = exp((ln(decay) / (scale * scale)) * (d * d))
        exp    : factor = exp((ln(decay) / scale) * d)
        linear : factor = max(0, (s - d) / s),  s = scale / (1 - decay)
        final  = BM25 * factor      (score_mode=multiply)

    Docs lacking the docvalue keep their BM25 score (factor 1 — the
    field_value_factor missing->1 convention). Float ops are pinned to
    the SQL oracle text; ln and exp are evaluated per DISTINCT argument
    with scalar math.log/math.exp (both measured bit-identical to
    DuckDB's ln()/exp(); numpy's SIMD variants differ by 1 ulp).

    Exact shard merge: the factor is a per-document property, so
    per-shard (rescored, local top-k) partials are a superset of the
    global top-k under the (final desc, docID asc) order."""
    import math

    import pandas as pd

    if kind not in ("gauss", "exp", "linear"):
        raise ValueError(f"kind must be gauss/exp/linear, got {kind!r}")
    if not 0 < decay < 1:
        raise ValueError("decay must be in (0, 1)")
    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    from webindex.serve import shard_salt_bounds

    bounds = shard_salt_bounds(index_dir, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def _factors(v: np.ndarray) -> np.ndarray:
        d = np.maximum(0.0, np.abs(v - origin) - offset)
        if kind == "linear":
            s = scale / (1.0 - decay)
            return np.maximum(0.0, (s - d) / s)
        if kind == "gauss":
            lam = math.log(decay) / (scale * scale)
            args = lam * (d * d)
        else:
            lam = math.log(decay) / scale
            args = lam * d
        uniq, inv = np.unique(args, return_inverse=True)
        ex = np.fromiter(
            (math.exp(a) for a in uniq.tolist()), np.float64, uniq.size
        )
        return ex[inv]

    def decay_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, top_k, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        dl_ids = s.reader._dl_ids
        qid_out, id_out, sc_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            terms = s.an.tokens(text or "")
            # full shard ranking: theta bounds are invalid under a
            # per-doc multiplier (a decayed doc can outrank an undecayed
            # one WAND would keep), so rescore the whole match set
            ids, scores = s._ranked(
                terms, max(int(dl_ids.size), 1), force_exhaustive=True
            )
            if ids.size == 0:
                continue
            pos = np.searchsorted(dl_ids, ids)
            ok = valid[pos]
            factor = np.ones(ids.size, dtype=np.float64)
            factor[ok] = _factors(vals_np[pos[ok]])
            final = scores * factor
            from webindex.wand import _rank_topk

            tids, tsc = _rank_topk(ids, final, top_k)
            qid_out.extend([qid] * tids.size)
            id_out.append(tids)
            sc_out.append(tsc)
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
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(decay_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )


def terms_set_queries(queries_ds, index_dir: str, m_col: str, *,
                      top_k: int = 10, m_mod: int = 3,
                      n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) -> runs: the ES ``terms_set`` query with
    ``minimum_should_match_field`` — each DOC carries its own required
    match count, here derived from the ``m_col`` integer docvalue as
    ``(value % m_mod) + 1`` (a pinned per-doc requirement both engines
    re-derive); a doc matches when it contains at least that many
    DISTINCT query terms, scored as the ordinary OR-match BM25 sum of
    the present terms (ascending unicode). Docs lacking the docvalue
    never match (ES missing-field semantics).

    Per shard: one scatter pass accumulates both the distinct-term count
    and the score over the union candidate set; the per-doc cut composes
    with the exact (score desc, docID asc) scatter-gather merge because
    the requirement is a per-document property."""
    import pandas as pd

    from webindex.serve import shard_salt_bounds
    from webindex.wand import _dense, _rank_topk

    bounds = shard_salt_bounds(index_dir, n_shards)

    def ts_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, top_k, "auto", False)
        s = searcher.inner
        reader = s.reader
        reader._load_docvalues([m_col])
        arr, valid = reader._dv[m_col]
        mvals = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        dl_ids = reader._dl_ids
        q_out, id_out, sc_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            terms = sorted(set(s.an.tokens(text or "")))
            pls = [reader.postings(t) for t in terms]
            pls = [pl for pl in pls if pl is not None]
            if not pls:
                continue
            cand = pls[0].ids
            for pl in pls[1:]:
                cand = np.union1d(cand, pl.ids)
            scores = np.zeros(cand.size, dtype=np.float64)
            cnt = np.zeros(cand.size, dtype=np.int64)
            for pl in pls:  # ascending term order
                idx = np.searchsorted(pl.ids, cand)
                ok = idx < pl.ids.size
                ok[ok] &= pl.ids[np.minimum(idx, pl.ids.size - 1)][
                    ok
                ] == cand[ok]
                _dense(pl, reader)
                scores[ok] += pl.dense_contrib[idx[ok]]
                cnt[ok] += 1
            pos = np.searchsorted(dl_ids, cand)
            ok_dv = valid[pos]
            req = (mvals[pos] % m_mod) + 1
            keep = ok_dv & (cnt >= req)
            ids, sc = _rank_topk(cand[keep], scores[keep], top_k)
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

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["did"] = g["doc_id"].astype(str)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "did", "doc_id", "score", "rank"]]

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(ts_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )


def _additive_dv_queries(queries_ds, index_dir: str, col: str, contrib_fn, *,
                         top_k: int, match: str, filter_pred,
                         n_shards: int):
    """Shared kernel for ADDITIVE docvalue feature queries — the ES
    ``rank_feature`` / ``distance_feature`` clauses inside a bool
    ``should``: every doc in the BM25 match set scores

        final = bm25 + contrib(docvalue)

    and docs missing the docvalue keep bare BM25 (contribution 0, the ES
    missing-field convention: a rank_feature should-clause that cannot
    match contributes nothing and never filters).

    WAND/theta bounds are invalid under a per-doc bonus (a boosted doc
    can outrank one the pruner would keep), so each shard rescored its
    whole match set (force_exhaustive) and emits a local top-k; the
    bonus is a per-document property, so the exact (score desc, docID
    asc) scatter-gather merge proof of ``decay_queries`` carries over
    unchanged. Float-op order inside ``contrib_fn`` is pinned to the SQL
    oracle text (driver_queries SQL_RANK_FEATURE_* — single adds/divides
    are engine-portable; ln is evaluated per DISTINCT argument with
    scalar math.log, measured bit-identical to DuckDB's ln())."""
    import pandas as pd

    from webindex.serve import shard_salt_bounds
    from webindex.wand import _rank_topk

    filter_pred = (
        tuple(tuple(c) for c in filter_pred) if filter_pred else None
    )
    bounds = shard_salt_bounds(index_dir, n_shards)

    def feat_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, top_k, "auto", False)
        searcher.inner.set_constraints(filter_pred, match)
        s = searcher.inner
        s.reader._load_docvalues([col])
        arr, valid = s.reader._dv[col]
        vals_np = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        dl_ids = s.reader._dl_ids
        qid_out, id_out, sc_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            terms = s.an.tokens(text or "")
            ids, scores = s._ranked(
                terms, max(int(dl_ids.size), 1), force_exhaustive=True
            )
            if ids.size == 0:
                continue
            pos = np.searchsorted(dl_ids, ids)
            ok = valid[pos]
            final = scores.copy()
            if ok.any():
                final[ok] = scores[ok] + contrib_fn(vals_np[pos[ok]])
            tids, tsc = _rank_topk(ids, final, top_k)
            qid_out.extend([qid] * tids.size)
            id_out.append(tids)
            sc_out.append(tsc)
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
        .map_groups(feat_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )


def rank_feature_queries(queries_ds, index_dir: str, col: str, *,
                         function: str = "saturation", pivot: float = None,
                         boost: float = 1.0, scaling: float = 1.0,
                         exponent: int = 2, top_k: int = 10,
                         match: str = "or", filter_pred=None,
                         n_shards: int = SEARCH_SHARDS):
    """The ES ``rank_feature`` query (static-signal boosting — how web
    search folds pagerank/url_length/freshness features into BM25):

        saturation : final = bm25 + boost * (v / (v + pivot))
        log        : final = bm25 + boost * ln(scaling * v + 1)
        sigmoid    : final = bm25 + boost * (v^e / (v^e + pivot^e))

    ``log`` is the exact ES/Lucene form (scaling_factor * S + 1 inside
    the ln), so scaling scales the FEATURE, not an additive offset.

    ``v`` is the ``col`` docvalue; ``e`` (sigmoid) is a positive INTEGER
    exponent evaluated by repeated multiplication so the float op
    sequence is engine-portable (pow() bit-identity across engines is
    not established; repeated multiply is). Reference analog: the
    function_score composition SGPT's web-ranking notebooks delegate to
    ES (SURVEY.md §2.6); sibling of web_rank_top10's linear blend."""
    import math

    if function not in ("saturation", "log", "sigmoid"):
        raise ValueError(
            f"function must be saturation/log/sigmoid, got {function!r}"
        )
    if function in ("saturation", "sigmoid"):
        if pivot is None or not pivot > 0:
            raise ValueError("pivot must be > 0")
    e = int(exponent)
    if function == "sigmoid" and e < 1:
        raise ValueError("exponent must be a positive integer")

    if function == "saturation":
        def contrib(v: np.ndarray) -> np.ndarray:
            return boost * (v / (v + pivot))
    elif function == "log":
        def contrib(v: np.ndarray) -> np.ndarray:
            args = scaling * v + 1.0
            uniq, inv = np.unique(args, return_inverse=True)
            ln = np.fromiter(
                (math.log(a) for a in uniq.tolist()), np.float64, uniq.size
            )
            return boost * ln[inv]
    else:
        pe = 1.0
        for _ in range(e):
            pe = pe * pivot

        def contrib(v: np.ndarray) -> np.ndarray:
            ve = v.copy()
            for _ in range(e - 1):
                ve = ve * v
            return boost * (ve / (ve + pe))

    return _additive_dv_queries(
        queries_ds, index_dir, col, contrib, top_k=top_k, match=match,
        filter_pred=filter_pred, n_shards=n_shards,
    )


def distance_feature_queries(queries_ds, index_dir: str, col: str, *,
                             origin: float, pivot: float,
                             boost: float = 1.0, top_k: int = 10,
                             match: str = "or", filter_pred=None,
                             n_shards: int = SEARCH_SHARDS):
    """The ES ``distance_feature`` query (recency/proximity boosting):

        final = bm25 + boost * (pivot / (pivot + |v - origin|))

    over a numeric/timestamp docvalue ``v``. Unlike function_score decay
    (multiplicative, decay_queries) this is ADDITIVE — a far doc keeps
    its full BM25 score; only the bonus fades."""
    if not pivot > 0:
        raise ValueError("pivot must be > 0")

    def contrib(v: np.ndarray) -> np.ndarray:
        d = np.abs(v - origin)
        return boost * (pivot / (pivot + d))

    return _additive_dv_queries(
        queries_ds, index_dir, col, contrib, top_k=top_k, match=match,
        filter_pred=filter_pred, n_shards=n_shards,
    )


def pinned_queries(queries_ds, index_dir: str, pinned: dict, *,
                   top_k: int = 10, match: str = "or",
                   n_shards: int = SEARCH_SHARDS):
    """The ES ``pinned`` query (promoted results): per qid, the ids in
    ``pinned[qid]`` rank FIRST in the given order (provided they exist
    in the index — ES pins docs even when they don't match the organic
    query), then the organic BM25 ranking fills the remaining slots,
    pinned ids excluded. Pinned docs report their organic BM25 score
    when they match and 0.0 otherwise, with ``pinned=1``.

    Shard shape: each shard returns (a) any pinned docs it OWNS (docID
    membership in its doclen subset) scored by the same ascending-term
    fold as the OR scorer, and (b) its post-exclusion organic top-k from
    a top-(k + |pins|) fetch — a superset of the global organic fill by
    the usual exchange argument, so the scatter-gather merge is exact.
    The organic path keeps WAND pruning (no exhaustive rescore: pinning
    permutes ranks but never alters organic scores)."""
    import pandas as pd

    from webindex.serve import shard_salt_bounds
    from webindex.wand import _dense

    pinned = {q: list(ids) for q, ids in pinned.items()}
    bounds = shard_salt_bounds(index_dir, n_shards)
    _ORG_POS = 1 << 31

    def pin_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, top_k, "auto", False)
        s = searcher.inner
        dl_ids = s.reader._dl_ids
        rows = {"qid": [], "doc_id": [], "score": [], "pinned": [],
                "pin_pos": []}
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            pins = pinned.get(qid, [])
            terms = s.an.tokens(text or "")
            # (a) pinned docs owned by this shard, scored by the same
            # ascending-term fold as the OR scorer
            owned = []
            for pos, did in enumerate(pins):
                j = int(np.searchsorted(dl_ids, did))
                if j < dl_ids.size and dl_ids[j] == did:
                    owned.append((pos, did))
            if owned:
                od = np.array([d for _, d in owned], np.int64)
                order = np.argsort(od)
                od_sorted = od[order]
                sc = np.zeros(od.size, dtype=np.float64)
                for t in sorted(set(terms)):
                    pl = s.reader.postings(t)
                    if pl is None:
                        continue
                    idx = np.searchsorted(pl.ids, od_sorted)
                    ok = idx < pl.ids.size
                    ok[ok] &= pl.ids[np.minimum(idx, pl.ids.size - 1)][
                        ok
                    ] == od_sorted[ok]
                    _dense(pl, s.reader)
                    sc_sorted = np.zeros(od.size, np.float64)
                    sc_sorted[ok] = pl.dense_contrib[idx[ok]]
                    inv = np.empty(od.size, np.int64)
                    inv[order] = np.arange(od.size)
                    sc += sc_sorted[inv]
                for (pos, did), v in zip(owned, sc.tolist()):
                    rows["qid"].append(qid)
                    rows["doc_id"].append(did)
                    rows["score"].append(v)
                    rows["pinned"].append(1)
                    rows["pin_pos"].append(pos)
            # (b) organic top-k after excluding the pinned ids
            ids, scores = s._ranked(terms, top_k + len(pins), False)
            if ids.size:
                keep = ~np.isin(ids, np.array(pins, np.int64)) \
                    if pins else np.ones(ids.size, bool)
                ids, scores = ids[keep][:top_k], scores[keep][:top_k]
                rows["qid"].extend([qid] * ids.size)
                rows["doc_id"].extend(ids.tolist())
                rows["score"].extend(scores.tolist())
                rows["pinned"].extend([0] * ids.size)
                rows["pin_pos"].extend([_ORG_POS] * ids.size)
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.string()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
                "pinned": pa.array(rows["pinned"], pa.int64()),
                "pin_pos": pa.array(rows["pin_pos"], pa.int64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        pin = g[g["pinned"] == 1].sort_values("pin_pos",
                                              kind="mergesort")
        org = g[g["pinned"] == 0].sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        out = pd.concat([pin, org], ignore_index=True).head(top_k)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
        return out[["qid", "doc_id", "score", "pinned", "rank"]]

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pin_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )
