"""Command-line entry points: ``python -m webindex <cmd>``.

Commands:
  build   --pages DIR --out DIR [--stemmed/--no-stem] [--num-shards N]
          [--positions]
  search  --index DIR --query "text" [--top-k K] [--mode auto|wand|exhaustive]
          [--match or|and] [--phrase] [--filter "col==val" ...]
  msearch --index DIR --queries FILE.jsonl --out runs.parquet [--top-k K]
          [--match or|and] [--phrase] [--filter "col==val" ...]
  eval    --runs runs.parquet --qrels qrels.tsv [--k 10 ...]
  merge   --inputs IDX1 IDX2 ... --out DIR
  delete  --index DIR --doc-ids ID [ID ...]     (tombstone; live searchers
          hide the docs immediately, stats unchanged until compact)
  compact --index DIR --out DIR                 (rewrite without tombstoned
          docs, stats/df/block maxima recomputed; resumable)
  refresh --index OLD --pages DELTA_DIR --out DIR  (incremental re-crawl:
          new/newer pages get a delta index merged in, superseded docs are
          tombstoned; needs an index built with build --urlmap)
  check   --index DIR   (integrity fsck: re-derives dictionary/stats/block
          metadata from the segments through the codec; exit 1 on damage)
  suggest --index DIR --prefix P [--prefix P2 ...] [--top-k K]
          (completion suggester over the dict sidecar)
  mlt     --index DIR --doc-id ID --text "..." [--top-k K] [--max-terms N]
          (more-like-this: tf-idf term selection + BM25, seed excluded)

Filter clauses are ``col OP value`` with OP in ==, !=, <=, >=, <, >
(value coerced to int/float when it parses as one); repeat --filter for
a conjunction. --phrase needs a positional index (build --positions) —
for position-free indexes use the library's lazy-verification path
(webindex.phrase.phrase_search), which also needs the corpus text.

Owns its Ray session (the only scripts allowed to: CLAUDE.md invariants);
the driver contract in __ray_entry__.py never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import os

    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS=local (sandbox default) starts a private instance;
        # inside a `ray job submit` entrypoint the runtime sets RAY_ADDRESS
        # to the cluster address and this connects instead of nesting a
        # local instance
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


_FILTER_OPS = ("==", "!=", "<=", ">=", "<", ">")


def _parse_filters(clauses):
    """["lang==en", "n_chars>=200"] -> filter_pred tuple (None if empty)."""
    if not clauses:
        return None
    pred = []
    for c in clauses:
        for op in _FILTER_OPS:  # two-char ops first
            col, sep, val = c.partition(op)
            if sep:
                val = val.strip()
                for cast in (int, float):
                    try:
                        val = cast(val)
                        break
                    except ValueError:
                        pass
                pred.append((col.strip(), op, val))
                break
        else:
            raise SystemExit(f"bad --filter clause {c!r} (need col OP value)")
    return tuple(pred)


def cmd_build(args) -> int:
    _init_ray()
    import ray.data as rd

    from webindex.build import build_index
    from webindex.config import SQL_SAFE_ANALYZER, AnalyzerConfig, IndexConfig
    from webindex.pipelines import prepare_corpus_from_pages

    cfg = IndexConfig(
        analyzer=AnalyzerConfig() if args.stemmed else SQL_SAFE_ANALYZER,
        store_positions=args.positions,
    )
    pages = rd.read_parquet(args.pages, override_num_blocks=64)
    if "text" in pages.schema().names:
        pages = pages.drop_columns(["text"])
    if args.urlmap:
        from webindex.refresh import build_with_urlmap

        stats = build_with_urlmap(pages, args.out, cfg,
                                  num_shards=args.num_shards)
    else:
        corpus = prepare_corpus_from_pages(pages, num_shards=args.num_shards)
        stats = build_index(corpus, args.out, cfg)
    print(json.dumps(stats))
    return 0


def cmd_refresh(args) -> int:
    _init_ray()
    import ray.data as rd

    from webindex.refresh import refresh_index

    pages = rd.read_parquet(args.pages, override_num_blocks=64)
    if "text" in pages.schema().names:
        pages = pages.drop_columns(["text"])
    summary = refresh_index(args.index, pages, args.out)
    print(json.dumps(summary))
    return 0


def _parse_boosts(clauses):
    """["data=2.0", "merge=3"] -> {term: weight} (None if empty)."""
    if not clauses:
        return None
    out = {}
    for c in clauses:
        term, sep, w = c.partition("=")
        if not sep:
            raise SystemExit(f"bad --boost clause {c!r} (need TERM=WEIGHT)")
        out[term.strip()] = float(w)
    return out


def cmd_search(args) -> int:
    from webindex.search import SearcherActor

    s = SearcherActor(
        args.index, top_k=args.top_k, mode=args.mode,
        filter_pred=_parse_filters(args.filter), match=args.match,
        query_kind="phrase" if args.phrase else "match",
        min_match=args.min_match, boosts=_parse_boosts(args.boost),
    )
    ids, scores = s.search_one("cli", args.query)
    for rank, (d, sc) in enumerate(zip(ids.tolist(), scores.tolist()), 1):
        print(f"{rank}\t{d}\t{sc:.6f}")
    return 0


def cmd_intervals(args) -> int:
    """Lucene intervals query (ES intervals-JSON spec) over a
    positional index."""
    _init_ray()

    from webindex.intervals import intervals_search

    spec = json.loads(args.spec)
    runs = intervals_search([("cli", spec)], args.index,
                            top_k=args.top_k)
    for r in sorted(runs.take_all(), key=lambda r: r["rank"]):
        print(f"{r['rank']}\t{r['doc_id']}\t{r['score']:.6f}")
    return 0


def cmd_msearch(args) -> int:
    _init_ray()

    from webindex.search import search_queries
    from webindex.sources import read_beir_queries

    queries = read_beir_queries(args.queries)
    runs = search_queries(
        queries, args.index, top_k=args.top_k, mode=args.mode,
        filter_pred=_parse_filters(args.filter), match=args.match,
        query_kind="phrase" if args.phrase else "match",
        min_match=args.min_match, boosts=_parse_boosts(args.boost),
    )
    runs.write_parquet(args.out)
    print(json.dumps({"rows": runs.count(), "out": args.out}))
    return 0


def cmd_suggest(args) -> int:
    _init_ray()
    from webindex.lexicon import suggest

    out = suggest(args.index, args.prefix, k=args.top_k)
    for row in out.itertuples(index=False):
        print(f"{row.prefix}\t{row.rank}\t{row.term}\t{row.df}")
    return 0


def cmd_mlt(args) -> int:
    _init_ray()
    import pyarrow as pa
    import ray.data as rd

    from webindex.lexicon import more_like_this

    seeds = rd.from_arrow(
        pa.table({"doc_id": pa.array([args.doc_id], pa.int64()),
                  "text": pa.array([args.text])})
    )
    runs = more_like_this(
        seeds, args.index, top_k=args.top_k,
        max_query_terms=args.max_terms,
    ).to_pandas().sort_values("rank")
    for row in runs.itertuples(index=False):
        print(f"{row.rank}\t{row.doc_id}\t{row.score:.6f}")
    return 0


def cmd_dym(args) -> int:
    """Whole-query did-you-mean (the ES phrase suggester)."""
    _init_ray()
    from webindex.lexicon import phrase_suggest

    out = phrase_suggest(args.index, [("q", args.query)])
    row = out.iloc[0]
    print(f"{row['suggestion']}\t{int(row['n_corrected'])} corrected")
    return 0


def cmd_keywords(args) -> int:
    """Per-document TextRank keywords over pasted text."""
    import pyarrow as pa

    from webindex.textstats import textrank_keywords

    _init_ray()
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([args.text])})
    )
    out = textrank_keywords(ds, top_k=args.top_k).to_pandas()
    for row in out.sort_values("rank").itertuples(index=False):
        print(f"{row.rank}\t{row.term}\t{row.score_q}")
    return 0


def cmd_eval(args) -> int:
    _init_ray()
    import pyarrow.dataset as pads
    import ray.data as rd

    from webindex.eval import evaluate_runs
    from webindex.sources import read_qrels_tsv

    runs = pads.dataset(args.runs).to_table().to_pandas()
    if "did" not in runs.columns:
        runs["did"] = runs["doc_id"].astype(str)
    qrels = read_qrels_tsv(args.qrels).to_pandas()
    _, macro = evaluate_runs(rd.from_pandas(runs), qrels, k_values=args.k)
    print(json.dumps(macro))
    return 0


def cmd_merge(args) -> int:
    _init_ray()

    from webindex.merge import merge_indexes

    stats = merge_indexes(args.inputs, args.out)
    print(json.dumps(stats))
    return 0


def cmd_delete(args) -> int:
    from webindex.lifecycle import delete_docs, read_deletes

    n = delete_docs(args.index, args.doc_ids)
    print(json.dumps({
        "tombstoned": n,
        "total_tombstones": int(read_deletes(args.index).size),
    }))
    return 0


def cmd_compact(args) -> int:
    _init_ray()

    from webindex.lifecycle import compact_index

    stats = compact_index(args.index, args.out)
    print(json.dumps(stats))
    return 0


def cmd_check(args) -> int:
    _init_ray()

    from webindex.fsck import check_index

    report = check_index(args.index)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="webindex")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--stemmed", action=argparse.BooleanOptionalAction,
                   default=True)
    b.add_argument("--num-shards", type=int, default=64)
    b.add_argument("--positions", action="store_true",
                   help="store term positions (index-only phrase queries)")
    b.add_argument("--urlmap", action="store_true",
                   help="persist the urlmap sidecar (enables refresh)")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--top-k", type=int, default=10)
    s.add_argument("--mode", default="auto")
    s.add_argument("--match", choices=["or", "and"], default="or")
    s.add_argument("--phrase", action="store_true",
                   help="phrase query (needs a --positions index)")
    s.add_argument("--filter", action="append", default=[],
                   metavar="COL_OP_VAL",
                   help="docvalues clause like lang==en (repeatable)")
    s.add_argument("--min-match", type=int, default=None, dest="min_match",
                   help="require >= N distinct query terms per doc")
    s.add_argument("--boost", action="append", default=[],
                   metavar="TERM=WEIGHT",
                   help="per-term score boost (repeatable)")
    s.set_defaults(fn=cmd_search)

    m = sub.add_parser("msearch")
    m.add_argument("--index", required=True)
    m.add_argument("--queries", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--top-k", type=int, default=1000)
    m.add_argument("--mode", default="auto")
    m.add_argument("--match", choices=["or", "and"], default="or")
    m.add_argument("--phrase", action="store_true",
                   help="phrase query (needs a --positions index)")
    m.add_argument("--filter", action="append", default=[],
                   metavar="COL_OP_VAL",
                   help="docvalues clause like lang==en (repeatable)")
    m.add_argument("--min-match", type=int, default=None, dest="min_match",
                   help="require >= N distinct query terms per doc")
    m.add_argument("--boost", action="append", default=[],
                   metavar="TERM=WEIGHT",
                   help="per-term score boost (repeatable)")
    m.set_defaults(fn=cmd_msearch)

    sg = sub.add_parser("suggest")
    sg.add_argument("--index", required=True)
    sg.add_argument("--prefix", action="append", required=True,
                    help="completion prefix (repeatable)")
    sg.add_argument("--top-k", type=int, default=10)
    sg.set_defaults(fn=cmd_suggest)

    ml = sub.add_parser("mlt")
    ml.add_argument("--index", required=True)
    ml.add_argument("--doc-id", type=int, required=True, dest="doc_id")
    ml.add_argument("--text", required=True,
                    help="the seed document's text")
    ml.add_argument("--top-k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=25, dest="max_terms")
    ml.set_defaults(fn=cmd_mlt)

    dy = sub.add_parser("dym")
    dy.add_argument("--index", required=True)
    dy.add_argument("--query", required=True)
    dy.set_defaults(fn=cmd_dym)

    kw = sub.add_parser("keywords")
    kw.add_argument("--text", required=True)
    kw.add_argument("--top-k", type=int, default=5)
    kw.set_defaults(fn=cmd_keywords)

    iv = sub.add_parser("intervals")
    iv.add_argument("--index", required=True)
    iv.add_argument("--spec", required=True,
                    help='ES intervals JSON, e.g. {"match": {"query": '
                         '"a b", "ordered": true, "max_gaps": 2}}')
    iv.add_argument("--top-k", type=int, default=10, dest="top_k")
    iv.set_defaults(fn=cmd_intervals)

    e = sub.add_parser("eval")
    e.add_argument("--runs", required=True)
    e.add_argument("--qrels", required=True)
    e.add_argument("--k", type=int, nargs="+", default=[10])
    e.set_defaults(fn=cmd_eval)

    g = sub.add_parser("merge")
    g.add_argument("--inputs", nargs="+", required=True)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=cmd_merge)

    d = sub.add_parser("delete")
    d.add_argument("--index", required=True)
    d.add_argument("--doc-ids", type=int, nargs="+", required=True,
                   dest="doc_ids")
    d.set_defaults(fn=cmd_delete)

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_compact)

    r = sub.add_parser("refresh")
    r.add_argument("--index", required=True)
    r.add_argument("--pages", required=True)
    r.add_argument("--out", required=True)
    r.set_defaults(fn=cmd_refresh)

    k = sub.add_parser("check")
    k.add_argument("--index", required=True)
    k.set_defaults(fn=cmd_check)

    args = p.parse_args(argv)
    # validate index paths up front: a missing/garbage --index otherwise
    # surfaces as a raw TypeError from deep inside the segment reader
    import os

    for attr in ("index", "inputs"):
        paths = getattr(args, attr, None)
        if paths is None:
            continue
        for d in paths if isinstance(paths, list) else [paths]:
            if not os.path.isfile(os.path.join(d, "manifest.json")):
                print(
                    f"error: {d!r} is not a webindex index directory "
                    "(no manifest.json)",
                    file=sys.stderr,
                )
                return 2
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
