"""Index rollover + alias search (webindex.rollover).

The load-bearing claim: alias search across time-partitioned member
indices with search_type=dfs_query_then_fetch is BIT-IDENTICAL (ranks and
scores) to searching one index built over the union corpus — the merged
statistics reproduce the union build's N/avgdl/df exactly, BM25
contributions depend only on (tf, dl, global stats), and the summation
order is pinned. Also covered: the ES default query_then_fetch actually
diverges (local idf), rollover_build's staged bucket partitioning, and
ingest's max_docs rollover condition (append-merge vs new generation).
"""

import numpy as np
import pandas as pd
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.rollover import (
    alias_index_dirs,
    alias_search,
    build_alias,
    dfs_stats,
    ingest,
    read_alias,
    rollover_build,
)
from webindex.synth import synth_pages_table, synth_queries_table

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())
NUM_SHARDS = 16


def _corpus(n=300, seed=11):
    import ray.data as rd

    from webindex.pipelines.corpus import prepare_corpus_from_pages

    pages = rd.from_arrow(synth_pages_table(n, seed=seed)).drop_columns(
        ["text"]
    )
    return prepare_corpus_from_pages(
        pages, num_shards=NUM_SHARDS
    ).select_columns(["doc_id", "text"]).materialize()


def _parts_mod3(corpus):
    def part(r):
        return corpus.map_batches(
            lambda df, r=r: df[df["doc_id"] % 3 == r], batch_format="pandas"
        )

    return {f"idx-m{r}": part(r) for r in range(3)}


def _queries_ds(n=10):
    import ray.data as rd

    return rd.from_arrow(synth_queries_table(n=n))


def _runs_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["qid", "rank"]).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_alias_dfs_bit_identical_to_union_build(tmp_path):
    from webindex.build import build_index
    from webindex.search import search_queries

    corpus = _corpus()
    union_idx = str(tmp_path / "union")
    build_index(corpus, union_idx, CFG)

    root = str(tmp_path / "alias")
    dirs = build_alias(root, _parts_mod3(corpus), CFG)
    assert len(dirs) == 3 and alias_index_dirs(root) == sorted(dirs)

    want = _runs_df(search_queries(_queries_ds(), union_idx, top_k=20))
    got = _runs_df(alias_search(_queries_ds(), root, top_k=20))
    assert got["qid"].tolist() == want["qid"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # bit-identical scores, not just close: merged stats == union stats
    # exactly, and every float op runs in the same order
    assert got["score"].tolist() == want["score"].tolist()

    # the dfs phase reproduces the union index's stats exactly
    from webindex.segments import SegmentReader
    from webindex.util import read_json

    r = SegmentReader(union_idx)
    terms = ["the", "merge", "fast"]
    st = dfs_stats(dirs, terms)
    u = read_json(f"{union_idx}/stats.json")
    assert st["N"] == u["N"] and st["avgdl"] == u["avgdl"]
    for t in terms:
        assert st["dfs"].get(t, 0) == r.df(t), t


@pytest.mark.usefixtures("ray_session")
def test_query_then_fetch_uses_local_stats(tmp_path):
    """ES's cheaper default skips the dfs phase — member-local idf/avgdl.
    With skewed partitions the two search types must actually differ,
    and a plain per-member search must equal its query_then_fetch slice
    (no stats leak through the worker-cached shard searchers)."""
    corpus = _corpus(240, seed=7)
    root = str(tmp_path / "alias")
    # skew: member 0 gets 2/3 of the corpus
    def part(lo, hi):
        return corpus.map_batches(
            lambda df, lo=lo, hi=hi: df[(df["doc_id"] % 3 >= lo)
                                        & (df["doc_id"] % 3 < hi)],
            batch_format="pandas",
        )

    build_alias(root, {"idx-a": part(0, 2), "idx-b": part(2, 3)}, CFG)

    dfs_runs = _runs_df(alias_search(_queries_ds(6), root, top_k=15))
    qtf_runs = _runs_df(
        alias_search(_queries_ds(6), root, top_k=15,
                     search_type="query_then_fetch")
    )
    assert dfs_runs["score"].tolist() != qtf_runs["score"].tolist()

    # interleave a plain search on a member index: scores must be the
    # index-local ones even though alias searches (with overrides) ran
    # against the same worker-cached searchers before and after
    from webindex.search import search_queries

    member = f"{root}/idx-b"
    plain1 = _runs_df(search_queries(_queries_ds(6), member, top_k=15))
    _ = _runs_df(alias_search(_queries_ds(6), root, top_k=15))
    plain2 = _runs_df(search_queries(_queries_ds(6), member, top_k=15))
    assert plain1["score"].tolist() == plain2["score"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_rollover_build_buckets(tmp_path):
    """One staged partitioned-parquet pass, one member index per bucket
    value; alias search over the result == one union build."""
    from webindex.build import build_index
    from webindex.search import search_queries

    corpus = _corpus(200, seed=3)
    months = ["2024-01", "2024-02", "2024-03"]

    def add_month(df):
        df = df.copy()
        df["month"] = [months[int(d) % 3] for d in df["doc_id"]]
        return df

    with_bucket = corpus.map_batches(add_month, batch_format="pandas")
    root = str(tmp_path / "alias")
    dirs = rollover_build(with_bucket, root, "month", CFG)
    assert sorted(read_alias(root)["indices"]) == [
        f"idx-{m}" for m in months
    ]
    assert len(dirs) == 3

    union_idx = str(tmp_path / "union")
    build_index(corpus, union_idx, CFG)
    want = _runs_df(search_queries(_queries_ds(8), union_idx, top_k=10))
    got = _runs_df(alias_search(_queries_ds(8), root, top_k=10))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_ingest_rollover_condition(tmp_path):
    """max_docs trips a new generation; below it, batches append via the
    relay merge. The final alias is searchable and bit-matches a union
    build over every ingested batch."""
    import ray.data as rd

    from webindex.build import build_index
    from webindex.search import search_queries

    corpus_df = _corpus(150, seed=9).to_pandas()
    n1 = len(corpus_df) // 2          # gen-000001
    n2 = (len(corpus_df) - n1) // 2   # appends (N still < max_docs)
    b1, b2, b3 = (
        corpus_df.iloc[:n1],
        corpus_df.iloc[n1:n1 + n2],
        corpus_df.iloc[n1 + n2:],
    )
    max_docs = n1 + n2  # b2 appends; afterwards N == max_docs -> b3 rolls

    root = str(tmp_path / "alias")
    d1 = ingest(root, rd.from_pandas(b1), max_docs=max_docs, cfg=CFG)
    assert d1.endswith("gen-000001")
    d2 = ingest(root, rd.from_pandas(b2), max_docs=max_docs)
    assert d2.endswith("gen-000001-r1")  # append replaced the write index
    man = read_alias(root)
    assert man["indices"] == ["gen-000001-r1"]
    d3 = ingest(root, rd.from_pandas(b3), max_docs=max_docs)
    assert d3.endswith("gen-000002")  # rollover: condition met
    man = read_alias(root)
    assert sorted(man["indices"]) == ["gen-000001-r1", "gen-000002"]
    assert man["write_index"] == "gen-000002"

    from webindex.util import read_json

    assert read_json(f"{d2}/stats.json")["N"] == n1 + n2
    assert read_json(f"{d3}/stats.json")["N"] == len(corpus_df) - n1 - n2

    union_idx = str(tmp_path / "union")
    build_index(rd.from_pandas(corpus_df), union_idx, CFG)
    want = _runs_df(search_queries(_queries_ds(6), union_idx, top_k=12))
    got = _runs_df(alias_search(_queries_ds(6), root, top_k=12))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
