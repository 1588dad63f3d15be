"""Doc-partitioned sharded serving == single searcher, bit-identical."""

import numpy as np
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.synth import synth_pages_table, synth_queries_table

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())


@pytest.mark.usefixtures("ray_session")
def test_sharded_service_matches_single_searcher(tmp_path):
    import ray.data as rd

    from webindex.build import build_index
    from webindex.pipelines.corpus import prepare_corpus_from_pages
    from webindex.search import SearcherActor
    from webindex.serve import ShardedSearchService, _ShardSearcherImpl, merge_partials

    pages = rd.from_arrow(synth_pages_table(400, seed=11)).drop_columns(["text"])
    corpus = prepare_corpus_from_pages(pages, num_shards=32)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG)

    qtab = synth_queries_table(n=15)
    pairs = list(zip(qtab.column("qid").to_pylist(), qtab.column("text").to_pylist()))

    single = SearcherActor(idx, top_k=20, mode="exhaustive")

    # in-process sharded path first (no actor scheduling noise in asserts):
    # shards over salt space [0..15] (32 shards / shards_per_salt=2)
    shards = [
        _ShardSearcherImpl(idx, lo, hi, top_k=20)
        for lo, hi in ((0, 4), (5, 9), (10, 15))
    ]
    rows = [r for s in shards for r in s.search_batch(pairs)]
    merged = merge_partials(rows, 20)

    for qid, text in pairs:
        ids, scores = single.search_one(qid, text)
        got = merged[merged["qid"] == qid].sort_values("rank")
        assert got["doc_id"].tolist() == ids.tolist(), qid
        assert np.allclose(got["score"].to_numpy(), scores, atol=1e-12), qid

    # shard coverage sanity: every shard holds at least one resident term
    assert all(len(s.inner.reader._term_span) > 0 for s in shards)

    # the ray-actor service end to end
    svc = ShardedSearchService(idx, n_shards=3, top_k=20, mode="exhaustive")
    runs = svc.search(pairs)
    for qid, text in pairs:
        ids, _ = single.search_one(qid, text)
        got = runs[runs["qid"] == qid].sort_values("rank")
        assert got["doc_id"].tolist() == ids.tolist(), qid
