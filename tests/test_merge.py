"""Index merge == from-scratch build over the union (rank + score identity).

Two halves of the synthetic pages corpus are built separately (disjoint
docID spaces fall out of shard-packed ids over disjoint URL sets only if
shards differ — here we split BY SHARD to guarantee disjointness), merged,
and compared against one build over everything.
"""

import numpy as np
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.docids import SHARD_BITS
from webindex.merge import merge_indexes
from webindex.synth import synth_pages_table, synth_queries_table

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())
NUM_SHARDS = 16


@pytest.mark.usefixtures("ray_session")
def test_merge_equals_full_build(tmp_path):
    import ray.data as rd

    from webindex.build import build_index
    from webindex.pipelines.corpus import prepare_corpus_from_pages
    from webindex.search import SearcherActor

    pages = rd.from_arrow(
        synth_pages_table(300, seed=5)
    ).drop_columns(["text"])
    corpus = prepare_corpus_from_pages(pages, num_shards=NUM_SHARDS)
    corpus = corpus.materialize()

    # split by shard parity — guaranteed-disjoint docID spaces
    def half(par):
        return corpus.map_batches(
            lambda df, par=par: df[(df["doc_id"] // (1 << SHARD_BITS)) % 2 == par],
            batch_format="pandas",
        )

    full_idx = str(tmp_path / "full")
    a_idx = str(tmp_path / "a")
    b_idx = str(tmp_path / "b")
    m_idx = str(tmp_path / "merged")
    build_index(corpus, full_idx, CFG)
    build_index(half(0), a_idx, CFG)
    build_index(half(1), b_idx, CFG)
    merge_indexes([a_idx, b_idx], m_idx)

    from webindex.util import read_json

    sf, sm = read_json(f"{full_idx}/stats.json"), read_json(f"{m_idx}/stats.json")
    assert sm["N"] == sf["N"]
    assert sm["total_tokens"] == sf["total_tokens"]
    assert abs(sm["avgdl"] - sf["avgdl"]) < 1e-12

    s_full = SearcherActor(full_idx, top_k=50, mode="exhaustive")
    s_merged = SearcherActor(m_idx, top_k=50, mode="wand")
    for qid, text in zip(*[
        synth_queries_table(n=12).column(c).to_pylist() for c in ("qid", "text")
    ]):
        ids_f, sc_f = s_full.search_one(qid, text)
        ids_m, sc_m = s_merged.search_one(qid, text)
        assert ids_f.tolist() == ids_m.tolist(), qid
        assert np.allclose(sc_f, sc_m, atol=1e-12), qid


@pytest.mark.usefixtures("ray_session")
def test_merge_positional_indexes(tmp_path):
    """Merging positional builds re-encodes positions from the relay: the
    merged index answers index-only phrase queries identically to one
    positional build over everything."""
    import dataclasses

    import ray.data as rd

    from webindex.build import build_index
    from webindex.pipelines.corpus import prepare_corpus_from_pages
    from webindex.positional import phrase_topk
    from webindex.segments import SegmentReader

    cfg = dataclasses.replace(CFG, store_positions=True)
    pages = rd.from_arrow(
        synth_pages_table(200, seed=5)
    ).drop_columns(["text"])
    corpus = prepare_corpus_from_pages(pages, num_shards=NUM_SHARDS)
    corpus = corpus.materialize()

    def half(par):
        return corpus.map_batches(
            lambda df, par=par: df[(df["doc_id"] // (1 << SHARD_BITS)) % 2 == par],
            batch_format="pandas",
        )

    full_idx = str(tmp_path / "pfull")
    a_idx = str(tmp_path / "pa")
    b_idx = str(tmp_path / "pb")
    m_idx = str(tmp_path / "pmerged")
    build_index(corpus, full_idx, cfg)
    build_index(half(0), a_idx, cfg)
    build_index(half(1), b_idx, cfg)
    merge_indexes([a_idx, b_idx], m_idx)

    rf, rm = SegmentReader(full_idx), SegmentReader(m_idx)
    rf.preload(), rm.preload()
    # phrases drawn from a real doc's analyzed tokens (the default
    # analyzer stems + drops stopwords, so hand-picked words may vanish)
    from webindex.analyze import Analyzer

    an = Analyzer(cfg.analyzer)
    row = corpus.take(1)[0]
    toks = an.tokens(row["text"])
    assert len(toks) >= 3
    hit = 0
    for phrase in ([toks[0]], toks[0:2], toks[1:3], [toks[0], "zzznope"]):
        idf, scf = phrase_topk(rf, phrase, 20)
        idm, scm = phrase_topk(rm, phrase, 20)
        assert idf.tolist() == idm.tolist(), phrase
        assert np.allclose(scf, scm, atol=1e-12), phrase
        hit += idf.size
    assert hit > 0, "fixture produced no phrase hits"


def test_merge_rejects_analyzer_mismatch(tmp_path):
    import json
    import os

    a = tmp_path / "a"
    b = tmp_path / "b"
    for d, stem in ((a, True), (b, False)):
        os.makedirs(d)
        cfg = IndexConfig(analyzer=AnalyzerConfig(stem=stem))
        json.dump(cfg.to_dict(), open(d / "config.json", "w"))
    with pytest.raises(ValueError, match="different analyzers"):
        merge_indexes([str(a), str(b)], str(tmp_path / "out"))
