"""§5(d) parallelism invariance: the same corpus built at different
partition counts produces identical segments, dictionary, and query
results (the in-process analog of the N vs 4N cluster identity that
bench.py --scaling asserts via runs-table hashes)."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.synth import synth_pages_table

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())


def _seg_content(idx: str) -> pd.DataFrame:
    df = pads.dataset(os.path.join(idx, "segments")).to_table().to_pandas()
    cols = ["term", "salt", "block_id", "n", "last_doc_id",
            "doc_ids", "tfs", "max_tf_norm"]
    if "positions" in df.columns:
        cols.append("positions")
    return (
        df.sort_values(["term", "salt", "block_id"])
        .reset_index(drop=True)[cols]
    )


@pytest.mark.usefixtures("ray_session")
def test_index_identical_across_partitioning(tmp_path):
    import ray.data as rd

    from webindex.build import build_index
    from webindex.pipelines.corpus import prepare_corpus_from_pages

    tab = synth_pages_table(350, seed=9)
    outs = []
    for nparts in (1, 5):
        pages = rd.from_arrow(tab).repartition(nparts).drop_columns(["text"])
        corpus = prepare_corpus_from_pages(pages, num_shards=16)
        idx = str(tmp_path / f"idx{nparts}")
        build_index(corpus, idx, CFG)
        outs.append(idx)

    a, b = (_seg_content(i) for i in outs)
    pd.testing.assert_frame_equal(a, b)

    da, db = (
        pads.dataset(os.path.join(i, "dict")).to_table().to_pandas()
        .sort_values("term").reset_index(drop=True)
        for i in outs
    )
    pd.testing.assert_frame_equal(da, db)

    from webindex.util import read_json

    sa, sb = (read_json(os.path.join(i, "stats.json")) for i in outs)
    assert sa["N"] == sb["N"] and sa["avgdl"] == sb["avgdl"]


@pytest.mark.usefixtures("ray_session")
def test_positional_index_identical_across_partitioning(tmp_path):
    """Positions (per-posting delta+varbyte runs) are doc-local, so the
    positional segments must also be byte-identical at any partition
    count."""
    import dataclasses

    import ray.data as rd

    from webindex.build import build_index
    from webindex.pipelines.corpus import prepare_corpus_from_pages

    cfg = dataclasses.replace(CFG, store_positions=True)
    tab = synth_pages_table(200, seed=9)
    outs = []
    for nparts in (1, 4):
        pages = rd.from_arrow(tab).repartition(nparts).drop_columns(["text"])
        corpus = prepare_corpus_from_pages(pages, num_shards=16)
        idx = str(tmp_path / f"pidx{nparts}")
        build_index(corpus, idx, cfg)
        outs.append(idx)

    a, b = (_seg_content(i) for i in outs)
    assert "positions" in a.columns
    pd.testing.assert_frame_equal(a, b)


def test_new_curation_ops_partition_invariant(ray_session):
    """dup n-grams, contamination, unigram LM, source filter: identical
    output at different input block counts (the repo's
    determinism-under-parallelism invariant)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from webindex.dedup import contamination, cross_doc_dup_ngrams
    from webindex.textstats import source_level_filter, unigram_logprob

    path = "/root/testdata/sf0.001/documents.parquet"

    def run(blocks):
        docs = rd.read_parquet(
            path, columns=["doc_id", "text", "source"],
            override_num_blocks=blocks,
        )
        d2 = docs.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        )
        outs = {}
        outs["dup"] = cross_doc_dup_ngrams(d2, n=3, min_count=2)
        outs["contam"] = contamination(
            d2, [(0, "merge the stream window"), (1, "customer order")],
            n=3,
        )
        outs["lm"] = unigram_logprob(d2, n_parts=16)
        outs["src"] = source_level_filter(docs, n_parts=16)
        return {
            k: v.to_pandas().sort_values("doc_id").reset_index(drop=True)
            for k, v in outs.items()
        }

    a, b = run(2), run(9)
    for k in a:
        pd.testing.assert_frame_equal(a[k], b[k]), k
