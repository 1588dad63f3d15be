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
