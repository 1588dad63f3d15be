"""Resumable builds: a restart skips completed stages and produces an index
logically identical to a fresh single-shot build (reference pattern:
skip-if-exists guards, /root/reference/biencoder/beir/
beir_dense_retriever.py:319-323,434-437 — made atomic here)."""

import json
import os
import shutil

import pandas as pd
import pyarrow.dataset as pads
import pytest

from webindex.build import build_index
from webindex.config import IndexConfig
from webindex.pipelines import corpus_from_documents

CFG = IndexConfig(num_buckets=4, df_salt_threshold=100, salt_shards=4,
                  block_size=32)


def _corpus():
    import ray.data as rd

    return corpus_from_documents(
        rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    )


def _segments_content(idx_dir: str) -> pd.DataFrame:
    df = pads.dataset(os.path.join(idx_dir, "segments")).to_table().to_pandas()
    return (
        df.sort_values(["term", "salt", "block_id"])
        .reset_index(drop=True)[
            ["term", "salt", "block_id", "n", "last_doc_id", "doc_ids", "tfs",
             "max_tf_norm"]
        ]
    )


@pytest.mark.usefixtures("ray_session")
def test_resume_identical(tmp_path):
    fresh = str(tmp_path / "fresh")
    resumed = str(tmp_path / "resumed")

    build_index(_corpus(), fresh, CFG, tokenize_concurrency=2)

    # interrupted build: stages 1-2 done, then "crash" (drop later stages,
    # leave a stale partial tmp dir behind)
    build_index(_corpus(), resumed, CFG, tokenize_concurrency=2)
    man_path = os.path.join(resumed, "manifest.json")
    man = json.load(open(man_path))
    wall_postings = man["postings_raw"]["wall_sec"]
    for stage in ("dict", "segments"):
        shutil.rmtree(os.path.join(resumed, stage))
        del man[stage]
    json.dump(man, open(man_path, "w"))
    os.makedirs(os.path.join(resumed, "segments.tmp/junk"), exist_ok=True)

    build_index(_corpus(), resumed, CFG, tokenize_concurrency=2)

    man2 = json.load(open(man_path))
    # stage 1 was NOT re-run (same completion record)
    assert man2["postings_raw"]["wall_sec"] == wall_postings
    assert not os.path.exists(os.path.join(resumed, "segments.tmp"))

    a, b = _segments_content(fresh), _segments_content(resumed)
    pd.testing.assert_frame_equal(a, b)

    stats_a = json.load(open(os.path.join(fresh, "stats.json")))
    stats_b = json.load(open(os.path.join(resumed, "stats.json")))
    assert stats_a == stats_b


@pytest.mark.usefixtures("ray_session")
def test_lineage_records(tmp_path):
    idx = str(tmp_path / "idx")
    build_index(_corpus(), idx, CFG, tokenize_concurrency=2)
    for stage in ("postings_raw", "dict", "segments"):
        rec = json.load(open(os.path.join(idx, "lineage", f"{stage}.json")))
        assert rec["rows_out"] > 0
        assert rec["wall_sec"] > 0
        assert rec["n_files"] >= 1
        assert all("path" in f and "bytes" in f for f in rec["files"])
    stats_rec = json.load(open(os.path.join(idx, "lineage", "stats.json")))
    assert stats_rec["stats"]["N"] > 0
