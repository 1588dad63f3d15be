"""Index integrity checker (webindex.fsck): a clean index passes; every
class of artifact damage — dictionary counts, stats aggregates, block
metadata — is detected by re-derivation through the codec."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.fsck import check_index
from webindex.synth import synth_pages_table
from webindex.util import atomic_write_json, read_json

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig(),
                  block_size=32, df_salt_threshold=60, salt_shards=4)


@pytest.fixture(scope="module")
def clean_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from webindex.build import build_index
    from webindex.pipelines.corpus import prepare_corpus_from_pages

    idx = str(tmp_path_factory.mktemp("fsck") / "idx")
    pages = rd.from_arrow(
        synth_pages_table(300, seed=31)
    ).drop_columns(["text"])
    build_index(prepare_corpus_from_pages(pages, num_shards=8), idx, CFG)
    return idx


def _copy(idx, tmp_path, name):
    dst = str(tmp_path / name)
    shutil.copytree(idx, dst)
    return dst


def _one_parquet(root):
    files = sorted(glob.glob(os.path.join(root, "**", "*.parquet"),
                             recursive=True))
    assert files
    return files[0]


def test_clean_index_passes(clean_index):
    rep = check_index(clean_index)
    assert rep["errors"] == []
    assert rep["ok"] and rep["n_terms"] > 50 and rep["n_postings"] > 1000
    assert rep["n_docs"] > 250


def test_detects_dictionary_damage(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "baddict")
    f = _one_parquet(os.path.join(idx, "dict"))
    t = pq.read_table(f)
    df = t.column("df").to_pylist()
    df[0] += 1
    t = t.set_column(t.column_names.index("df"), "df",
                     pa.array(df, t.schema.field("df").type))
    pq.write_table(t, f)
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("df/cf" in e or "dictionary" in e for e in rep["errors"])


def test_detects_stats_damage(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "badstats")
    stats = read_json(f"{idx}/stats.json")
    stats["N"] += 5
    atomic_write_json(f"{idx}/stats.json", stats)
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("stats.N" in e for e in rep["errors"])


def test_detects_block_metadata_damage(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "badblock")
    f = _one_parquet(os.path.join(idx, "segments"))
    t = pq.read_table(f)
    col = t.column("max_tf_norm").to_pylist()
    assert col
    col[0] += 1e-3
    t = t.set_column(t.column_names.index("max_tf_norm"), "max_tf_norm",
                     pa.array(col, pa.float64()))
    pq.write_table(t, f)
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("max_tf_norm" in e for e in rep["errors"])


def test_detects_posting_loss(clean_index, tmp_path):
    """Dropping segment rows (a lost block) shows up as dict/df mismatch
    or metadata inconsistency."""
    idx = _copy(clean_index, tmp_path, "lostrows")
    f = _one_parquet(os.path.join(idx, "segments"))
    t = pq.read_table(f)
    assert t.num_rows > 2
    pq.write_table(t.slice(0, t.num_rows - 1), f)
    rep = check_index(idx)
    assert not rep["ok"]


def test_unknown_tombstone_is_warning(clean_index, tmp_path):
    from webindex.lifecycle import delete_docs

    idx = _copy(clean_index, tmp_path, "ghostdel")
    delete_docs(idx, [999_999_999_999])  # never-indexed doc: legal no-op
    rep = check_index(idx)
    assert rep["ok"]
    assert any("deletes" in w for w in rep["warnings"])


def test_compacted_index_passes(clean_index, tmp_path):
    from webindex.lifecycle import compact_index, delete_docs

    idx = _copy(clean_index, tmp_path, "livedel")
    import pyarrow.dataset as pads

    ids = pads.dataset(os.path.join(idx, "postings_raw")).to_table(
        columns=["doc_id"], filter=pads.field("kind") == 1
    ).column("doc_id").to_numpy()
    delete_docs(idx, ids[:: 10])
    out = str(tmp_path / "compacted")
    compact_index(idx, out)
    rep = check_index(out)
    assert rep["ok"], rep["errors"][:5]


def test_positional_index_checked(ray_session, tmp_path):
    """Positions are validated through the codec; damaging a position
    blob is detected."""
    import ray.data as rd

    from dataclasses import replace

    from webindex.build import build_index
    from webindex.pipelines.corpus import prepare_corpus_from_pages

    cfg = replace(CFG, store_positions=True)
    idx = str(tmp_path / "posidx")
    pages = rd.from_arrow(
        synth_pages_table(150, seed=33)
    ).drop_columns(["text"])
    build_index(prepare_corpus_from_pages(pages, num_shards=8), idx, cfg)
    rep = check_index(idx)
    assert rep["ok"], rep["errors"][:5]

    f = _one_parquet(os.path.join(idx, "segments"))
    t = pq.read_table(f)
    pos = t.column("positions").to_pylist()
    victim = next(i for i, b in enumerate(pos) if b and len(b) > 2)
    pos[victim] = pos[victim][: len(pos[victim]) // 2]  # truncate blob
    t = t.set_column(t.column_names.index("positions"), "positions",
                     pa.array(pos, pa.binary()))
    pq.write_table(t, f)
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("position" in e for e in rep["errors"])
