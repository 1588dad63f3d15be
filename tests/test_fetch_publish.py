"""Fetch+unzip source (S2) and Kaggle-analog publishing (S10)."""

import os
import zipfile

import pytest

from webindex.fetch import download_and_unzip, http_get, sha256_file
from webindex.publish import (
    LocalStoreTransport,
    create_dataset,
    download_dataset,
    init_dataset,
)


def _make_beir_zip(tmp_path, name="scifact", rooted=True):
    src = tmp_path / "src" / name
    os.makedirs(src / "qrels", exist_ok=True)
    (src / "corpus.jsonl").write_text('{"_id": "d1", "text": "alpha"}\n')
    (src / "queries.jsonl").write_text('{"_id": "q1", "text": "a?"}\n')
    (src / "qrels" / "test.tsv").write_text("query-id\tcorpus-id\tscore\nq1\td1\t1\n")
    zip_path = tmp_path / f"{name}.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _d, files in os.walk(src):
            for f in sorted(files):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, src if not rooted else src.parent)
                zf.write(full, rel)
    return zip_path


def test_http_get_file_scheme(tmp_path):
    src = tmp_path / "blob.bin"
    src.write_bytes(b"x" * 4096)
    dest = tmp_path / "out" / "blob.bin"
    http_get(f"file://{src}", str(dest))
    assert dest.read_bytes() == b"x" * 4096
    # bare local path works too
    http_get(str(src), str(tmp_path / "out2.bin"))
    assert (tmp_path / "out2.bin").stat().st_size == 4096


def test_download_and_unzip_rooted_and_idempotent(tmp_path):
    zip_path = _make_beir_zip(tmp_path, rooted=True)
    out = tmp_path / "datasets"
    d = download_and_unzip(f"file://{zip_path}", str(out))
    assert d == str(out / "scifact")
    assert os.path.exists(os.path.join(d, "corpus.jsonl"))
    assert os.path.exists(os.path.join(d, "qrels", "test.tsv"))
    # zip removed, re-call is a no-op cache hit
    assert not os.path.exists(out / "scifact.zip")
    marker = os.path.join(d, "marker")
    open(marker, "w").close()
    d2 = download_and_unzip(f"file://{zip_path}", str(out))
    assert d2 == d and os.path.exists(marker)


def test_download_and_unzip_bare_files(tmp_path):
    zip_path = _make_beir_zip(tmp_path, name="bare", rooted=False)
    d = download_and_unzip(f"file://{zip_path}", str(tmp_path / "ds"))
    assert os.path.exists(os.path.join(d, "corpus.jsonl"))


def test_download_sha256_gate(tmp_path):
    zip_path = _make_beir_zip(tmp_path, name="gated")
    good = sha256_file(str(zip_path))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        download_and_unzip(
            f"file://{zip_path}", str(tmp_path / "bad"), sha256="0" * 64
        )
    d = download_and_unzip(
        f"file://{zip_path}", str(tmp_path / "good"), sha256=good
    )
    assert os.path.isdir(d)


def test_zip_slip_rejected(tmp_path):
    zip_path = tmp_path / "evil.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("../escape.txt", "nope")
    with pytest.raises(ValueError, match="escapes"):
        download_and_unzip(f"file://{zip_path}", str(tmp_path / "out"))


def test_publish_roundtrip_and_versioning(tmp_path):
    results = tmp_path / "bm25_results"
    os.makedirs(results)
    (results / "results_scifact.json").write_text('{"q1": {"d1": 1.5}}')
    init_dataset(str(results), "tester/beirbm25results", title="BM25 runs")
    store = LocalStoreTransport(str(tmp_path / "store"))
    loc1 = create_dataset(str(results), store)
    assert loc1.endswith("v1.zip")
    # second push gets a new version
    (results / "results_nfcorpus.json").write_text('{"q2": {"d2": 0.5}}')
    loc2 = create_dataset(str(results), store)
    assert loc2.endswith("v2.zip")

    d = download_dataset(
        "tester/beirbm25results", str(tmp_path / "pulled"), store
    )
    names = sorted(os.listdir(d))
    assert "results_scifact.json" in names and "results_nfcorpus.json" in names
    assert "dataset-metadata.json" in names
    # idempotent pull
    assert download_dataset(
        "tester/beirbm25results", str(tmp_path / "pulled"), store
    ) == d


def test_init_dataset_validates_id(tmp_path):
    with pytest.raises(ValueError, match="owner/slug"):
        init_dataset(str(tmp_path / "x"), "no-slash-here")


def test_sha256_mismatch_keeps_preexisting_zip(tmp_path):
    """A zip this call did NOT download must survive a sha mismatch —
    it may be the caller's only copy (stale pin, keep_zip from earlier)."""
    zip_path = _make_beir_zip(tmp_path, name="kept")
    out = tmp_path / "ds"
    os.makedirs(out, exist_ok=True)
    pre = out / "kept.zip"
    pre.write_bytes(zip_path.read_bytes())
    with pytest.raises(ValueError, match="sha256 mismatch"):
        download_and_unzip(f"file://{zip_path}", str(out), sha256="0" * 64)
    assert pre.exists()
    # but a zip fetched BY the failing call is discarded
    out2 = tmp_path / "ds2"
    with pytest.raises(ValueError, match="sha256 mismatch"):
        download_and_unzip(f"file://{zip_path}", str(out2), sha256="0" * 64)
    assert not (out2 / "kept.zip").exists()


def test_push_version_is_max_plus_one(tmp_path):
    """Pruning an old version must not make the next push clobber the
    newest one (version = max existing + 1, not file count + 1)."""
    store = LocalStoreTransport(str(tmp_path / "store"))
    blob = tmp_path / "payload.zip"
    with zipfile.ZipFile(blob, "w") as zf:
        zf.writestr("a.txt", "one")
    assert store.push("o/s", str(blob)).endswith("v1.zip")
    assert store.push("o/s", str(blob)).endswith("v2.zip")
    os.remove(tmp_path / "store" / "o" / "s" / "v1.zip")
    dest3 = store.push("o/s", str(blob))
    assert dest3.endswith("v3.zip")
    assert os.path.exists(tmp_path / "store" / "o" / "s" / "v2.zip")
