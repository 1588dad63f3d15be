"""WARC source/sink: roundtrip identity, determinism, streaming reads,
malformed-input errors, and build-from-WARC == build-from-parquet."""

import glob
import os
import shutil

import pyarrow as pa
import pytest

from webindex.synth import synth_pages_table
from webindex.warc import (
    _gzip_member,
    _RecordParser,
    _response_record,
    read_warc,
    write_warc,
)

N_PAGES = 220


def _canon(df):
    df = df.assign(h=[bytes(x) for x in df["html"]])
    return (
        df[["url", "warc_ts", "h"]]
        .sort_values(["url", "warc_ts", "h"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def pages_tab():
    # adversarial rows included: empty body, duplicate urls, long doc
    return synth_pages_table(N_PAGES, seed=42)


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_exact(ray_session, tmp_path, pages_tab, gz):
    import ray.data as rd

    out = str(tmp_path / f"warc{gz}")
    paths = write_warc(
        rd.from_arrow(pages_tab).repartition(5), out, n_files=4,
        gzip_records=gz,
    )
    assert len(paths) == 4
    back = read_warc(out).to_pandas()
    assert set(back["status"]) == {200}
    a = _canon(pages_tab.select(["url", "warc_ts", "html"]).to_pandas())
    b = _canon(back)
    assert a.equals(b)


def test_written_files_partition_invariant(ray_session, tmp_path, pages_tab):
    """File BYTES are a pure function of the row set — independent of the
    input Dataset's block layout (pinned url-hash sharding + in-file
    sort + mtime-0 gzip members)."""
    import ray.data as rd

    outs = []
    for i, nblocks in enumerate((1, 7)):
        out = str(tmp_path / f"w{i}")
        write_warc(
            rd.from_arrow(pages_tab).repartition(nblocks), out, n_files=3
        )
        outs.append(out)
    for name in ("part-00000.warc.gz", "part-00001.warc.gz",
                 "part-00002.warc.gz"):
        with open(os.path.join(outs[0], name), "rb") as f:
            b0 = f.read()
        with open(os.path.join(outs[1], name), "rb") as f:
            b1 = f.read()
        assert b0 == b1, name


def test_streaming_batches(ray_session, tmp_path, pages_tab):
    """Small batch_records still yields every row (multiple blocks per
    file) and bounded batches."""
    import ray.data as rd

    out = str(tmp_path / "warcbatch")
    write_warc(rd.from_arrow(pages_tab), out, n_files=1)
    ds = read_warc(out, batch_records=16)
    sizes = [len(b["url"]) for b in ds.iter_batches(batch_size=None)]
    assert sum(sizes) == pages_tab.num_rows
    assert len(sizes) > 3  # genuinely streamed as multiple blocks
    assert max(sizes) <= 16 * 4  # blocks may coalesce a little, stay small


def test_warcinfo_and_request_records_skipped(ray_session, tmp_path):
    """Non-response records (warcinfo header, request) are skipped —
    the Common Crawl reading convention."""
    rec = _response_record("https://x.example/a", 1_700_000_000_123_456,
                           b"<html>hi</html>")
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Record-ID: <urn:uuid:0>\r\n"
        b"WARC-Date: 2024-01-01T00:00:00.000000Z\r\n"
        b"WARC-Target-URI: https://x.example/a\r\n"
        b"Content-Length: 5\r\n\r\nGET /\r\n\r\n"
    )
    p = str(tmp_path / "mixed.warc.gz")
    with open(p, "wb") as f:
        f.write(_gzip_member(req))
        f.write(_gzip_member(rec))
    out = read_warc(p).to_pandas()
    assert list(out["url"]) == ["https://x.example/a"]
    assert bytes(out["html"][0]) == b"<html>hi</html>"
    # pandas Timestamp.value is nanoseconds
    assert int(out["warc_ts"][0].value) == 1_700_000_000_123_456 * 1000


def test_truncated_record_raises(ray_session, tmp_path):
    rec = _response_record("https://x.example/b", 0, b"payload-bytes")
    p = str(tmp_path / "trunc.warc")
    with open(p, "wb") as f:
        f.write(rec[: len(rec) // 2])
    with pytest.raises(Exception):
        read_warc(p).materialize()


def test_non_warc_file_raises(ray_session, tmp_path):
    p = str(tmp_path / "bogus.warc")
    with open(p, "wb") as f:
        f.write(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")
    with pytest.raises(Exception):
        read_warc(p).materialize()


def test_record_parser_incremental():
    """Records parse correctly regardless of chunk boundaries."""
    recs = [
        _response_record(f"https://s.example/{i}", i * 1000 + 7,
                         f"<html>{'x' * i}</html>".encode())
        for i in range(20)
    ]
    blob = b"".join(recs)
    for step in (1, 3, 17, 1024):
        parser = _RecordParser()
        got = 0
        for off in range(0, len(blob), step):
            parser.feed(blob[off:off + step])
            while True:
                r = parser.next_record()
                if r is None:
                    break
                got += 1
        assert got == 20, step


def test_build_from_warc_matches_parquet_build(
    ray_session, tmp_path, pages_tab
):
    """End-to-end: index built from WARC input ranks identically to the
    index built from the parquet pages table."""
    import ray.data as rd

    from webindex.build import build_index
    from webindex.config import IndexConfig
    from webindex.pipelines.corpus import prepare_corpus_from_pages
    from webindex.search import search_queries

    cfg = IndexConfig(num_buckets=4, df_salt_threshold=60, salt_shards=2,
                      block_size=32)
    warc_dir = str(tmp_path / "warcsrc")
    write_warc(rd.from_arrow(pages_tab), warc_dir, n_files=3)

    idx_a = str(tmp_path / "idx_parquet")
    pages_a = rd.from_arrow(pages_tab).drop_columns(["text"])
    build_index(prepare_corpus_from_pages(pages_a, num_shards=4),
                idx_a, cfg, tokenize_concurrency=2)

    idx_b = str(tmp_path / "idx_warc")
    pages_b = read_warc(warc_dir).drop_columns(["status", "content_type"])
    build_index(prepare_corpus_from_pages(pages_b, num_shards=4),
                idx_b, cfg, tokenize_concurrency=2)

    queries = rd.from_arrow(pa.table({
        "qid": pa.array(["q1", "q2", "q3"]),
        "text": pa.array(["search engine ranking", "web crawl corpus",
                          "the of and"]),
    }))
    ra = search_queries(queries, idx_a, top_k=10).to_pandas()
    rb = search_queries(
        rd.from_arrow(pa.table({
            "qid": pa.array(["q1", "q2", "q3"]),
            "text": pa.array(["search engine ranking", "web crawl corpus",
                              "the of and"]),
        })), idx_b, top_k=10,
    ).to_pandas()
    ka = ra.sort_values(["qid", "rank"]).reset_index(drop=True)
    kb = rb.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert ka[["qid", "rank", "doc_id", "score"]].equals(
        kb[["qid", "rank", "doc_id", "score"]]
    )
