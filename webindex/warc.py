"""WARC source/sink — the actual Common Crawl storage format.

The reference pipeline's corpus loaders (SURVEY.md §2.1 S1/S3) consume
pre-extracted jsonl; at web scale the upstream artifact is WARC
(ISO 28500): one ``response`` record per fetched page, each record its
own gzip member, members concatenated into ~1 GB ``.warc.gz`` files.
This module makes that format a first-class Ray Data boundary for the
``(url, warc_ts, html)`` slice of the input_hint pages schema:

- :func:`write_warc` — pages Dataset -> ``part-NNNNN.warc.gz`` files.
  Rows shard by ``stable_hash64(url) % n_files`` (PINNED logical
  partitioning — file contents are independent of the input's block
  layout and CPU count), sort within a file by (url, warc_ts, nbytes),
  and write atomically (tmp + rename). Gzip members use ``mtime=0`` so
  bytes are deterministic. Each file opens with a ``warcinfo`` record,
  like real crawler output.
- :func:`read_warc` / :class:`WarcDatasource` — a STREAMING
  ``FileBasedDatasource``: records parse incrementally out of a bounded
  buffer (memory is O(largest record), never O(file)) and emit in
  arrow batches of ``batch_records`` rows, so a 1 GB crawl file flows
  through the object store as many small blocks with backpressure —
  the shape that survives 100 TB of crawl data. Non-``response``
  records (warcinfo, request, metadata) are skipped, matching how
  CC-MAIN consumers read these files.

Parsing is pure stdlib (zlib for member-wise gzip). Timestamps keep
microseconds (WARC-Date with fractional seconds) so a write->read
roundtrip is exact; ``tests/test_warc.py`` proves roundtrip identity
over the adversarial synth corpus and build-from-WARC rank identity
against build-from-parquet.
"""

from __future__ import annotations

import os
import zlib
from datetime import datetime, timedelta, timezone
from hashlib import blake2b

import numpy as np
import pyarrow as pa

from webindex.util import stable_hash64

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"
_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)

READ_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
    ]
)


def _record_id(url: str, date_str: str) -> str:
    h = blake2b(f"{url}\x00{date_str}".encode(), digest_size=16).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _response_record(url: str, ts_us: int, payload: bytes) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 200 response."""
    # timedelta arithmetic keeps integer microseconds exact (float
    # epoch-seconds round near the us boundary)
    date_str = (
        _EPOCH + timedelta(microseconds=ts_us)
    ).strftime(_DATE_FMT)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(payload)).encode() + _CRLF + _CRLF
        + payload
    )
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: " + _record_id(url, date_str).encode() + _CRLF
        + b"WARC-Date: " + date_str.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF
    )
    return hdr + http + _CRLF + _CRLF


def _warcinfo_record(filename: str) -> bytes:
    body = (
        b"software: webindex\r\nformat: WARC File Format 1.0\r\n"
        b"isPartOf: " + filename.encode() + _CRLF
    )
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: " + _record_id(filename, "info").encode() + _CRLF
        + b"WARC-Date: 2024-01-01T00:00:00.000000Z\r\n"
        + b"Content-Type: application/warc-fields\r\n"
        + b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
    )
    return hdr + body + _CRLF + _CRLF


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (mtime pinned to 0)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    # zlib's gzip header writes mtime=0 already (it never stats a file).
    return co.compress(data) + co.flush()


def write_warc(pages_ds, out_dir: str, *, n_files: int = 16,
               gzip_records: bool = True, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "html"):
    """Write a pages Dataset as WARC files; returns the file paths.

    Sharding is by ``stable_hash64(url) % n_files`` — pinned logical
    partitioning, so file contents are a pure function of the row SET
    (duplicate urls co-locate, like a host-bucketed crawler output).
    One Ray task writes each file; nothing corpus-sized on the driver.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_records else ".warc"

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = np.fromiter(
            (stable_hash64(u) % n_files
             for u in batch.column(url_col).to_pylist()),
            dtype=np.int32, count=batch.num_rows,
        )
        return batch.append_column("shard", pa.array(shard))

    def write_one(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        name = f"part-{sid:05d}{ext}"
        urls = g.column(url_col).to_pylist()
        # exact epoch microseconds (datetime.timestamp() floats round)
        ts = g.column(ts_col).cast(pa.timestamp("us")).cast(
            pa.int64()).to_pylist()
        payloads = g.column(payload_col).to_pylist()
        rows = sorted(
            zip(urls, ts, payloads),
            key=lambda r: (r[0], r[1], len(r[2] or b"")),
        )
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            info = _warcinfo_record(name)
            f.write(_gzip_member(info) if gzip_records else info)
            for url, ts_us, payload in rows:
                rec = _response_record(url, ts_us, payload or b"")
                f.write(_gzip_member(rec) if gzip_records else rec)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]),
             "n_records": pa.array([len(rows)], pa.int64())}
        )

    done = (
        pages_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_one, batch_format="pyarrow")
    ).to_pandas()
    return sorted(done["path"].tolist())


class _RecordParser:
    """Incremental WARC parser over a growing byte buffer.

    Memory is bounded by the largest single record: consumed bytes are
    dropped from the buffer as each record completes.
    """

    def __init__(self):
        self._buf = bytearray()
        self.eof = False

    def feed(self, chunk: bytes):
        self._buf.extend(chunk)

    def next_record(self):
        """Return (headers: dict, block: bytes) or None if incomplete."""
        buf = self._buf
        if not buf:
            return None
        # tolerate inter-record CRLFs
        start = 0
        while buf[start:start + 2] == _CRLF:
            start += 2
        he = buf.find(_HDR_END, start)
        if he < 0:
            if self.eof and len(buf) - start > 0:
                raise ValueError("truncated WARC header block")
            return None
        head = bytes(buf[start:he]).decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record header: {lines[0]!r}")
        headers = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length")
        body_start = he + len(_HDR_END)
        end = body_start + clen
        if len(buf) < end:
            if self.eof:
                raise ValueError("truncated WARC record body")
            return None
        block = bytes(buf[body_start:end])
        del buf[:end]
        return headers, block


def _parse_http(block: bytes):
    """(status, content_type, body) from an HTTP response block."""
    he = block.find(_HDR_END)
    if he < 0:
        return 0, "", block
    head = block[:he].decode("utf-8", "replace").split("\r\n")
    try:
        status = int(head[0].split(" ")[1])
    except (IndexError, ValueError):
        status = 0
    ctype = ""
    for ln in head[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, block[he + len(_HDR_END):]


def _parse_date(s: str) -> int:
    fmt = _DATE_FMT if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    return (dt - _EPOCH) // timedelta(microseconds=1)


try:  # Ray import kept lazy-ish so the parser is usable standalone
    from ray.data.datasource import FileBasedDatasource
except ImportError:  # pragma: no cover
    FileBasedDatasource = object


class WarcDatasource(FileBasedDatasource):
    """Streaming WARC reader: yields arrow batches of ``batch_records``
    response rows; gzip members decompress incrementally (never the
    whole file in memory). Schema: :data:`READ_SCHEMA`.
    """

    _FILE_EXTENSIONS = ["warc", "warc.gz"]
    _CHUNK = 1 << 20

    def __init__(self, paths, *, batch_records: int = 512, **kwargs):
        kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
        super().__init__(paths, **kwargs)
        self._batch_records = batch_records

    def _read_stream(self, f, path: str):
        parser = _RecordParser()
        decomp = None
        first = f.read(2)
        gz = first == b"\x1f\x8b"
        if gz:
            decomp = zlib.decompressobj(16 + zlib.MAX_WBITS)
            parser.feed(decomp.decompress(first))
        else:
            parser.feed(first)

        cols = {k: [] for k in
                ("url", "warc_ts", "html", "status", "content_type")}

        def flush():
            tbl = pa.table(
                {
                    "url": pa.array(cols["url"], pa.string()),
                    "warc_ts": pa.array(cols["warc_ts"],
                                        pa.timestamp("us")),
                    "html": pa.array(cols["html"], pa.binary()),
                    "status": pa.array(cols["status"], pa.int32()),
                    "content_type": pa.array(cols["content_type"],
                                             pa.string()),
                }
            )
            for k in cols:
                cols[k].clear()
            return tbl

        def drain():
            while True:
                rec = parser.next_record()
                if rec is None:
                    return
                headers, block = rec
                if headers.get("warc-type") != "response":
                    continue
                status, ctype, body = _parse_http(block)
                cols["url"].append(headers.get("warc-target-uri", ""))
                cols["warc_ts"].append(
                    _parse_date(headers["warc-date"])
                )
                cols["html"].append(body)
                cols["status"].append(status)
                cols["content_type"].append(ctype)

        while True:
            raw = f.read(self._CHUNK)
            if not raw:
                break
            if gz:
                data = raw
                while data:
                    parser.feed(decomp.decompress(data))
                    if decomp.eof:  # next gzip member
                        data = decomp.unused_data
                        decomp = zlib.decompressobj(16 + zlib.MAX_WBITS)
                    else:
                        data = b""
            else:
                parser.feed(raw)
            drain()
            if len(cols["url"]) >= self._batch_records:
                yield flush()
        parser.eof = True
        drain()
        if cols["url"]:
            yield flush()


def read_warc(paths, *, batch_records: int = 512, **kwargs):
    """WARC files/dirs -> Dataset(url, warc_ts, html, status,
    content_type). One read task per file (the Common Crawl processing
    granularity); records stream out in bounded batches."""
    import ray.data as rd

    return rd.read_datasource(
        WarcDatasource(paths, batch_records=batch_records, **kwargs)
    )
