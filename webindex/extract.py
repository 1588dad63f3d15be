"""HTML -> text extraction: a pure function, byte-identical per url.

The reference's closest analog is the streamed field extractor over the 19 GB
BioASQ JSON (/root/reference/crossencoder/beir/crossencoder_bioasq_bm25.ipynb
cell 4) — a per-row pure function over raw bytes. Our input is
Common-Crawl-style pages (BASELINE.json input_hint: ``html: binary``), and the
north rule requires the extracted ``text`` to be byte-identical per ``url``
regardless of parallelism.

Pinned extraction spec (engine + synth generator + oracle all share it):

1. decode ``html`` bytes as UTF-8 (``errors="replace"``);
2. drop ``<script>``/``<style>`` elements including their content and
   HTML comments;
3. title = contents of the first ``<title>`` element, entities decoded,
   whitespace collapsed;
4. body text = all remaining markup stripped (tags -> a single space),
   entities decoded, whitespace runs (incl. newlines) collapsed to one
   space — the reference's newline rule ``txt.replace("\\n", " ")``
   (/root/reference/biencoder/beir/beir_dense_retriever.py:169) —
   then stripped;
5. ``text = (title + " " + body).strip()`` when a title exists, else
   ``body`` — the canonical doc-text concat
   (/root/reference/biencoder/beir/beir_dense_retriever.py:341), with the
   ``title is None -> ""`` normalization of ``clean_titles``
   (/root/reference/biencoder/beir/beir_dense_retriever.py:500-504).
"""

from __future__ import annotations

import html as _htmllib
import re

import pyarrow as pa

_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TITLE_RE = re.compile(
    r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _clean_fragment(fragment: str) -> str:
    """Strip tags, decode entities, collapse whitespace."""
    no_tags = _TAG_RE.sub(" ", fragment)
    decoded = _htmllib.unescape(no_tags)
    return _WS_RE.sub(" ", decoded).strip()


def extract_text(html_bytes: bytes | str) -> str:
    """Extract canonical document text from raw HTML. Pure; deterministic."""
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        doc = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        doc = html_bytes or ""
    doc = _COMMENT_RE.sub(" ", doc)
    doc = _SCRIPT_RE.sub(" ", doc)
    m = _TITLE_RE.search(doc)
    title = _clean_fragment(m.group(1)) if m else ""
    if m:
        doc = doc[: m.start()] + " " + doc[m.end() :]
    body = _clean_fragment(doc)
    if title:
        return (title + " " + body).strip()
    return body


def extract_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` stage: pages(url, warc_ts, html, ...) -> adds ``text``.

    Replaces the ``html`` column with the extracted ``text``. Row-wise by
    necessity (HTML parsing is not expressible as an Arrow kernel), but all
    regexes are compiled once at module import and the stage is stateless —
    Ray fuses it with the read.
    """
    texts = pa.array(
        [extract_text(h) for h in batch.column("html").to_pylist()],
        type=pa.large_string(),
    )
    out = batch.drop_columns(["html"])
    if "text" in out.column_names:
        out = out.drop_columns(["text"])
    return out.append_column("text", texts)
