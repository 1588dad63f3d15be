"""Corpus preparation pipelines: raw inputs -> (doc_id:int64, text:string).

Two front ends feed the same index builder:

- ``prepare_corpus_from_pages``: Common-Crawl-style pages
  (BASELINE.json input_hint schema) -> HTML extraction -> empty-text filter
  (reference M1, /root/reference/biencoder/beir/beir_dense_retriever.py:
  393-401) -> latest-wins URL dedup + deterministic docID assignment
  (SURVEY.md §2.7 D5);
- ``corpus_from_documents``: the driver's ``documents.parquet``
  (doc_id, text, ...) — ids already assigned.
"""

from __future__ import annotations

import pyarrow.compute as pc

from webindex.docids import assign_doc_ids
from webindex.extract import extract_batch


def prepare_corpus_from_pages(pages_ds, *, num_shards: int = 32,
                              lang: str | None = None):
    """pages(url, warc_ts, html, lang) -> (doc_id, url, warc_ts, lang, text)."""
    ds = pages_ds
    if lang is not None:
        ds = ds.map_batches(
            lambda t, lang=lang: t.filter(pc.equal(t.column("lang"), lang)),
            batch_format="pyarrow",
        )
    # Pinned order: dedup + docID assignment FIRST (ids depend only on the
    # deduped (url, warc_ts) set — stable under extraction changes, and dup
    # rows are dropped before the expensive HTML extraction), then extract,
    # then the empty-text filter.
    with_ids = assign_doc_ids(ds, num_shards)
    extracted = with_ids.map_batches(extract_batch, batch_format="pyarrow")
    return extracted.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    )


def corpus_from_documents(documents_ds):
    """documents(doc_id, text, ...) -> (doc_id, text), empty rows dropped."""
    return documents_ds.select_columns(["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    )
