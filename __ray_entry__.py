"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Implementation lives in ``webindex`` (see SURVEY.md; registry:
webindex/pipelines/driver_queries.py). No ``ray.init``/``ray.shutdown``
here — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents corpus ->
    checkpointed BM25 index build (english analyzer: Porter stem +
    stopwords) -> block-max WAND top-100 for the reference query set ->
    runs table (qid, did, doc_id, score, rank)."""
    from webindex.pipelines.driver_queries import (
        _queries_ds,
        ensure_index,
    )
    from webindex.search import search_queries

    idx = ensure_index("/root/testdata/sf0.001", "stemmed")
    return search_queries(
        _queries_ds(), idx, top_k=100, mode="wand", concurrency=2, batch_size=8
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from webindex.pipelines.driver_queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from webindex.pipelines.driver_queries import REGISTRY

    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
