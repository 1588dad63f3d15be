"""URL canonicalization + per-domain curation — the crawl/curation front
door (C4 / RefinedWeb dedupe-by-URL and cap-per-domain steps; no
reference counterpart — BEIR corpora carry opaque ids).

Canonicalization spec (pinned; the DuckDB oracle replays every step with
string/list functions — no hidden library behavior):

1. scheme and host lowercase; strip ALL leading ``www.`` labels (one
   strip is not idempotent: www.www.x -> www.x -> x) and any trailing
   dot from the host;
2. drop an explicit default port (``:80`` http, ``:443`` https); other
   ports kept;
3. empty path becomes ``/`` (path otherwise kept verbatim — URL paths
   are case-sensitive);
4. fragment dropped;
5. query: split on ``&``, drop tracking params (name starts with
   ``utm_`` or is in ``TRACKING_KEYS``), remaining params kept VERBATIM
   (no re-quoting) and sorted bytewise; empty result drops the ``?``.

``canonicalize_url`` is idempotent (property-tested). Registrable
domain = last two host labels — a public-suffix list is the production
upgrade (out of scope offline; seam documented), host-level grouping is
what the per-domain cap uses anyway.

Scale shape: canonicalization is a stateless ``map_batches`` (no
shuffle); the per-domain cap reuses the repo's grouped-cut pattern —
per-batch lowest-k superset cut, ONE domain-hash shuffle
(relational.grouped_topk) — so a hot domain (the skew case: content
farms with millions of pages) never concentrates more than k rows per
batch on the wire.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TRACKING_KEYS = frozenset({"fbclid", "gclid", "msclkid", "ref"})
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Pure canonicalization per the module spec (idempotent)."""
    rest = url
    scheme, sep, rest = rest.partition("://")
    if not sep:
        scheme, rest = "", url
    scheme = scheme.lower()
    rest = rest.split("#", 1)[0]  # 4. drop fragment (always last)
    # authority ends at the first '/' or '?'
    cut = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i != -1:
            cut = min(cut, i)
    hostport, tail = rest[:cut], rest[cut:]
    host, colon, port = hostport.partition(":")
    host = host.lower().rstrip(".")
    while host.startswith("www."):  # ALL leading www. labels (idempotent)
        host = host[4:]
    if colon and port == _DEFAULT_PORTS.get(scheme, ""):
        colon, port = "", ""
    path, qmark, query = tail.partition("?")
    if not path:
        path = "/"
    if qmark:
        params = [
            p for p in query.split("&")
            if not (p.partition("=")[0].startswith("utm_")
                    or p.partition("=")[0] in TRACKING_KEYS)
        ]
        query = "&".join(sorted(params))
        qmark = "?" if query else ""
    out = host + colon + port + path + qmark + query
    return scheme + "://" + out if scheme else out


def registrable_domain(host: str) -> str:
    """Last two labels (see module docstring for the PSL caveat)."""
    parts = host.split(".")
    return ".".join(parts[-2:]) if len(parts) >= 2 else host


def canonicalize(ds, *, url_col: str = "url"):
    """Adds url_canon / host / domain / path_depth columns (stateless)."""

    def f(batch: pa.Table) -> pa.Table:
        canon, hosts, doms, depth = [], [], [], []
        for u in batch.column(url_col).to_pylist():
            c = canonicalize_url(u or "")
            canon.append(c)
            rest = c.partition("://")[2] or c
            host = rest.partition("/")[0].partition(":")[0]
            path = "/" + rest.partition("/")[2]
            hosts.append(host)
            doms.append(registrable_domain(host))
            depth.append(len([s for s in path.split("?")[0].split("/")
                              if s]))
        return pa.table(
            {
                **{c: batch.column(c) for c in batch.column_names},
                "url_canon": pa.array(canon, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "domain": pa.array(doms, pa.string()),
                "path_depth": pa.array(depth, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def domain_cap(ds, *, k: int, group_col: str = "host",
               id_col: str = "doc_id", n_parts: int = 64):
    """Keep the ``k`` lowest ``id_col`` rows per ``group_col`` (the
    RefinedWeb cap-per-domain curation rule, made deterministic by the
    lowest-id total order). One hash shuffle; per-batch superset cut."""
    from webindex.relational import grouped_topk

    out = grouped_topk(ds, [group_col], id_col, k, descending=False,
                       tie_cols=[id_col], n_parts=n_parts)
    return out.map_batches(
        lambda t: t.drop_columns(["rank"]), batch_format="pyarrow"
    )
