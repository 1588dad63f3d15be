"""PII redaction: replace emails / IPv4s / SSNs / phone numbers with
typed placeholder tokens and count hits per type — the standard
pre-training scrub step (C4, RefinedWeb, Dolma all ship a variant; no
reference counterpart — the reference consumes already-clean BEIR text,
SURVEY.md §2.2).

Engine/oracle equivalence is exact by construction: the batch kernel is
``pyarrow.compute.replace_substring_regex`` / ``count_substring_regex``
and DuckDB's ``regexp_replace(..., 'g')`` / ``regexp_extract_all`` —
BOTH are RE2, so the same pattern strings produce byte-identical
redacted text and identical counts (verified on stress cases in
tests/test_pii.py and by the ``pii_redact`` driver-contract entry).

Semantics pinned:

- replacement is SEQUENTIAL in ``PII_PATTERNS`` order (email -> ipv4 ->
  ssn -> phone), each pass global;
- per-type counts are measured on the ORIGINAL text independently
  (count first, then redact), so each count is a plain
  ``len(regexp_extract_all(text, pat))``;
- patterns are deliberately RE2-conservative (no lookarounds): a
  parenthesized area code without a separator boundary, or an SSN
  glued to letters, is out of scope on both engines equally.

Scale shape: stateless vectorized ``map_batches`` over zero-copy Arrow
string columns — no shuffle, no state, no driver traffic; the one
transform in this repo that is trivially 100-TB-safe.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, placeholder) — order IS the redaction order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b(?:\+?1[ .-]?)?(?:\([0-9]{3}\)|[0-9]{3})[ .-]?"
        r"[0-9]{3}[ .-]?[0-9]{4}\b",
        "<PHONE>",
    ),
]


def redact_batch(batch: pa.Table, *, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """One Arrow batch -> (id, text_redacted, n_<type>... , n_pii)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        id_col: batch.column(id_col)
    }
    out = col
    counts = []
    for name, pat, tok in PII_PATTERNS:
        c = pc.count_substring_regex(col, pat)  # on the ORIGINAL text
        counts.append(pc.cast(c, pa.int64()))
        out = pc.replace_substring_regex(out, pat, tok)
    cols["text_redacted"] = out
    total = counts[0]
    for c in counts[1:]:
        total = pc.add_checked(total, c)
    for (name, _, _), c in zip(PII_PATTERNS, counts):
        cols[f"n_{name}"] = c
    cols["n_pii"] = total
    return pa.table(cols)


def redact_pii(docs_ds, *, text_col: str = "text",
               id_col: str = "doc_id"):
    """documents -> (doc_id, text_redacted, n_email, n_ipv4, n_ssn,
    n_phone, n_pii). Stateless vectorized map_batches; column-pruned
    callers should select [id_col, text_col] at the read."""

    def fn(batch: pa.Table) -> pa.Table:
        return redact_batch(batch, text_col=text_col, id_col=id_col)

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def oracle_sql(table: str = "documents", *, text_col: str = "text",
               id_col: str = "doc_id") -> str:
    """The DuckDB mirror of redact_pii, built from the SAME pattern
    strings (single source of truth for the driver contract)."""
    repl = text_col
    for _, pat, tok in PII_PATTERNS:
        repl = (
            f"regexp_replace({repl}, '{pat}', '{tok}', 'g')"
        )
    count_cols = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    total = " + ".join(
        f"len(regexp_extract_all({text_col}, '{pat}'))"
        for _, pat, _ in PII_PATTERNS
    )
    return (
        f"SELECT {id_col}, {repl} AS text_redacted, {count_cols}, "
        f"({total})::BIGINT AS n_pii FROM {table}"
    )
