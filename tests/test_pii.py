"""PII redaction (webindex/pii.py): the RE2 batch kernel vs DuckDB's
regexp_replace/regexp_extract_all on stress strings — the two engines
must agree byte-for-byte (both RE2, same pattern strings)."""

import duckdb
import pyarrow as pa

from webindex.pii import PII_PATTERNS, oracle_sql, redact_batch, redact_pii

STRESS = [
    "contact me at john.doe+spam@example.co.uk or admin@x.io",
    "call 555-123-4567 or (555) 987-6543 x22, ip 192.168.0.1 port 8080",
    "no pii here",
    "",
    "edge 999.999.999.999 1.2.3.4 a@b.cd",
    "+1 415 555 2671 and 4155552671 ssn 123-45-6789",
    "ssn-ish 123-45-6789x and real 987-65-4321 end",
    "nested a@b.com@c.dd 10.0.0.1.2 weird..dots@@",
    "phone with dots 415.555.2671 and dashes 415-555-2671",
    "v6-ish ::1 2001:db8::1 stays; 127.0.0.1 goes",
    "unicode café résumé müller@example.de — dash",
    "digits 12345678901234567890 and 123 456 7890 spaced",
]


def _duck(texts):
    con = duckdb.connect()
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    con.register("documents", tab)
    out = con.execute(oracle_sql() + " ORDER BY doc_id").fetch_arrow_table()
    con.close()
    return out


def test_redact_batch_matches_duckdb():
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(STRESS)), pa.int64()),
            "text": pa.array(STRESS),
        }
    )
    got = redact_batch(tab)
    want = _duck(STRESS)
    assert got.column_names == want.column_names
    for c in got.column_names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_redact_counts_on_original_text():
    # an email whose digits could look phone-ish after redaction: counts
    # are defined on the ORIGINAL text, independent per pattern
    t = "mail 4155552671@txt.example.com now"
    tab = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "text": pa.array([t])})
    got = redact_batch(tab)
    assert got.column("n_email").to_pylist() == [1]
    # the phone pattern also sees the digits in the original
    assert got.column("n_phone").to_pylist() == [1]
    # but redaction is sequential: email eats the digits first
    assert got.column("text_redacted").to_pylist() == ["mail <EMAIL> now"]


def test_redact_pii_ds(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "doc_id": pa.array(range(len(STRESS)), pa.int64()),
            "text": pa.array(STRESS),
        }
    )
    out = (
        redact_pii(rd.from_arrow(tab).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _duck(STRESS).to_pandas()
    assert out.equals(want)


def test_patterns_are_re2_safe():
    import re

    for name, pat, _ in PII_PATTERNS:
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat, (
            name, "RE2 has no lookarounds")
        re.compile(pat)  # also valid Python re (used nowhere hot, sanity)
