"""Byte-identity of HTML->text extraction vs the golden generator output
(north rule / BASELINE.json input_hint: "byte-identical extracted text per
url"; template: reference batch-invariance tests, SURVEY.md §5)."""

from webindex.extract import extract_text
from webindex.synth import synth_pages_table


def test_extract_byte_identity_golden():
    tab = synth_pages_table(600, seed=42)
    for url, html, golden in zip(
        tab.column("url").to_pylist(),
        tab.column("html").to_pylist(),
        tab.column("text").to_pylist(),
    ):
        assert extract_text(html) == golden, url


def test_extract_rules():
    # title + body concat, entity decode, tag strip, ws collapse
    h = b"""<html><head><title> A &amp; B </title>
    <script>junk()</script><style>.x{}</style></head>
    <body><!-- comment --><p>Hello&#33;  <b>world</b>\n\nnew  line</p></body></html>"""
    assert extract_text(h) == "A & B Hello! world new line"
    # no title
    assert extract_text(b"<html><body>just body</body></html>") == "just body"
    # empty
    assert extract_text(b"") == ""
    assert extract_text(b"<html><head><title>T</title></head><body></body></html>") == "T"


def test_extract_invalid_utf8():
    assert "abc" in extract_text(b"<html><body>abc\xff\xfe</body></html>")
