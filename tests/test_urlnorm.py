"""URL canonicalization (webindex.urlnorm) — nasty-URL battery against
hand-expected outputs, the idempotence property, and partition
invariance of the per-domain cap."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webindex.urlnorm import (
    canonicalize,
    canonicalize_url,
    domain_cap,
    registrable_domain,
)

CASES = [
    # scheme/host case, www, default port
    ("HTTPS://WWW.Example.COM:443/Path", "https://example.com/Path"),
    ("http://Example.com:80/", "http://example.com/"),
    # non-default port kept
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    # http with https default port is NOT default -> kept
    ("http://example.com:443/x", "http://example.com:443/x"),
    # fragment dropped; empty path -> /
    ("https://example.com#top", "https://example.com/"),
    # tracking params dropped, rest sorted bytewise, quoting untouched
    ("https://e.com/p?utm_source=a&b=2&a=1&fbclid=z",
     "https://e.com/p?a=1&b=2"),
    ("https://e.com/p?utm_campaign=x&gclid=1", "https://e.com/p"),
    # param values with '=' survive verbatim; blank values kept
    ("https://e.com/p?b=x=y&a=", "https://e.com/p?a=&b=x=y"),
    # path case preserved; trailing host dot stripped
    ("https://E.com./Wiki/Page", "https://e.com/Wiki/Page"),
    # ALL leading www. labels stripped (idempotence), only as labels
    ("https://www.www.e.com/", "https://e.com/"),
    ("https://wwwx.e.com/", "https://wwwx.e.com/"),
    # scheme-less input survives
    ("Example.com/A?utm_x=1", "example.com/A"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonicalize_battery(raw, want):
    assert canonicalize_url(raw) == want


@pytest.mark.parametrize("raw,want", CASES)
def test_canonicalize_idempotent_on_battery(raw, want):
    assert canonicalize_url(want) == want


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               max_size=60))
def test_canonicalize_idempotent_property(s):
    u = "https://Ex.com/" + s
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_registrable_domain():
    assert registrable_domain("a.b.example.com") == "example.com"
    assert registrable_domain("example.com") == "example.com"
    assert registrable_domain("localhost") == "localhost"


def test_domain_cap_partition_invariant(ray_session):
    import ray.data as rd

    ids = np.arange(100, dtype=np.int64)
    urls = [f"https://h{i % 3}.e.com/p/{i}" for i in ids]
    tab = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "url": pa.array(urls, pa.string())})
    outs = []
    for blocks in (1, 7):
        ds = canonicalize(rd.from_arrow(tab).repartition(blocks))
        out = domain_cap(ds, k=5, n_parts=8).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    got = outs[0]
    assert len(got) == 15  # 3 hosts x 5
    # lowest ids per host kept: host h0 gets 0,3,6,9,12
    assert sorted(got.loc[got.host == "h0.e.com", "doc_id"]) == [0, 3, 6,
                                                                 9, 12]
