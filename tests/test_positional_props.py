"""Property tests (hypothesis) for the positional machinery's pure parts:

- ``contains_phrase`` against a naive window scan;
- the tokenize stage's per-doc position encoding
  (``TokenizeStage._doc_positions``) round-trips through varbyte decode
  back to the exact token positions, per term, in first-occurrence term
  order with counts matching ``Counter`` semantics.

No Ray needed — these run the in-process kernels only.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webindex.compress import varbyte_decode
from webindex.phrase import contains_phrase

TOK = st.text(alphabet="abc", min_size=1, max_size=2)


def naive_contains(tokens, phrase):
    m = len(phrase)
    if m == 0 or len(tokens) < m:
        return False
    return any(
        list(tokens[i: i + m]) == list(phrase)
        for i in range(len(tokens) - m + 1)
    )


@settings(max_examples=300, deadline=None)
@given(st.lists(TOK, max_size=30), st.lists(TOK, min_size=1, max_size=4))
def test_contains_phrase_matches_naive(tokens, phrase):
    assert contains_phrase(tokens, tuple(phrase)) == naive_contains(
        tokens, phrase
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(TOK, min_size=1, max_size=60))
def test_doc_positions_roundtrip(tokens):
    from webindex.build import TokenizeStage
    from webindex.config import SQL_SAFE_ANALYZER

    stage = TokenizeStage(SQL_SAFE_ANALYZER, store_positions=True)
    terms, counts, blobs = stage._doc_positions(tokens)
    # first-occurrence order + Counter counts
    seen = []
    for t in tokens:
        if t not in seen:
            seen.append(t)
    assert terms == seen
    assert counts == [tokens.count(t) for t in terms]
    # blobs decode to the exact positions (first absolute, then deltas)
    for t, c, blob in zip(terms, counts, blobs):
        gaps = varbyte_decode(blob)
        assert gaps.size == c
        pos = np.cumsum(gaps)
        want = [i for i, x in enumerate(tokens) if x == t]
        assert pos.tolist() == want


@settings(max_examples=400, deadline=None)
@given(
    st.text(alphabet="ab*?", min_size=0, max_size=8),
    st.text(alphabet="ab", min_size=0, max_size=10),
)
def test_wildcard_translate_matches_fnmatch(pattern, term):
    """The engine's glob->regex translation == fnmatch's native glob
    semantics, for every pattern/term over the joint alphabet."""
    import re
    from fnmatch import fnmatchcase

    from webindex.lexicon import wildcard_translate

    got = re.fullmatch(wildcard_translate(pattern), term) is not None
    assert got == fnmatchcase(term, pattern)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab1", min_size=1, max_size=3),
                max_size=40),
       st.integers(min_value=1, max_value=4))
def test_ngram_pos_hashes_matches_string_shingles(tokens, n):
    """Hash multiset == string-shingle multiset (no collisions on the
    generated space; equal strings always hash equal)."""
    from collections import Counter

    from webindex.dedup import _ngram_pos_hashes

    text = " ".join(tokens)
    acc = _ngram_pos_hashes(text, n, {})
    total = max(0, len(tokens) - n + 1)
    assert acc.size == total
    want = Counter(
        " ".join(tokens[i: i + n]) for i in range(total)
    )
    got = Counter(acc.tolist())
    assert sorted(got.values()) == sorted(want.values())
    assert len(got) == len(want)
