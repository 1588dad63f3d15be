"""Text analysis: the pinned ``english``-style analyzer chain.

The reference scores BM25 through Elasticsearch's ``english`` analyzer
(beir==0.2.3 BM25Search, invoked at
/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10).
ES internals are not in-repo, so per SURVEY.md §7.0 we pin a fully-specified
equivalent shared by engine and oracle:

    NFC normalize -> lowercase -> word tokenize -> Lucene English stopword
    filter (33 words) -> Porter (1980) stemmer

Tokenization: unicode word characters excluding underscore
(``[^\\W_]+``); in ``ascii_only`` mode ``[a-z0-9]+`` over the lowercased
text (matches what an ANSI-SQL oracle can express).

The Porter stemmer below is implemented from the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980 —
public domain algorithm); it is a fresh implementation, not copied code.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter

from webindex.config import AnalyzerConfig

# Lucene's EnglishAnalyzer default stopword set (33 words) — the list ES's
# ``english`` analyzer uses (public, from Lucene's StandardAnalyzer docs).
LUCENE_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)
_ASCII_WORD_RE = re.compile(r"[a-z0-9]+")

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    """True if word[i] is a consonant per Porter's definition."""
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in the stem."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem ``word`` (assumed lowercase ASCII letters) with Porter (1980)."""
    if len(word) <= 2:
        return word

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # Step 1b
    flag_1b = False
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    elif word.endswith("ed"):
        if _has_vowel(word[:-2]):
            word = word[:-2]
            flag_1b = True
    elif word.endswith("ing"):
        if _has_vowel(word[:-3]):
            word = word[:-3]
            flag_1b = True
    if flag_1b:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif _ends_double_cons(word) and word[-1] not in "lsz":
            word = word[:-1]
        elif _measure(word) == 1 and _cvc(word):
            word += "e"

    # Step 1c
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if _measure(stem) > 0:
                word = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if _measure(stem) > 0:
                word = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    continue
                word = stem
            break

    # Step 5a
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            word = stem

    # Step 5b
    if _measure(word) > 1 and _ends_double_cons(word) and word[-1] == "l":
        word = word[:-1]

    return word


_ASCII_ALPHA_RE = re.compile(r"^[a-z]+$")


class Analyzer:
    """Callable analysis chain with a per-instance stem memo cache.

    One instance per Ray actor / task worker (state amortized across
    batches, SURVEY.md §2.3) — the memo dict makes repeated stemming of a
    Zipf-distributed vocabulary near-free.
    """

    def __init__(self, cfg: AnalyzerConfig | None = None):
        self.cfg = cfg or AnalyzerConfig()
        self._stem_cache: dict[str, str] = {}
        self._syn = {t: list(s) for t, s in self.cfg.synonyms}

    def tokens(self, text: str) -> list[str]:
        """Analyze one document/query string into index terms."""
        cfg = self.cfg
        if not text:
            return []
        if not cfg.ascii_only:
            text = unicodedata.normalize("NFC", text)
        if cfg.lowercase:
            text = text.lower()
        raw = (
            _ASCII_WORD_RE.findall(text)
            if cfg.ascii_only
            else _WORD_RE.findall(text)
        )
        # list comprehensions keep the per-token work in C loops; semantics
        # identical to the one-pass reference loop (len gate -> stopword
        # gate -> memoized Porter stem)
        lo, hi = cfg.min_token_len, cfg.max_token_len
        # the long-token precheck is the hot path's second-biggest cost
        # after the regex itself: max(key=len) runs the length scan at C
        # speed vs a Python genexpr (measured ~45% of tokens() time)
        if lo > 1 or (raw and len(max(raw, key=len)) > hi):
            raw = [t for t in raw if lo <= len(t) <= hi]
        if cfg.remove_stopwords:
            stop = LUCENE_STOPWORDS
            raw = [t for t in raw if t not in stop]
        if cfg.stem:
            cache = self._stem_cache
            # set.difference + map stay in C on the warm (all-cached)
            # path — the per-token Python comprehensions measured ~15%
            # of tokens() under a hot memo
            miss = set(raw).difference(cache)
            for t in miss:
                # Porter is specified for English letters only; other
                # tokens (digits, non-ASCII) pass through unchanged.
                cache[t] = porter_stem(t) if _ASCII_ALPHA_RE.match(t) else t
            raw = list(map(cache.__getitem__, raw))
        if self._syn:
            # index-time synonym injection: mapped synonyms appended
            # verbatim (post-filter, counted in doclen — pinned spec, see
            # AnalyzerConfig.synonyms)
            syn = self._syn
            raw = raw + [s for t in raw if t in syn for s in syn[t]]
        if self.cfg.shingle_only:
            # Lucene index_phrases analog: emit word bigrams (space-
            # joined; analyzed tokens cannot contain spaces) INSTEAD of
            # unigrams — see AnalyzerConfig.shingle_only
            raw = [f"{a} {b}" for a, b in zip(raw, raw[1:])]
        return raw

    def term_freqs(self, text: str) -> Counter:
        return Counter(self.tokens(text))
