"""Analyzer chain + Porter stemmer.

Stemmer vectors are the canonical examples from the published algorithm
(Porter 1980); analyzer behavior is the spec pinned in SURVEY.md §7.0.
"""

from webindex.analyze import Analyzer, LUCENE_STOPWORDS, porter_stem
from webindex.config import AnalyzerConfig, SQL_SAFE_ANALYZER

PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "generalization": "gener", "oscillators": "oscil",
    "university": "univers", "universe": "univers",
}


def test_porter_vectors():
    for w, expect in PORTER_VECTORS.items():
        assert porter_stem(w) == expect, w


def test_stopword_list_is_lucene_33():
    assert len(LUCENE_STOPWORDS) == 33
    assert "the" in LUCENE_STOPWORDS and "with" in LUCENE_STOPWORDS


def test_default_chain():
    a = Analyzer()
    assert a.tokens("The QUICK brown foxes were Jumping over the lazy dogs!") == [
        "quick", "brown", "fox", "were", "jump", "over", "lazi", "dog",
    ]
    # stopwords removed, digits kept, underscores split
    assert a.tokens("a the 42 foo_bar") == ["42", "foo", "bar"]
    assert a.tokens("") == []
    assert a.tokens("   \n\t ") == []


def test_sql_safe_chain_no_stem_no_stop():
    a = Analyzer(SQL_SAFE_ANALYZER)
    assert a.tokens("The Foxes, jumping-высоко; a42b") == [
        "the", "foxes", "jumping", "a42b",
    ]


def test_term_freqs():
    a = Analyzer()
    tf = a.term_freqs("merge sort merge join merge")
    assert tf == {"merg": 3, "sort": 1, "join": 1}


def test_max_token_len_filter():
    a = Analyzer(AnalyzerConfig(max_token_len=5))
    assert a.tokens("short verylongtoken ok") == ["short", "ok"]


def test_index_time_synonyms_append_post_filter():
    from webindex.analyze import Analyzer
    from webindex.config import AnalyzerConfig

    cfg = AnalyzerConfig(
        remove_stopwords=False, stem=False, ascii_only=True,
        synonyms=(("slow", ("fast",)), ("scan", ("query", "lookup"))),
    )
    a = Analyzer(cfg)
    # each mapped token emits its synonyms, appended after the stream;
    # unmapped tokens pass through; synonyms count toward doclen
    assert a.tokens("slow scan slow") == [
        "slow", "scan", "slow", "fast", "query", "lookup", "fast",
    ]
    assert a.tokens("table merge") == ["table", "merge"]


def test_synonyms_config_roundtrip_and_positions_guard():
    from webindex.build import build_index
    from webindex.config import AnalyzerConfig, IndexConfig

    cfg = IndexConfig(
        analyzer=AnalyzerConfig(synonyms=[["slow", ["fast"]]]),
        store_positions=True,
    )
    # JSON-roundtripped lists normalize to tuples
    assert cfg.analyzer.synonyms == (("slow", ("fast",)),)
    assert IndexConfig.from_dict(cfg.to_dict()) == cfg
    import pytest as _pytest

    with _pytest.raises(ValueError, match="synonyms"):
        build_index(None, "/tmp/never-built", cfg)


def test_synonyms_shingle_only_guard():
    import pytest as _pytest

    from webindex.build import build_index
    from webindex.config import AnalyzerConfig, IndexConfig

    # synonym expansions are appended at the tail of the token stream,
    # so shingling would emit a bigram spanning last-real-token + first
    # synonym — the combination is refused at build time like
    # synonyms+store_positions
    cfg = IndexConfig(
        analyzer=AnalyzerConfig(
            synonyms=[["slow", ["fast"]]], shingle_only=True
        ),
    )
    with _pytest.raises(ValueError, match="shingle_only"):
        build_index(None, "/tmp/never-built", cfg)
