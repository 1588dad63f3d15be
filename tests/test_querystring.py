"""Lucene query_string parser + two-backend evaluation
(webindex/querystring.py): grammar shapes, error handling, and
bit-identity of the boolean-tree kernel with the dedicated single-feature
search paths it subsumes (plain OR match, AND match, must_not, boosts,
phrases, wildcards), plus shard-count invariance."""

import dataclasses

import numpy as np
import pyarrow as pa
import pytest

from webindex.analyze import Analyzer
from webindex.build import build_index
from webindex.config import SQL_SAFE_ANALYZER, IndexConfig
from webindex.querystring import (Bool, Nothing, Phrase, QueryStringError,
                                  Term, Wildcard, bind, parse_query_string,
                                  query_string_search)

CFG = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=8, block_size=32)

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "rare1 rare2").split()
N_DOCS = 160


def _make_docs():
    rng = np.random.default_rng(23)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(8, 40))
        words = [VOCAB[int(j)] for j in rng.integers(0, 10, size=n)]
        if i % 13 == 0:
            words.append("rare1")
        if i % 29 == 0:
            words.append("rare2")
        rows.append({"doc_id": i, "text": " ".join(words)})
    return rows


DOCS = _make_docs()


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("qsidx") / "idx")
    tab = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
        "text": pa.array([d["text"] for d in DOCS]),
    })
    # positions on: phrase leaves run the positional kernel
    build_index(rd.from_arrow(tab), out,
                dataclasses.replace(CFG, store_positions=True))
    return out


_AN = Analyzer(SQL_SAFE_ANALYZER)


def _b(q):
    return bind(parse_query_string(q), _AN)


# -- parser -----------------------------------------------------------------


def test_parse_shapes():
    assert _b("alpha") == Term("alpha")
    n = _b("alpha AND beta^2")
    assert n == Bool([("must", Term("alpha")), ("must", Term("beta", 2.0))])
    n = _b("alpha -beta")
    assert n == Bool([("should", Term("alpha")), ("must_not", Term("beta"))])
    n = _b('"alpha beta"~2^1.5')
    assert n == Phrase(["alpha", "beta"], slop=2, boost=1.5)
    n = _b("al*a")
    assert n == Wildcard("al*a")
    # a word that analyzes to nothing is a match-nothing leaf
    assert isinstance(_b("alpha OR '"), Bool)


def test_parse_errors():
    for bad in ["", "(alpha", "alpha)", "AND", "alpha AND", "-alpha",
                "NOT alpha", "^2"]:
        with pytest.raises(QueryStringError):
            _b(bad)


def test_not_requires_positive_sibling():
    n = _b("alpha AND NOT beta")
    assert n == Bool([("must", Term("alpha")), ("must_not", Term("beta"))])


# -- kernel bit-identity with the dedicated paths ----------------------------


def _runs(ds):
    rows = ds.take_all()
    return sorted((r["qid"], r["rank"], r["doc_id"], r["score"])
                  for r in rows)


def _search(index_dir, text, k=10, **kw):
    import ray.data as rd

    from webindex.search import search_queries

    qds = rd.from_arrow(pa.table({"qid": ["x"], "text": [text]}))
    return _runs(search_queries(qds, index_dir, top_k=k, **kw).map_batches(
        lambda t: t.select(["qid", "doc_id", "score", "rank"]),
        batch_format="pyarrow",
    ))


def test_or_equals_plain_match(index_dir):
    got = _runs(query_string_search([("x", "alpha beta")], index_dir))
    assert got == _search(index_dir, "alpha beta")


def test_and_equals_and_match(index_dir):
    got = _runs(query_string_search([("x", "alpha AND rare1")], index_dir))
    assert got == _search(index_dir, "alpha rare1", match="and")


def test_must_not_equals_must_not(index_dir):
    got = _runs(query_string_search([("x", "rare1 -beta")], index_dir))
    assert got == _search(index_dir, "rare1", must_not=["beta"])


def test_boost_equals_boosts(index_dir):
    got = _runs(query_string_search([("x", "alpha^2.0 rare2")], index_dir))
    assert got == _search(index_dir, "alpha rare2",
                          boosts={"alpha": 2.0})


def test_phrase_equals_positional_phrase(index_dir):
    got = _runs(query_string_search([("x", '"alpha beta"')], index_dir))
    assert got == _search(index_dir, "alpha beta", query_kind="phrase")


def test_wildcard_equals_wildcard_search(index_dir):
    from webindex.lexicon import wildcard_search

    got = _runs(query_string_search([("x", "rare*")], index_dir))
    want = _runs(wildcard_search([("x", "rare*")], index_dir,
                                 top_k=10).map_batches(
        lambda t: t.select(["qid", "doc_id", "score", "rank"]),
        batch_format="pyarrow",
    ))
    assert got == want


def test_group_composition(index_dir):
    """(rare1 OR rare2) AND alpha: brute per-doc oracle from the pinned
    spec over the synthetic corpus."""
    from webindex.oracle import OracleBM25

    o = OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)
    want = {}
    for d, text in [(d["doc_id"], d["text"]) for d in DOCS]:
        toks = set(text.split())
        if ("rare1" in toks or "rare2" in toks) and "alpha" in toks:
            sc = 0.0
            # engine sum order: source order rare1, rare2, alpha; each a
            # single-term contribution — order-insensitive here only
            # because we compare with tolerance
            for t in ("rare1", "rare2", "alpha"):
                if t in toks:
                    sc += dict(o.topk(t, 10**9)).get(d, 0.0)
            want[d] = sc
    got = {
        r["doc_id"]: r["score"]
        for r in query_string_search(
            [("x", "(rare1 OR rare2) AND alpha")], index_dir, top_k=10**9
        ).take_all()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_must_plus_optional_should_scores(index_dir):
    """+rare1 alpha: matches = rare1 docs; alpha contributes score only."""
    rows = query_string_search([("x", "+rare1 alpha")], index_dir,
                               top_k=10**9).take_all()
    match_set = {r["doc_id"] for r in rows}
    want = {d["doc_id"] for d in DOCS if "rare1" in d["text"].split()}
    assert match_set == want


def test_similarity_composition(index_dir):
    """similarity="boolean" through the boolean tree: score = number of
    matched scoring terms (must+should), boosts applied per leaf."""
    rows = query_string_search([("x", "alpha AND rare1")], index_dir,
                               top_k=10**9, similarity="boolean").take_all()
    assert rows and all(r["score"] == 2.0 for r in rows)
    rows = query_string_search([("x", "alpha^3.0 AND rare1")], index_dir,
                               top_k=10**9, similarity="boolean").take_all()
    assert rows and all(r["score"] == 4.0 for r in rows)


def test_shard_count_invariance(index_dir):
    a = _runs(query_string_search(
        [("x", "(alpha OR rare1) AND beta -rare2")], index_dir, n_shards=2))
    b = _runs(query_string_search(
        [("x", "(alpha OR rare1) AND beta -rare2")], index_dir, n_shards=7))
    assert a == b and a


# -- docvalue leaves (field:value / field:[LO TO HI]) -------------------------


LANGS = ["en", "de", "fr"]


@pytest.fixture(scope="module")
def dv_index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("qsdvidx") / "idx")
    tab = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
        "text": pa.array([d["text"] for d in DOCS]),
    })
    dv = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
        "lang": pa.array([LANGS[d["doc_id"] % 3] for d in DOCS]),
        "n_chars": pa.array([len(d["text"]) for d in DOCS], pa.int64()),
    })
    build_index(rd.from_arrow(tab), out, CFG,
                docvalues_ds=rd.from_arrow(dv))
    return out


def test_parse_dv_shapes():
    from webindex.querystring import DvRange, DvTerm

    assert _b("lang:en") == DvTerm("lang", "en")
    assert _b("lang:en^2.5") == DvTerm("lang", "en", 2.5)
    n = _b("alpha AND n_chars:[100 TO 400]")
    assert n == Bool([("must", Term("alpha")),
                      ("must", DvRange("n_chars", 100, 400))])
    assert _b("n_chars:[* TO 50]") == DvRange("n_chars", None, 50)
    assert _b("n_chars:[50 TO *]^3") == DvRange("n_chars", 50, None, 3.0)
    for bad in ["n_chars:[* TO *]", "n_chars:[a TO b]"]:
        with pytest.raises(QueryStringError):
            _b(bad)


def test_dv_term_filters_and_constant_scores(dv_index_dir):
    base = {d: s for _, _, d, s in
            _runs(query_string_search([("x", "rare1")], dv_index_dir,
                                      top_k=10**9))}
    got = _runs(query_string_search([("x", "rare1 AND lang:en")],
                                    dv_index_dir, top_k=10**9))
    assert got
    for _, _, did, score in got:
        assert LANGS[did % 3] == "en"
        # constant_score 1.0 added by the matching must-clause
        assert score == pytest.approx(base[did] + 1.0, abs=1e-12)
    want = {d for d in base if LANGS[d % 3] == "en"}
    assert {d for _, _, d, _ in got} == want


def test_dv_range_and_must_not(dv_index_dir):
    base = {d: s for _, _, d, s in
            _runs(query_string_search([("x", "rare1")], dv_index_dir,
                                      top_k=10**9))}
    lens = {d["doc_id"]: len(d["text"]) for d in DOCS}
    got = _runs(query_string_search(
        [("x", "rare1 AND n_chars:[100 TO *]^2")], dv_index_dir,
        top_k=10**9))
    assert got
    for _, _, did, score in got:
        assert lens[did] >= 100
        assert score == pytest.approx(base[did] + 2.0, abs=1e-12)
    # dv under must_not: filters, never scores
    got = _runs(query_string_search([("x", "rare1 -lang:de")],
                                    dv_index_dir, top_k=10**9))
    assert got
    assert all(LANGS[d % 3] != "de" for _, _, d, _ in got)
    assert all(s == pytest.approx(base[d], abs=1e-12)
               for _, _, d, s in got)


def test_dv_shard_count_invariance(dv_index_dir):
    q = [("x", "(alpha OR rare1) AND lang:fr n_chars:[* TO 300]")]
    a = _runs(query_string_search(q, dv_index_dir, n_shards=2))
    b = _runs(query_string_search(q, dv_index_dir, n_shards=7))
    assert a == b and a


def test_dv_to_sql_duckdb_identity(dv_index_dir):
    """to_sql over documents docvalues == the engine, exactly (DuckDB
    evaluates the generated per-query SELECT on a handmade contrib/dl)."""
    import duckdb

    from webindex.oracle import OracleBM25
    from webindex.querystring import to_sql

    oracle = OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)
    con = duckdb.connect()
    con.execute("CREATE TABLE dl (doc_id BIGINT, dl BIGINT)")
    con.executemany("INSERT INTO dl VALUES (?, ?)",
                    [(d, int(l)) for d, l in oracle.dl.items()])
    con.execute("CREATE TABLE contrib (doc_id BIGINT, term TEXT, c DOUBLE)")
    rows = []
    for t, plist in oracle.postings.items():
        idf_t = oracle.idf(t)
        for d, tf in plist.items():
            dlv = oracle.dl[d]
            denom = tf + CFG.k1 * (1.0 - CFG.b + CFG.b * (dlv / oracle.avgdl))
            rows.append((d, t, idf_t * (tf / denom)))
    con.executemany("INSERT INTO contrib VALUES (?, ?, ?)", rows)
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, lang TEXT, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(d["doc_id"], LANGS[d["doc_id"] % 3], len(d["text"]))
         for d in DOCS])
    for q in ["rare1 AND lang:en", "rare1 AND n_chars:[100 TO *]^2",
              "rare1 -lang:de", "lang:fr^2 rare2",
              "alpha AND (lang:en OR n_chars:[* TO 150])"]:
        sql = to_sql(_b(q), "x")
        want = sorted(con.execute(sql).fetchall())
        rows_e = query_string_search([("x", q)], dv_index_dir,
                                     top_k=10**9).take_all()
        got = sorted(("x", r["doc_id"], r["score"]) for r in rows_e)
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want], q
        for (_, _, gs), (_, _, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-12, q
    con.close()


# -- fielded TEXT terms (field:word scored with the per-field index) ----------


@pytest.fixture(scope="module")
def field_index_dirs(ray_session, tmp_path_factory):
    import ray.data as rd

    from webindex.multifield import build_field_indexes

    out = str(tmp_path_factory.mktemp("qsfidx"))
    tab = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
        "text": pa.array([d["text"] for d in DOCS]),
    })
    return build_field_indexes(rd.from_arrow(tab), out, CFG,
                               combined_dict=False)


def _field_oracles():
    from webindex.multifield import split_fields
    from webindex.oracle import OracleBM25

    tcorp, bcorp = [], []
    for d in DOCS:
        title, body = split_fields(d["text"])
        if title:
            tcorp.append((d["doc_id"], title))
        if body:
            bcorp.append((d["doc_id"], body))
    return OracleBM25(tcorp, CFG), OracleBM25(bcorp, CFG)


def test_parse_field_shapes_with_text_fields():
    from webindex.querystring import DvTerm, FieldTerm

    raw = parse_query_string("title:alpha lang:en")
    n = bind(raw, _AN, text_fields=("title", "body"))
    assert n == Bool([("should", FieldTerm("title", "alpha")),
                      ("should", DvTerm("lang", "en"))])
    # without text_fields the same parse binds to a docvalue predicate
    assert bind(parse_query_string("title:alpha"), _AN) == DvTerm(
        "title", "alpha"
    )
    with pytest.raises(QueryStringError):
        bind(parse_query_string("title:alp*"), _AN,
             text_fields=("title",))


def test_field_term_matches_per_field_oracle(index_dir, field_index_dirs):
    t_oracle, b_oracle = _field_oracles()
    fd = {"title": field_index_dirs["title"],
          "body": field_index_dirs["body"]}
    for field, oracle in (("title", t_oracle), ("body", b_oracle)):
        got = _runs(query_string_search(
            [("x", f"{field}:alpha")], index_dir, top_k=10**9,
            field_dirs=fd,
        ))
        want = dict(oracle.topk("alpha", 10**9))
        assert {d for _, _, d, _ in got} == set(want)
        for _, _, d, s in got:
            assert s == pytest.approx(want[d], rel=1e-12), (field, d)


def test_field_term_composes_with_default_and_dv(index_dir,
                                                 field_index_dirs):
    t_oracle, _ = _field_oracles()
    from webindex.oracle import OracleBM25

    full = OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)
    fd = {"title": field_index_dirs["title"],
          "body": field_index_dirs["body"]}
    got = _runs(query_string_search(
        [("x", "+title:alpha^2 rare1")], index_dir, top_k=10**9,
        field_dirs=fd,
    ))
    t_scores = dict(t_oracle.topk("alpha", 10**9))
    r_scores = dict(full.topk("rare1", 10**9))
    assert {d for _, _, d, _ in got} == set(t_scores)  # must-clause
    for _, _, d, s in got:
        want = t_scores[d] * 2.0 + r_scores.get(d, 0.0)
        assert s == pytest.approx(want, rel=1e-12), d


def test_field_term_shard_invariance(index_dir, field_index_dirs):
    fd = {"title": field_index_dirs["title"],
          "body": field_index_dirs["body"]}
    q = [("x", "(title:alpha OR body:rare1) beta -title:rare2")]
    a = _runs(query_string_search(q, index_dir, n_shards=2, field_dirs=fd))
    b = _runs(query_string_search(q, index_dir, n_shards=7, field_dirs=fd))
    assert a == b and a


def test_field_term_to_sql_duckdb_identity(index_dir, field_index_dirs):
    """to_sql with contrib_title / contrib_body tables == the engine."""
    import duckdb

    from webindex.querystring import to_sql

    t_oracle, b_oracle = _field_oracles()
    from webindex.oracle import OracleBM25

    full = OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)
    con = duckdb.connect()
    con.execute("CREATE TABLE dl (doc_id BIGINT, dl BIGINT)")
    con.executemany("INSERT INTO dl VALUES (?, ?)",
                    [(d, int(l)) for d, l in full.dl.items()])

    def contrib_rows(oracle):
        rows = []
        for t, plist in oracle.postings.items():
            idf_t = oracle.idf(t)
            for d, tf in plist.items():
                dlv = oracle.dl[d]
                denom = tf + CFG.k1 * (
                    1.0 - CFG.b + CFG.b * (dlv / oracle.avgdl)
                )
                rows.append((d, t, idf_t * (tf / denom)))
        return rows

    for name, oracle in [("contrib", full), ("contrib_title", t_oracle),
                         ("contrib_body", b_oracle)]:
        con.execute(
            f"CREATE TABLE {name} (doc_id BIGINT, term TEXT, c DOUBLE)"
        )
        con.executemany(f"INSERT INTO {name} VALUES (?, ?, ?)",
                        contrib_rows(oracle))
    fd = {"title": field_index_dirs["title"],
          "body": field_index_dirs["body"]}
    for q in ["title:alpha", "+title:alpha^2 rare1",
              "(title:alpha OR body:rare1) beta",
              "body:rare1 -title:rare2"]:
        ast = bind(parse_query_string(q), _AN,
                   text_fields=("title", "body"))
        sql = to_sql(ast, "x")
        want = sorted(con.execute(sql).fetchall())
        rows_e = query_string_search([("x", q)], index_dir, top_k=10**9,
                                     field_dirs=fd).take_all()
        got = sorted(("x", r["doc_id"], r["score"]) for r in rows_e)
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want], q
        for (_, _, gs), (_, _, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-12, q
    con.close()


def test_fuzzy_leaf_equals_fuzzy_search(index_dir):
    """query_string `word~N` == the dedicated fuzzy path (same Lucene
    top-terms rewrite, each expansion with its own idf)."""
    from webindex.lexicon import fuzzy_search

    got = _runs(query_string_search([("x", "rare1~1")], index_dir))
    want = _runs(fuzzy_search([("x", "rare1")], index_dir, top_k=10,
                              max_edits=1, max_expansions=50).map_batches(
        lambda t: t.select(["qid", "doc_id", "score", "rank"]),
        batch_format="pyarrow",
    ))
    assert want and got == want


def test_fuzzy_leaf_edits_and_composition(index_dir):
    """~0 == the exact term; bare ~ widens to 2 edits (superset of 1);
    fuzzy composes with plain terms through the bool tree."""
    exact = _runs(query_string_search([("x", "rare1~0")], index_dir))
    plain = _runs(query_string_search([("x", "rare1")], index_dir))
    assert exact == plain
    one = {r[2] for r in _runs(
        query_string_search([("x", "rare1~1")], index_dir, top_k=1000))}
    two = {r[2] for r in _runs(
        query_string_search([("x", "rare1~")], index_dir, top_k=1000))}
    # rare1 -> rare1/rare2 at 1 edit; 2 edits must never shrink matches
    assert one and one <= two
    both = _runs(query_string_search([("x", "alpha rare2~1")], index_dir))
    assert both  # composes without error


def test_fuzzy_wildcard_mix_rejected():
    with pytest.raises(QueryStringError, match="fuzzy and wildcard"):
        parse_query_string("ra*e~1")
