"""Gates for the generated-SQL oracle components: the SQL Porter stemmer
(webindex/pipelines/sql_porter.py) vs the Python reference, and the
unrolled BPE training replay (webindex/pipelines/sql_bpe.py) vs the
Python trainer — over the real corpus vocabulary PLUS adversarial word
sets (exhaustive short words over a y-heavy alphabet, random suffix
grafts)."""

import itertools
import random
import re

import duckdb
import pytest

from webindex.analyze import _ASCII_WORD_RE, porter_stem
from webindex.pipelines.sql_porter import porter_sql_stages

SF_DIR = "/root/testdata/sf0.001"


def _sql_stems(words):
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE vocab(word VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [(w,) for w in words])
    sql = ("WITH " + porter_sql_stages("vocab")
           + " SELECT word, stem FROM stem_map")
    return dict(con.execute(sql).fetchall())


def _want(w):
    return porter_stem(w) if re.match(r"^[a-z]+$", w) else w


def test_sql_porter_matches_python_on_corpus_and_vignettes():
    import pyarrow.parquet as pq

    vocab = set()
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    for txt in t.column("text").to_pylist():
        vocab.update(_ASCII_WORD_RE.findall((txt or "").lower()))
    vocab.update("""caresses ponies ties caress cats feed agreed plastered
        bled motoring sing conflated troubled sized hopping tanned falling
        hissing fizzed failing filing happy sky relational conditional
        rational valenci hesitanci digitizer conformabli radicalli
        differentli vileli analogousli vietnamization predication operator
        feudalism decisiveness hopefulness callousness formaliti
        sensitiviti sensibiliti triplicate formative formalize electriciti
        electrical hopeful goodness revival allowance inference airliner
        gyroscopic adjustable defensible irritant replacement adjustment
        dependent adoption homologou communism activate angulariti
        homologous effective bowdlerize probate rate cease controll roll
        generalization oscillation agreeable dyeing eyeing canoeing
        rhythm crying dying lying tying vying flying syzygy""".split())
    got = _sql_stems(sorted(vocab))
    bad = [(w, _want(w), got[w]) for w in vocab if got[w] != _want(w)]
    assert not bad, bad[:10]


def test_sql_porter_matches_python_adversarial():
    """Exhaustive short words over a y/vowel-heavy alphabet (the y
    consonant/vowel alternation edge cases) + random suffix grafts."""
    vocab = set()
    for n in range(1, 5):
        for tup in itertools.product("aeysztl", repeat=n):
            vocab.add("".join(tup))
    rng = random.Random(7)
    alpha = "abcdefgilmnoprstuvwxyz"
    sufs = ["s", "sses", "ies", "ed", "eed", "ing", "ational", "enci",
            "izer", "abli", "ization", "ator", "iveness", "aliti",
            "biliti", "icate", "ative", "alize", "ical", "ful", "ness",
            "al", "ance", "er", "ible", "ement", "ent", "ion", "ate",
            "ous", "ize", "e", "ll", "y", ""]
    for _ in range(800):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        vocab.add(base + rng.choice(sufs))
    got = _sql_stems(sorted(vocab))
    bad = [(w, _want(w), got[w]) for w in vocab if got[w] != _want(w)]
    assert not bad, bad[:10]


def test_sql_bpe_unrolled_matches_trainer():
    from collections import Counter

    import pyarrow.parquet as pq

    from webindex.bpe import train_bpe
    from webindex.pipelines.sql_bpe import sql_bpe_merges

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    got = sorted(con.execute(sql_bpe_merges(60)).fetchall())
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    wc = Counter()
    for txt in t.column("text").to_pylist():
        wc.update(re.findall(r"[a-z0-9]+", (txt or "").lower()))
    want = train_bpe(sorted(wc.items()), 60)
    assert [(a, b) for _, a, b in got] == want
    assert [r for r, _, _ in got] == list(range(len(want)))


def test_sql_bpe_early_stop_contiguous_ranks():
    """A corpus whose pairs dry up before num_merges: the SQL chain must
    emit exactly the trainer's (shorter) merge list."""
    from webindex.bpe import train_bpe

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(0, "ab ab"), (1, "ab cd"), (2, "cd")],
    )
    from webindex.pipelines.sql_bpe import sql_bpe_merges

    got = sorted(con.execute(sql_bpe_merges(30)).fetchall())
    want = train_bpe([("ab", 3), ("cd", 2)], 30)
    assert [(a, b) for _, a, b in got] == want
    assert len(want) < 30  # the early stop actually engaged
