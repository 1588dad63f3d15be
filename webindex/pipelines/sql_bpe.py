"""BPE training replay as generated (unrolled) DuckDB SQL.

``train_bpe``'s loop is inherently sequential, but its iteration count is
a pinned constant (100 merges for the contract entries), so the loop can
be UNROLLED into a generated CTE chain — one (pairs -> best -> rewrite)
round per merge — giving the ``bpe_merges`` / ``bpe_subword_counts``
entries full DuckDB oracles (previously rows-only).

Representation: a vocab entry's symbol sequence is a ``|``-delimited
string ``|c||a||t||</w>|``. Merging pair (a, b) everywhere is then ONE
``replace(s, '|a||b|', '|ab|')`` — string replace scans left-to-right
over non-overlapping occurrences, exactly the reference
``_merge_vocab`` semantics (``aaa`` + merge (a,a) -> ``aa a``), and the
full per-symbol delimiters mean a pattern can never match across symbol
boundaries (symbols are ``[a-z0-9]+`` or ``</w>`` — never contain a
pipe). Pair counts come from re-splitting the strings; the argmax
tie-break (count desc, then (a, b) lexicographic asc) is the same
byte-order comparison in SQL and Python.

For words that appear in the training corpus, the final vocab state IS
their encoded segmentation (greedy training replay == greedy encode for
in-vocab words — asserted by tests/test_bpe.py against the sequential
reference), which is what lets ``bpe_subword_counts`` reuse the same
chain.
"""

from __future__ import annotations

WORD_TOK_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def bpe_train_sql(num_merges: int) -> str:
    """CTE chain: documents -> ``merges(rank, a, b)`` and
    ``vocab_final(word, n_syms)`` after ``num_merges`` rounds."""
    parts = [f"""
wc AS (
  SELECT word, count(*)::BIGINT AS cnt
  FROM (SELECT unnest({WORD_TOK_SQL}) AS word FROM documents) t
  GROUP BY word
),
vocab_0 AS MATERIALIZED (
  SELECT word, cnt,
         '|' || array_to_string(str_split(word, ''), '||') || '||</w>|'
             AS s
  FROM wc
)"""]
    for k in range(num_merges):
        parts.append(f"""
syms_{k} AS MATERIALIZED (
  SELECT word, cnt, unnest(l) AS sym, unnest(range(len(l))) AS i
  FROM (SELECT word, cnt, str_split(trim(s, '|'), '||') AS l
        FROM vocab_{k})
),
pairs_{k} AS (
  SELECT x.sym AS a, y.sym AS b, sum(x.cnt)::BIGINT AS c
  FROM syms_{k} x
  JOIN syms_{k} y ON y.word = x.word AND y.i = x.i + 1
  GROUP BY x.sym, y.sym
  HAVING sum(x.cnt) >= 2
),
best_{k} AS MATERIALIZED (SELECT a, b FROM pairs_{k} ORDER BY c DESC, a, b LIMIT 1),
vocab_{k + 1} AS MATERIALIZED (
  SELECT v.word, v.cnt,
         CASE WHEN bb.a IS NULL THEN v.s
              ELSE replace(v.s, '|' || bb.a || '||' || bb.b || '|',
                           '|' || bb.a || bb.b || '|') END AS s
  FROM vocab_{k} v LEFT JOIN best_{k} bb ON TRUE
)""")
    union = "\n  UNION ALL ".join(
        f"SELECT {k}::BIGINT AS rank, a, b FROM best_{k}"
        for k in range(num_merges)
    )
    parts.append(f"""
merges AS (
  {union}
),
vocab_final AS (
  SELECT word, len(str_split(trim(s, '|'), '||'))::BIGINT AS n_syms
  FROM vocab_{num_merges}
)""")
    return ",".join(parts)


def sql_bpe_merges(num_merges: int = 100) -> str:
    return (f"WITH {bpe_train_sql(num_merges)}\n"
            "SELECT rank, a, b FROM merges")


def sql_bpe_subword_counts(num_merges: int = 100) -> str:
    return f"""WITH {bpe_train_sql(num_merges)},
dtoks AS (
  SELECT doc_id, unnest({WORD_TOK_SQL}) AS tok FROM documents
),
agg AS (
  SELECT d.doc_id, count(*)::BIGINT AS n_words,
         sum(v.n_syms)::BIGINT AS n_bpe_tokens
  FROM dtoks d JOIN vocab_final v ON v.word = d.tok
  GROUP BY d.doc_id
)
SELECT doc.doc_id,
       coalesce(a.n_words, 0)::BIGINT AS n_words,
       coalesce(a.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
FROM documents doc LEFT JOIN agg a ON a.doc_id = doc.doc_id
"""
