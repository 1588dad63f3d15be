"""Porter (1980) stemmer as generated DuckDB SQL.

Generates a CTE chain that maps a vocabulary CTE ``<src>(word)`` (lowercase
ASCII words) to ``stem_map(word, stem)`` replaying
:func:`webindex.analyze.porter_stem` rule for rule — the oracle side of the
``bm25_stemmed_top10`` contract entry (the SQL_SAFE_ANALYZER precedent
extended to the full english chain).

Two structural facts make this tractable in SQL:

1. Porter's consonant/vowel classification of position ``i`` depends only
   on characters at positions ``<= i`` (the ``y``-after-consonant rule
   looks left), so the CV pattern of any PREFIX of ``w`` is a prefix of
   ``cv(w)``. Every measure/vowel condition Porter tests is on a prefix of
   the current word (suffix replacements are only ever applied, never
   re-tested within a step), so each stage computes ONE ``cv`` column and
   answers all its conditions with ``left(cv, n - k)`` substrings.
2. ``m`` (the number of VC sequences) equals the count of adjacent ``VC``
   pairs in the UNcollapsed pattern — one ``regexp_extract_all`` per test.

The ``y`` resolution (y is a consonant at position 0 or after a vowel)
iterates a left-to-right rewrite; ``_Y_PASSES`` passes resolve runs of up
to ``_Y_PASSES`` consecutive ``y``'s exactly (longer runs do not occur in
English text; the pytest gate compares against the Python Porter over the
full corpus + query vocabulary and a generated word list).
"""

from __future__ import annotations

from webindex.analyze import _STEP2, _STEP3, _STEP4

_Y_PASSES = 6


def _cv(w: str) -> str:
    """SQL expr: resolved C/V pattern of word expression ``w``."""
    x = (f"regexp_replace(regexp_replace({w}, '[aeiou]', 'V', 'g'), "
         f"'[^Vy]', 'C', 'g')")
    for _ in range(_Y_PASSES):
        x = (f"regexp_replace(regexp_replace(regexp_replace({x}, "
             f"'^y', 'C'), 'Vy', 'VC', 'g'), 'Cy', 'CV', 'g')")
    return x


def _m_prefix(k: str | int) -> str:
    """SQL expr: Porter measure of w's prefix dropping ``k`` tail chars
    (columns ``cv``/``n`` must be in scope)."""
    return (f"len(regexp_extract_all(left(cv, greatest(n - {k}, 0)), "
            f"'VC'))")


def _vowel_prefix(k: str | int) -> str:
    return f"contains(left(cv, greatest(n - {k}, 0)), 'V')"


# *d: ends with a double consonant (equal letters share a class, and a
# 'yy' tail alternates classes, so right(cv,2)='CC' plus letter equality
# is exactly Porter's test)
_DBL = ("(n >= 2 AND substr(w, n - 1, 1) = substr(w, n, 1) "
        "AND right(cv, 1) = 'C')")
# *o on the prefix dropping k chars: cvc tail where the final c is not
# w/x/y
def _cvc_prefix(k: str | int) -> str:
    return (f"(n - {k} >= 3 AND right(left(cv, n - {k}), 3) = 'CVC' "
            f"AND substr(w, n - {k}, 1) NOT IN ('w', 'x', 'y'))")


def _rule_case(rules, cond_fn, default: str = "w") -> str:
    """First-match-in-LIST-ORDER suffix CASE (Porter breaks on the first
    endswith, even when the measure condition then fails)."""
    arms = []
    for suf, rep in rules:
        k = len(suf)
        arms.append(
            f"WHEN ends_with(w, '{suf}') THEN "
            f"CASE WHEN {cond_fn(suf, k)} "
            f"THEN left(w, n - {k}) || '{rep}' ELSE w END"
        )
    return "CASE " + " ".join(arms) + f" ELSE {default} END"


def porter_sql_stages(src: str) -> str:
    """CTE chain ``<src>(word)`` -> ``stem_map(word, stem)``.

    Words of length <= 2 or containing non-letters pass through unchanged
    (the Analyzer applies Porter only to ``^[a-z]+$`` tokens)."""
    s2 = _rule_case(_STEP2, lambda s, k: f"{_m_prefix(k)} > 0")
    s3 = _rule_case(_STEP3, lambda s, k: f"{_m_prefix(k)} > 0")

    # step 4: drop the suffix when m(prefix) > 1; the 'ion' rule demands
    # the prefix end in s/t — its 'continue' in the reference loop can
    # never reach a later suffix (none of ou/ism/ate/iti/ous/ive/ize is a
    # suffix of a word ending 'ion'), so first-match CASE is exact
    def s4_cond(suf, k):
        base = f"{_m_prefix(k)} > 1"
        if suf == "ion":
            return (f"({base} AND n - {k} >= 1 "
                    f"AND substr(w, n - {k}, 1) IN ('s', 't'))")
        return base

    s4 = _rule_case([(s, "") for s in _STEP4], s4_cond)

    return f"""
p0 AS (
  SELECT word,
         (length(word) <= 2 OR NOT regexp_matches(word, '^[a-z]+$'))
             AS skip,
         word AS w
  FROM {src}
),
-- step 1a: plural stripping
p1a AS (
  SELECT word, skip,
    CASE WHEN ends_with(w, 'sses') THEN left(w, length(w) - 2)
         WHEN ends_with(w, 'ies')  THEN left(w, length(w) - 2)
         WHEN ends_with(w, 'ss')   THEN w
         WHEN ends_with(w, 's')    THEN left(w, length(w) - 1)
         ELSE w END AS w
  FROM p0
),
-- step 1b part 1: eed/ed/ing with measure/vowel gates on the prefix
p1b_cv AS (SELECT word, skip, w, {_cv('w')} AS cv, length(w) AS n
           FROM p1a),
p1b AS (
  SELECT word, skip,
    CASE WHEN ends_with(w, 'eed') THEN
           CASE WHEN {_m_prefix(3)} > 0 THEN left(w, n - 1) ELSE w END
         WHEN ends_with(w, 'ed') THEN
           CASE WHEN {_vowel_prefix(2)} THEN left(w, n - 2) ELSE w END
         WHEN ends_with(w, 'ing') THEN
           CASE WHEN {_vowel_prefix(3)} THEN left(w, n - 3) ELSE w END
         ELSE w END AS w,
    (CASE WHEN ends_with(w, 'eed') THEN FALSE
          WHEN ends_with(w, 'ed') THEN {_vowel_prefix(2)}
          WHEN ends_with(w, 'ing') THEN {_vowel_prefix(3)}
          ELSE FALSE END) AS flag1b
  FROM p1b_cv
),
-- step 1b part 2: post-removal fixups on the NEW word
p1b2_cv AS (SELECT word, skip, w, flag1b, {_cv('w')} AS cv, length(w) AS n
            FROM p1b),
p1b2 AS (
  SELECT word, skip,
    CASE WHEN NOT flag1b THEN w
         WHEN ends_with(w, 'at') OR ends_with(w, 'bl')
              OR ends_with(w, 'iz') THEN w || 'e'
         WHEN {_DBL} AND substr(w, n, 1) NOT IN ('l', 's', 'z')
           THEN left(w, n - 1)
         WHEN {_m_prefix(0)} = 1 AND {_cvc_prefix(0)} THEN w || 'e'
         ELSE w END AS w
  FROM p1b2_cv
),
-- step 1c: terminal y -> i when the stem has a vowel
p1c_cv AS (SELECT word, skip, w, {_cv('w')} AS cv, length(w) AS n
           FROM p1b2),
p1c AS (
  SELECT word, skip,
    CASE WHEN ends_with(w, 'y') AND {_vowel_prefix(1)}
         THEN left(w, n - 1) || 'i' ELSE w END AS w
  FROM p1c_cv
),
-- step 2 (m > 0 suffix mappings, first match in list order)
p2_cv AS (SELECT word, skip, w, {_cv('w')} AS cv, length(w) AS n
          FROM p1c),
p2 AS (SELECT word, skip, {s2} AS w FROM p2_cv),
-- step 3
p3_cv AS (SELECT word, skip, w, {_cv('w')} AS cv, length(w) AS n
          FROM p2),
p3 AS (SELECT word, skip, {s3} AS w FROM p3_cv),
-- step 4 (m > 1 strip)
p4_cv AS (SELECT word, skip, w, {_cv('w')} AS cv, length(w) AS n
          FROM p3),
p4 AS (SELECT word, skip, {s4} AS w FROM p4_cv),
-- step 5a: drop terminal e when m > 1, or m = 1 and not *o
p5a_cv AS (SELECT word, skip, w, {_cv('w')} AS cv, length(w) AS n
           FROM p4),
p5a AS (
  SELECT word, skip,
    CASE WHEN ends_with(w, 'e')
              AND ({_m_prefix(1)} > 1
                   OR ({_m_prefix(1)} = 1 AND NOT {_cvc_prefix(1)}))
         THEN left(w, n - 1) ELSE w END AS w
  FROM p5a_cv
),
-- step 5b: -ll -> -l when m > 1
p5b_cv AS (SELECT word, skip, w, {_cv('w')} AS cv, length(w) AS n
           FROM p5a),
p5b AS (
  SELECT word, skip,
    CASE WHEN {_m_prefix(0)} > 1 AND {_DBL} AND substr(w, n, 1) = 'l'
         THEN left(w, n - 1) ELSE w END AS w
  FROM p5b_cv
),
stem_map AS (
  SELECT word, CASE WHEN skip THEN word ELSE w END AS stem FROM p5b
)"""
