"""Lucene-style ``query_string`` queries: one parser, one AST, two
bit-identical backends (the dense numpy shard kernel and a generated
DuckDB oracle).

The reference drives ES through the beir dep's fixed ``multi_match``
template (/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb
cell 10); ES itself exposes the full Lucene query-string syntax on the
same index. This module pins a CLEAN grammar (classic Lucene's precedence
is famously inconsistent; ours is conventional and documented):

    query  := or
    or     := and ((OR | <adjacency>) and)*      -- default_operator=OR
    and    := unary (AND unary)*
    unary  := (NOT | '+' | '-')* atom ('^' NUMBER)?
    atom   := '(' or ')' | '"' words '"' ('~' INT)? | WORD ('~' [012])?
            | FIELD ':' VALUE | FIELD ':[' (INT|'*') TO (INT|'*') ']'

and maps it onto the Lucene BooleanQuery model: an OR-group's clauses are
``should`` (plus ``must``/``must_not`` for +/-/NOT-prefixed clauses), an
AND-group's clauses are ``must``. Match semantics (per document):

    all must match  AND  no must_not matches
    AND (>=1 should matches, unless any must exists — then should optional)

Score = sum of the MATCHING must+should clauses' scores, added in source
(left-to-right) order, float64; a clause under ``must_not`` never scores.
Leaf scores are the pinned BM25 contribution (webindex/scoring.py), times
the ``^boost`` when one is written (boost == 1 multiplies nothing, so the
float ops match the SQL text exactly). Pure-negative queries raise.

WORD leaves are analyzed with the index analyzer (a word analyzing to
multiple terms becomes a should-group; to zero terms, a match-nothing
leaf). Words containing ``*``/``?`` are Lucene wildcards: expanded ONCE
on the driver against the dictionary (top ``max_expansions`` by df desc,
term asc — the shared multi-term rewrite, webindex/lexicon.py), each
expansion scored with its own idf, summed in expansion order. Quoted
phrases run the positional index kernel (webindex/positional.py) and
score like match_phrase (ascending-term BM25 sum over the phrase's
unique terms); ``~N`` is span_near slop.

``field:value`` / ``field:[LO TO HI]`` leaves are DOCVALUE predicates
(the index's attribute sidecar — lang, source, n_chars in the contract
index), scored as Lucene constant_score: ``boost`` when the predicate
holds, never matching a doc without docvalues. They compose with every
boolean role (a ``+lang:en`` must-clause is exactly ES's
filter-in-query-context).

When ``query_string_search`` is given ``field_dirs`` (per-field TEXT
indexes from webindex/multifield.py), ``field:word`` for those fields is
the Lucene FIELDED query instead: the word analyzes with the shared
analyzer and scores with THAT field's own BM25 statistics (its own N,
avgdl, df — ES's per-field scoring), mapped onto the default index's
doc space; any other ``field:`` name stays a docvalue predicate.

``to_sql`` compiles the SAME AST to a DuckDB expression per document —
the additions and CASE-zeroings mirror the kernel op for op (x + 0.0 and
x * 1.0-free, left-assoc), so contract hashes are exact, not approximate.
Phrases and wildcards are engine+pytest surfaces (their SQL would need
the positional self-join / dictionary-rewrite CTEs already proven by the
dedicated phrase/wildcard entries); ``to_sql`` raises on them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Term:
    """One already-analyzed index term."""

    term: str
    boost: float = 1.0


@dataclass
class Phrase:
    """Quoted phrase (analyzed tokens, in order), optional slop."""

    tokens: list[str]
    slop: int = 0
    boost: float = 1.0


@dataclass
class Wildcard:
    """Unexpanded ``*``/``?`` pattern; ``expansions`` filled driver-side."""

    pattern: str
    boost: float = 1.0
    expansions: list[str] | None = None


@dataclass
class Nothing:
    """A leaf that matches no document (e.g. a fully-stopworded word)."""

    boost: float = 1.0


@dataclass
class DvTerm:
    """``field:value`` — docvalue equality, constant score ``boost`` when
    matched (the Lucene constant-score filter-in-query-context model;
    fields are DOCVALUES here — per-field TEXT search is the multifield
    module). Digit-only values compare as int64."""

    col: str
    value: str
    boost: float = 1.0


@dataclass
class DvRange:
    """``field:[LO TO HI]`` — inclusive int docvalue range (``*`` opens
    an end), constant score ``boost`` when matched."""

    col: str
    lo: int | None
    hi: int | None
    boost: float = 1.0


@dataclass
class FieldTerm:
    """``field:word`` where ``field`` is a TEXT field with its own
    per-field index (webindex/multifield.py build_field_indexes):
    scored with THAT index's BM25 statistics (its own N, avgdl, df —
    exactly how ES scores a fielded term), mapped onto the default
    index's doc space. Produced by ``bind(..., text_fields=...)``; a
    ``field:`` name not in ``text_fields`` stays a docvalue DvTerm."""

    field: str
    term: str
    boost: float = 1.0


@dataclass
class Bool:
    """Lucene BooleanQuery: ordered (role, node) clauses, role in
    {"must", "should", "must_not"}. Order is source order — it pins the
    float summation order."""

    clauses: list[tuple[str, object]] = field(default_factory=list)

    def roles(self, *names):
        return [n for r, n in self.clauses if r in names]


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r'\s*(?:(?P<lp>\()|(?P<rp>\))'
    r'|(?P<phrase>"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?)'
    r"|(?P<range>[A-Za-z_][A-Za-z0-9_]*:\[[^\]]+\](?:\^\d+(?:\.\d+)?)?)"
    r"|(?P<plus>\+)|(?P<minus>-)"
    r'|(?P<word>[^\s()+"]+))'
)
_FIELD_RE = re.compile(r"^(?P<col>[A-Za-z_][A-Za-z0-9_]*):(?P<val>.+)$")
_RANGE_RE = re.compile(
    r"^(?P<col>[A-Za-z_][A-Za-z0-9_]*):"
    r"\[(?P<lo>\*|-?\d+) TO (?P<hi>\*|-?\d+)\]$"
)
_BOOST_RE = re.compile(r"^(?P<body>.*?)\^(?P<boost>\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"^(?P<body>[^~]+)~(?P<edits>[012]?)$")


class QueryStringError(ValueError):
    pass


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if m is None:
            if q[i:].strip():
                raise QueryStringError(f"cannot tokenize at: {q[i:]!r}")
            break
        i = m.end()
        for kind in ("lp", "rp", "phrase", "range", "plus", "minus",
                     "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _Parser:
    """Recursive descent over the pinned grammar. Produces raw nodes with
    words UNanalyzed (strings); ``bind`` resolves them against an
    analyzer + optional wildcard expansions."""

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek()[0] is not None:
            raise QueryStringError(f"unexpected token {self.peek()[1]!r}")
        return node

    def or_expr(self):
        clauses = [self.and_expr()]
        while True:
            kind, val = self.peek()
            if kind is None or kind == "rp":
                break
            if kind == "word" and val == "OR":
                self.next()
                clauses.append(self.and_expr())
            else:  # adjacency = implicit OR (default_operator)
                clauses.append(self.and_expr())
        if len(clauses) == 1 and clauses[0][0] == "plain":
            return clauses[0][1]
        out = Bool()
        for sign, node in clauses:
            role = {"plain": "should", "must": "must", "not": "must_not"}[sign]
            out.clauses.append((role, node))
        return out

    def and_expr(self):
        first = self.unary()
        clauses = [first]
        while True:
            kind, val = self.peek()
            if kind == "word" and val == "AND":
                self.next()
                clauses.append(self.unary())
            else:
                break
        if len(clauses) == 1:
            return first  # propagate the sign to the or-level
        out = Bool()
        for sign, node in clauses:
            # inside an AND group, plain and '+' are both must
            role = {"plain": "must", "must": "must", "not": "must_not"}[sign]
            out.clauses.append((role, node))
        return ("plain", out)

    def unary(self):
        sign = "plain"
        while True:
            kind, val = self.peek()
            if kind == "plus":
                self.next()
                sign = "must"
            elif kind == "minus":
                self.next()
                sign = "not"
            elif kind == "word" and val == "NOT":
                self.next()
                sign = "not"
            else:
                break
        return (sign, self.atom())

    def atom(self):
        kind, val = self.next()
        if kind == "lp":
            node = self.or_expr()
            k2, v2 = self.next()
            if k2 != "rp":
                raise QueryStringError("unbalanced parenthesis")
            return node
        if kind == "phrase":
            body, boost, slop = val, 1.0, 0
            if "^" in body:
                body, _, b = body.rpartition("^")
                boost = float(b)
            if not body.endswith('"'):
                body, _, s = body.rpartition("~")
                slop = int(s)
            return ("rawphrase", body[1:-1], slop, boost)
        if kind == "range":
            boost = 1.0
            if not val.endswith("]"):
                val, _, b = val.rpartition("^")
                boost = float(b)
            m = _RANGE_RE.match(val)
            if m is None:
                raise QueryStringError(f"malformed range {val!r} "
                                       "(use field:[LO TO HI])")
            lo = None if m.group("lo") == "*" else int(m.group("lo"))
            hi = None if m.group("hi") == "*" else int(m.group("hi"))
            if lo is None and hi is None:
                raise QueryStringError("range with both ends open")
            return DvRange(m.group("col"), lo, hi, boost)
        if kind == "word":
            if val in ("AND", "OR", "NOT"):
                raise QueryStringError(f"dangling operator {val}")
            boost = 1.0
            m = _BOOST_RE.match(val)
            if m:
                val, boost = m.group("body"), float(m.group("boost"))
                if not val:
                    raise QueryStringError("boost without a term")
            fm = _FIELD_RE.match(val)
            if fm:
                return ("rawfield", fm.group("col"), fm.group("val"),
                        boost)
            zm = _FUZZY_RE.match(val)
            if zm:
                body = zm.group("body")
                if "*" in body or "?" in body:
                    raise QueryStringError(
                        f"fuzzy and wildcard do not combine: {val!r}"
                    )
                edits = int(zm.group("edits") or 2)  # bare ~ = 2 (Lucene)
                return ("rawfuzzy", body, edits, boost)
            return ("rawword", val, boost)
        raise QueryStringError(f"unexpected {val!r}")


def parse_query_string(q: str):
    """Query string -> raw AST (words/phrases not yet analyzed)."""
    toks = _tokenize(q)
    if not toks:
        raise QueryStringError("empty query string")
    return _Parser(toks).parse()


# ---------------------------------------------------------------------------
# analyzer binding
# ---------------------------------------------------------------------------


def bind(node, analyzer, expansions: dict[str, list[str]] | None = None,
         text_fields: tuple[str, ...] = ()):
    """Resolve raw words/phrases into Term/Phrase/Wildcard leaves using
    the index analyzer. ``expansions`` maps a lowercased wildcard pattern
    to its dictionary expansion list (driver-side rewrite).
    ``text_fields`` names the fields with per-field TEXT indexes —
    ``field:value`` binds to FieldTerm for those (value analyzed with
    the shared analyzer), DvTerm (docvalue predicate) otherwise."""
    if isinstance(node, tuple):
        kind = node[0]
        if kind == "rawfield":
            _, col, val, boost = node
            if col not in text_fields:
                return DvTerm(col, val, boost)
            if "*" in val or "?" in val:
                raise QueryStringError(
                    f"wildcards inside text-field terms ({col}:{val}) "
                    "are not supported"
                )
            terms = analyzer.tokens(val)
            if not terms:
                return Nothing(boost)
            if len(terms) == 1:
                return FieldTerm(col, terms[0], boost)
            return Bool([("should", FieldTerm(col, t, boost))
                         for t in terms])
        if kind == "rawfuzzy":
            # the Lucene top-terms fuzzy rewrite: the analyzed term's
            # dictionary neighbours within N edits, each scored with its
            # OWN idf (df desc, term asc order — same as wildcards);
            # reuses the Wildcard leaf, whose eval is exactly that
            _, word, edits, boost = node
            terms = analyzer.tokens(word)
            if not terms:
                return Nothing(boost)
            if len(terms) != 1:
                raise QueryStringError(
                    f"fuzzy word must analyze to one term: {word!r}"
                )
            key = f"{terms[0]}~{edits}"
            return Wildcard(key, boost, (expansions or {}).get(key))
        if kind == "rawword":
            _, word, boost = node
            if "*" in word or "?" in word:
                pat = word.lower()
                return Wildcard(pat, boost,
                                (expansions or {}).get(pat))
            terms = analyzer.tokens(word)
            if not terms:
                return Nothing(boost)
            if len(terms) == 1:
                return Term(terms[0], boost)
            return Bool([("should", Term(t, boost)) for t in terms])
        if kind == "rawphrase":
            _, words, slop, boost = node
            toks = analyzer.tokens(words)
            if not toks:
                return Nothing(boost)
            if len(toks) == 1:
                return Term(toks[0], boost)
            return Phrase(toks, slop, boost)
        raise QueryStringError(f"unbound node {node!r}")
    if isinstance(node, Bool):
        out = Bool()
        has_positive = False
        for role, child in node.clauses:
            b = bind(child, analyzer, expansions, text_fields)
            out.clauses.append((role, b))
            if role != "must_not":
                has_positive = True
        if not has_positive:
            raise QueryStringError("pure-negative query matches nothing")
        return out
    return node


def fuzzy_patterns(node) -> list[tuple[str, int]]:
    """All (word, edits) fuzzy leaves in a raw AST (driver rewrite)."""
    if isinstance(node, tuple):
        if node[0] == "rawfuzzy":
            return [(node[1], node[2])]
        return []
    if isinstance(node, Bool):
        out = []
        for _, c in node.clauses:
            out.extend(fuzzy_patterns(c))
        return out
    return []


def wildcard_patterns(node) -> list[str]:
    """All wildcard patterns in a raw AST (for the driver-side rewrite)."""
    if isinstance(node, tuple):
        if node[0] == "rawword":
            w = node[1]
            return [w.lower()] if ("*" in w or "?" in w) else []
        return []
    if isinstance(node, Bool):
        out = []
        for _, c in node.clauses:
            out.extend(wildcard_patterns(c))
        return out
    return []


# ---------------------------------------------------------------------------
# engine backend: dense (mask, score) evaluation per shard
# ---------------------------------------------------------------------------


def _contrib(pl, reader, similarity: str) -> np.ndarray:
    """Per-posting contribution under the similarity. ``"bm25"`` is the
    pinned default (webindex/scoring.py); any other name routes to the
    pluggable modules (webindex/similarity.py)."""
    if similarity == "bm25":
        return pl.dense_contrib
    from webindex.similarity import sim_contrib

    return sim_contrib(pl, reader, similarity)


def _leaf_term(reader, term: str, boost: float, n: int, similarity: str):
    from webindex.wand import _dense

    mask = np.zeros(n, dtype=bool)
    score = np.zeros(n, dtype=np.float64)
    pl = reader.postings(term)
    if pl is not None:
        _dense(pl, reader)
        c = _contrib(pl, reader, similarity)
        if boost != 1.0:
            c = c * boost
        mask[pl.dense_pos] = True
        score[pl.dense_pos] = c
    return mask, score


def _leaf_field_term(reader, fr, term: str, boost: float, n: int,
                     similarity: str):
    """FieldTerm leaf: contributions computed against the FIELD reader's
    own statistics, scattered onto the DEFAULT reader's doc positions
    (field corpora are subsets of the text corpus; a field doc missing
    from the default doclen table fails loudly — the segments.doclen
    precedent, never a silent neighbor)."""
    from webindex.wand import _dense

    mask = np.zeros(n, dtype=bool)
    score = np.zeros(n, dtype=np.float64)
    pl = fr.postings(term)
    if pl is not None:
        _dense(pl, fr)
        c = _contrib(pl, fr, similarity)
        if boost != 1.0:
            c = c * boost
        ids = fr._dl_ids[pl.dense_pos]
        pos = np.searchsorted(reader._dl_ids, ids)
        pos_c = np.minimum(pos, max(reader._dl_ids.size - 1, 0))
        if ids.size and not np.array_equal(reader._dl_ids[pos_c], ids):
            raise AssertionError(
                "field index contains docs absent from the default "
                "index (build both over the same corpus / docID range)"
            )
        mask[pos_c] = True
        score[pos_c] = c
    return mask, score


def eval_node(node, reader, similarity: str = "bm25", field_readers=None):
    """AST -> (mask: bool[n], score: float64[n]); score is 0 outside the
    mask. n = the reader's resident doclen-table size (shard-bounded).
    ``field_readers`` maps a text-field name to its per-field
    SegmentReader (same docID range as ``reader``)."""
    n = reader._dl_ids.size
    if isinstance(node, Term):
        return _leaf_term(reader, node.term, node.boost, n, similarity)
    if isinstance(node, FieldTerm):
        fr = (field_readers or {}).get(node.field)
        if fr is None:
            raise QueryStringError(
                f"no field reader for text field {node.field!r} "
                "(pass field_dirs= to query_string_search)"
            )
        return _leaf_field_term(reader, fr, node.term, node.boost, n,
                                similarity)
    if isinstance(node, Nothing):
        return np.zeros(n, dtype=bool), np.zeros(n, dtype=np.float64)
    if isinstance(node, (DvTerm, DvRange)):
        if isinstance(node, DvTerm):
            v = node.value
            val = int(v) if v.lstrip("-").isdigit() else v
            pred = ((node.col, "==", val),)
        else:
            clauses = []
            if node.lo is not None:
                clauses.append((node.col, ">=", node.lo))
            if node.hi is not None:
                clauses.append((node.col, "<=", node.hi))
            pred = tuple(clauses)
        mask = reader.filter_mask(pred)  # cached bitset: read-only
        score = np.zeros(n, dtype=np.float64)
        score[mask] = node.boost  # constant_score
        return mask, score
    if isinstance(node, Wildcard):
        # expansion order (df desc, term asc) pins the summation order
        mask = np.zeros(n, dtype=bool)
        score = np.zeros(n, dtype=np.float64)
        for t in node.expansions or []:
            m, s = _leaf_term(reader, t, node.boost, n, similarity)
            mask |= m
            score += s
        return mask, score
    if isinstance(node, Phrase):
        from webindex.positional import phrase_topk, span_near_topk
        from webindex.wand import _dense

        fn = span_near_topk if node.slop else phrase_topk
        kw = {"slop": node.slop} if node.slop else {}
        ids, _ = fn(reader, node.tokens, max(n, 1), **kw)
        mask = np.zeros(n, dtype=bool)
        score = np.zeros(n, dtype=np.float64)
        if ids.size:
            pos = np.searchsorted(reader._dl_ids, ids)
            mask[pos] = True
            # match_phrase scoring: ascending-term contribution sum over
            # the phrase's unique terms at the matching docs (identical
            # additions to phrase_topk's own BM25 scores; generalizes to
            # any similarity), one final boost multiply
            for t in sorted(set(node.tokens)):
                pl = reader.postings(t)
                _dense(pl, reader)
                idx = np.searchsorted(pl.dense_pos, pos)
                score[pos] += _contrib(pl, reader, similarity)[idx]
            if node.boost != 1.0:
                score[pos] = score[pos] * node.boost
        return mask, score
    if isinstance(node, Bool):
        must_m, not_m, should_m = None, None, None
        score = np.zeros(n, dtype=np.float64)
        for role, child in node.clauses:  # source order = summation order
            m, s = eval_node(child, reader, similarity, field_readers)
            if role == "must":
                must_m = m if must_m is None else (must_m & m)
                score += s
            elif role == "should":
                should_m = m if should_m is None else (should_m | m)
                score += s
            else:  # must_not: never scores
                not_m = m if not_m is None else (not_m | m)
        if must_m is not None:
            mask = must_m  # should clauses optional when any must exists
        else:
            mask = should_m
        if not_m is not None:
            mask = mask & ~not_m
        score[~mask] = 0.0
        return mask, score
    raise QueryStringError(f"cannot evaluate {node!r}")


# ---------------------------------------------------------------------------
# SQL backend (term-only subset): the same additions / zeroings as text
# ---------------------------------------------------------------------------


class _SqlCtx:
    """Allocates one contrib-join alias per distinct term (per contrib
    table — the default index's ``contrib`` or a text field's
    ``contrib_{field}``) and one documents-join alias per docvalue
    clause, and renders match/score expressions for an AST."""

    def __init__(self):
        self.alias: dict[tuple[str, str], str] = {}
        self.dv_alias: dict[str, str] = {}

    def a(self, term: str, table: str = "contrib") -> str:
        key = (table, term)
        if key not in self.alias:
            self.alias[key] = f"c{len(self.alias)}"
        return self.alias[key]

    def dv(self, cond_tmpl: str) -> str:
        """``cond_tmpl`` has one ``{a}`` placeholder for the alias; one
        join per distinct condition (match + score share it)."""
        al = self.dv_alias.get(cond_tmpl)
        if al is None:
            al = self.dv_alias[cond_tmpl] = f"r{len(self.dv_alias)}"
        return al

    def joins(self) -> str:
        return "\n".join(
            [
                f"  LEFT JOIN {tab} {al} ON {al}.doc_id = d.doc_id "
                f"AND {al}.term = '{t}'"
                for (tab, t), al in self.alias.items()
            ]
            + [
                f"  LEFT JOIN documents {al} ON {al}.doc_id = d.doc_id "
                f"AND {tmpl.format(a=al)}"
                for tmpl, al in self.dv_alias.items()
            ]
        )


def _dv_cond(node) -> str:
    if isinstance(node, DvTerm):
        v = node.value
        val = v if v.lstrip("-").isdigit() else f"'{v}'"
        return f"{{a}}.{node.col} = {val}"
    parts = []
    if node.lo is not None:
        parts.append(f"{{a}}.{node.col} >= {node.lo}")
    if node.hi is not None:
        parts.append(f"{{a}}.{node.col} <= {node.hi}")
    return " AND ".join(parts)


def _sql_match(node, ctx: _SqlCtx) -> str:
    if isinstance(node, Term):
        return f"{ctx.a(node.term)}.doc_id IS NOT NULL"
    if isinstance(node, FieldTerm):
        al = ctx.a(node.term, f"contrib_{node.field}")
        return f"{al}.doc_id IS NOT NULL"
    if isinstance(node, (DvTerm, DvRange)):
        return f"{ctx.dv(_dv_cond(node))}.doc_id IS NOT NULL"
    if isinstance(node, Nothing):
        return "FALSE"
    if isinstance(node, Bool):
        musts = [_sql_match(c, ctx) for r, c in node.clauses if r == "must"]
        shoulds = [
            _sql_match(c, ctx) for r, c in node.clauses if r == "should"
        ]
        nots = [
            _sql_match(c, ctx) for r, c in node.clauses if r == "must_not"
        ]
        if musts:
            cond = "(" + " AND ".join(musts) + ")"
        else:
            cond = "(" + " OR ".join(shoulds) + ")"
        if nots:
            cond += " AND NOT (" + " OR ".join(nots) + ")"
        return cond
    raise QueryStringError(
        f"{type(node).__name__} leaves have no SQL oracle "
        "(phrase/wildcard query strings are engine+pytest surfaces)"
    )


def _sql_score(node, ctx: _SqlCtx) -> str:
    if isinstance(node, Term):
        e = f"coalesce({ctx.a(node.term)}.c, 0.0)"
        if node.boost != 1.0:
            e = f"({e} * {node.boost!r})"
        return e
    if isinstance(node, FieldTerm):
        al = ctx.a(node.term, f"contrib_{node.field}")
        e = f"coalesce({al}.c, 0.0)"
        if node.boost != 1.0:
            e = f"({e} * {node.boost!r})"
        return e
    if isinstance(node, (DvTerm, DvRange)):
        al = ctx.dv(_dv_cond(node))
        return (f"(CASE WHEN {al}.doc_id IS NOT NULL "
                f"THEN {node.boost!r} ELSE 0.0 END)")
    if isinstance(node, Nothing):
        return "0.0"
    if isinstance(node, Bool):
        parts = [
            _sql_score(c, ctx)
            for r, c in node.clauses
            if r in ("must", "should")
        ]
        total = " + ".join(parts)
        return f"(CASE WHEN {_sql_match(node, ctx)} THEN {total} ELSE 0.0 END)"
    raise QueryStringError(
        f"{type(node).__name__} leaves have no SQL oracle"
    )


def to_sql(bound_ast, qid: str) -> str:
    """One per-query SELECT over the shared ``dl`` + ``contrib`` CTEs
    (see driver_queries._sql_qs_runs): (qid, doc_id, score) for every
    matching document, float ops mirroring eval_node exactly."""
    ctx = _SqlCtx()
    score = _sql_score(bound_ast, ctx)
    match = _sql_match(bound_ast, ctx)
    return (
        f"SELECT '{qid}' AS qid, d.doc_id, {score} AS score\n"
        f"  FROM dl d\n{ctx.joins()}\n  WHERE {match}"
    )


# ---------------------------------------------------------------------------
# pipeline: parse/bind on the driver, evaluate per salt-range shard
# ---------------------------------------------------------------------------


def _field_shard_reader(field_dir: str, salt_lo: int, salt_hi: int):
    """Process-global cache of salt-range-restricted per-field readers
    (the _shard_searcher / _mf_shard_searcher pattern: Ray reuses worker
    processes, the subset loads once per worker; keyed on config mtime so
    a rebuild at the same path invalidates)."""
    import os

    import pyarrow.dataset as pads

    from webindex.config import IndexConfig
    from webindex.segments import SegmentReader
    from webindex.util import read_json

    mt = os.stat(os.path.join(field_dir, "config.json")).st_mtime_ns
    key = (field_dir, mt, salt_lo, salt_hi)
    r = _FIELD_SHARD_READERS.get(key)
    if r is None:
        for k in [
            k for k in _FIELD_SHARD_READERS
            if k[0] == field_dir and k[1] != mt
        ]:
            del _FIELD_SHARD_READERS[k]
        cfg = IndexConfig.from_dict(
            read_json(os.path.join(field_dir, "config.json"))
        )
        doc_lo = salt_lo * cfg.shards_per_salt << cfg.salt_doc_shift
        doc_hi = (
            ((salt_hi + 1) * cfg.shards_per_salt) << cfg.salt_doc_shift
        ) - 1
        r = SegmentReader(field_dir, doc_id_range=(doc_lo, doc_hi))
        seg_root = r._seg_root
        if os.path.isdir(seg_root):
            tab = pads.dataset(seg_root).to_table(
                filter=(pads.field("salt") >= salt_lo)
                & (pads.field("salt") <= salt_hi)
            )
            r.preload(table=tab)
        else:
            r.preload()
        _FIELD_SHARD_READERS[key] = r
    return r


_FIELD_SHARD_READERS: dict = {}


def query_string_search(queries: list[tuple[str, str]], index_dir: str, *,
                        top_k: int = 10, max_expansions: int = 50,
                        n_shards: int | None = None,
                        similarity: str = "bm25",
                        field_dirs: dict[str, str] | None = None):
    """[(qid, query_string)] -> runs Dataset (qid, doc_id, score, rank).

    Parsing, analysis, and the wildcard dictionary rewrite happen ONCE on
    the driver (the rewrite is the shared distributed dict scan); the
    bound ASTs ride into the standard salt-range shard fan-out, where
    each shard evaluates the boolean tree over dense shard-bounded
    arrays. Exact per-qid merge, (score desc, docID asc).

    ``field_dirs`` maps text-field names to per-field index dirs
    (webindex/multifield.py build_field_indexes over the SAME corpus and
    salt config): ``field:word`` leaves then score with that field's own
    BM25 statistics (Lucene fielded query syntax); other ``field:``
    names remain docvalue predicates."""
    import pandas as pd
    import ray.data as rd

    from webindex.analyze import Analyzer
    from webindex.search import SEARCH_SHARDS, _shard_searcher
    from webindex.segments import SegmentReader
    from webindex.serve import shard_salt_bounds
    from webindex.wand import _rank_topk

    if n_shards is None:
        n_shards = SEARCH_SHARDS

    # one probe reader for the analyzer config (no postings loaded)
    main_cfg = SegmentReader(index_dir).cfg
    an = Analyzer(main_cfg.analyzer)
    field_dirs = dict(field_dirs or {})
    for f, d in field_dirs.items():
        fcfg = SegmentReader(d).cfg
        if fcfg.analyzer != main_cfg.analyzer:
            raise ValueError(
                f"text field {f!r} index uses a different analyzer"
            )
        if (fcfg.salt_doc_shift, fcfg.shards_per_salt) != (
            main_cfg.salt_doc_shift, main_cfg.shards_per_salt
        ):
            raise ValueError(
                f"text field {f!r} index uses a different salt config"
            )
    raw = {qid: parse_query_string(q) for qid, q in queries}
    pats = sorted({p for r in raw.values() for p in wildcard_patterns(r)})
    expansions: dict[str, list[str]] = {}
    if pats:
        from webindex.lexicon import _rewrite_expand, wildcard_translate

        res = {p: re.compile(wildcard_translate(p)) for p in pats}
        exp = _rewrite_expand(
            index_dir, pats,
            lambda t, p: res[p].fullmatch(t) is not None, max_expansions,
        )
        expansions = exp.groupby("pattern")["term"].apply(list).to_dict()
    fpats = sorted({fp for r in raw.values() for fp in fuzzy_patterns(r)})
    if fpats:
        from webindex.lexicon import fuzzy_expand

        by_edits: dict[int, list[str]] = {}
        keyof: dict[tuple[str, int], str] = {}
        for word, edits in fpats:
            terms = an.tokens(word)
            if len(terms) != 1:
                continue  # bind() raises/Nothing-s; nothing to expand
            by_edits.setdefault(edits, []).append(terms[0])
            keyof[(word, edits)] = f"{terms[0]}~{edits}"
        for edits, terms in sorted(by_edits.items()):
            fx = fuzzy_expand(
                index_dir, terms, max_edits=edits,
                max_expansions=max_expansions,
            )
            for t, grp in fx.groupby("qterm"):
                expansions[f"{t}~{edits}"] = grp["term"].tolist()
    bound = {
        qid: bind(r, an, expansions, text_fields=tuple(field_dirs))
        for qid, r in raw.items()
    }

    bounds = shard_salt_bounds(index_dir, n_shards)
    qids = [qid for qid, _ in queries]

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "shard": pa.array(
                    np.repeat(np.arange(len(bounds), dtype=np.int32),
                              batch.num_rows)
                ),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
            }
        )

    def score_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        reader = searcher.inner.reader
        f_readers = {
            f: _field_shard_reader(d, lo, hi)
            for f, d in field_dirs.items()
        }
        qid_out, id_out, sc_out = [], [], []
        for qid in g.column("qid").to_pylist():
            mask, score = eval_node(bound[qid], reader, similarity,
                                    f_readers)
            sel = np.flatnonzero(mask)
            ids, scores = _rank_topk(
                reader._dl_ids[sel], score[sel], top_k
            ) if sel.size else (np.empty(0, np.int64),
                                np.empty(0, np.float64))
            qid_out.extend([qid] * ids.size)
            id_out.append(ids)
            sc_out.append(scores)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out
                    else np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(sc_out) if sc_out
                    else np.empty(0, np.float64)
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "rank"]]

    q_ds = rd.from_arrow(pa.table({"qid": pa.array(qids, pa.string())}))
    return (
        q_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(score_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )
