"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

All are stateless-or-actor ``map_batches`` stages over the ``documents``
schema (doc_id, text, ...). Heuristics only — no model weights (none are
available in this environment), but the Ray plumbing, schemas and
determinism match what a model-backed stage would need.
"""

from __future__ import annotations

import re
from hashlib import md5

import numpy as np
import pandas as pd
import pyarrow as pa

from webindex.analyze import LUCENE_STOPWORDS

_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)
# A GPT-2-ish pre-tokenizer pattern (public regex family: contractions,
# letter runs, digit runs, other-symbol runs, whitespace collapse).
_BPEISH_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

# tiny per-language stopword profiles (top function words)
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the of and to in is it that for on with as at this was".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von auf für den".split()),
    "es": frozenset("el la los las de que y en un una es por con para no".split()),
    "fr": frozenset("le la les de des et est un une que pour dans qui sur pas".split()),
}


class LangIdStage:
    """Function-word-profile language ID -> (doc_id, lang_pred, lang_conf).

    Deterministic n-gram/function-word heuristic: score = fraction of tokens
    found in each language's profile; prediction is the argmax (or "und"
    when nothing matches).
    """

    def __init__(self):
        self.profiles = _LANG_PROFILES

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for t in batch.column("text").to_pylist():
            toks = _WORD_RE.findall((t or "").lower())
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {
                lang: sum(1 for w in toks if w in prof) / len(toks)
                for lang, prof in self.profiles.items()
            }
            best = max(sorted(scores), key=lambda l: scores[l])
            preds.append(best if scores[best] > 0 else "und")
            confs.append(scores[best])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
                "lang_conf": pa.array(confs, pa.float64()),
            }
        )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality-signal columns: token/char stats, stopword & punct ratios,
    plus a composite [0,1] quality score (monotone heuristics)."""
    rows = {
        "doc_id": batch.column("doc_id").to_pylist(),
        "n_chars": [], "n_tokens": [], "mean_token_len": [],
        "stopword_ratio": [], "digit_ratio": [], "upper_ratio": [],
        "quality": [],
    }
    for t in batch.column("text").to_pylist():
        t = t or ""
        toks = _WORD_RE.findall(t.lower())
        n_tok = len(toks)
        n_chars = len(t)
        mean_len = (sum(len(w) for w in toks) / n_tok) if n_tok else 0.0
        stop = (sum(1 for w in toks if w in LUCENE_STOPWORDS) / n_tok) if n_tok else 0.0
        digits = sum(c.isdigit() for c in t) / n_chars if n_chars else 0.0
        upper = sum(c.isupper() for c in t) / n_chars if n_chars else 0.0
        # composite: enough tokens, sane word lengths, some-but-not-all
        # stopwords, few digits
        q = 1.0
        q *= min(1.0, n_tok / 50.0)
        q *= 1.0 if 3.0 <= mean_len <= 10.0 else 0.5
        q *= 1.0 - min(1.0, abs(stop - 0.3))
        q *= 1.0 - min(1.0, digits * 3)
        rows["n_chars"].append(n_chars)
        rows["n_tokens"].append(n_tok)
        rows["mean_token_len"].append(mean_len)
        rows["stopword_ratio"].append(stop)
        rows["digit_ratio"].append(digits)
        rows["upper_ratio"].append(upper)
        rows["quality"].append(q)
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
            "mean_token_len": pa.array(rows["mean_token_len"], pa.float64()),
            "stopword_ratio": pa.array(rows["stopword_ratio"], pa.float64()),
            "digit_ratio": pa.array(rows["digit_ratio"], pa.float64()),
            "upper_ratio": pa.array(rows["upper_ratio"], pa.float64()),
            "quality": pa.array(rows["quality"], pa.float64()),
        }
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_ws_tokens, n_bpeish_tokens): whitespace split count and a
    BPE-ish regex pre-token count (proxy for model token budgeting).

    Whitespace = the explicit ``[ \\t\\n\\f\\r]`` class (RE2 ``\\S+``,
    what the SQL oracle counts) — NOT str.split(), which also splits on
    ``\\v``/NBSP/other Unicode whitespace (the c4_filters divergence
    class)."""
    ws, bpe, dids = [], [], batch.column("doc_id").to_pylist()
    for t in batch.column("text").to_pylist():
        t = t or ""
        ws.append(len(_WS_SPLIT_RE.findall(t)))
        bpe.append(sum(1 for m in _BPEISH_RE.finditer(t) if m.group().strip()))
    return pa.table(
        {
            "doc_id": pa.array(dids, pa.int64()),
            "n_ws_tokens": pa.array(ws, pa.int64()),
            "n_bpeish_tokens": pa.array(bpe, pa.int64()),
        }
    )


_POLY_BASE = np.uint64(1000003)


def rolling_fingerprint(text: str) -> int:
    """64-bit polynomial rolling hash of the whitespace-normalized text.

    h = h0*B^n + sum_i b_i * B^(n-1-i)  (mod 2^64) — evaluated with one
    vectorized cumprod + dot (uint64 wrap-around is the modulus), no
    per-byte Python loop.
    """
    norm = " ".join((text or "").split())
    b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    h0 = np.uint64(1469598103934665603)
    if b.size == 0:
        return int(h0) - (1 << 63)
    pows = np.full(b.size, _POLY_BASE, dtype=np.uint64)
    pows[0] = 1
    pows = np.cumprod(pows)[::-1]  # pows[i] = B^(n-1-i) mod 2^64
    with np.errstate(over="ignore"):
        h = h0 * pows[0] * _POLY_BASE + np.sum(b * pows, dtype=np.uint64)
    return int(h) - (1 << 63)


_MD5_NORM_RE = re.compile(r"[ \t\n\f\r]+")


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp_md5, fp_roll): md5 of normalized text (SQL-checkable via
    DuckDB ``md5()``) + the rolling hash.

    The md5 normalization collapses runs of the explicit
    ``[ \\t\\n\\f\\r]`` class and strips spaces — exactly the oracle's
    ``trim(regexp_replace(text, '\\s+', ' ', 'g'))`` under RE2's ASCII
    ``\\s``; str.split() would additionally split on ``\\v``/NBSP (the
    c4_filters divergence class). The rolling hash keeps its own pinned
    str.split() normalization (no SQL contract; changing it would
    change stored fingerprints)."""
    dids = batch.column("doc_id").to_pylist()
    md5s, rolls = [], []
    for t in batch.column("text").to_pylist():
        norm = _MD5_NORM_RE.sub(" ", t or "").strip(" ")
        md5s.append(md5(norm.encode("utf-8")).hexdigest())
        rolls.append(rolling_fingerprint(t or ""))
    return pa.table(
        {
            "doc_id": pa.array(dids, pa.int64()),
            "fp_md5": pa.array(md5s, pa.string()),
            "fp_roll": pa.array(rolls, pa.int64()),
        }
    )


_ASCII_TOK_RE = re.compile(r"[a-z0-9]+")


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public
    paper; no reference counterpart) — the repetition filters a
    Common-Crawl curation pipeline applies before training:

    - ``dup_line_frac``       (n_lines - n_distinct_lines) / n_lines
    - ``dup_line_char_frac``  chars in repeat lines / chars in all lines
      (each distinct line's chars counted once in the numerator's
      complement — exact rational, see below)
    - ``top2gram_frac``       occurrences of the most frequent word
      bigram / total bigrams
    - ``dup3gram_frac`` / ``dup5gram_frac``
                              (total n-grams - distinct n-grams) / total

    Tokens are ``[a-z0-9]+`` over the lowercased text (the repo's
    SQL-safe analyzer regex), lines split on ``\\n`` — both reproducible
    in DuckDB, and every fraction is one integer/integer IEEE division,
    so the DuckDB oracle matches bit for bit. Documents too short for an
    n-gram emit 0.0 (no denominator).
    """
    from collections import Counter

    dids = batch.column("doc_id").to_pylist()
    out = {
        "n_lines": [], "dup_line_frac": [], "dup_line_char_frac": [],
        "top2gram_frac": [], "dup3gram_frac": [], "dup5gram_frac": [],
    }
    for t in batch.column("text").to_pylist():
        t = t or ""
        lines = t.split("\n")
        n_lines = len(lines)
        n_dist = len(set(lines))
        tot_chars = sum(len(ln) for ln in lines)
        dist_chars = sum(len(ln) for ln in set(lines))
        out["n_lines"].append(n_lines)
        out["dup_line_frac"].append(
            (n_lines - n_dist) / n_lines if n_lines else 0.0
        )
        out["dup_line_char_frac"].append(
            (tot_chars - dist_chars) / tot_chars if tot_chars else 0.0
        )
        toks = _ASCII_TOK_RE.findall(t.lower())
        for n, col in ((2, "top2gram_frac"), (3, "dup3gram_frac"),
                       (5, "dup5gram_frac")):
            total = len(toks) - n + 1
            if total <= 0:
                out[col].append(0.0)
                continue
            grams = Counter(
                " ".join(toks[i: i + n]) for i in range(total)
            )
            if n == 2:
                out[col].append(max(grams.values()) / total)
            else:
                out[col].append((total - len(grams)) / total)
    return pa.table(
        {
            "doc_id": pa.array(dids, pa.int64()),
            "n_lines": pa.array(out["n_lines"], pa.int64()),
            "dup_line_frac": pa.array(out["dup_line_frac"], pa.float64()),
            "dup_line_char_frac": pa.array(
                out["dup_line_char_frac"], pa.float64()
            ),
            "top2gram_frac": pa.array(out["top2gram_frac"], pa.float64()),
            "dup3gram_frac": pa.array(out["dup3gram_frac"], pa.float64()),
            "dup5gram_frac": pa.array(out["dup5gram_frac"], pa.float64()),
        }
    )


def repetition_signals(ds):
    """documents Dataset -> per-doc repetition-signal Dataset (stateless
    ``map_batches``; scale-safe — no shuffle, no state)."""
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


def unigram_logprob(docs_ds, *, n_parts: int = 64):
    """Corpus-trained unigram language-model score per document — the
    CCNet-style perplexity-proxy quality signal (Wenzek et al. 2020
    train a LM on reference text and keep low-perplexity docs; public
    methodology; here the LM is the corpus's own unigram distribution).

    Per doc: ``logprob = sum over distinct terms (ascending unicode) of
    tf * ln(cf_term / total_tokens)`` and ``logprob_per_token =
    logprob / n_tokens`` (one IEEE division). Tokens are the SQL-safe
    ``[a-z0-9]+`` lowercase regex and ln() is scalar libm (bit-equal to
    DuckDB ln; numpy's SIMD log differs by 1 ulp, measured). The per-doc
    fold order over many terms is engine-specific (numpy reduceat !=
    sequential != DuckDB list_sum, measured) — the driver contract
    rounds to 6dp, which absorbs the ~1e-15-relative order noise.

    Scale shape: one cheap counting pass gives the scalar total; then
    ONE term-hash shuffle co-locates each term's (doc, tf) rows so the
    corpus-wide cf is a per-partition vectorized groupby (no vocabulary
    broadcast, no driver materialization); a doc-hash shuffle of the
    (doc, term, contrib) rows and a per-doc term-sorted reduceat fold
    compute the sums. Output: ``(doc_id, n_tokens,
    logprob, logprob_per_token)`` for docs with >= 1 token."""
    import pandas as pd

    from webindex.relational import hash_partitioned_groupby
    from webindex.util import stable_hash64

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_t, o_tf = [], [], []
        for did, t in zip(ids, texts):
            tfs = Counter(_ASCII_TOK_RE.findall((t or "").lower()))
            for term, f in tfs.items():
                o_id.append(did)
                o_t.append(term)
                o_tf.append(f)
        part = np.fromiter(
            (stable_hash64(t) % n_parts for t in o_t),
            dtype=np.int64, count=len(o_t),
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "term": pa.array(o_t, pa.string()),
                "tf": pa.array(o_tf, pa.int64()),
                "part": pa.array(part),
            }
        )

    rows = docs_ds.map_batches(explode, batch_format="pyarrow")

    def count_tokens(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array(
                [int(np.sum(batch.column("tf").to_numpy()))], pa.int64()
            )}
        )

    rows = rows.materialize()  # two consumers: total + the join shuffle
    total = int(
        rows.map_batches(count_tokens, batch_format="pyarrow").sum("n")
    )

    def attach_logp(g: pd.DataFrame) -> pd.DataFrame:
        import math

        # all rows of a term are co-located: cf is a partition-local sum.
        # SCALAR math.log per distinct term — libm agrees bit-for-bit
        # with DuckDB ln(); numpy's SIMD array log differs by 1 ulp
        # (measured), which would break the oracle hash.
        cf_map = g.groupby("term", sort=False)["tf"].sum()
        logp_map = {t: math.log(c / total) for t, c in cf_map.items()}
        logp = g["term"].map(logp_map).to_numpy(np.float64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "term": g["term"].to_numpy(),
                "tf": g["tf"].to_numpy(),
                "contrib": g["tf"].to_numpy(np.float64) * logp,
            }
        )

    scored = (
        rows.groupby("part")
        .map_groups(attach_logp, batch_format="pandas")
    )

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-doc ASCENDING-TERM sequential sum (reduceat is a left fold)
        df = df.sort_values(
            ["doc_id", "term"], kind="mergesort"
        ).reset_index(drop=True)
        ids = df["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.r_[True, ids[1:] != ids[:-1]]
        )
        lp = np.add.reduceat(df["contrib"].to_numpy(np.float64), starts)
        nt = np.add.reduceat(df["tf"].to_numpy(np.int64), starts)
        return pd.DataFrame(
            {"doc_id": ids[starts], "n_tokens": nt, "logprob": lp}
        )

    def doc_final(df: pd.DataFrame) -> pd.DataFrame:
        # partials are already whole per doc (one term-partition pass
        # emits every (doc, term) row exactly once; the doc shuffle only
        # co-locates) — but a doc split across input blocks of THIS
        # groupby arrives as multiple partials: recombine exactly.
        if df["doc_id"].duplicated().any():
            raise AssertionError(
                "unigram_logprob: per-doc partials must be combined from "
                "term-sorted rows in one kernel — split partials would "
                "break the pinned summation order"
            )
        out = df.copy()
        out["logprob_per_token"] = (
            out["logprob"].to_numpy(np.float64)
            / out["n_tokens"].to_numpy(np.int64)
        )
        return out[["doc_id", "n_tokens", "logprob", "logprob_per_token"]]

    # doc-hash co-location FIRST (raw scored rows), THEN one kernel per
    # partition does the term-sorted fold — doc_partial must see every
    # row of a doc at once, so it runs as the per-partition final.
    def final_fold(df: pd.DataFrame) -> pd.DataFrame:
        return doc_final(doc_partial(df))

    return hash_partitioned_groupby(
        scored, ["doc_id"], lambda df: df, final_fold, n_parts=n_parts
    )


def bigram_logprob(docs_ds, *, lam: float = 0.8, n_parts: int = 64):
    """Interpolated bigram language-model score per document — the KenLM
    direction of the CCNet quality signal (Wenzek et al. 2020 score docs
    with an n-gram LM; public methodology; here the LM is the corpus's
    own bigram distribution with unigram interpolation, the
    Jelinek-Mercer smoothing the LM-JM similarity already pins).

    Per doc with tokens w_1..w_m (SQL-safe ``[a-z0-9]+`` lowercase), the
    events are the m-1 within-doc adjacent pairs; per distinct pair
    (ascending (w1, w2) fold, like unigram_logprob):

        p(w2 | w1) = lam * (cb(w1,w2) / cp(w1)) + (1-lam) * (cu(w2) / T)

    with EXACT int64 corpus counts — cb = bigram occurrences, cp =
    occurrences of w1 as a bigram prefix (= sum over w2 of cb, so the
    denominator is consistent with the numerator by construction), cu =
    unigram occurrences, T = total tokens — and the float expression
    evaluated in exactly the SQL oracle's op order (1-lam is computed
    ONCE and injected as the same literal both sides; 1.0-0.8 is not
    0.2 in float64). ln is scalar libm per distinct argument (bit-equal
    to DuckDB ln; numpy SIMD log is 1 ulp off, measured). The per-doc
    many-term fold order is engine-specific, so the contract surface
    rounds to 6dp (the unigram_logprob precedent).

    Scale shape (three bounded shuffles, nothing corpus-sized on the
    driver): (1) per-doc bigram-count rows hash-partition by w1, making
    cb AND cp partition-local exact sums; (2) the unigram (term, cf)
    table — vocab-sized — attaches to the rows by a padded-union hash
    join on w2; (3) a doc-hash fold computes the per-doc sums. Docs with
    fewer than two tokens have no events and are omitted. Output:
    ``(doc_id, n_bigrams, logprob, logprob_per_bigram)``."""
    import math

    from webindex.relational import (hash_join_attach,
                                     hash_partitioned_groupby)
    from webindex.util import stable_hash64

    oml = 1.0 - lam  # pinned once; both backends use this exact literal

    def explode_bigrams(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_w1, o_w2, o_n = [], [], [], []
        for did, t in zip(ids, texts):
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            for (w1, w2), n in Counter(zip(toks, toks[1:])).items():
                o_id.append(did)
                o_w1.append(w1)
                o_w2.append(w2)
                o_n.append(n)
        part = np.fromiter(
            (stable_hash64(w) % n_parts for w in o_w1),
            dtype=np.int64, count=len(o_w1),
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "w1": pa.array(o_w1, pa.string()),
                "w2": pa.array(o_w2, pa.string()),
                "n": pa.array(o_n, pa.int64()),
                "part": pa.array(part),
            }
        )

    def explode_unigrams(batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column("text").to_pylist()
        c = Counter()
        for t in texts:
            c.update(_ASCII_TOK_RE.findall((t or "").lower()))
        terms = list(c.keys())
        part = np.fromiter(
            (stable_hash64(t) % n_parts for t in terms),
            dtype=np.int64, count=len(terms),
        ).astype(np.int32)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "cf_p": pa.array([c[t] for t in terms], pa.int64()),
                "part": pa.array(part),
            }
        )

    def merge_cf(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=False)["cf_p"].sum().reset_index()
        return out.rename(columns={"cf_p": "cf"})

    cu_ds = (
        docs_ds.map_batches(explode_unigrams, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_cf, batch_format="pandas")
    ).materialize()  # vocab-sized; consumed twice (total + the join)
    total = int(cu_ds.sum("cf"))

    def attach_cb_cp(g: pd.DataFrame) -> pd.DataFrame:
        # every row of a w1 is co-located: cb and cp are partition-local
        cb = g.groupby(["w1", "w2"], sort=False)["n"].sum()
        cp = cb.groupby(level="w1", sort=False).sum()
        idx = pd.MultiIndex.from_arrays([g["w1"], g["w2"]])
        out = g[["doc_id", "w1", "w2", "n"]].copy()
        out["cb"] = cb.reindex(idx).to_numpy(np.int64)
        out["cp"] = cp.reindex(g["w1"]).to_numpy(np.int64)
        return out

    rows = (
        docs_ds.map_batches(explode_bigrams, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_cb_cp, batch_format="pandas")
    )

    rows = hash_join_attach(
        rows, "w2", cu_ds, ["cf"],
        rows_types={
            "doc_id": pa.int64(), "w1": pa.string(), "w2": pa.string(),
            "n": pa.int64(), "cb": pa.int64(), "cp": pa.int64(),
        },
        val_types={"cf": pa.int64()},
        n_parts=n_parts, side_key="term",
    )

    def contrib(batch: pa.Table) -> pa.Table:
        cb = batch.column("cb").to_numpy().astype(np.int64)
        cp = batch.column("cp").to_numpy().astype(np.int64)
        cu = batch.column("cf").to_numpy().astype(np.int64)
        n = batch.column("n").to_numpy().astype(np.int64)
        # the SQL oracle's op tree, op for op:
        # lam * (cb / cp) + oml * (cu / T)
        arg = lam * (cb / cp) + oml * (cu / total)
        cache: dict[float, float] = {}
        ln = np.fromiter(
            (cache.get(a) or cache.setdefault(a, math.log(a))
             for a in arg.tolist()),
            dtype=np.float64, count=arg.size,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n": batch.column("n"),
                "c": pa.array(n * ln, pa.float64()),
            }
        )

    scored = rows.map_batches(contrib, batch_format="pyarrow")

    def doc_fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["doc_id", "w1", "w2"], kind="mergesort"
        ).reset_index(drop=True)
        ids = df["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        lp = np.add.reduceat(df["c"].to_numpy(np.float64), starts)
        nb = np.add.reduceat(df["n"].to_numpy(np.int64), starts)
        return pd.DataFrame(
            {
                "doc_id": ids[starts],
                "n_bigrams": nb,
                "logprob": lp,
                "logprob_per_bigram": lp / nb,
            }
        )

    return hash_partitioned_groupby(
        scored, ["doc_id"], lambda df: df, doc_fold, n_parts=n_parts
    )


def source_level_filter(docs_ds, *, short_tokens: int = 40,
                        max_short_frac: float = 0.35,
                        source_col: str = "source", n_parts: int = 64):
    """Domain-level curation (the RefinedWeb/Dolma-style stage: judge the
    SOURCE, then keep/drop its documents wholesale — spam domains are
    dominated by short boilerplate pages): aggregate per-source document
    stats, then annotate every doc with its source's verdict.

    Per source (exact int64 partials per the repo's float invariant —
    one combiner per batch, one hash-partitioned merge, each output
    ratio ONE int/int IEEE division): ``n_docs``, ``short_frac`` (share
    of docs with < ``short_tokens`` ``[a-z0-9]+`` tokens),
    ``mean_tokens``. A doc's ``keep`` flag is
    ``short_frac <= max_short_frac``.

    The per-source table is value-domain-sized; it broadcasts once via
    ``ray.put`` and the corpus streams through the annotate stage (at
    web scale hosts are ~10^7 rows — still object-store-broadcastable;
    beyond that swap the attach for the repo's hash-join shape).
    Output: ``(doc_id, source, src_docs, src_short_frac, keep)``."""
    import pandas as pd
    import ray

    from webindex.relational import hash_partitioned_groupby

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = np.fromiter(
            (len(_ASCII_TOK_RE.findall((t or "").lower()))
             for t in df["text"]),
            dtype=np.int64, count=len(df),
        )
        out = pd.DataFrame(
            {
                source_col: df[source_col].to_numpy(),
                "docs_p": np.ones(len(df), np.int64),
                "short_p": (n_tok < short_tokens).astype(np.int64),
                "tokens_p": n_tok,
            }
        )
        return (
            out.groupby(source_col, sort=False).sum().reset_index()
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(source_col, sort=False).sum().reset_index()
        docs = g["docs_p"].to_numpy(np.int64)
        short = g["short_p"].to_numpy(np.int64)
        toks = g["tokens_p"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                source_col: g[source_col].to_numpy(),
                "src_docs": docs,
                "src_short_frac": short / docs,
                "src_mean_tokens": toks / docs,
            }
        )

    stats = hash_partitioned_groupby(
        docs_ds.map_batches(
            lambda t: t.select(["doc_id", "text", source_col]),
            batch_format="pyarrow",
        ),
        [source_col], partial, final, n_parts=n_parts,
    ).to_pandas()
    side = ray.put(
        {
            "src": stats[source_col].to_numpy(),
            "docs": stats["src_docs"].to_numpy(np.int64),
            "frac": stats["src_short_frac"].to_numpy(np.float64),
        }
    )

    def annotate(batch: pa.Table) -> pa.Table:
        s = ray.get(side)
        order = np.argsort(s["src"], kind="stable")
        src_s, docs_s, frac_s = (
            s["src"][order], s["docs"][order], s["frac"][order]
        )
        vals = np.asarray(batch.column(source_col).to_pylist())
        pos = np.searchsorted(src_s, vals)
        pos = np.minimum(pos, max(src_s.size - 1, 0))
        frac = frac_s[pos]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                source_col: batch.column(source_col),
                "src_docs": pa.array(docs_s[pos], pa.int64()),
                "src_short_frac": pa.array(frac, pa.float64()),
                "keep": pa.array(frac <= max_short_frac),
            }
        )

    return docs_ds.map_batches(
        lambda t: t.select(["doc_id", source_col]), batch_format="pyarrow"
    ).map_batches(annotate, batch_format="pyarrow")


def pmi_collocations(docs_ds, *, window: int = 3, min_count: int = 5,
                     top_n: int = 20, n_parts: int = 64):
    """Corpus-level collocation mining: the ``top_n`` unordered term
    pairs by pointwise mutual information over a +/-``window``
    co-occurrence relation (Church & Hanks 1990, public methodology —
    the classic "which words belong together" corpus-analytics op).

    A co-occurrence is a position pair (i < j, j - i <= window) of two
    DIFFERENT ``[a-z0-9]+`` tokens, normalized to unordered (min, max).
    ``pmi(a, b) = ln( (cnt_ab * total_pairs) / (marg_a * marg_b) )``
    where marg_x counts pairs containing x — all exact int64 counts, one
    int/int float division per pair and one scalar libm ln (bit-equal to
    DuckDB), so the SQL oracle hash-matches (products must stay < 2^53
    for the division to be exact — true far beyond contract scale; at
    100x switch the ratio to log-space subtraction).

    Scale shape: per-batch pair-count partials (combiner), ONE pair-hash
    shuffle for global counts, marginals via a term-hash shuffle of the
    (already bounded) pair table, both marginals attached by the repo's
    padded-union hash join — the corpus text never leaves stage 1, and
    the driver sees only the final ``top_n`` rows."""
    import math

    import pandas as pd

    from webindex.relational import (
        hash_join_attach,
        hash_partitioned_groupby,
    )

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        cnt: Counter = Counter()
        for t in df["text"]:
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            n = len(toks)
            for i in range(n):
                a = toks[i]
                for j in range(i + 1, min(i + window + 1, n)):
                    b = toks[j]
                    if a == b:
                        continue
                    cnt[(a, b) if a < b else (b, a)] += 1
        if not cnt:
            return pd.DataFrame({"a": [], "b": [], "cnt": []}).astype(
                {"a": str, "b": str, "cnt": np.int64}
            )
        ks = list(cnt)
        return pd.DataFrame(
            {
                "a": [k[0] for k in ks],
                "b": [k[1] for k in ks],
                "cnt": np.fromiter(
                    (cnt[k] for k in ks), np.int64, len(ks)
                ),
            }
        )

    def pair_final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["a", "b"], sort=False)["cnt"].sum().reset_index()
        )

    pairs = hash_partitioned_groupby(
        docs_ds, ["a", "b"], pair_partials, pair_final, n_parts=n_parts
    ).materialize()

    total = int(
        pairs.map_batches(
            lambda t: pa.table(
                {"n": pa.array(
                    [int(np.sum(t.column("cnt").to_numpy()))], pa.int64()
                )}
            ),
            batch_format="pyarrow",
        ).sum("n")
    )

    def marg_partials(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [
                df[["a", "cnt"]].rename(columns={"a": "term"}),
                df[["b", "cnt"]].rename(columns={"b": "term"}),
            ],
            ignore_index=True,
        )
        return both.groupby("term", sort=False)["cnt"].sum().reset_index()

    def marg_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", sort=False)["cnt"].sum().reset_index()
        return g.rename(columns={"cnt": "m"})

    marg = hash_partitioned_groupby(
        pairs, ["term"], marg_partials, marg_final, n_parts=n_parts
    )

    import pyarrow as _pa

    rows_types = {"a": _pa.string(), "b": _pa.string(),
                  "cnt": _pa.int64()}
    withm = hash_join_attach(
        pairs, "a", marg, ["m"], rows_types=rows_types,
        val_types={"m": _pa.int64()}, n_parts=n_parts, out_prefix="a_",
        side_key="term",
    )
    rows_types2 = dict(rows_types)
    rows_types2["a_m"] = _pa.int64()
    withm = hash_join_attach(
        withm, "b", marg, ["m"], rows_types=rows_types2,
        val_types={"m": _pa.int64()}, n_parts=n_parts, out_prefix="b_",
        side_key="term",
    )

    def score(batch: pa.Table) -> pa.Table:
        cnt = batch.column("cnt").to_numpy()
        keep = cnt >= min_count
        batch = batch.filter(pa.array(keep))
        cnt = batch.column("cnt").to_numpy()
        ma = batch.column("a_m").to_numpy()
        mb = batch.column("b_m").to_numpy()
        pmi = np.fromiter(
            (
                math.log((int(c) * total) / (int(x) * int(y)))
                for c, x, y in zip(cnt, ma, mb)
            ),
            np.float64, len(cnt),
        )
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                # the padded-union join rides pandas blocks, which float
                # nullable ints — cast back (small exact ints, lossless)
                "cnt": pa.array(cnt.astype(np.int64)),
                "pmi": pa.array(pmi),
            }
        )

    scored = withm.map_batches(score, batch_format="pyarrow")

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        # per-block partial cut: a global top-n row is in its own block's
        # top-n, so only top_n x blocks rows reach the final sort
        return df.sort_values(
            ["pmi", "a", "b"], ascending=[False, True, True],
            kind="mergesort",
        ).head(top_n)

    out = (
        scored.map_batches(local_top, batch_format="pandas")
        .to_pandas()
        .sort_values(["pmi", "a", "b"], ascending=[False, True, True],
                     kind="mergesort")
        .head(top_n)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out


TEXTRANK_SCALE = 10**12


def textrank_keywords(docs_ds, *, window: int = 2, top_k: int = 5,
                      iters: int = 20):
    """Per-document keyword extraction via TextRank (Mihalcea & Tarau
    2004, public paper): PageRank over the doc's own token co-occurrence
    graph (undirected, +/-``window``, edge weight = co-occurrence
    count), in int64 FIXED-POINT micro-units — the webindex.graph
    pagerank convention (float power iterations are neither partition-
    independent nor engine-portable, measured), which makes the scores
    exact integers a recursive-CTE SQL oracle replays bit for bit.

    Pinned update rule (SCALE = 10^12, damping 17/20, ``iters`` rounds):

        p_q[0][a]   = SCALE // v                        (v distinct terms)
        contrib[a]  = sum over neighbors b of
                      (w_ab * p_q[b]) // deg_b          (per-edge floor)
        p_q[t+1][a] = (3*SCALE) // (20*v)
                    + (17 * contrib[a]) // 20

    with ``deg_b = sum_a w_ab`` (isolated terms — single-token docs —
    keep base mass only). Top-``top_k`` terms by (p_q desc, term asc).
    Overflow bound: w * p_q <= tokens_per_doc * SCALE << 2^63.

    Entirely per-document — a stateless vectorized ``map_batches`` with
    one dense (v x v) int64 matrix per doc (v = distinct tokens, small
    by construction) — trivially partition-invariant and embarrassingly
    parallel at any corpus size. Output:
    ``(doc_id, term, score_q, rank)``."""
    import pandas as pd  # noqa: F401

    S = TEXTRANK_SCALE

    def extract(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_t, o_s, o_r = [], [], [], []
        for did, t in zip(ids, texts):
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            if not toks:
                continue
            vocab = sorted(set(toks))
            vi = {w: i for i, w in enumerate(vocab)}
            v = len(vocab)
            w_mat = np.zeros((v, v), dtype=np.int64)
            for i in range(len(toks)):
                a = vi[toks[i]]
                for j in range(i + 1, min(i + window + 1, len(toks))):
                    b = vi[toks[j]]
                    if a != b:
                        w_mat[a, b] += 1
                        w_mat[b, a] += 1
            deg = w_mat.sum(axis=1)
            safe = np.maximum(deg, 1)
            p = np.full(v, S // v, dtype=np.int64)
            base = (3 * S) // (20 * v)
            for _ in range(iters):
                contrib = (
                    (w_mat * p[None, :]) // safe[None, :]
                ).sum(axis=1)
                p = base + (17 * contrib) // 20
            order = np.lexsort((np.array(vocab), -p))[:top_k]
            o_id.extend([did] * order.size)
            o_t.extend(vocab[i] for i in order)
            o_s.extend(int(p[i]) for i in order)
            o_r.extend(range(1, order.size + 1))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "term": pa.array(o_t, pa.string()),
                "score_q": pa.array(o_s, pa.int64()),
                "rank": pa.array(
                    np.asarray(o_r, dtype=np.int32)
                ),
            }
        )

    return docs_ds.map_batches(extract, batch_format="pyarrow")


def dsir_weights(docs_ds, *, target_col: str = "lang",
                 target_value: str = "en", n_parts: int = 64):
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public methodology): per document the log importance ratio between a
    TARGET distribution (here: the corpus's own ``target_col ==
    target_value`` slice, e.g. English pages standing in for the
    high-quality target) and the RAW distribution, over token-bigram
    features with add-1 smoothing:

        w(doc) = sum over distinct bigrams f (ascending unicode) of
                 n_f(doc) * ( ln((c_tgt(f)+1) / (T_tgt+V))
                            - ln((c_raw(f)+1) / (T_raw+V)) )

    where c_*(f) are corpus feature counts, T_* the total feature counts
    and V the joint distinct-feature count. Selection is then a
    deterministic top-k by weight (the paper resamples stochastically;
    pinned deterministic here, like every ranking in this repo).

    Exactness: counts/totals are exact int64; ln is scalar math.log per
    distinct feature (DuckDB-bit-identical); per-doc fold is the
    ascending-feature sequential sum; fold order over many features is
    engine-specific at the last ulp, so the contract rounds to 6dp (the
    unigram_logprob precedent).

    Scale shape (the unigram_logprob template): per-doc bigram counting
    is row-local (a doc's text lives in one row); ONE feature-hash
    shuffle co-locates each bigram's rows so corpus counts are
    partition-local sums (no vocabulary broadcast — at 100 TB the
    feature space is bounded by hashing features into buckets upstream
    if needed); the same partition attaches per-feature logs; ONE
    doc-hash shuffle folds per-doc sums. Docs with < 2 tokens emit no
    features and are absent from the output."""
    import math

    import pandas as pd

    from webindex.relational import hash_partitioned_groupby
    from webindex.util import stable_hash64

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        tgt = [
            v == target_value
            for v in batch.column(target_col).to_pylist()
        ]
        o_id, o_f, o_n, o_nt = [], [], [], []
        for did, t, is_t in zip(ids, texts, tgt):
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            grams = Counter(
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            )
            for f, n in grams.items():
                o_id.append(did)
                o_f.append(f)
                o_n.append(n)
                o_nt.append(n if is_t else 0)
        part = np.fromiter(
            (stable_hash64(f) % n_parts for f in o_f),
            dtype=np.int64, count=len(o_f),
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "f": pa.array(o_f, pa.string()),
                "n": pa.array(o_n, pa.int64()),
                "n_tgt": pa.array(o_nt, pa.int64()),
                "part": pa.array(part),
            }
        )

    rows = docs_ds.map_batches(explode, batch_format="pyarrow")
    rows = rows.materialize()  # consumers: totals, V, and the log attach

    t_raw = int(rows.sum("n"))
    t_tgt = int(rows.sum("n_tgt"))

    def distinct_f(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": [int(g["f"].nunique())]})

    v = int(
        rows.groupby("part")
        .map_groups(distinct_f, batch_format="pandas")
        .sum("v")
    )

    def attach_w(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a feature are co-located: corpus counts are
        # partition-local sums; ln per DISTINCT feature with math.log
        agg = g.groupby("f", sort=False).agg(
            c_raw=("n", "sum"), c_tgt=("n_tgt", "sum")
        )
        lr_map = {
            f: (math.log((int(ct) + 1) / (t_tgt + v))
                - math.log((int(cr) + 1) / (t_raw + v)))
            for f, cr, ct in zip(agg.index, agg["c_raw"], agg["c_tgt"])
        }
        lr = g["f"].map(lr_map).to_numpy(np.float64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "f": g["f"].to_numpy(),
                "w": g["n"].to_numpy(np.float64) * lr,
            }
        )

    scored = rows.groupby("part").map_groups(
        attach_w, batch_format="pandas"
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["doc_id", "f"], kind="mergesort"
        ).reset_index(drop=True)
        ids = df["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        w = np.add.reduceat(df["w"].to_numpy(np.float64), starts)
        return pd.DataFrame({"doc_id": ids[starts], "dsir_w": w})

    return hash_partitioned_groupby(
        scored, ["doc_id"], lambda df: df, fold, n_parts=n_parts
    )


def chunk_documents(docs_ds, *, max_tokens: int = 128, overlap: int = 32,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Fixed-window document chunking with overlap — the pretraining /
    RAG corpus-prep step (split long docs into model-context-sized
    pieces; overlapping windows so no span is split across a boundary
    without context).

    Tokens are the SQL-safe ``[a-z0-9]+`` lowercase stream; windows
    start every ``stride = max_tokens - overlap`` tokens and take up to
    ``max_tokens`` (the last window is the remainder, never empty:
    a start position must satisfy ``start < n_tokens``, so a doc yields
    ``ceil(max(n - overlap, 1) / stride)`` chunks and a short doc yields
    exactly one). Output one row per chunk:
    ``(doc_id, chunk_id, chunk_text, n_tokens)`` where ``chunk_id`` is
    the 0-based window index, ``chunk_text`` the space-joined window
    (the canonical re-tokenized surface — exact string identity for the
    SQL oracle), and ``n_tokens`` the window length. Docs with zero
    tokens yield no rows.

    Stateless ``map_batches`` — embarrassingly parallel, trivially
    partition-invariant, no shuffle; the one operator here that is pure
    fan-out at any corpus size."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_cid, o_text, o_n = [], [], [], []
        for did, t in zip(ids, texts):
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            m = len(toks)
            for cid, s in enumerate(range(0, m, stride)):
                w = toks[s: s + max_tokens]
                o_id.append(did)
                o_cid.append(cid)
                o_text.append(" ".join(w))
                o_n.append(len(w))
        return pa.table(
            {
                id_col: pa.array(o_id, pa.int64()),
                "chunk_id": pa.array(o_cid, pa.int64()),
                "chunk_text": pa.array(o_text, pa.string()),
                "n_tokens": pa.array(o_n, pa.int64()),
            }
        )

    return docs_ds.map_batches(chunk, batch_format="pyarrow")


GOPHER_STOPSET = ("and", "be", "have", "of", "that", "the", "to", "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2

_WS_SPLIT_RE = re.compile(r"[^ \t\n\f\r]+")
_ALPHA_ANY_RE = re.compile(r"[A-Za-z]")


def gopher_rules(docs_ds):
    """Gopher quality-rule filter (Rae et al. 2021 App. A1 subset — the
    canonical LLM-corpus rule set): per doc the raw-whitespace word
    count, mean word length, #/ellipsis symbol-to-word ratio, fraction
    of words containing an alphabetic character, and DISTINCT hits in
    the 8-word required-stopword set; ``keep`` ANDs the published
    thresholds. Every ratio is ONE int/int IEEE division (bit-identical
    across engines — repetition_signals precedent), thresholds compare
    the UNROUNDED division results, reported ratios are 6dp-rounded.
    Token-less docs report zero ratios and keep=0 (pinned). Stateless
    map_batches — no shuffle; the 100-TB shape is embarrassingly
    parallel."""

    stopset = set(GOPHER_STOPSET)

    def rules(batch: pa.Table) -> pa.Table:
        o_id, o_nw, o_mwl, o_sym, o_alpha, o_stop, o_keep = (
            [], [], [], [], [], [], []
        )
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            t = t or ""
            words = _WS_SPLIT_RE.findall(t)
            nw = len(words)
            o_id.append(did)
            o_nw.append(nw)
            if nw == 0:
                o_mwl.append(0.0)
                o_sym.append(0.0)
                o_alpha.append(0.0)
                o_stop.append(0)
                o_keep.append(0)
                continue
            mwl = sum(len(w) for w in words) / nw
            n_sym = t.count("#") + t.count("...")
            sym = n_sym / nw
            alpha = sum(1 for w in words if _ALPHA_ANY_RE.search(w)) / nw
            stop_hits = len({w.lower() for w in words} & stopset)
            keep = (GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS
                    and GOPHER_MIN_MWL <= mwl <= GOPHER_MAX_MWL
                    and sym <= GOPHER_MAX_SYMBOL_RATIO
                    and alpha >= GOPHER_MIN_ALPHA_FRAC
                    and stop_hits >= GOPHER_MIN_STOP_HITS)
            o_mwl.append(round(mwl, 6))
            o_sym.append(round(sym, 6))
            o_alpha.append(round(alpha, 6))
            o_stop.append(stop_hits)
            o_keep.append(int(keep))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "n_words": pa.array(o_nw, pa.int64()),
                "mean_word_len_r": pa.array(o_mwl, pa.float64()),
                "symbol_ratio_r": pa.array(o_sym, pa.float64()),
                "alpha_frac_r": pa.array(o_alpha, pa.float64()),
                "n_stop_hits": pa.array(o_stop, pa.int64()),
                "keep": pa.array(o_keep, pa.int64()),
            }
        )

    return docs_ds.map_batches(rules, batch_format="pyarrow")


def perplexity_buckets(docs_ds, *, n_parts: int = 64):
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
    2020 §4.2: per LANGUAGE, rank documents by LM score and cut the
    corpus into equal thirds — head = best third, used to select
    training data): per-doc unigram log-probability per token
    (:func:`unigram_logprob`, rounded to the contract's 6dp surface so
    the tercile CUTOFFS are engine-portable), per-lang tercile cutoffs
    c1 = Q_disc(1/3), c2 = Q_disc(2/3) (nearest-rank, exact distributed
    rank selection — webindex/quantile.py grouped_quantile_disc), then
    ``tail if lpt <= c1 else middle if lpt <= c2 else head``.

    Scale shape: the unigram-LM passes (one term-hash shuffle + one
    doc-hash fold), ONE doc-hash join to attach lang, O(rounds) counting
    passes per tercile (counts cross the wire, never rows; per-lang
    state is driver-resident — lang cardinality-sized), one stateless
    assign. Output: ``(doc_id, lang, lpt_r, bucket)``."""
    import pyarrow as pa
    import ray

    from webindex.quantile import grouped_quantile_disc
    from webindex.relational import hash_join_attach

    lp = unigram_logprob(docs_ds, n_parts=n_parts)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "lpt_r": df["logprob_per_token"].round(6),
            }
        )

    lpt = lp.map_batches(project, batch_format="pandas")
    with_lang = hash_join_attach(
        lpt, "doc_id", docs_ds.select_columns(["doc_id", "lang"]),
        ["lang"],
        rows_types={"doc_id": pa.int64(), "lpt_r": pa.float64()},
        val_types={"lang": pa.string()},
        n_parts=n_parts,
    )
    # iterative rank selection re-executes its input per round: keep the
    # (doc_id, lpt_r, lang) projection materialized (3 small columns)
    with_lang = with_lang.materialize()
    c1 = grouped_quantile_disc(with_lang, "lang", "lpt_r", (1, 3))
    c2 = grouped_quantile_disc(with_lang, "lang", "lpt_r", (2, 3))
    cuts = {
        lang: (float(v1), float(v2))
        for lang, v1, v2 in zip(c1["lang"], c1["value"], c2["value"])
    }
    cuts_ref = ray.put(cuts)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        langs = batch.column("lang").to_pylist()
        lpt_v = batch.column("lpt_r").to_numpy(zero_copy_only=False)
        buckets = []
        for lang, v in zip(langs, lpt_v):
            lo, hi = c[lang]
            buckets.append(
                "tail" if v <= lo else ("middle" if v <= hi else "head")
            )
        return batch.append_column("bucket", pa.array(buckets, pa.string()))

    return with_lang.map_batches(assign, batch_format="pyarrow")


C4_TERMINAL_PUNCT = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
_C4_STRIP = '.!?"'
# The explicit ASCII-whitespace word class shared with the SQL oracle's
# regexp_extract_all('[^ \t\n\f\r]+') — NOT str.split(), which also
# splits on \v / NBSP / other Unicode whitespace and would diverge from
# any SQL engine's character-class tokenizer on such docs.
_C4_WORD_RE = re.compile(r"[^ \t\n\f\r]+")


def c4_filters(docs_ds, *, badwords=frozenset(),
               min_line_words: int = C4_MIN_LINE_WORDS,
               min_kept_lines: int = C4_MIN_KEPT_LINES):
    """C4 cleaning rules (Raffel et al. 2020 §2.2 — the T5 corpus
    pipeline; the line-level sibling of :func:`gopher_rules`). Documents
    are ``\\n``-lined pages; per line the rule set keeps lines that end
    in a terminal punctuation mark (``. ! ? "``), contain at least
    ``min_line_words`` words (words = maximal runs of the explicit
    ``[^ \\t\\n\\f\\r]`` class, matching the SQL oracle's character-class
    tokenizer exactly), and do not contain the word
    "javascript" (case-insensitive, trailing punctuation stripped).
    Page-level: ``has_badword`` (any word, lowercased + punct-stripped,
    in ``badwords``), ``has_lorem`` ("lorem ipsum" substring of the
    lowercased page), ``has_brace`` ("{" anywhere); ``keep`` = at least
    ``min_kept_lines`` kept lines (each kept line ends a sentence — the
    pinned stand-in for the paper's >=3-sentences rule) and no page
    flag. ``kept_text`` is the kept lines joined by ``\\n`` regardless
    of ``keep`` (filtering is the caller's move), so the rewrite is
    value-checkable. Stateless map_batches — embarrassingly parallel at
    100 TB, the same shape C4 ran at."""
    bw = {w.lower() for w in badwords}

    def rules(batch: pa.Table) -> pa.Table:
        o_id, o_nl, o_nk, o_nw = [], [], [], []
        o_bad, o_lor, o_brc, o_keep, o_text = [], [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            t = t or ""
            lines = t.split("\n") if t else []
            kept, n_kept_words = [], 0
            has_bad = False
            for line in lines:
                words = _C4_WORD_RE.findall(line)
                lw = [w.lower().rstrip(_C4_STRIP) for w in words]
                if bw and not has_bad and any(w in bw for w in lw):
                    has_bad = True
                ok = (line.endswith(C4_TERMINAL_PUNCT)
                      and len(words) >= min_line_words
                      and "javascript" not in lw)
                if ok:
                    kept.append(line)
                    n_kept_words += len(words)
            low = t.lower()
            has_lorem = "lorem ipsum" in low
            has_brace = "{" in t
            keep = (len(kept) >= min_kept_lines and not has_bad
                    and not has_lorem and not has_brace)
            o_id.append(did)
            o_nl.append(len(lines))
            o_nk.append(len(kept))
            o_nw.append(n_kept_words)
            o_bad.append(int(has_bad))
            o_lor.append(int(has_lorem))
            o_brc.append(int(has_brace))
            o_keep.append(int(keep))
            o_text.append("\n".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "n_lines": pa.array(o_nl, pa.int64()),
                "n_kept_lines": pa.array(o_nk, pa.int64()),
                "n_kept_words": pa.array(o_nw, pa.int64()),
                "has_badword": pa.array(o_bad, pa.int64()),
                "has_lorem": pa.array(o_lor, pa.int64()),
                "has_brace": pa.array(o_brc, pa.int64()),
                "keep": pa.array(o_keep, pa.int64()),
                "kept_text": pa.array(o_text, pa.string()),
            }
        )

    return docs_ds.map_batches(rules, batch_format="pyarrow")
