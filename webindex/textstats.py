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
    BPE-ish regex pre-token count (proxy for model token budgeting)."""
    ws, bpe, dids = [], [], batch.column("doc_id").to_pylist()
    for t in batch.column("text").to_pylist():
        t = t or ""
        ws.append(len(t.split()))
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


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp_md5, fp_roll): md5 of normalized text (SQL-checkable via
    DuckDB ``md5()``) + the rolling hash."""
    dids = batch.column("doc_id").to_pylist()
    md5s, rolls = [], []
    for t in batch.column("text").to_pylist():
        norm = " ".join((t or "").split())
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
