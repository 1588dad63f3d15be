"""Corpus-trained BPE subword tokenizer: distributed word counting, the
classic byte-pair-merge training loop, and a distributed encode stage —
the "train a tokenizer on your corpus" step of an LLM data pipeline
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units", public algorithm; no reference counterpart — the
reference consumes pretrained HF tokenizers, SURVEY.md §2.2 M5).

Pinned semantics (engine, tests and the SQL-checked slice all share it):

- words are the SQL-safe ``[a-z0-9]+`` lowercase stream;
- a word is the symbol sequence of its characters plus a final ``</w>``
  end-of-word marker (the standard formulation — merges never cross a
  word boundary, and the marker lets a subword distinguish word-final
  position);
- each round merges the (pair-count-max) adjacent symbol pair, ties
  broken by (first symbol asc, second symbol asc) — fully deterministic;
- pair counts are EXACT int64 over the word-frequency table (a word
  occurring c times contributes c to each of its adjacent pairs).

Scale shape: word counting is the bounded-vocabulary pattern (per-batch
Counter partials, ONE word-hash shuffle, per-partition exact sums) — the
(word, count) table is value-domain-sized (Zipf), the standard BPE
training input, and the only thing the driver holds; the merge loop
itself is inherently sequential (each round depends on the last) and
runs on the driver over that bounded table, like every published BPE
trainer. Encoding broadcasts the merge ranks once (``ray.put``) and
streams the corpus through a stateless ``map_batches``.

The training loop is iterative and therefore has no SQL oracle; the
driver contract checks the SQL-expressible slices exactly (the word
count table; the round-1 argmax pair) and the loop itself is gated by an
independent from-scratch pytest oracle + partition invariance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EOW = "</w>"


# ---------------------------------------------------------------------------
# stage 1: distributed word counts (bounded-vocabulary pattern)
# ---------------------------------------------------------------------------


def word_counts(docs_ds, *, n_parts: int = 64, text_col: str = "text"):
    """documents -> (word, cnt) Dataset, exact int64 counts.

    Per-batch Counter partials (repeats inside a batch never fan out),
    one pinned word-hash shuffle, per-partition vectorized merge."""
    import pandas as pd

    from webindex.textstats import _ASCII_TOK_RE
    from webindex.util import stable_hash64

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_ASCII_TOK_RE.findall((t or "").lower()))
        words = list(c.keys())
        part = np.fromiter(
            (stable_hash64(w) % n_parts for w in words),
            dtype=np.int64, count=len(words),
        ).astype(np.int32)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "cnt_p": pa.array([c[w] for w in words], pa.int64()),
                "part": pa.array(part),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", sort=False)["cnt_p"].sum().reset_index()
        return out.rename(columns={"cnt_p": "cnt"})

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
    )


def pair_counts_ds(docs_ds, *, n_parts: int = 16, text_col: str = "text"):
    """documents -> (a, b, cnt): EXACT round-1 adjacent symbol-pair counts
    over the char+``</w>`` symbol stream — the table whose argmax is the
    first trained merge. Same bounded-vocabulary shape as word_counts
    (per-batch Counter partials over the ~1.4k-key pair domain, one tiny
    pinned hash shuffle, per-partition exact int64 sums); SQL-checkable,
    so the driver contract pins the training loop's round-1 input."""
    import pandas as pd

    from webindex.textstats import _ASCII_TOK_RE
    from webindex.util import stable_hash64

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        wc = Counter()
        for t in batch.column(text_col).to_pylist():
            wc.update(_ASCII_TOK_RE.findall((t or "").lower()))
        c = Counter()
        for w, k in wc.items():  # pairs once per DISTINCT word, weighted
            syms = tuple(w) + (EOW,)
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += k
        pairs = list(c.keys())
        part = np.fromiter(
            (stable_hash64(a + "\x1f" + b) % n_parts for a, b in pairs),
            dtype=np.int64, count=len(pairs),
        ).astype(np.int32)
        return pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.string()),
                "b": pa.array([p[1] for p in pairs], pa.string()),
                "cnt_p": pa.array([c[p] for p in pairs], pa.int64()),
                "part": pa.array(part),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], sort=False)["cnt_p"].sum().reset_index()
        return out.rename(columns={"cnt_p": "cnt"})

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# stage 2: the merge loop (driver-side, over the bounded word table)
# ---------------------------------------------------------------------------


def pair_counts(
    vocab: dict[tuple[str, ...], int]
) -> dict[tuple[str, str], int]:
    """Adjacent-symbol pair counts over a {symbol-tuple: count} vocab."""
    out: dict[tuple[str, str], int] = {}
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            out[p] = out.get(p, 0) + c
    return out


def best_pair(pairs: dict[tuple[str, str], int]):
    """Deterministic argmax: count desc, then pair lexicographic asc."""
    return min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def _merge_vocab(vocab, pair):
    a, b = pair
    ab = a + b
    out = {}
    for syms, c in vocab.items():
        i, n, new = 0, len(syms), []
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                new.append(ab)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + c
    return out


def train_bpe(word_count_rows, num_merges: int,
              *, max_vocab_words: int = 5_000_000):
    """[(word, count)] -> ordered merge list [(a, b), ...].

    The classic loop: start from characters + ``</w>``, repeatedly merge
    the argmax adjacent pair (ties: lexicographic asc). Stops early when
    no pair occurs twice. ``max_vocab_words`` guards the driver-resident
    table (the bounded-vocabulary assumption made explicit)."""
    rows = list(word_count_rows)
    if len(rows) > max_vocab_words:
        raise ValueError(
            f"word table has {len(rows)} entries > max_vocab_words="
            f"{max_vocab_words}; raise the cap or pre-filter rare words"
        )
    vocab = {tuple(w) + (EOW,): int(c) for w, c in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = pair_counts(vocab)
        pairs = {p: c for p, c in pairs.items() if c >= 2}
        if not pairs:
            break
        pair = best_pair(pairs)
        merges.append(pair)
        vocab = _merge_vocab(vocab, pair)
    return merges


def train_bpe_from_ds(docs_ds, num_merges: int, *, n_parts: int = 64,
                      text_col: str = "text", min_word_count: int = 1,
                      max_vocab_words: int = 5_000_000):
    """documents Dataset -> ordered merge list (counts distributed, the
    inherently-sequential loop on the driver's bounded word table).

    ``min_word_count`` is the scale guard for the driver-resident word
    table: words with corpus count below the floor are dropped
    DISTRIBUTEDLY (a ``filter`` on the counted Dataset) before the pull,
    so at 100 TB of web text — where the distinct-word count is billions
    but the count->=2 vocabulary is orders of magnitude smaller (Zipf:
    roughly half of distinct words are hapax legomena) — the driver
    never sees the long tail. This is an explicit approximation: pairs
    contributed only by sub-floor words are lost, exactly as in every
    production BPE trainer that applies a frequency cutoff (GPT-2's
    trainer floors at 2). Default 1 = exact (contract-scale behavior
    unchanged). ``max_vocab_words`` still hard-caps the pull after the
    floor; raise the floor rather than the cap when it trips."""
    wc = word_counts(docs_ds, n_parts=n_parts, text_col=text_col)
    if min_word_count > 1:
        wc = wc.filter(expr=f"cnt >= {int(min_word_count)}")
    rows = [
        (r["word"], r["cnt"]) for r in wc.iter_rows()
    ]  # vocab-sized pull, the documented driver-resident table
    rows.sort()  # iteration order must not depend on partition order
    return train_bpe(rows, num_merges, max_vocab_words=max_vocab_words)


# ---------------------------------------------------------------------------
# stage 3: distributed encode (broadcast ranks, stateless map_batches)
# ---------------------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order (the standard BPE encode: repeatedly
    merge the lowest-rank adjacent pair present)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        a, b = syms[best], syms[best + 1]
        # merge EVERY occurrence of the chosen pair this round (matches
        # the trainer's _merge_vocab, so encoding a training word yields
        # exactly its trained segmentation)
        i, new = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                new.append(a + b)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        syms = new
    return syms


class BpeEncodeStage:
    """Actor-pool encode stage: merge ranks broadcast once via ray.put,
    resolved in ``__init__`` (once per actor), per-word segmentations
    memoized per actor (Zipf makes the memo near-free). Emits
    ``(doc_id, n_words, n_bpe_tokens)`` per doc."""

    def __init__(self, merges_ref):
        import ray

        merges = (
            ray.get(merges_ref) if not isinstance(merges_ref, list)
            else merges_ref
        )
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from webindex.textstats import _ASCII_TOK_RE

        ids = batch.column("doc_id").to_pylist()
        n_words, n_bpe = [], []
        for t in batch.column("text").to_pylist():
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            total = 0
            for w in toks:
                k = self._memo.get(w)
                if k is None:
                    k = self._memo[w] = len(encode_word(w, self.ranks))
                total += k
            n_words.append(len(toks))
            n_bpe.append(total)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            }
        )


def bpe_token_counts(docs_ds, merges, *, concurrency=(1, 4),
                     batch_size: int = 256):
    """documents + trained merges -> (doc_id, n_words, n_bpe_tokens)."""
    import ray

    ref = ray.put(list(merges))
    return docs_ds.map_batches(
        BpeEncodeStage,
        fn_constructor_args=(ref,),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
