"""BPE tokenizer training + encode (webindex/bpe.py) vs an INDEPENDENT
from-scratch reference: the reference counts pairs over the raw word
STREAM (not the word-count dict) and encodes by applying the merge list
sequentially (merge 1 everywhere, then merge 2, ...) — different
derivation paths that must agree exactly with the engine's."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from webindex.bpe import (EOW, bpe_token_counts, encode_word,
                          pair_counts_ds, train_bpe, train_bpe_from_ds,
                          word_counts)

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    (0, "low low low low low lower lower newest newest"),
    (1, "newest newest newest newest widest widest widest"),
    (2, "the lowest newest widest low low"),
    (3, ""),
    (4, "a ab abc abcd"),
]


def _ref_train(docs, num_merges):
    """Stream-based reference: symbols per word OCCURRENCE."""
    stream = []
    for _, t in docs:
        for w in TOK.findall(t.lower()):
            stream.append(list(w) + [EOW])
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms in stream:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += 1
        pairs = {p: c for p, c in pairs.items() if c >= 2}
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for k, syms in enumerate(stream):
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            stream[k] = new
    return merges, stream


def _ref_encode(word, merges):
    """Sequential-application reference encode."""
    syms = list(word) + [EOW]
    for a, b in merges:
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


def test_train_bpe_matches_stream_reference():
    wc = Counter()
    for _, t in DOCS:
        wc.update(TOK.findall(t.lower()))
    got = train_bpe(sorted(wc.items()), 30)
    want, _ = _ref_train(DOCS, 30)
    assert got == want
    assert got  # the corpus has mergeable pairs
    # first merge is the raw argmax adjacent char pair (sanity)
    pairs = Counter()
    for w, c in wc.items():
        syms = list(w) + [EOW]
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    assert got[0] == min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def test_encode_matches_sequential_reference():
    wc = Counter()
    for _, t in DOCS:
        wc.update(TOK.findall(t.lower()))
    merges = train_bpe(sorted(wc.items()), 30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in list(wc) + ["unseenword", "zzz", "a"]:
        assert encode_word(w, ranks) == _ref_encode(w, merges), w
    # training words segment exactly as the trainer left them
    _, stream = _ref_train(DOCS, 30)
    seen = {}
    for _, t in DOCS:
        for w in TOK.findall(t.lower()):
            seen.setdefault(w, None)
    it = iter(stream)
    for _, t in DOCS:
        for w in TOK.findall(t.lower()):
            assert encode_word(w, ranks) == next(it), w


def test_train_from_ds_partition_invariance(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS]),
        }
    )
    outs = []
    for n_parts, n_blocks in [(4, 1), (16, 3)]:
        ds = rd.from_arrow(tab)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        outs.append(train_bpe_from_ds(ds, 20, n_parts=n_parts))
    assert outs[0] == outs[1]
    want, _ = _ref_train(DOCS, 20)
    assert outs[0] == want


def test_train_from_ds_min_word_count_floor(ray_session):
    import ray.data as rd

    from webindex.bpe import train_bpe

    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS]),
        }
    )
    # the floor drops sub-floor words DISTRIBUTEDLY before the driver
    # pull; result == training on the floored word table directly
    wc = Counter()
    for _, t in DOCS:
        wc.update(TOK.findall(t.lower()))
    floored = sorted((w, c) for w, c in wc.items() if c >= 2)
    assert floored and len(floored) < len(wc)  # floor actually engages
    got = train_bpe_from_ds(
        rd.from_arrow(tab), 20, n_parts=8, min_word_count=2
    )
    assert got == train_bpe(floored, 20)
    # default floor (1) is exact: identical to the unfloored train
    assert train_bpe_from_ds(rd.from_arrow(tab), 20, n_parts=8) == \
        train_bpe(sorted(wc.items()), 20)


def test_word_counts_exact(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS]),
        }
    )
    got = {
        r["word"]: r["cnt"]
        for r in word_counts(rd.from_arrow(tab), n_parts=8).iter_rows()
    }
    wc = Counter()
    for _, t in DOCS:
        wc.update(TOK.findall(t.lower()))
    assert got == dict(wc)


def test_pair_counts_ds_exact(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS]),
        }
    )
    want = Counter()
    for _, t in DOCS:
        for w in TOK.findall(t.lower()):
            syms = list(w) + [EOW]
            for i in range(len(syms) - 1):
                want[(syms[i], syms[i + 1])] += 1
    for n_parts, n_blocks in [(4, 1), (16, 3)]:
        ds = rd.from_arrow(tab)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        got = {
            (r["a"], r["b"]): r["cnt"]
            for r in pair_counts_ds(ds, n_parts=n_parts).iter_rows()
        }
        assert got == dict(want)


def test_bpe_token_counts_end_to_end(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS]),
        }
    )
    ds = rd.from_arrow(tab)
    merges = train_bpe_from_ds(ds, 25, n_parts=8)
    out = (
        bpe_token_counts(rd.from_arrow(tab), merges, concurrency=2,
                         batch_size=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for did, t in DOCS:
        toks = TOK.findall(t.lower())
        row = out.loc[did]
        assert int(row["n_words"]) == len(toks)
        want = sum(len(_ref_encode(w, merges)) for w in toks)
        assert int(row["n_bpe_tokens"]) == want
    # merging strictly compresses the char+EOW baseline somewhere
    base = out["n_words"].sum() + sum(
        len(w) for _, t in DOCS for w in TOK.findall(t.lower())
    )
    assert out["n_bpe_tokens"].sum() < base


def test_train_bpe_vocab_guard():
    with pytest.raises(ValueError):
        train_bpe([("w%d" % i, 1) for i in range(10)], 5,
                  max_vocab_words=5)
