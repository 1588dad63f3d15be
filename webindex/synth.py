"""Deterministic synthetic web-page corpus + query/qrel fixtures.

Implements FIXTURES.md F1-F3: a Common-Crawl-style ``pages`` table with the
exact ``BASELINE.json input_hint`` schema
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
``text`` is the *golden* extraction target, computed directly from the word
sequence (NOT by running the extractor), so the byte-identity test of
``webindex.extract`` is meaningful.

Every row is a pure function of ``(seed, i)`` — generation is
order/partition independent and reproducible at any scale. Zipf-weighted
vocabulary (stopwords heaviest) reproduces the stopword-scale term skew the
salted posting build must handle (SURVEY.md §7.3).

Adversarial rows (FIXTURES.md F1): empty body (i % 23 == 3), missing title
(i % 17 == 0), duplicate url with newer warc_ts (i % 41 == 40, duplicates
i-1), very long doc (i == 7), stopword-only doc (i % 53 == 9).
"""

from __future__ import annotations

import html as _htmllib
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from webindex.analyze import Analyzer

# Stopword-heavy head + content-word tail, Zipf-ish weights.
STOPWORD_HEAD = [
    "the", "of", "and", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "this", "was", "are", "be", "or",
]
CONTENT_WORDS = [
    "search", "index", "query", "document", "ranking", "retrieval", "engine",
    "web", "page", "crawl", "corpus", "term", "score", "merge", "sort",
    "shard", "block", "posting", "lexical", "token", "stemmer", "filter",
    "parallel", "cluster", "node", "batch", "stream", "shuffle", "partition",
    "vector", "embedding", "neural", "model", "training", "data", "pipeline",
    "compression", "encoding", "decode", "latency", "throughput", "cache",
    "memory", "disk", "network", "storage", "replica", "fault", "tolerance",
    "checkpoint", "resume", "lineage", "metric", "evaluation", "benchmark",
    "precision", "recall", "relevance", "judgment", "annotation", "label",
    "artificial", "intelligence", "deep", "learning", "snow", "winter",
    "summer", "ocean", "mountain", "river", "forest", "desert", "city",
    "village", "market", "economy", "science", "history", "language",
    "culture", "music", "painting", "theater", "football", "tennis",
    "chess", "cooking", "garden", "travel", "medicine", "biology",
    "physics", "chemistry", "astronomy", "geology", "algebra", "geometry",
    "statistics", "probability", "r&d", "covid19", "genome", "protein",
]
VOCAB = STOPWORD_HEAD + CONTENT_WORDS
_WEIGHTS = [1.0 / (r + 2) for r in range(len(VOCAB))]
_LANGS = ["en"] * 17 + ["de", "es", ""]

_JUNK = ["var x=1;", "function f(){return 0}", ".cls{color:red}", "TRACKING"]


def _words(rng: random.Random, n: int) -> list[str]:
    return rng.choices(VOCAB, weights=_WEIGHTS, k=n)


def _render_word(rng: random.Random, w: str) -> str:
    """HTML for one word; must decode/strip back to exactly ``w``."""
    esc = _htmllib.escape(w)  # '&' -> '&amp;' etc.
    roll = rng.random()
    if roll < 0.05:
        return f"<b>{esc}</b>"
    if roll < 0.08:
        return f"<em class=\"w{rng.randrange(9)}\">{esc}</em>"
    if roll < 0.12 and w.isascii() and w.isalpha():
        # numeric character reference for the first letter
        return f"&#{ord(w[0])};{w[1:]}"
    return esc


def synth_page(i: int, seed: int = 42) -> dict:
    rng = random.Random((seed << 24) ^ i)
    url = f"https://site{i % 97:02d}.example.com/page/{i:08d}"
    ts = 1_600_000_000_000_000 + i * 1_000_000 + (i % 7)

    if i % 53 == 9:
        body_words = rng.choices(STOPWORD_HEAD, k=rng.randint(10, 40))
    elif i % 23 == 3:
        body_words = []
    else:
        n = 10_000 if i == 7 else rng.randint(20, 260)
        body_words = _words(rng, n)

    title_words = [] if i % 17 == 0 else _words(rng, rng.randint(2, 5))

    # golden text per the pinned extraction spec
    title = " ".join(title_words)
    body = " ".join(body_words)
    text = (title + " " + body).strip() if title else body

    # render html with decorations the extractor must undo
    parts = ["<html><head>"]
    if title_words:
        parts.append(f"<title>\n  {' '.join(_htmllib.escape(w) for w in title_words)}\n</title>")
    if rng.random() < 0.4:
        parts.append(f"<script type=\"text/javascript\">{rng.choice(_JUNK)}</script>")
    if rng.random() < 0.3:
        parts.append(f"<style>{_JUNK[2]}</style>")
    parts.append("</head>\n<body>")
    if rng.random() < 0.3:
        parts.append(f"<!-- {rng.choice(_JUNK)} -->")
    k = 0
    while k < len(body_words):
        plen = min(rng.randint(8, 60), len(body_words) - k)
        para = "\n ".join(
            _render_word(rng, w) for w in body_words[k : k + plen]
        )
        parts.append(f"<p class=\"para p{k}\">{para}</p>")
        k += plen
    parts.append("</body></html>")
    html_doc = "\n".join(parts)

    return {
        "url": url,
        "warc_ts": ts,
        "html": html_doc.encode("utf-8"),
        "text": text,
        "lang": rng.choice(_LANGS),
    }


def synth_pages_slice(start: int, stop: int, seed: int = 42) -> pa.Table:
    """Rows [start, stop) of the corpus — identical to the same rows of
    ``synth_pages_table(n)`` for any slicing (each row is a pure function
    of its global index, including the duplicate-url rule)."""
    rows = [synth_page(i, seed) for i in range(start, stop)]
    # duplicate-url rows: i % 41 == 40 duplicates url of i-1 with newer ts
    for i in range(start + (40 - start) % 41, stop, 41):
        src = rows[i - 1 - start] if i - 1 >= start else synth_page(i - 1, seed)
        rows[i - start]["url"] = src["url"]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def synth_pages_table(n: int, seed: int = 42) -> pa.Table:
    return synth_pages_slice(0, n, seed)


def synth_queries_table(n: int = 50, seed: int = 7) -> pa.Table:
    """BEIR-style query set (FIXTURES.md F2)."""
    rng = random.Random(seed)
    qids, texts = [], []
    for i in range(n):
        if i == 0:
            # qid colliding with a docID string -> exercises self-hit anti-join
            qid, text = "3", "artificial intelligence"
        elif i == 1:
            qid, text = "q1", "the and of to"  # stopword-only
        elif i == 2:
            qid, text = "q2", "search index query document"  # high-df multi-term
        else:
            qid = f"q{i}"
            text = " ".join(
                rng.choices(CONTENT_WORDS, weights=_WEIGHTS[len(STOPWORD_HEAD):], k=rng.randint(1, 4))
            )
        qids.append(qid)
        texts.append(text)
    return pa.table({"qid": pa.array(qids), "text": pa.array(texts)})


def synth_qrels_table(
    corpus: list[tuple[int, str]], queries: pa.Table, max_rel_per_q: int = 20
) -> pa.Table:
    """Qrels (FIXTURES.md F3): rel=1 for docs containing every query term,
    rel=2 for the doc with the most total occurrences. ``corpus`` is
    ``[(doc_id, text)]`` AFTER dedup/docID assignment.
    """
    an = Analyzer()
    doc_tfs = [(did, an.term_freqs(t)) for did, t in corpus]
    qids, dids, rels = [], [], []
    for qid, qtext in zip(
        queries.column("qid").to_pylist(), queries.column("text").to_pylist()
    ):
        terms = set(an.tokens(qtext))
        if not terms:
            continue
        hits = []
        for did, tf in doc_tfs:
            if all(t in tf for t in terms):
                hits.append((sum(tf[t] for t in terms), did))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for j, (_, did) in enumerate(hits[:max_rel_per_q]):
            qids.append(qid)
            dids.append(str(did))
            rels.append(2 if j == 0 else 1)
    return pa.table(
        {
            "qid": pa.array(qids),
            "did": pa.array(dids),
            "rel": pa.array(rels, pa.int32()),
        }
    )


PAGES_PER_FILE = 12_500


def synth_dir(n_pages: int, seed: int = 42, root: str = "/tmp/webindex-synth") -> str:
    """Materialize pages/queries parquet for ``n_pages`` under a cached dir.

    ``pages.parquet`` is a DIRECTORY of ~12.5k-row files with 4096-row row
    groups: a single-file single-row-group corpus forces ``read_parquet``
    into one serial read task, which caps every downstream stage (the v1
    layout measured 0.2-0.3 scaling efficiency on the build purely from the
    serial read).
    """
    d = os.path.join(root, f"n{n_pages}-s{seed}-v2")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        tmp = d + ".tmp"
        pages_tmp = os.path.join(tmp, "pages.parquet")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(pages_tmp)
        for fi, start in enumerate(range(0, n_pages, PAGES_PER_FILE)):
            stop = min(start + PAGES_PER_FILE, n_pages)
            tab = synth_pages_slice(start, stop, seed)
            pq.write_table(
                tab,
                os.path.join(pages_tmp, f"part-{fi:05d}.parquet"),
                row_group_size=4096,
            )
        pq.write_table(synth_queries_table(), os.path.join(tmp, "queries.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        shutil.rmtree(d, ignore_errors=True)
        os.replace(tmp, d)
    return d
