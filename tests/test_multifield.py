"""Multi-field best_fields (ES multi_match analog, webindex.multifield):
engine vs an independent per-field OracleBM25 combination, pool vs sharded
path identity, and the pinned field-split properties."""

import random

import numpy as np
import pyarrow as pa
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.multifield import (
    RAW_TOKEN_RE,
    TIE_BREAKER,
    MultiFieldSearcher,
    build_field_indexes,
    split_fields,
)
from webindex.oracle import OracleBM25
from webindex.synth import VOCAB, synth_queries_table

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())
N_DOCS = 400


def _corpus() -> list[tuple[int, str]]:
    """Deterministic (doc_id, text) rows across 4 docID shards (multi-salt
    posting runs) with a mix of short (title-only) and long docs."""
    rng = random.Random(123)
    out = []
    for i in range(N_DOCS):
        shard = i % 4
        rank = i // 4
        doc_id = (shard << 40) | rank
        n = rng.choice([3, 5, 8, 15, 40, 80])  # 3/5 -> empty body field
        text = " ".join(rng.choices(VOCAB, k=n))
        out.append((doc_id, text))
    return out


@pytest.fixture(scope="module")
def field_indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    rows = _corpus()
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )
    root = str(tmp_path_factory.mktemp("mf") / "idx")
    return build_field_indexes(docs, root, CFG)


@pytest.fixture(scope="module")
def mf_oracle():
    """Independent single-threaded oracle: one OracleBM25 per field over
    the split corpora, combined max + tie*min per doc."""
    rows = _corpus()
    title_rows, body_rows = [], []
    for doc_id, text in rows:
        title, body = split_fields(text)
        if title:
            title_rows.append((doc_id, title))
        if body:
            body_rows.append((doc_id, body))
    ot = OracleBM25(title_rows, CFG)
    ob = OracleBM25(body_rows, CFG)

    def topk(query: str, k: int):
        st = dict(ot.topk(query, 10**9))
        sb = dict(ob.topk(query, 10**9))
        comb = {
            d: max(st.get(d, 0.0), sb.get(d, 0.0))
            + TIE_BREAKER * min(st.get(d, 0.0), sb.get(d, 0.0))
            for d in set(st) | set(sb)
        }
        ranked = sorted(comb.items(), key=lambda e: (-e[1], e[0]))
        return ranked[:k]

    return topk


def test_split_fields_pinned():
    assert split_fields("a b c") == ("a b c", "")
    assert split_fields("one two three four five six seven eight") == (
        "one two three four five six",
        "seven eight",
    )
    # whitespace runs collapse; \v is NOT a separator (RE2 \s parity)
    assert split_fields(" a\t\tb\nc ") == ("a b c", "")
    assert split_fields("a\x0bb c") == ("a\x0bb c", "")
    assert split_fields("") == ("", "")


def test_split_fields_property():
    rng = random.Random(9)
    for _ in range(200):
        toks = rng.choices(VOCAB, k=rng.randint(0, 20))
        text = " ".join(toks)
        title, body = split_fields(text)
        # recombined raw tokens == original raw tokens (no loss, no gain)
        assert RAW_TOKEN_RE.findall(title) + RAW_TOKEN_RE.findall(body) == toks
        assert len(RAW_TOKEN_RE.findall(title)) <= 6


def test_best_fields_matches_oracle(field_indexes, mf_oracle):
    s = MultiFieldSearcher(
        field_indexes["title"], field_indexes["body"], top_k=50
    )
    qs = synth_queries_table(n=30)
    n_nonempty = 0
    for qid, text in zip(
        qs.column("qid").to_pylist(), qs.column("text").to_pylist()
    ):
        expect = mf_oracle(text, 50)
        ids, scores = s.search_one(qid, text)
        assert list(zip(ids.tolist(), scores.tolist())) == expect, (qid, text)
        n_nonempty += bool(expect)
    assert n_nonempty >= 25


def test_title_only_docs_still_score(field_indexes, mf_oracle):
    """A doc with <= 6 raw tokens has an empty body field; its combined
    score must equal its title-field score alone (min side is 0)."""
    rows = _corpus()
    short = {d for d, t in rows if len(t.split()) <= 6}
    assert short, "fixture lost its short docs"
    s = MultiFieldSearcher(
        field_indexes["title"], field_indexes["body"], top_k=10**6
    )
    hits = 0
    qs = synth_queries_table(n=30)
    for qid, text in zip(
        qs.column("qid").to_pylist(), qs.column("text").to_pylist()
    ):
        ids, _ = s.search_one(qid, text)
        hits += len(short & set(ids.tolist()))
    assert hits > 0, "no short doc ever matched — fixture too narrow"


@pytest.mark.usefixtures("ray_session")
def test_pool_vs_sharded_identical(field_indexes):
    import ray.data as rd

    from webindex.multifield import multifield_search

    qs = rd.from_arrow(synth_queries_table(n=20)).repartition(3)
    frames = {}
    for impl in ("pool", "sharded"):
        runs = multifield_search(
            qs,
            field_indexes["title"],
            field_indexes["body"],
            top_k=15,
            impl=impl,
            n_shards=3,
            concurrency=2,
            batch_size=8,
        ).to_pandas()
        frames[impl] = (
            runs[["qid", "doc_id", "score", "rank"]]
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
    assert frames["pool"].equals(frames["sharded"])
    assert len(frames["pool"]) > 0


def test_field_stats_independent(field_indexes):
    """Per-field N/avgdl come from that field's non-empty docs only."""
    from webindex.util import read_json

    st = read_json(f"{field_indexes['title']}/stats.json")
    sb = read_json(f"{field_indexes['body']}/stats.json")
    rows = _corpus()
    n_title = sum(1 for _, t in rows if split_fields(t)[0])
    n_body = sum(1 for _, t in rows if split_fields(t)[1])
    assert st["N"] == n_title
    assert sb["N"] == n_body
    assert sb["N"] < st["N"]  # short docs exist
    assert st["avgdl"] < sb["avgdl"]  # titles are capped at 6 raw tokens


def test_multifield_respects_deletes(field_indexes, tmp_path_factory):
    """Tombstones (webindex.lifecycle) on both field indexes exclude the
    doc from combined results; survivor scores are unchanged."""
    import shutil

    from webindex.lifecycle import delete_docs

    root = tmp_path_factory.mktemp("mfdel")
    dirs = {}
    for f, d in field_indexes.items():
        dirs[f] = str(root / f)
        shutil.copytree(d, dirs[f])

    s0 = MultiFieldSearcher(
        field_indexes["title"], field_indexes["body"], top_k=10**6
    )
    text = "data pipeline search"
    ids0, sc0 = s0.search_one("q", text)
    assert ids0.size > 1
    victim = int(ids0[0])
    for d in dirs.values():
        delete_docs(d, [victim])
    s1 = MultiFieldSearcher(dirs["title"], dirs["body"], top_k=10**6)
    ids1, sc1 = s1.search_one("q", text)
    before = dict(zip(ids0.tolist(), sc0.tolist()))
    after = dict(zip(ids1.tolist(), sc1.tolist()))
    assert set(after) == set(before) - {victim}
    assert all(after[d] == before[d] for d in after)


# ---------------------------------------------------------------------------
# combined_fields (ES combined_fields / BM25F-style weighted-field BM25)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cf_oracle():
    """Independent single-threaded combined-fields oracle: weighted tf/dl
    over the split corpora, union df, one BM25."""
    import math

    from webindex.analyze import Analyzer
    from webindex.multifield import COMBINED_WEIGHTS

    wt, wb = COMBINED_WEIGHTS
    an = Analyzer(CFG.analyzer)
    tft, tfb, dlt, dlb = {}, {}, {}, {}
    for d, text in _corpus():
        title, body = split_fields(text)
        if title:
            c = an.term_freqs(title)
            dlt[d] = sum(c.values())
            for t, f in c.items():
                tft.setdefault(t, {})[d] = f
        if body:
            c = an.term_freqs(body)
            dlb[d] = sum(c.values())
            for t, f in c.items():
                tfb.setdefault(t, {})[d] = f
    N = len(dlt)
    avgdl = (wt * sum(dlt.values()) + wb * sum(dlb.values())) / N

    def topk(query: str, k: int):
        terms = sorted(set(an.tokens(query)))
        scores: dict[int, float] = {}
        for t in terms:
            docs = set(tft.get(t, {})) | set(tfb.get(t, {}))
            if not docs:
                continue
            dfu = len(docs)
            idf = math.log(1.0 + (N - dfu + 0.5) / (dfu + 0.5))
            for d in docs:
                tf = (wt * tft.get(t, {}).get(d, 0)
                      + wb * tfb.get(t, {}).get(d, 0))
                dl = wt * dlt[d] + wb * dlb.get(d, 0)
                denom = tf + CFG.k1 * (1.0 - CFG.b + CFG.b * (dl / avgdl))
                scores[d] = scores.get(d, 0.0) + idf * (tf / denom)
        return sorted(scores.items(), key=lambda e: (-e[1], e[0]))[:k]

    return topk


def test_combined_fields_matches_oracle(field_indexes, cf_oracle):
    s = MultiFieldSearcher(
        field_indexes["title"], field_indexes["body"], top_k=50,
        combine="combined_fields",
        combined_dict_dir=field_indexes["combined_dict"],
    )
    qs = synth_queries_table(n=30)
    n_nonempty = 0
    for qid, text in zip(
        qs.column("qid").to_pylist(), qs.column("text").to_pylist()
    ):
        expect = cf_oracle(text, 50)
        ids, scores = s.search_one(qid, text)
        assert list(zip(ids.tolist(), scores.tolist())) == expect, (qid, text)
        n_nonempty += bool(expect)
    assert n_nonempty >= 25


def test_combined_dict_is_exact_union(field_indexes):
    """The build-time sidecar df equals the runtime posting-doc union for
    every dictionary term (full-index readers = global truth)."""
    import pyarrow.dataset as pads

    from webindex.segments import SegmentReader

    dic = pads.dataset(field_indexes["combined_dict"]).to_table()
    cdict = dict(zip(dic.column("term").to_pylist(),
                     dic.column("dfu").to_pylist()))
    rt = SegmentReader(field_indexes["title"])
    rb = SegmentReader(field_indexes["body"])
    terms = set(rt._df) | set(rb._df)
    assert terms == set(cdict)
    for t in sorted(terms):
        plt, plb = rt.postings(t), rb.postings(t)
        union = set(plt.ids.tolist() if plt is not None else []) | set(
            plb.ids.tolist() if plb is not None else []
        )
        assert cdict[t] == len(union), t


@pytest.mark.usefixtures("ray_session")
def test_combined_pool_vs_sharded_identical(field_indexes):
    import ray.data as rd

    from webindex.multifield import multifield_search

    qs = rd.from_arrow(synth_queries_table(n=15)).repartition(3)
    frames = {}
    for impl in ("pool", "sharded"):
        runs = multifield_search(
            qs, field_indexes["title"], field_indexes["body"],
            top_k=12, impl=impl, n_shards=3, concurrency=2, batch_size=8,
            combine="combined_fields",
            combined_dict_dir=field_indexes["combined_dict"],
        ).to_pandas()
        frames[impl] = (
            runs[["qid", "doc_id", "score", "rank"]]
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
    assert frames["pool"].equals(frames["sharded"])
    assert len(frames["pool"]) > 0


def test_combined_requires_dict(field_indexes):
    with pytest.raises(ValueError, match="combined_dict"):
        MultiFieldSearcher(
            field_indexes["title"], field_indexes["body"],
            combine="combined_fields",
        )
