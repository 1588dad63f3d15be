"""Incremental crawl refresh (webindex.refresh): a re-crawl delta of
updated + stale + new pages refreshed into an old index must, after
compaction, answer every query identically (at the URL level — docIDs
legitimately differ) to an index built from scratch over the
latest-wins union of both crawls."""

import numpy as np
import pyarrow as pa
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.lifecycle import compact_index, read_deletes
from webindex.refresh import build_with_urlmap, refresh_index
from webindex.search import SearcherActor
from webindex.synth import synth_page, synth_pages_slice, synth_pages_table, synth_queries_table

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())
NUM_SHARDS = 8
N_V1 = 300

UPDATED_IDX = [i for i in range(5, 65, 2) if i % 41 not in (39, 40)]
STALE_IDX = list(range(70, 90))
NEW_RANGE = (300, 380)


def _delta_table() -> pa.Table:
    """Re-crawl delta: UPDATED_IDX urls with newer ts + new content,
    STALE_IDX urls with older ts (must be ignored), plus genuinely new
    pages (indices 300-380)."""
    rows = []
    for i in UPDATED_IDX:
        r = synth_page(i, seed=77)  # same url (url = f(i)), new content
        r["warc_ts"] = synth_page(i, seed=42)["warc_ts"] + 1_000_000_000
        rows.append(r)
    for i in STALE_IDX:
        r = synth_page(i, seed=77)
        r["warc_ts"] = synth_page(i, seed=42)["warc_ts"] - 1_000_000_000
        rows.append(r)
    new_tab = synth_pages_slice(*NEW_RANGE, seed=42)
    delta = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    return pa.concat_tables(
        [delta, new_tab.drop_columns(["text"]).select(delta.column_names)]
    )


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    """old (v1 build), refreshed (old + delta), refreshed_c (compacted),
    scratch (from-scratch over the latest-wins union)."""
    import ray.data as rd

    root = tmp_path_factory.mktemp("refresh")
    v1 = synth_pages_table(N_V1, seed=42).drop_columns(["text"])
    delta = _delta_table()

    old = str(root / "old")
    build_with_urlmap(rd.from_arrow(v1), old, CFG, num_shards=NUM_SHARDS)

    out = str(root / "refreshed")
    summary = refresh_index(old, rd.from_arrow(delta), out)

    comp = str(root / "refreshed_c")
    compact_index(out, comp)

    scratch = str(root / "scratch")
    union = pa.concat_tables([v1, delta.select(v1.column_names)])
    build_with_urlmap(rd.from_arrow(union), scratch, CFG,
                      num_shards=NUM_SHARDS)
    return {"old": old, "out": out, "comp": comp, "scratch": scratch,
            "summary": summary}


def _urlmap(idx: str) -> dict[int, str]:
    import pyarrow.dataset as pads

    t = pads.dataset(f"{idx}/urlmap").to_table(columns=["doc_id", "url"])
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("url").to_pylist()))


def _url_scores(idx: str, text: str) -> dict[str, float]:
    um = _urlmap(idx)
    s = SearcherActor(idx, top_k=10**6)
    ids, scores = s.search_one("q", text)
    return {um[int(d)]: sc for d, sc in zip(ids.tolist(), scores.tolist())}


def _expected_counts():
    """Single-threaded replica of the refresh decision: latest-wins within
    the delta, then new-or-strictly-newer vs the v1 winners. (Computed
    from the TABLES: v1's duplicate-url rule rewrites some row urls, so
    index arithmetic over UPDATED/STALE/NEW_RANGE would be wrong — e.g. a
    'stale' row whose url never actually appeared in v1 is new.)"""
    v1 = synth_pages_table(N_V1, seed=42)
    v1_latest: dict[str, int] = {}
    for u, t in zip(v1.column("url").to_pylist(),
                    v1.column("warc_ts").to_pylist()):
        ti = int(t.timestamp() * 1e6) if hasattr(t, "timestamp") else int(t)
        if u not in v1_latest or ti > v1_latest[u]:
            v1_latest[u] = ti
    delta = _delta_table()
    d_latest: dict[str, int] = {}
    for u, t in zip(delta.column("url").to_pylist(),
                    delta.column("warc_ts").to_pylist()):
        ti = int(t.timestamp() * 1e6) if hasattr(t, "timestamp") else int(t)
        if u not in d_latest or ti > d_latest[u]:
            d_latest[u] = ti
    n_new = sum(1 for u in d_latest if u not in v1_latest)
    n_updated = sum(
        1 for u, ti in d_latest.items()
        if u in v1_latest and ti > v1_latest[u]
    )
    return n_new, n_updated


def test_summary_counts(indexes):
    s = indexes["summary"]
    n_new, n_updated = _expected_counts()
    assert s["n_updated"] == n_updated == len(UPDATED_IDX)
    assert s["n_new"] == n_new
    assert s["n_delta_docs"] == n_new + n_updated
    # tombstones present in the refreshed (not compacted) index
    assert read_deletes(indexes["out"]).size == n_updated


def test_compacted_refresh_equals_scratch(indexes):
    from webindex.util import read_json

    sc = read_json(f"{indexes['comp']}/stats.json")
    sb = read_json(f"{indexes['scratch']}/stats.json")
    for k in ("N", "total_tokens", "avgdl", "n_terms"):
        assert sc[k] == sb[k], k

    n_checked = 0
    for text in synth_queries_table(n=20).column("text").to_pylist():
        a = _url_scores(indexes["comp"], text)
        b = _url_scores(indexes["scratch"], text)
        assert a == b, text  # urls AND float64 scores bit-identical
        n_checked += bool(a)
    assert n_checked >= 15


def test_precompaction_match_set(indexes):
    """Before compaction the match SET is already correct (tombstones
    hide superseded docs); only the statistics lag until compaction."""
    for text in synth_queries_table(n=10).column("text").to_pylist():
        got = set(_url_scores(indexes["out"], text))
        want = set(_url_scores(indexes["scratch"], text))
        assert got == want, text


def test_updated_content_searchable(indexes):
    """The refreshed index serves the NEW content of an updated url: its
    doc_id maps to the url in the merged urlmap, and the superseded old
    doc_id is gone from the urlmap."""
    um_old = _urlmap(indexes["old"])
    um_new = _urlmap(indexes["out"])
    updated_urls = {synth_page(i, seed=42)["url"] for i in UPDATED_IDX}
    old_ids = {d for d, u in um_old.items() if u in updated_urls}
    assert old_ids and not (old_ids & set(um_new)), (
        "superseded ids must leave the merged urlmap"
    )
    assert updated_urls <= set(um_new.values())


def test_refresh_rerun_idempotent(indexes, tmp_path_factory):
    import ray.data as rd

    s2 = refresh_index(
        indexes["old"], rd.from_arrow(_delta_table()), indexes["out"]
    )
    assert s2["n_updated"] == indexes["summary"]["n_updated"]
    assert s2["n_new"] == indexes["summary"]["n_new"]
    assert read_deletes(indexes["out"]).size == s2["n_updated"]


def test_stale_only_delta_is_noop(indexes, tmp_path_factory):
    import ray.data as rd

    rows = []
    # skip i % 41 == 40: v1's duplicate-url rule rewrote those rows' urls,
    # so url(i) never entered v1 and a "stale" re-crawl of it would be new
    for i in (j for j in STALE_IDX if j % 41 != 40):
        r = synth_page(i, seed=77)
        r["warc_ts"] = synth_page(i, seed=42)["warc_ts"] - 5_000_000_000
        rows.append(r)
    stale = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    out = str(tmp_path_factory.mktemp("refresh") / "noop")
    s = refresh_index(indexes["old"], rd.from_arrow(stale), out)
    assert s == {
        "n_delta_docs": 0, "n_updated": 0, "n_new": 0, "stats": s["stats"]
    }
    from webindex.util import read_json

    assert s["stats"]["N"] == read_json(
        f"{indexes['old']}/stats.json"
    )["N"]
