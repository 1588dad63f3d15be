"""OpenAI search-endpoint scorer semantics (SURVEY.md §2.2 M13)."""

import math

import pandas as pd
import ray.data as rd

from webindex.openai_scorer import (
    DeterministicCompletionClient,
    construct_context,
    get_score,
    score_pairs_ds,
    search,
)


def test_construct_context_template():
    assert construct_context("q", "doc") == (
        "<|endoftext|>doc\n\n---\n\nThe above passage is related to: q"
    )


def test_get_score_walks_query_span():
    # context "AAAA BB q" with query "q": cutoff = 9 - 1 = 8. The final
    # token sits exactly at the cutoff (the query span), so the backwards
    # walk adds it and stops: mean over exactly the query's one token.
    context, query = "AAAA BB q", "q"
    offsets = [0, 4, 5, 7, 8]
    logprobs = [-1.0, -2.0, -3.0, -4.0, -5.0]
    got = get_score(context, query, logprobs, offsets)
    assert math.isclose(got, -5.0 * 100.0)
    # a longer query spanning the last two tokens averages both
    got2 = get_score("AAAA BB 7 8", "7 8", logprobs, [0, 4, 5, 8, 10])
    assert math.isclose(got2, (-5.0 - 4.0) / 2 * 100.0)


def test_get_score_skips_repeated_offsets():
    # repeated offset at the cutoff boundary must not stop the walk
    context, query = "AB q", "q"   # cutoff 3
    offsets = [0, 3, 3]
    logprobs = [-1.0, -2.0, -4.0]
    got = get_score(context, query, logprobs, offsets)
    # i=2: add -4 (offset 3 > cutoff? 3 <= 3 but == offsets[1] -> continue)
    # i=1: add -2 (3 <= 3 and != offsets[0] -> stop)
    assert math.isclose(got, (-4.0 - 2.0) / 2 * 100.0)


def test_search_normalizes_by_empty_doc():
    client = DeterministicCompletionClient()
    res = search("apple orange", ["", "banana", "lord lollipop"], client)
    assert [r["document"] for r in res] == [0, 1, 2]
    # the empty document IS the baseline: its normalized score is 0
    assert res[0]["score"] == 0.0
    # deterministic across calls
    res2 = search("apple orange", ["", "banana", "lord lollipop"], client)
    assert res == res2


def test_ray_stage_matches_driver_search(ray_session):
    queries = {"q1": "apple orange", "q2": "database systems"}
    docs = {"d1": "banana", "d2": "lord lollipop", "d3": "btree index page"}
    pairs = pd.DataFrame(
        [
            {"qid": qid, "query": qtext, "did": did, "text": dtext}
            for qid, qtext in queries.items()
            for did, dtext in docs.items()
        ]
    )
    out = (
        score_pairs_ds(rd.from_pandas(pairs), batch_size=2)
        .to_pandas()
        .sort_values(["qid", "did"])
        .reset_index(drop=True)
    )
    client = DeterministicCompletionClient()
    for qid, qtext in queries.items():
        doc_ids = sorted(docs)
        expected = search(qtext, [docs[d] for d in doc_ids], client)
        got = out[out["qid"] == qid].sort_values("did")["score"].tolist()
        assert got == [r["score"] for r in expected]
