"""BEIR-format source/sink round-trips (SURVEY.md §2.1 S1/S5/S6)."""

import json

import pandas as pd

from webindex.sources import (
    nested_to_runs_table,
    read_beir_corpus,
    read_beir_queries,
    read_qrels_tsv,
    read_runs_json,
    runs_table_to_nested,
    write_beir_corpus,
    write_runs_json,
)


def test_corpus_jsonl_roundtrip(ray_session, tmp_path):
    path = tmp_path / "corpus.jsonl"
    rows = [
        {"_id": "d1", "title": "Alpha", "text": "alpha body"},
        {"_id": "d2", "title": None, "text": "beta body"},
        {"_id": "3", "text": "no title field"},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = read_beir_corpus(str(path)).to_pandas().sort_values("doc_id")
    assert df["doc_id"].tolist() == ["3", "d1", "d2"]
    # clean_titles semantics: missing/None title -> ""
    assert df["title"].tolist() == ["", "Alpha", ""]

    out = tmp_path / "copy.jsonl"
    import ray.data as rd

    write_beir_corpus(rd.from_pandas(df), str(out))
    back = read_beir_corpus(str(out)).to_pandas().sort_values("doc_id")
    assert back["text"].tolist() == df["text"].tolist()


def test_queries_and_qrels(ray_session, tmp_path):
    qpath = tmp_path / "queries.jsonl"
    with open(qpath, "w") as f:
        f.write(json.dumps({"_id": "q1", "text": "hello world"}) + "\n")
        f.write(json.dumps({"_id": "q2", "text": "bye"}) + "\n")
    q = read_beir_queries(str(qpath)).to_pandas().sort_values("qid")
    assert q["text"].tolist() == ["hello world", "bye"]

    tpath = tmp_path / "test.tsv"
    with open(tpath, "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t2\nq1\td2\t0\nq2\td9\t1\n")
    qr = read_qrels_tsv(str(tpath)).to_pandas()
    assert len(qr) == 3
    assert set(qr.columns) == {"qid", "did", "rel"}
    assert qr.set_index(["qid", "did"]).loc[("q1", "d1"), "rel"] == 2


def test_runs_json_roundtrip(tmp_path):
    runs = pd.DataFrame(
        [("q1", "d2", 2.5, 1), ("q1", "d1", 1.5, 2), ("q2", "d3", 9.0, 1)],
        columns=["qid", "did", "score", "rank"],
    )
    nested = runs_table_to_nested(runs)
    assert nested == {"q1": {"d2": 2.5, "d1": 1.5}, "q2": {"d3": 9.0}}
    path = tmp_path / "results.json"
    write_runs_json(runs, str(path))
    back = read_runs_json(str(path))
    # rank re-derived deterministically (score desc, did asc)
    assert back.sort_values(["qid", "rank"])["did"].tolist() == ["d2", "d1", "d3"]
    # ties broken by ascending did
    tied = nested_to_runs_table({"q": {"b": 1.0, "a": 1.0}})
    assert tied.sort_values("rank")["did"].tolist() == ["a", "b"]
