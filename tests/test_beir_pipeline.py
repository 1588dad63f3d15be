"""End-to-end BEIR quality-repro harness (webindex/pipelines/beir.py +
tools/run_beir.py) on a synthetic BEIR-format dataset: string ids round
trip through the int64 docID rule, title+text concat feeds the index,
judged-only queries evaluate, and the computed NDCG@10 matches a hand
oracle."""

import json
import os
import zipfile

import numpy as np
import pytest

from webindex.oracle import OracleBM25


def _write_beir_dir(root):
    os.makedirs(os.path.join(root, "qrels"), exist_ok=True)
    corpus = [
        {"_id": "MED-10", "title": "alpha beta", "text": "gamma delta"},
        {"_id": "MED-14", "title": "", "text": "alpha alpha beta"},
        {"_id": "MED-2427", "text": "delta epsilon zeta"},  # no title
        {"_id": "doc-x", "title": "unrelated", "text": "eta theta"},
    ]
    with open(os.path.join(root, "corpus.jsonl"), "w") as f:
        for row in corpus:
            f.write(json.dumps(row) + "\n")
    queries = [
        {"_id": "q1", "text": "alpha beta"},
        {"_id": "q2", "text": "delta"},
        {"_id": "q-unjudged", "text": "eta"},
    ]
    with open(os.path.join(root, "queries.jsonl"), "w") as f:
        for row in queries:
            f.write(json.dumps(row) + "\n")
    with open(os.path.join(root, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\tMED-10\t1\nq1\tMED-14\t2\nq2\tMED-2427\t1\n")
    return corpus, queries


def test_run_beir_bm25_end_to_end(tmp_path, ray_session):
    from webindex.config import IndexConfig
    from webindex.pipelines.beir import run_beir_bm25

    ds_dir = str(tmp_path / "nfcorpus")
    corpus, _queries = _write_beir_dir(ds_dir)
    out = str(tmp_path / "out")
    cfg = IndexConfig(num_buckets=4, n_parts=4)
    m = run_beir_bm25(ds_dir, out, split="test", top_k=10, cfg=cfg,
                      num_shards=4)
    # unjudged query skipped
    assert m["n_queries"] == 2
    assert m["dataset"] == "nfcorpus"
    assert os.path.isfile(os.path.join(out, "metrics.json"))

    # hand oracle: full-english BM25 over title+" "+text, docs ranked,
    # per-query NDCG@10 against the qrels
    docs = [
        (i, ((row.get("title") or "") + " " + row["text"]).strip())
        for i, row in enumerate(corpus)
    ]
    did_of = {i: row["_id"] for i, row in enumerate(corpus)}
    oracle = OracleBM25(docs, cfg)
    qrels = {"q1": {"MED-10": 1, "MED-14": 2}, "q2": {"MED-2427": 1}}
    import math

    ndcgs = []
    for qid, qtext in [("q1", "alpha beta"), ("q2", "delta")]:
        ranked = [did_of[d] for d, _ in oracle.topk(qtext, 10)]
        gains = [qrels[qid].get(d, 0) for d in ranked]
        ideal = sorted(qrels[qid].values(), reverse=True)
        dcg = sum(g / math.log2(i + 2) for i, g in enumerate(gains[:10]))
        idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal[:10]))
        ndcgs.append(dcg / idcg if idcg else 0.0)
    assert np.isclose(m["ndcg@10"], float(np.mean(ndcgs)), atol=1e-12)


def test_run_beir_bm25_large_idmap_distributed_join(tmp_path, ray_session):
    """The docID->string-did reattach must survive a corpus-sized idmap:
    3000 docs (idmap >> |queries| x k) with unique marker tokens; each
    judged query hits exactly its marker doc, so ndcg@10 == 1.0 IFF the
    distributed hash join re-attached the right string dids (qrels key
    on the string id — a wrong/missing did scores 0). Regression for
    the round-4 perf_weak: beir.py used to pull the whole idmap into a
    driver pandas frame."""
    import json
    import os

    from webindex.config import IndexConfig
    from webindex.pipelines.beir import run_beir_bm25

    ds_dir = str(tmp_path / "synth")
    os.makedirs(os.path.join(ds_dir, "qrels"), exist_ok=True)
    n = 3000
    with open(os.path.join(ds_dir, "corpus.jsonl"), "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "_id": f"D{i:04d}", "title": "",
                "text": f"marker{i:04d} common filler words",
            }) + "\n")
    targets = [7, 123, 1998, 2999]
    with open(os.path.join(ds_dir, "queries.jsonl"), "w") as f:
        for i in targets:
            f.write(json.dumps({"_id": f"q{i}",
                                "text": f"marker{i:04d}"}) + "\n")
    with open(os.path.join(ds_dir, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in targets:
            f.write(f"q{i}\tD{i:04d}\t1\n")

    out = str(tmp_path / "out")
    m = run_beir_bm25(ds_dir, out, split="test", top_k=10,
                      cfg=IndexConfig(num_buckets=4, n_parts=4),
                      num_shards=4)
    assert m["n_queries"] == len(targets)
    assert m["ndcg@10"] == 1.0


def test_run_beir_cli_from_zip(tmp_path, ray_session):
    """tools/run_beir.py path resolution: zip -> nested dataset dir."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import run_beir as cli

    src = tmp_path / "src" / "scifact"
    _write_beir_dir(str(src))
    zip_path = tmp_path / "scifact.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _d, files in os.walk(src):
            for f in sorted(files):
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, src.parent))
    work = str(tmp_path / "work")
    ds_dir = cli._resolve_dataset(str(zip_path), work)
    assert os.path.isfile(os.path.join(ds_dir, "corpus.jsonl"))
    # a plain dir resolves to itself
    assert cli._resolve_dataset(str(src), work) == str(src)
