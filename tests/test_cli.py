"""CLI surface (`python -m webindex <cmd>`): the commands a cluster user
runs via `ray job submit -- python -m webindex build ...`.

Drives webindex.__main__.main() in-process under the session Ray fixture
(the CLI's _init_ray guards on ray.is_initialized, so it adopts the test
session) — covers argparse wiring, the build->search->msearch->eval->merge
lifecycle, and JSON output shapes, without paying per-command Ray startup.
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webindex.docids import url_shard
from webindex.synth import synth_pages_table, synth_queries_table
from webindex.__main__ import main


@pytest.mark.usefixtures("ray_session")
def test_cli_lifecycle(tmp_path, capsys):
    # split one corpus by url-shard parity: merge requires disjoint docID
    # spaces, and doc_id = shard << 40 | rank, so disjoint SHARD sets
    # guarantee it (same construction as tests/test_merge.py)
    tab = synth_pages_table(300, seed=11)
    parity = pa.array(
        [url_shard(u, 64) % 2 == 0 for u in tab.column("url").to_pylist()]
    )
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(tab.filter(parity), pages_path)
    pages_b = str(tmp_path / "pages_b.parquet")
    pq.write_table(
        tab.filter(pa.compute.invert(parity)), pages_b
    )

    # build (twice: two disjoint-shard indexes for the merge step)
    idx_a = str(tmp_path / "idx_a")
    assert main(["build", "--pages", pages_path, "--out", idx_a]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["N"] > 0

    idx_b = str(tmp_path / "idx_b")
    assert main(["build", "--pages", pages_b, "--out", idx_b]) == 0
    stats_b = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # search: rank \t doc_id \t score lines, scores non-increasing
    qtext = synth_queries_table(n=3).column("text").to_pylist()[0]
    assert main(["search", "--index", idx_a, "--query", qtext,
                 "--top-k", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 0 < len(lines) <= 5
    scores = [float(l.split("\t")[2]) for l in lines]
    assert scores == sorted(scores, reverse=True)

    # msearch over a BEIR-style queries.jsonl
    qfile = str(tmp_path / "queries.jsonl")
    with open(qfile, "w") as f:
        for i, t in enumerate(synth_queries_table(n=5).column("text").to_pylist()):
            f.write(json.dumps({"_id": f"q{i}", "text": t}) + "\n")
    runs_out = str(tmp_path / "runs.parquet")
    assert main(["msearch", "--index", idx_a, "--queries", qfile,
                 "--out", runs_out, "--top-k", "10"]) == 0
    msg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert msg["rows"] > 0

    # eval against a qrels naming each query's own top-1 doc relevant
    runs = pq.read_table(runs_out).to_pandas()
    top1 = runs[runs["rank"] == 1]
    qrels = str(tmp_path / "qrels.tsv")
    with open(qrels, "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for r in top1.itertuples(index=False):
            f.write(f"{r.qid}\t{r.doc_id}\t1\n")
    assert main(["eval", "--runs", runs_out, "--qrels", qrels,
                 "--k", "10"]) == 0
    macro = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # top-1 of each run is by construction the one relevant doc
    assert macro["ndcg@10"] == pytest.approx(1.0)

    # merge the two disjoint-corpus indexes
    merged = str(tmp_path / "merged")
    assert main(["merge", "--inputs", idx_a, idx_b, "--out", merged]) == 0
    mstats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert mstats["N"] == stats["N"] + stats_b["N"]


@pytest.mark.usefixtures("ray_session")
def test_cli_query_language(tmp_path, capsys):
    """--positions build + --phrase / --match and / --filter search."""
    tab = synth_pages_table(200, seed=13)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, pages_path)
    idx = str(tmp_path / "idx_pos")
    assert main(["build", "--pages", pages_path, "--out", idx,
                 "--positions", "--no-stemmed"]) == 0
    capsys.readouterr()

    # AND match: every returned doc would also match plain OR
    qtext = synth_queries_table(n=3).column("text").to_pylist()[1]
    assert main(["search", "--index", idx, "--query", qtext,
                 "--match", "and", "--top-k", "5"]) == 0
    and_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]

    # phrase over the positional index: a bigram from a real doc
    from webindex.analyze import Analyzer
    from webindex.config import SQL_SAFE_ANALYZER
    from webindex.extract import extract_text

    toks = Analyzer(SQL_SAFE_ANALYZER).tokens(
        extract_text(tab.column("html")[0].as_py())
    )
    phrase = f"{toks[0]} {toks[1]}"
    assert main(["search", "--index", idx, "--query", phrase,
                 "--phrase", "--top-k", "5"]) == 0
    ph_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(ph_lines) >= 1  # the source doc itself must match

    # filter without a docvalues sidecar fails loudly
    with pytest.raises(FileNotFoundError, match="docvalues"):
        main(["search", "--index", idx, "--query", qtext,
              "--filter", "lang==en"])
    # bad clause is a usage error
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", qtext,
              "--filter", "lang~en"])
    assert and_lines is not None


@pytest.mark.usefixtures("ray_session")
def test_cli_delete_compact(tmp_path, capsys):
    """delete tombstones hide docs at search time; compact removes them."""
    tab = synth_pages_table(200, seed=17)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, pages_path)
    idx = str(tmp_path / "idx")
    assert main(["build", "--pages", pages_path, "--out", idx]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    qtext = synth_queries_table(n=3).column("text").to_pylist()[0]
    assert main(["search", "--index", idx, "--query", qtext,
                 "--top-k", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    victim = lines[0].split("\t")[1]

    assert main(["delete", "--index", idx, "--doc-ids", victim]) == 0
    msg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert msg == {"tombstoned": 1, "total_tombstones": 1}

    assert main(["search", "--index", idx, "--query", qtext,
                 "--top-k", "5"]) == 0
    after = [l.split("\t")[1]
             for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert victim not in after

    compacted = str(tmp_path / "compacted")
    assert main(["compact", "--index", idx, "--out", compacted]) == 0
    cstats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cstats["N"] == stats["N"] - 1
    assert cstats["n_deleted"] == 1
    assert main(["search", "--index", compacted, "--query", qtext,
                 "--top-k", "5"]) == 0
    clines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert victim not in [l.split("\t")[1] for l in clines]


@pytest.mark.usefixtures("ray_session")
def test_cli_refresh(tmp_path, capsys):
    """build --urlmap + refresh: new pages merge in, ids stay live."""
    from webindex.synth import synth_pages_slice

    v1 = str(tmp_path / "v1.parquet")
    pq.write_table(synth_pages_table(150, seed=11), v1)
    delta = str(tmp_path / "delta.parquet")
    # 50 overlapping rows (same ts -> ignored) + 50 genuinely new pages
    pq.write_table(synth_pages_slice(100, 200, seed=11), delta)

    idx = str(tmp_path / "idx")
    assert main(["build", "--pages", v1, "--out", idx, "--urlmap"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = str(tmp_path / "refreshed")
    assert main(["refresh", "--index", idx, "--pages", delta,
                 "--out", out]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_updated"] == 0 and s["n_new"] > 0
    assert s["stats"]["N"] > stats["N"]

    qtext = synth_queries_table(n=3).column("text").to_pylist()[0]
    assert main(["search", "--index", out, "--query", qtext,
                 "--top-k", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) > 0


@pytest.mark.usefixtures("ray_session")
def test_cli_suggest_and_mlt(tmp_path, capsys):
    tab = synth_pages_table(120, seed=13)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, pages_path)
    idx = str(tmp_path / "idx")
    assert main(["build", "--pages", pages_path, "--out", idx,
                 "--no-stemmed"]) == 0
    capsys.readouterr()

    # suggest: prefix \t rank \t term \t df, df non-increasing per prefix
    assert main(["suggest", "--index", idx, "--prefix", "s",
                 "--top-k", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 0 < len(lines) <= 5
    dfs = [int(l.split("\t")[3]) for l in lines]
    assert dfs == sorted(dfs, reverse=True)
    assert all(l.split("\t")[2].startswith("s") for l in lines)

    # mlt: seed excluded from its own neighbors
    import pyarrow.dataset as pads

    # seed text: extract from one page's html (same path the build used)
    from webindex.extract import extract_text

    text0 = extract_text(tab.column("html")[0].as_py())
    dl = pads.dataset(f"{idx}/postings_raw").to_table(
        columns=["doc_id", "kind"]
    )
    some_doc = int(dl.column("doc_id")[0].as_py())
    assert main(["mlt", "--index", idx, "--doc-id", str(some_doc),
                 "--text", text0, "--top-k", "5"]) == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 0 < len(out) <= 5
    assert all(int(l.split("\t")[1]) != some_doc for l in out)


def test_cli_dym_and_keywords(tmp_path, capsys):
    tab = synth_pages_table(120, seed=13)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, pages_path)
    idx = str(tmp_path / "idx")
    assert main(["build", "--pages", pages_path, "--out", idx,
                 "--no-stemmed"]) == 0
    capsys.readouterr()

    # dym: in-dictionary words pass through; output is one line
    assert main(["dym", "--index", idx, "--query", "mergge the stream"]) == 0
    line = capsys.readouterr().out.strip()
    suggestion, corrected = line.split("\t")
    assert len(suggestion.split()) == 3
    assert corrected.endswith("corrected")

    # keywords: top-k TextRank terms over pasted text
    assert main(["keywords", "--text",
                 "graph rank graph node edge rank graph walk node graph",
                 "--top-k", "3"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 3
    assert lines[0].split("\t")[1] == "graph"


def test_cli_intervals(tmp_path, capsys):
    tab = synth_pages_table(120, seed=13)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, pages_path)
    idx = str(tmp_path / "idx")
    assert main(["build", "--pages", pages_path, "--out", idx,
                 "--no-stemmed", "--positions"]) == 0
    capsys.readouterr()
    assert main([
        "intervals", "--index", idx, "--spec",
        '{"match": {"query": "the and", "ordered": true, "max_gaps": 5}}',
        "--top-k", "3",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 0 < len(lines) <= 3
    assert lines[0].split("\t")[0] == "1"
