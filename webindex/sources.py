"""BEIR-format sources and sinks (SURVEY.md §2.1 S1/S5/S6).

The reference's data interchange is the BEIR layout: ``corpus.jsonl``
(``{"_id", "title", "text"}``), ``queries.jsonl`` (``{"_id", "text"}``),
``qrels/{split}.tsv`` (``query-id \t corpus-id \t score``), and run files as
nested JSON ``{qid: {did: score}}`` (written
/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 11,
re-read /root/reference/crossencoder/beir/sgptce.py:358-359).

Here each becomes a Ray Data Dataset with an explicit Arrow schema; the
nested run dict becomes the flat runs table ``(qid, did, score, rank)`` used
across the engine, converted back to the reference's nested shape only at
the (small) serialization boundary.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa

CORPUS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("title", pa.string()), ("text", pa.string())]
)
QUERIES_SCHEMA = pa.schema([("qid", pa.string()), ("text", pa.string())])
QRELS_SCHEMA = pa.schema(
    [("qid", pa.string()), ("did", pa.string()), ("rel", pa.int32())]
)


def read_beir_corpus(path: str):
    """``corpus.jsonl`` -> Dataset(doc_id, title, text).

    ``title`` may be absent or null in the files (robust04); normalized to
    ``""`` here — the reference's ``clean_titles``
    (/root/reference/biencoder/beir/beir_dense_retriever.py:500-504).
    """
    import ray.data as rd

    def project(batch: pa.Table) -> pa.Table:
        names = batch.column_names
        n = batch.num_rows
        title = (
            batch.column("title")
            if "title" in names
            else pa.nulls(n, pa.string())
        )
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pa.array(
                    [str(x) for x in batch.column("_id").to_pylist()]
                ),
                "title": pc.fill_null(pa.array(
                    [None if t is None else str(t) for t in title.to_pylist()],
                    pa.string(),
                ), ""),
                "text": pa.array(
                    [str(x or "") for x in batch.column("text").to_pylist()]
                ),
            }
        )

    return rd.read_json(path).map_batches(project, batch_format="pyarrow")


def read_beir_queries(path: str):
    """``queries.jsonl`` -> Dataset(qid, text)."""
    import ray.data as rd

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": pa.array([str(x) for x in batch.column("_id").to_pylist()]),
                "text": pa.array(
                    [str(x or "") for x in batch.column("text").to_pylist()]
                ),
            }
        )

    return rd.read_json(path).map_batches(project, batch_format="pyarrow")


def read_qrels_tsv(path: str):
    """``qrels/{split}.tsv`` (header ``query-id\tcorpus-id\tscore``) ->
    Dataset(qid, did, rel)."""
    import pyarrow.csv as pacsv
    import ray.data as rd

    parse = pacsv.ParseOptions(delimiter="\t")
    convert = pacsv.ConvertOptions(
        column_types={"query-id": pa.string(), "corpus-id": pa.string(),
                      "score": pa.int32()}
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": batch.column("query-id"),
                "did": batch.column("corpus-id"),
                "rel": batch.column("score"),
            }
        )

    return rd.read_csv(
        path, parse_options=parse, convert_options=convert
    ).map_batches(project, batch_format="pyarrow")


def write_beir_corpus(ds, path: str) -> None:
    """Dataset(doc_id, title?, text) -> ``corpus.jsonl`` (S5 sink)."""
    with open(path, "w", encoding="utf-8") as f:
        for batch in ds.iter_batches(batch_format="pandas"):
            for row in batch.itertuples(index=False):
                rec = {"_id": str(row.doc_id), "text": row.text}
                if hasattr(row, "title"):
                    rec["title"] = row.title
                f.write(json.dumps(rec) + "\n")


def extract_json_fields(line: str, markers: dict[str, tuple[str, str]]) -> dict:
    """Marker-based field extraction from one giant-JSON line (S3 analog:
    the reference streams a 19 GB JSON line-by-line and pulls
    ``abstractText``/``pmid``/``title`` with ``str.find`` on literal
    markers instead of parsing,
    /root/reference/crossencoder/beir/crossencoder_bioasq_bm25.ipynb
    cell 4). ``markers`` maps field -> (start_literal, end_literal)."""
    out = {}
    for field, (start, end) in markers.items():
        i = line.find(start)
        if i < 0:
            out[field] = None
            continue
        i += len(start)
        j = line.find(end, i)
        out[field] = line[i:j] if j >= 0 else None
    return out


def read_giant_json(path: str, markers: dict[str, tuple[str, str]]):
    """Streaming scan of a one-record-per-line JSON-ish file -> Dataset of
    extracted fields. ``read_text`` streams blocks of lines; extraction is
    a pure per-line function — the Ray shape of the reference's
    explicitly-avoids-loading-into-memory loop."""
    import pyarrow as _pa
    import ray.data as rd

    def extract(batch: pa.Table) -> pa.Table:
        fields: dict[str, list] = {f: [] for f in markers}
        for line in batch.column("text").to_pylist():
            rec = extract_json_fields(line, markers)
            for f in markers:
                fields[f].append(rec[f])
        return _pa.table({f: _pa.array(v, _pa.string())
                          for f, v in fields.items()})

    return rd.read_text(path).map_batches(extract, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# run files: nested {qid: {did: score}} <-> flat (qid, did, score, rank)
# ---------------------------------------------------------------------------


def runs_table_to_nested(runs_df: pd.DataFrame) -> dict[str, dict[str, float]]:
    out: dict[str, dict[str, float]] = {}
    for qid, did, score in zip(
        runs_df["qid"], runs_df["did"], runs_df["score"]
    ):
        out.setdefault(str(qid), {})[str(did)] = float(score)
    return out


def nested_to_runs_table(results: dict[str, dict[str, float]]) -> pd.DataFrame:
    """Nested run dict -> flat table with the engine's deterministic rank
    order (score desc, did asc — SURVEY.md §2.9 ordering contract)."""
    rows = []
    for qid, dids in results.items():
        ranked = sorted(dids.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (did, score) in enumerate(ranked, 1):
            rows.append((str(qid), str(did), float(score), rank))
    return pd.DataFrame(rows, columns=["qid", "did", "score", "rank"])


def write_runs_json(runs_df: pd.DataFrame, path: str,
                    all_qids: list[str] | None = None) -> None:
    """Flat runs table -> reference-shape results JSON (S6 sink;
    "format of results is identical to qrels"). ``all_qids`` pre-seeds
    empty entries for zero-hit queries — the reference's ``results`` dict
    always contains every qid (beir ``BM25Search.search`` initializes
    ``{qid: {} ...}``)."""
    nested = runs_table_to_nested(runs_df)
    if all_qids:
        nested = {str(q): nested.get(str(q), {}) for q in all_qids} | nested
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(nested, f)
    os.replace(tmp, path)


def read_runs_json(path: str) -> pd.DataFrame:
    with open(path, encoding="utf-8") as f:
        return nested_to_runs_table(json.load(f))
