"""Parallel-apply error-channel semantics (§2.10 parallelizer analog) and
the S3 giant-JSON extractor."""

import json

import pytest

from webindex.parallel import parallel_apply
from webindex.sources import extract_json_fields, read_giant_json


@pytest.mark.usefixtures("ray_session")
def test_parallel_apply_log_semantics():
    import ray.data as rd

    ds = rd.from_items([{"x": i} for i in range(10)])

    def fn(row):
        if row["x"] % 4 == 3:
            raise ValueError(f"bad {row['x']}")
        return {"y": row["x"] * 2}

    out = parallel_apply(ds, fn, error_handling="log").to_pandas()
    out = out.sort_values("x").reset_index(drop=True)
    ok = out[out["response_error_message"].isna()]
    bad = out[out["response_error_message"].notna()]
    assert len(bad) == 2 and sorted(bad["x"]) == [3, 7]
    assert (ok["response_y"] == ok["x"] * 2).all()
    assert bad["response_y"].isna().all()
    assert set(bad["response_error_type"]) == {"ValueError"}
    # input columns survive on failed rows
    assert bad["x"].tolist() == sorted(bad["x"].tolist())


@pytest.mark.usefixtures("ray_session")
def test_parallel_apply_fail_and_retry():
    import ray.data as rd

    ds = rd.from_items([{"x": 1}])

    def always_bad(row):
        raise RuntimeError("boom")

    with pytest.raises(Exception):
        parallel_apply(ds, always_bad, error_handling="fail").to_pandas()

    # retry: flaky fn succeeds on 2nd attempt within the same row
    calls = {"n": 0}

    def flaky(row):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return {"ok": True}

    out = parallel_apply(
        rd.from_items([{"x": 1}]), flaky, max_attempts=3
    ).to_pandas()
    assert out["response_error_message"].isna().all()


def test_extract_json_fields():
    line = json.dumps({"pmid": "123", "title": "T", "abstractText": "A b c."})
    rec = extract_json_fields(
        line,
        {
            "pmid": ('"pmid": "', '"'),
            "abstract": ('"abstractText": "', '"'),
        },
    )
    assert rec == {"pmid": "123", "abstract": "A b c."}
    assert extract_json_fields("no markers", {"x": ("<a>", "</a>")}) == {"x": None}


@pytest.mark.usefixtures("ray_session")
def test_read_giant_json(tmp_path):
    path = tmp_path / "giant.json"
    with open(path, "w") as f:
        for i in range(50):
            f.write(
                json.dumps({"pmid": str(i), "abstractText": f"abstract {i}"})
                + "\n"
            )
    ds = read_giant_json(
        str(path),
        {"pmid": ('"pmid": "', '"'), "ab": ('"abstractText": "', '"')},
    )
    df = ds.to_pandas()
    assert len(df) == 50
    assert set(df.columns) == {"pmid", "ab"}
    assert df.sort_values("pmid", key=lambda s: s.astype(int))["ab"].iloc[49] == "abstract 49"
