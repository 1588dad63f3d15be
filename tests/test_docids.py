"""Deterministic docID assignment: Ray pipeline == single-threaded spec,
independent of partitioning (SURVEY.md §7.3 "Determinism under parallelism").
"""

import pyarrow as pa
import pytest

from webindex.docids import assign_doc_ids, assign_doc_ids_py
from webindex.synth import synth_pages_table


@pytest.mark.usefixtures("ray_session")
def test_assign_matches_spec_and_partitioning():
    import ray.data as rd

    tab = synth_pages_table(300, seed=1)
    expected = assign_doc_ids_py(
        list(
            zip(
                tab.column("url").to_pylist(),
                [t.value for t in tab.column("warc_ts")],
            )
        ),
        num_shards=8,
    )

    for nparts in (1, 7):
        ds = rd.from_arrow(tab).repartition(nparts)
        out = assign_doc_ids(ds, num_shards=8).to_pandas()
        got = dict(zip(out["url"], out["doc_id"]))
        assert got == expected
        # latest-wins dedup: unique urls only
        assert out["url"].is_unique


def test_spec_latest_wins():
    rows = [("u/a", 5), ("u/a", 9), ("u/b", 1)]
    ids = assign_doc_ids_py(rows, num_shards=4)
    assert set(ids) == {"u/a", "u/b"}


def test_doc_ids_sorted_within_shard():
    tab = synth_pages_table(100, seed=2)
    ids = assign_doc_ids_py(
        list(
            zip(
                tab.column("url").to_pylist(),
                [t.value for t in tab.column("warc_ts")],
            )
        ),
        num_shards=4,
    )
    by_shard: dict[int, list[tuple[str, int]]] = {}
    for url, did in ids.items():
        by_shard.setdefault(did >> 40, []).append((url, did))
    for shard, entries in by_shard.items():
        entries.sort()
        ranks = [d & ((1 << 40) - 1) for _, d in entries]
        assert ranks == list(range(len(entries)))
