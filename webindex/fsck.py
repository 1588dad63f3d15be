"""Index integrity checker (``webindex check``) — fsck for index artifacts.

At 10^12-document scale an index is petabytes of immutable artifacts that
live through merges, compactions, refreshes, and storage migrations; silent
corruption (a truncated parquet, a stale stage dir, bit rot) must be
detectable WITHOUT a query workload noticing wrong results first. This
re-derives every invariant the artifacts are supposed to satisfy:

- manifest: every build stage recorded complete;
- stats.json == aggregates recomputed from the doclen marker rows;
- dictionary df/cf == per-term counts re-decoded from the SEGMENTS
  (end-to-end through the varbyte codec, not the relay);
- per (term, salt) run: block_ids contiguous, docIDs strictly ascending
  across the whole run, every docID's salt matches the row's salt, every
  docID resolvable in the doclen table;
- per block: posting count == n, last decoded docID == last_doc_id,
  max_tf_norm == recomputed idf-free bound from tfs/doclens/avgdl
  (bit-exact — same float64 kernel as the build);
- sidecars: docvalues/urlmap/tombstone doc_ids ⊆ the corpus (tombstones
  of unknown docs are a warning, not an error — deletes of never-indexed
  pages are legal no-ops).

Scale shape: one Ray task per term-hash bucket (the index's own pinned
partitioning — segments and dictionary are both bucket-partitioned, so a
task reads exactly its slice); the doclen table broadcasts once via
``ray.put`` (zero-copy numpy per task). Cost ~ one full segment decode,
embarrassingly parallel.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from webindex.compress import varbyte_decode
from webindex.config import IndexConfig
from webindex.util import read_json


def _check_bucket(batch: pa.Table, index_dir: str, cfg_dict: dict,
                  avgdl: float, dl_ref) -> pa.Table:
    """Task body: re-derive every invariant of one bucket's segments +
    dictionary slice. Returns (errors:list, n_terms, n_postings) rows."""
    import pyarrow.dataset as pads
    import ray

    cfg = IndexConfig.from_dict(cfg_dict)
    dl_ids, dls = ray.get(dl_ref)  # sorted numpy arrays, zero-copy
    errors: list[str] = []
    n_terms = n_postings = 0

    for b in batch.column("bucket").to_pylist():
        seg = pads.dataset(os.path.join(index_dir, "segments")).to_table(
            filter=pads.field("bucket") == b, use_threads=False
        )
        dic = pads.dataset(os.path.join(index_dir, "dict")).to_table(
            columns=["term", "df", "cf", "bucket"],
            filter=pads.field("bucket") == b, use_threads=False,
        )
        dict_df = dict(
            zip(dic.column("term").to_pylist(),
                zip(dic.column("df").to_pylist(),
                    dic.column("cf").to_pylist()))
        )
        # group rows by (term, salt) in stored order
        import pyarrow.compute as pc

        if seg.num_rows:
            order = pc.sort_indices(
                seg, sort_keys=[("term", "ascending"), ("salt", "ascending"),
                                ("block_id", "ascending")],
            )
            seg = seg.take(order)
        terms = seg.column("term").to_pylist()
        salts = seg.column("salt").to_numpy()
        bids = seg.column("block_id").to_numpy()
        ns = seg.column("n").to_numpy()
        lasts = seg.column("last_doc_id").to_numpy()
        maxes = seg.column("max_tf_norm").to_numpy()
        idbufs = seg.column("doc_ids").to_pylist()
        tfbufs = seg.column("tfs").to_pylist()
        posbufs = (
            seg.column("positions").to_pylist()
            if "positions" in seg.column_names
            else None
        )

        got: dict[str, tuple[int, int]] = {}
        i = 0
        nrows = len(terms)
        while i < nrows:
            t = terms[i]
            j = i
            prev_id = -1
            t_df = t_cf = 0
            while j < nrows and terms[j] == t:
                # one (term, salt) run = contiguous block_ids from 0
                s = j
                salt = salts[j]
                while j < nrows and terms[j] == t and salts[j] == salt:
                    j += 1
                run_bids = bids[s:j]
                if not np.array_equal(
                    run_bids, np.arange(j - s, dtype=run_bids.dtype)
                ):
                    errors.append(
                        f"term {t!r} salt {salt}: block_ids not "
                        f"contiguous-from-0: {run_bids.tolist()[:8]}"
                    )
                run_ns = ns[s:j].astype(np.int64)
                starts = np.concatenate(([0], np.cumsum(run_ns)[:-1]))
                if getattr(cfg, "codec", "varbyte") == "ef":
                    from webindex.compress import ef_decode_concat

                    try:
                        ids = ef_decode_concat(idbufs[s:j], run_ns)
                    except ValueError as e:
                        errors.append(f"term {t!r} salt {salt}: {e}")
                        break
                else:
                    gaps = varbyte_decode(b"".join(idbufs[s:j]))
                    if gaps.size != int(run_ns.sum()):
                        errors.append(
                            f"term {t!r} salt {salt}: decoded "
                            f"{gaps.size} ids, metadata says {run_ns.sum()}"
                        )
                        break
                    csum = np.cumsum(gaps)
                    shift = np.zeros(run_ns.size, dtype=np.int64)
                    shift[1:] = csum[starts[1:] - 1]
                    ids = csum - np.repeat(shift, run_ns)
                tfs = varbyte_decode(b"".join(tfbufs[s:j]))
                if tfs.size != ids.size:
                    errors.append(
                        f"term {t!r} salt {salt}: {tfs.size} tfs for "
                        f"{ids.size} ids"
                    )
                    break
                if posbufs is not None:
                    # positional runs: tf varbyte values per posting, all
                    # positions in [0, dl) and strictly ascending per doc
                    pgaps = varbyte_decode(b"".join(posbufs[s:j]))
                    if pgaps.size != int(tfs.sum()):
                        errors.append(
                            f"term {t!r} salt {salt}: {pgaps.size} "
                            f"position deltas, tfs sum to {int(tfs.sum())}"
                        )
                    else:
                        tf64 = tfs.astype(np.int64)
                        pends = np.cumsum(tf64)
                        pstarts = pends - tf64
                        pcsum = np.cumsum(pgaps)
                        pshift = np.zeros(tf64.size, dtype=np.int64)
                        pshift[1:] = pcsum[pstarts[1:] - 1]
                        pvals = pcsum - np.repeat(pshift, tf64)
                        # gaps > 0 except each posting's (absolute) first
                        # value, which only needs to be >= 0
                        nonfirst = np.ones(pgaps.size, dtype=bool)
                        nonfirst[pstarts] = False
                        if np.any(pgaps[nonfirst] <= 0) or np.any(pvals < 0):
                            errors.append(
                                f"term {t!r} salt {salt}: positions not "
                                "strictly ascending per posting"
                            )
                if ids.size:
                    if ids[0] <= prev_id or np.any(np.diff(ids) <= 0):
                        errors.append(
                            f"term {t!r} salt {salt}: docIDs not strictly "
                            "ascending across the run"
                        )
                    prev_id = int(ids[-1])
                    id_salt = (
                        (ids >> np.int64(cfg.salt_doc_shift))
                        // np.int64(cfg.shards_per_salt)
                    )
                    if np.any(id_salt != salt):
                        errors.append(
                            f"term {t!r} salt {salt}: "
                            f"{int((id_salt != salt).sum())} postings "
                            "outside their salt's docID range"
                        )
                    pos = np.searchsorted(dl_ids, ids)
                    pos_c = np.minimum(pos, max(dl_ids.size - 1, 0))
                    miss = (
                        dl_ids[pos_c] != ids
                        if dl_ids.size
                        else np.ones(ids.size, bool)
                    )
                    if miss.any():
                        errors.append(
                            f"term {t!r} salt {salt}: "
                            f"{int(miss.sum())} docIDs missing from the "
                            "doclen table"
                        )
                    else:
                        # block metadata (exact float64 re-derivation)
                        dl_run = dls[pos_c].astype(np.float64)
                        tf_norm = tfs.astype(np.float64) / (
                            tfs.astype(np.float64)
                            + cfg.k1 * (1.0 - cfg.b + cfg.b * (dl_run / avgdl))
                        )
                        ends = np.cumsum(run_ns)
                        blast = ids[ends - 1]
                        if not np.array_equal(blast, lasts[s:j]):
                            errors.append(
                                f"term {t!r} salt {salt}: last_doc_id "
                                "metadata != decoded block ends"
                            )
                        bmax = np.maximum.reduceat(tf_norm, starts)
                        if not np.array_equal(bmax, maxes[s:j]):
                            errors.append(
                                f"term {t!r} salt {salt}: max_tf_norm "
                                "metadata != recomputed block bounds"
                            )
                t_df += ids.size
                t_cf += int(tfs.sum()) if tfs.size else 0
            got[t] = (t_df, t_cf)
            n_terms += 1
            n_postings += t_df
            i = j

        for t, (df_c, cf_c) in got.items():
            want = dict_df.pop(t, None)
            if want is None:
                errors.append(f"term {t!r}: in segments but not dictionary")
            elif (df_c, cf_c) != want:
                errors.append(
                    f"term {t!r}: segments df/cf {(df_c, cf_c)} != "
                    f"dictionary {want}"
                )
        for t, want in dict_df.items():
            if want[0] > 0:
                errors.append(
                    f"term {t!r}: dictionary df {want[0]} but no segments"
                )

    return pa.table(
        {
            "errors": pa.array([errors], pa.list_(pa.string())),
            "n_terms": pa.array([n_terms], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
        }
    )


def check_index(index_dir: str) -> dict:
    """Full integrity check; returns
    ``{ok, errors, warnings, n_terms, n_postings, n_docs}``."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    errors: list[str] = []
    warnings_: list[str] = []
    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    stats = read_json(os.path.join(index_dir, "stats.json"))

    # manifest completeness
    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    stages = manifest.get("stages", manifest)
    for required in ("postings_raw", "stats", "dict", "segments"):
        if required not in stages:
            errors.append(f"manifest: stage {required!r} not recorded")

    # doclens (kind=1 marker rows) vs stats.json
    dl_tab = pads.dataset(os.path.join(index_dir, "postings_raw")).to_table(
        columns=["doc_id", "dl"], filter=pads.field("kind") == 1
    )
    dl_ids = dl_tab.column("doc_id").to_numpy()
    dls = dl_tab.column("dl").to_numpy().astype(np.int64)
    order = np.argsort(dl_ids, kind="stable")
    dl_ids, dls = dl_ids[order], dls[order]
    if np.any(np.diff(dl_ids) == 0):
        errors.append("doclens: duplicate doc_id marker rows")
    n, tot = int(dl_ids.size), int(dls.sum())
    if stats["N"] != n:
        errors.append(f"stats.N {stats['N']} != {n} doclen rows")
    if stats["total_tokens"] != tot:
        errors.append(
            f"stats.total_tokens {stats['total_tokens']} != {tot}"
        )
    if n and stats["max_doc_id"] != int(dl_ids[-1]):
        errors.append(
            f"stats.max_doc_id {stats['max_doc_id']} != {int(dl_ids[-1])}"
        )
    if abs(stats["avgdl"] - tot / max(1, n)) > 1e-12:
        errors.append("stats.avgdl != total_tokens / N")

    # sidecars reference real docs
    for sidecar, fatal in (("docvalues", True), ("urlmap", True),
                           ("deletes", False)):
        root = os.path.join(index_dir, sidecar)
        if not os.path.isdir(root):
            continue
        ids = pads.dataset(root).to_table(
            columns=["doc_id"]
        ).column("doc_id").to_numpy()
        pos = np.searchsorted(dl_ids, ids)
        pos_c = np.minimum(pos, max(dl_ids.size - 1, 0))
        miss = dl_ids[pos_c] != ids if dl_ids.size else np.ones(ids.size, bool)
        n_miss = int(miss.sum())
        if n_miss and sidecar == "urlmap":
            # urlmap legitimately includes deduped pages whose extraction
            # was empty (never indexed) — informational only
            continue
        if n_miss:
            msg = f"{sidecar}: {n_miss} doc_ids not in the corpus"
            (errors if fatal else warnings_).append(msg)

    # segment + dictionary deep check, one task per bucket
    dl_ref = ray.put((dl_ids, dls))
    buckets = rd.from_items(
        [{"bucket": b} for b in range(cfg.num_buckets)],
        override_num_blocks=cfg.num_buckets,
    )
    rep = buckets.map_batches(
        _check_bucket,
        fn_kwargs=dict(index_dir=index_dir, cfg_dict=cfg.to_dict(),
                       avgdl=stats["avgdl"], dl_ref=dl_ref),
        batch_format="pyarrow",
        batch_size=1,
    ).to_pandas()
    for errs in rep["errors"]:
        errors.extend(errs)
    n_terms = int(rep["n_terms"].sum())
    n_postings = int(rep["n_postings"].sum())
    if stats.get("n_terms") is not None and stats["n_terms"] != n_terms:
        errors.append(
            f"stats.n_terms {stats['n_terms']} != {n_terms} decoded terms"
        )

    return {
        "ok": not errors,
        "errors": errors[:200],
        "warnings": warnings_[:200],
        "n_docs": n,
        "n_terms": n_terms,
        "n_postings": n_postings,
    }
