"""MinHash-LSH dedup at bench-corpus scale (default: the cached 3.2M-page
synth corpus) — evidence that the Dataset-native label surface and the
distributed connected-components path hold up at ~1000x contract scale.

Usage: python tools/bench_dedup_scale.py [PAGES_DIR] [--cpus N]
Prints one JSON line: wall times per stage, candidate-pair count, label
count, and which CC path engaged (pairs > driver_threshold => the
hash-to-min distributed rounds).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    pages = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "/tmp/webindex-synth/n3200000-s42-v2/pages.parquet"
    cpus = int(sys.argv[sys.argv.index("--cpus") + 1]) if "--cpus" in sys.argv \
        else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")

    from webindex.dedup import (cluster_pairs, minhash_bands,
                                pairs_from_buckets, _STAGE_CACHE,
                                MinHashStage)
    from webindex.util import stable_hash64

    t_all = time.time()
    ds = rd.read_parquet(pages, columns=["url", "text"])

    def add_ids(batch: pa.Table) -> pa.Table:
        ids = np.fromiter(
            (stable_hash64(u) >> 1 for u in batch.column("url").to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return pa.table({"doc_id": pa.array(ids), "text": batch.column("text")})

    # materialize: the (doc_id, text) table feeds the sig stage, the
    # store build, the incremental sig AND the verify payload join —
    # without this the read + per-url hash lineage re-executes per
    # consumer (measured ~2 extra full passes in the incremental phase)
    docs = ds.map_batches(add_ids, batch_format="pyarrow").materialize()
    n_docs = docs.count()

    # signature + banding + candidate pairs (the minhash_dedup internals,
    # instrumented per stage)
    def sig_batch(batch: pa.Table) -> pa.Table:
        key = ("minhash", 128, 3, "blake2b")
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE[key] = MinHashStage(num_perm=128, shingle_k=3)
        return st(batch)

    t0 = time.time()
    sig = docs.map_batches(sig_batch, batch_format="pyarrow").materialize()
    t_sig = time.time() - t0

    t0 = time.time()
    pairs = pairs_from_buckets(
        minhash_bands(sig, num_perm=128, bands=16), ["band_id", "band_hash"]
    ).materialize()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    # skip the exact-verify join here (pair-verified timings are already
    # benched at sf scale; this run measures the LABELING path at scale) —
    # cluster the raw candidates so the distributed CC path engages
    t0 = time.time()
    labels = cluster_pairs(pairs.select_columns(["a", "b"]),
                           driver_threshold=100_000)
    n_labels = labels.count()
    t_cc = time.time() - t0

    out = {
        "metric": "dedup_scale",
        "n_docs": n_docs,
        "sig_sec": round(t_sig, 1),
        "pairs_sec": round(t_pairs, 1),
        "n_candidate_pairs": n_pairs,
        "cc_sec": round(t_cc, 1),
        "n_labeled_docs": n_labels,
        "cc_path": "distributed" if n_pairs > 100_000 else "driver",
        "total_sec": round(time.time() - t_all, 1),
        "num_cpus": cpus,
    }

    if "--incremental" in sys.argv:
        # incremental (new-vs-store) dedup at the same corpus scale:
        # even docIDs play the persisted store, odd the incoming batch
        import shutil

        from webindex.dedup import (build_minhash_store,
                                    minhash_dedup_incremental)

        def even(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy()
            return batch.filter(pa.array(ids % 2 == 0))

        def odd(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy()
            return batch.filter(pa.array(ids % 2 == 1))

        store_dir = "/tmp/webindex-bench/mhstore-inc"
        shutil.rmtree(store_dir, ignore_errors=True)
        t0 = time.time()
        build_minhash_store(
            docs.map_batches(even, batch_format="pyarrow"), store_dir,
            num_perm=128, shingle_k=3,
        )
        t_store = time.time() - t0
        t0 = time.time()
        labels = minhash_dedup_incremental(
            docs.map_batches(odd, batch_format="pyarrow"), store_dir,
        )
        n_inc = labels.count()
        t_inc = time.time() - t0
        out.update(
            store_build_sec=round(t_store, 1),
            incremental_sec=round(t_inc, 1),
            incremental_dups=n_inc,
            total_sec=round(time.time() - t_all, 1),
        )

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
