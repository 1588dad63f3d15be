"""One-command BEIR BM25 quality reproduction.

Usage:
    python tools/run_beir.py <dataset.zip | dataset_dir | URL> \
        [--split test] [--top-k 1000] [--out /tmp/webindex-beir/<name>]

Accepts a BEIR zip path, an unzipped dataset directory, or an http(s)/
file:// URL (fetched via webindex.fetch, sha256-gated zips supported).
Prints per-dataset NDCG@10 next to the reference's published macro
average (sgpt_utils.ipynb cell 32; see BASELINE.md)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resolve_dataset(src: str, work: str) -> str:
    """zip/url/dir -> dataset dir containing corpus.jsonl."""
    from webindex.fetch import download_and_unzip

    if os.path.isdir(src):
        root = src
    else:
        url = src if "://" in src else "file://" + os.path.abspath(src)
        root = download_and_unzip(url, work)
    # BEIR zips nest the payload one level down (<name>/corpus.jsonl)
    if os.path.isfile(os.path.join(root, "corpus.jsonl")):
        return root
    subs = [
        d for d in os.listdir(root)
        if os.path.isfile(os.path.join(root, d, "corpus.jsonl"))
    ]
    if len(subs) != 1:
        raise FileNotFoundError(
            f"no corpus.jsonl under {root} (subdirs: {subs})"
        )
    return os.path.join(root, subs[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--split", default="test")
    ap.add_argument("--top-k", type=int, default=1000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        work = args.out or os.path.join(
            "/tmp/webindex-beir",
            os.path.splitext(os.path.basename(args.dataset))[0] or "ds",
        )
        os.makedirs(work, exist_ok=True)
        ds_dir = _resolve_dataset(args.dataset, os.path.join(work, "data"))
        from webindex.pipelines.beir import (REFERENCE_BM25_MACRO,
                                             run_beir_bm25)

        m = run_beir_bm25(ds_dir, work, split=args.split,
                          top_k=args.top_k)
        print(f"dataset={m['dataset']} split={m['split']} "
              f"n_queries={m['n_queries']}")
        for k in sorted(m):
            if k.startswith("ndcg@") or k.startswith("map@") \
                    or k.startswith("recall@"):
                print(f"  {k:12s} {m[k]:.4f}")
        print(f"reference macro NDCG@10 over 18 BEIR sets: "
              f"{REFERENCE_BM25_MACRO} (sgpt_utils.ipynb cell 32)")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
