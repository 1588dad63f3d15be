"""Small shared utilities: stable hashing, atomic dirs, manifest/lineage IO."""

from __future__ import annotations

import json
import os
import shutil
import time
from hashlib import blake2b


def stable_hash64(s: str) -> int:
    """Stable 64-bit hash of a string (partition- and process-independent)."""
    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def term_bucket(term: str, num_buckets: int) -> int:
    return stable_hash64(term) % num_buckets


def atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2, default=str)
    os.replace(tmp, path)


def read_json(path: str, default=None):
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


class StageRunner:
    """Checkpointed stage execution for resumable builds.

    The reference resumes via file-existence guards around every expensive
    artifact (/root/reference/biencoder/beir/beir_dense_retriever.py:319-323,
    434-437); we make the same pattern atomic: a stage writes its output into
    ``<out>.tmp``, the runner renames it into place and records the stage in
    ``manifest.json`` plus a lineage record (wall time, output files, row
    counts) in ``lineage/<stage>.json``.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "lineage"), exist_ok=True)
        self.manifest_path = os.path.join(root, "manifest.json")

    def manifest(self) -> dict:
        return read_json(self.manifest_path, {})

    def is_done(self, stage: str) -> bool:
        return stage in self.manifest()

    def out_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def tmp_dir(self, stage: str) -> str:
        d = self.out_dir(stage) + ".tmp"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        return d

    def _collect_lineage(self, stage: str, out_dir: str, wall: float, extra: dict):
        files = []
        rows = 0
        nbytes = 0
        if os.path.isdir(out_dir):
            import pyarrow.parquet as pq

            for dirpath, _, names in os.walk(out_dir):
                for name in sorted(names):
                    p = os.path.join(dirpath, name)
                    ent = {"path": os.path.relpath(p, self.root),
                           "bytes": os.path.getsize(p)}
                    nbytes += ent["bytes"]
                    if name.endswith(".parquet"):
                        ent["rows"] = pq.ParquetFile(p).metadata.num_rows
                        rows += ent["rows"]
                    files.append(ent)
        rec = {
            "stage": stage,
            "wall_sec": round(wall, 4),
            "rows_out": rows,
            "bytes_out": nbytes,
            "n_files": len(files),
            "files": files,
            **extra,
        }
        atomic_write_json(os.path.join(self.root, "lineage", f"{stage}.json"), rec)
        return rec

    def run(self, stage: str, fn, has_output_dir: bool = True) -> dict:
        """Run ``fn(tmp_dir) -> extra_metrics`` unless already completed."""
        if self.is_done(stage):
            return self.manifest()[stage]
        t0 = time.time()
        if has_output_dir:
            tmp = self.tmp_dir(stage)
            extra = fn(tmp) or {}
            final = self.out_dir(stage)
            shutil.rmtree(final, ignore_errors=True)
            os.replace(tmp, final)
        else:
            extra = fn(None) or {}
            final = None
        rec = self._collect_lineage(stage, final or "", time.time() - t0, extra)
        man = self.manifest()
        man[stage] = {
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "wall_sec": rec["wall_sec"],
            "rows_out": rec["rows_out"],
        }
        atomic_write_json(self.manifest_path, man)
        return man[stage]
