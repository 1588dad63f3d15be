"""Results publishing: Kaggle-dataset up/download analog (SURVEY.md §2.1 S10).

The reference publishes its BM25 run files as a Kaggle dataset and pulls
them back on other machines
(/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cells
17-23: ``kaggle datasets init -p bm25_results`` → ``kaggle datasets create
-p bm25_results/ --dir-mode zip`` → elsewhere ``kaggle datasets download -d
<slug>`` + unzip; /root/reference/crossencoder/beir/sgptce.py:1-8 documents
the same download in its setup block).

Semantics preserved here:

- :func:`init_dataset` — the ``datasets init`` step: write
  ``dataset-metadata.json`` (public Kaggle schema: title, ``owner/slug``
  id, licenses) next to the result files.
- :func:`create_dataset` — the ``datasets create --dir-mode zip`` step:
  zip the directory (metadata included) and hand the archive to a
  *transport*.
- :func:`download_dataset` — ``datasets download -d slug`` + unzip,
  returning the extracted directory.

The transport is pluggable because this sandbox (and any air-gapped
cluster) has no network: :class:`LocalStoreTransport` versions archives
under a plain directory tree (``store/<owner>/<slug>/v<N>.zip``) and is
what tests exercise end-to-end; :class:`KaggleCliTransport` shells out to
the real ``kaggle`` CLI when it exists on PATH.  Run files themselves stay
small (top-k rows per query serialized by webindex.sources), so publishing
is a driver-side step, never a Ray stage.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

from webindex.fetch import _safe_members

METADATA_FILE = "dataset-metadata.json"


def init_dataset(
    path: str,
    dataset_id: str,
    title: str | None = None,
    licenses: list[dict] | None = None,
) -> str:
    """Write ``dataset-metadata.json`` into ``path`` (``datasets init``).

    ``dataset_id`` must be ``owner/slug``. Returns the metadata path.
    """
    if dataset_id.count("/") != 1:
        raise ValueError(f"dataset id must be 'owner/slug', got {dataset_id!r}")
    os.makedirs(path, exist_ok=True)
    meta = {
        "title": title or dataset_id.split("/", 1)[1],
        "id": dataset_id,
        "licenses": licenses or [{"name": "CC0-1.0"}],
    }
    meta_path = os.path.join(path, METADATA_FILE)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta_path


def _read_metadata(path: str) -> dict:
    meta_path = os.path.join(path, METADATA_FILE)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{METADATA_FILE} missing in {path}; run init_dataset first"
        )
    with open(meta_path) as f:
        return json.load(f)


def _zip_dir(path: str, zip_path: str) -> str:
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(path):
            for name in sorted(files):
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, path))
    return zip_path


class LocalStoreTransport:
    """Directory-backed dataset store: ``root/<owner>/<slug>/v<N>.zip``."""

    def __init__(self, root: str):
        self.root = root

    def _slug_dir(self, dataset_id: str) -> str:
        owner, slug = dataset_id.split("/", 1)
        return os.path.join(self.root, owner, slug)

    def push(self, dataset_id: str, zip_path: str) -> str:
        d = self._slug_dir(dataset_id)
        os.makedirs(d, exist_ok=True)
        # max existing + 1 (NOT count + 1: pruning an old version must
        # never make the next push clobber the current latest)
        existing = [
            int(n[1:-4]) for n in os.listdir(d)
            if n.startswith("v") and n.endswith(".zip")
            and n[1:-4].isdigit()
        ]
        version = 1 + max(existing, default=0)
        dest = os.path.join(d, f"v{version}.zip")
        shutil.copyfile(zip_path, dest)
        return dest

    def pull(self, dataset_id: str, dest_zip: str) -> str:
        d = self._slug_dir(dataset_id)
        if not os.path.isdir(d):
            raise FileNotFoundError(f"no such dataset in store: {dataset_id}")
        versions = sorted(
            (n for n in os.listdir(d) if n.startswith("v") and n.endswith(".zip")),
            key=lambda n: int(n[1:-4]),
        )
        if not versions:
            raise FileNotFoundError(f"dataset has no versions: {dataset_id}")
        shutil.copyfile(os.path.join(d, versions[-1]), dest_zip)
        return dest_zip


class KaggleCliTransport:
    """Real ``kaggle`` CLI. Only usable where the CLI + credentials exist."""

    def _cli(self) -> str:
        exe = shutil.which("kaggle")
        if exe is None:
            raise RuntimeError(
                "kaggle CLI not on PATH; use LocalStoreTransport offline"
            )
        return exe

    def push(self, dataset_id: str, zip_path: str) -> str:
        # the CLI zips itself from a directory; hand it the archive's dir
        subprocess.run(
            [self._cli(), "datasets", "create",
             "-p", os.path.dirname(zip_path), "--dir-mode", "zip"],
            check=True,
        )
        return dataset_id

    def pull(self, dataset_id: str, dest_zip: str) -> str:
        out_dir = os.path.dirname(dest_zip) or "."
        subprocess.run(
            [self._cli(), "datasets", "download", "-d", dataset_id,
             "-p", out_dir],
            check=True,
        )
        slug = dataset_id.split("/", 1)[1]
        produced = os.path.join(out_dir, slug + ".zip")
        if produced != dest_zip:
            os.replace(produced, dest_zip)
        return dest_zip


def create_dataset(path: str, transport) -> str:
    """Zip ``path`` (``--dir-mode zip``) and push via ``transport``.

    Returns the transport's location string for the pushed version.
    """
    meta = _read_metadata(path)
    zip_path = os.path.join(
        path + ".staging", meta["id"].split("/", 1)[1] + ".zip"
    )
    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    try:
        _zip_dir(path, zip_path)
        return transport.push(meta["id"], zip_path)
    finally:
        shutil.rmtree(os.path.dirname(zip_path), ignore_errors=True)


def download_dataset(dataset_id: str, out_dir: str, transport) -> str:
    """``datasets download -d`` + unzip; returns the extracted directory.

    Idempotent on the extracted directory, like webindex.fetch.
    """
    slug = dataset_id.split("/", 1)[1]
    data_dir = os.path.join(out_dir, slug)
    if os.path.isdir(data_dir):
        return data_dir
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, slug + ".zip")
    transport.pull(dataset_id, zip_path)
    tmp_dir = data_dir + ".extracting"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(tmp_dir, members=_safe_members(zf))
    os.replace(tmp_dir, data_dir)
    os.remove(zip_path)
    return data_dir
