"""Dataset fetch + unzip source (SURVEY.md §2.1 S2).

Re-expression of the reference's acquisition step — it calls
``beir.util.download_and_unzip(url, out_dir)`` before every run
(/root/reference/biencoder/beir/beir_dense_retriever.py:378-382) and ships
its own streaming ``http_get`` pattern
(/root/reference/biencoder/useb implementation, SURVEY.md §2.1 S2 row):
stream the archive to disk in chunks, then extract next to it, skipping
both steps when the target already exists.

Here the same surface is a cache-read-through pair:

- :func:`http_get` — chunked streaming download via urllib.  ``file://``
  URLs are first-class (and the only kind exercised in this sandbox — no
  network), so tests and air-gapped clusters use identical code.
- :func:`download_and_unzip` — idempotent fetch+extract keyed on the
  extracted directory, with an optional sha256 gate.  At cluster scale this
  runs once per node at most (the extracted dir doubles as the lock/marker,
  mirroring the reference's ``if not os.path.isdir(data_path)`` guard), and
  everything downstream reads the extracted files through Ray Data sources.

Zip members are validated against path traversal (absolute paths or ``..``
components are rejected) — archives are untrusted input.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.request
import zipfile

_CHUNK = 1 << 20


def http_get(url: str, dest_path: str, *, chunk_size: int = _CHUNK) -> str:
    """Stream ``url`` to ``dest_path`` (atomic rename at the end).

    Supports ``http(s)://`` and ``file://`` schemes plus bare local paths.
    Returns ``dest_path``.
    """
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    tmp = dest_path + ".part"
    if "://" not in url:
        url = "file://" + os.path.abspath(url)
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                break
            out.write(chunk)
    os.replace(tmp, dest_path)
    return dest_path


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(_CHUNK), b""):
            h.update(chunk)
    return h.hexdigest()


def _safe_members(zf: zipfile.ZipFile) -> list[zipfile.ZipInfo]:
    members = []
    for info in zf.infolist():
        name = info.filename
        if name.startswith(("/", "\\")) or os.path.isabs(name):
            raise ValueError(f"zip member has absolute path: {name!r}")
        parts = name.replace("\\", "/").split("/")
        if ".." in parts:
            raise ValueError(f"zip member escapes archive root: {name!r}")
        members.append(info)
    return members


def download_and_unzip(
    url: str,
    out_dir: str,
    *,
    sha256: str | None = None,
    keep_zip: bool = False,
) -> str:
    """Fetch a zip at ``url`` and extract it under ``out_dir``.

    Returns the path of the extracted dataset directory
    ``out_dir/<archive-stem>``.  Idempotent: if that directory already
    exists the download and extraction are both skipped (the reference's
    read-through-cache behavior).  ``sha256``, when given, must match the
    downloaded archive or the call fails before extraction.
    """
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.basename(url.rstrip("/"))
    if stem.endswith(".zip"):
        stem = stem[: -len(".zip")]
    data_dir = os.path.join(out_dir, stem)
    if os.path.isdir(data_dir):
        return data_dir

    zip_path = os.path.join(out_dir, stem + ".zip")
    downloaded = not os.path.exists(zip_path)
    if downloaded:
        http_get(url, zip_path)
    if sha256 is not None:
        got = sha256_file(zip_path)
        if got != sha256:
            if downloaded:
                # only discard an archive THIS call fetched — a pre-existing
                # zip (keep_zip=True earlier, or user-provided) may be the
                # caller's only copy and the mismatch may be a stale pin
                os.remove(zip_path)
            raise ValueError(
                f"sha256 mismatch for {url}: expected {sha256}, got {got}"
            )

    tmp_dir = data_dir + ".extracting"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    with zipfile.ZipFile(zip_path) as zf:
        members = _safe_members(zf)
        zf.extractall(tmp_dir, members=members)
    # archives either contain the dataset dir as their single root entry
    # (BEIR layout: scifact.zip -> scifact/corpus.jsonl ...) or bare files;
    # normalize both to out_dir/<stem>/
    entries = os.listdir(tmp_dir)
    if len(entries) == 1 and os.path.isdir(os.path.join(tmp_dir, entries[0])):
        os.replace(os.path.join(tmp_dir, entries[0]), data_dir)
        shutil.rmtree(tmp_dir, ignore_errors=True)
    else:
        os.replace(tmp_dir, data_dir)
    if not keep_zip:
        os.remove(zip_path)
    return data_dir
