"""Per-partition checkpoint manifests (SURVEY.md §4.4, north rule
"resumable from checkpoint with per-partition lineage + metrics").

Layout::

    out_dir/part={k}/....parquet        # Ray partitioned write
    out_dir/_manifests/part-{k}.json    # {part, row_count, url_checksum,
                                        #  n_bytes_out, stage_version}

A partition is DONE iff its manifest exists; a crashed run leaves part
dirs without manifests, which resume deletes and recomputes.  The
checksum is order-independent (sum of url hashes mod 2^64,
functions/hashing.py) so rewrites verify identically.
"""

from __future__ import annotations

import json
import os
import shutil

from ..functions.hashing import hash64

STAGE_VERSION = "extract-v1"
MANIFEST_DIR = "_manifests"


def url_part(url: str, n_parts: int) -> int:
    """Deterministic partition id for a url (hash-range partitioning)."""
    return hash64(url, seed=7) % n_parts


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR)


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{part:05d}.json")


def write_manifest(out_dir: str, part: int, row_count: int, url_checksum: int,
                   n_bytes_out: int) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    payload = {
        "part": part,
        "row_count": row_count,
        "url_checksum": url_checksum,
        "n_bytes_out": n_bytes_out,
        "stage_version": STAGE_VERSION,
    }
    tmp = manifest_path(out_dir, part) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, manifest_path(out_dir, part))  # atomic publish


def read_done_parts(out_dir: str) -> dict[int, dict]:
    """Manifests present on disk, keyed by part (stale stage versions are
    treated as not-done)."""
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    done: dict[int, dict] = {}
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            if m.get("stage_version") == STAGE_VERSION:
                done[int(m["part"])] = m
        except (json.JSONDecodeError, KeyError, ValueError, OSError):
            continue
    return done


def clean_incomplete_parts(out_dir: str) -> list[int]:
    """Delete part dirs that lack a manifest (crashed partial writes)."""
    if not os.path.isdir(out_dir):
        return []
    done = read_done_parts(out_dir)
    removed = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part="):
            continue
        try:
            part = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if part not in done:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            removed.append(part)
    return removed


def checksum_urls(urls: list[str]) -> int:
    total = 0
    for u in urls:
        total = (total + hash64(u, seed=7)) & ((1 << 64) - 1)
    return total
