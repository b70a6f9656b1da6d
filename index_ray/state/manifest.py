"""Per-partition lineage manifests — checkpoint/resume for the build.

The reference's resume story is only "completed numbered chunk files
survive" (``/root/reference/index.cpp:60-76``; a crashed in-memory chunk is
lost).  Here every build chunk writes its outputs first and then an atomic
chunk manifest recording input lineage (fragment list), row/token counts,
output files with sizes, and the build-config fingerprint.  Resume = skip
chunks whose manifest validates; anything else is wiped and rebuilt
(SURVEY.md §4 checkpoint/resume, north rule "per-partition lineage").
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any


def write_json_atomic(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_json(path: str) -> Any | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def config_fingerprint(cfg_dict: dict) -> str:
    blob = json.dumps(cfg_dict, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def manifest_path(chunk_dir: str) -> str:
    return os.path.join(chunk_dir, "MANIFEST.json")


def validate_chunk(chunk_dir: str, fingerprint: str) -> dict | None:
    """Return the manifest if this chunk is complete and current, else None."""
    m = read_json(manifest_path(chunk_dir))
    if not m or m.get("config_fingerprint") != fingerprint:
        return None
    for rel, size in m.get("files", {}).items():
        p = os.path.join(chunk_dir, rel)
        try:
            if os.path.getsize(p) != size:
                return None
        except OSError:
            return None
    return m


def list_output_files(chunk_dir: str) -> dict[str, int]:
    files: dict[str, int] = {}
    for root, _, names in os.walk(chunk_dir):
        for n in names:
            if n.endswith(".tmp") or n == "MANIFEST.json":
                continue
            p = os.path.join(root, n)
            files[os.path.relpath(p, chunk_dir)] = os.path.getsize(p)
    return files
