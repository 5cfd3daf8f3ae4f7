"""Shared persisted-store plumbing: the atomic manifest commit every
store (k-means centroid state, perceptron weights, IVF-PQ index,
signature store) must perform identically.

The contract (learned across rounds 7-8): state lands in FRESH
versioned subdirectories first, then the manifest pointer flips via
temp-file + os.replace — an in-place open('w') TRUNCATES the live
manifest before writing, so a crash mid-dump bricks the store, and
in-place DATA rewrites under a constant manifest leave torn
mixed-generation artifacts that still pass the guard.
"""

from __future__ import annotations

import json
import os

MANIFEST_NAME = "_manifest.json"


def manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST_NAME)


def write_manifest(path: str, manifest: dict) -> None:
    """Atomic pointer flip: temp + os.replace (POSIX-atomic). Call
    ONLY after every artifact the manifest points at is fully
    written."""
    os.makedirs(path, exist_ok=True)
    tmp = manifest_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path(path))


def read_manifest(path: str) -> dict:
    with open(manifest_path(path), encoding="utf-8") as f:
        return json.load(f)


def manifest_exists(path: str) -> bool:
    return os.path.exists(manifest_path(path))
