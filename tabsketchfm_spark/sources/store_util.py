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

import contextlib
import json
import os

MANIFEST_NAME = "_manifest.json"
LEASE_NAME = "_writer.lease"


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


def lease_path(path: str) -> str:
    return os.path.join(path, LEASE_NAME)


def acquire_lease(path: str, owner: str = "writer", require_store: bool = False) -> None:
    """Non-contextmanager acquire, for bodies whose release lives in
    an existing ``finally`` (pair with release_lease). Semantics as
    writer_lease.

    ``require_store=True`` is for pure-MAINTENANCE entry points (ops
    that only make sense against an existing store): it refuses to
    mkdir a wrong/mistyped path — without it, a typo'd maintenance
    call would leave a stray empty directory tree behind before the
    manifest read even fails."""
    if require_store and not manifest_exists(path):
        raise IOError(
            f"no store manifest at {path} — maintenance ops do not "
            "bootstrap stores (check the path, or build the store first)"
        )
    os.makedirs(path, exist_ok=True)
    lp = lease_path(path)
    try:
        fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        try:
            with open(lp, encoding="utf-8") as f:
                holder = json.load(f)
        except (OSError, ValueError):
            holder = {"owner": "unknown"}
        raise IOError(
            f"store at {path} is write-leased by "
            f"{holder.get('owner')!r} (pid {holder.get('pid')}); if that "
            "writer crashed, recover with "
            "store_util.force_break_lease(path)"
        ) from None
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump({"owner": owner, "pid": os.getpid()}, f)


def release_lease(path: str) -> None:
    try:
        os.remove(lease_path(path))
    except FileNotFoundError:
        pass  # force-broken mid-write: nothing left to release


@contextlib.contextmanager
def writer_lease(path: str, owner: str = "writer", require_store: bool = False):
    """Mutual exclusion for store WRITERS (round-9 hazard, closed):
    without it, two concurrent appends lose one delta at the manifest
    read-modify-write, and a compaction's orphan sweep can GC a
    concurrent append's not-yet-committed subdir. Readers never take
    the lease — manifest flips are atomic, so reads are always
    consistent without coordination.

    The lease is an O_CREAT|O_EXCL exclusive create (POSIX-atomic on
    local and NFS-v4 filesystems; on object stores substitute a
    conditional PUT at this seam) holding {owner, pid} for the loud
    conflict message. NO wall-clock expiry — auto-expiring leases
    trade a deterministic loud failure for a silent double-writer
    window. A crashed writer leaves the lease behind by design:
    recovery is the operator's explicit force_break_lease(path) after
    confirming the holder is dead, mirroring the crash-recovery story
    of the generation dirs (a crash before the manifest flip already
    leaves the store serving the old generation intact)."""
    acquire_lease(path, owner, require_store=require_store)
    try:
        yield
    finally:
        release_lease(path)


def safe_subdir(path: str, name, prefix: str) -> str | None:
    """Validate a manifest-recorded subdirectory name before any
    destructive use: must be a bare child name (no separators, no
    '..', not absolute) with the expected prefix. Returns the joined
    path, or None if the value is unusable — a corrupt or hand-edited
    manifest must never steer an rmtree at the live store, its parent,
    or anywhere outside the store (review finding: '..' or an absolute
    path in retired_* would pass a naive join)."""
    if (
        not isinstance(name, str)
        or not name.startswith(prefix)
        or name != os.path.basename(name)
        or os.path.isabs(name)
        or name in (".", "..")
    ):
        return None
    return os.path.join(path, name)


def force_break_lease(path: str) -> bool:
    """Operator-initiated recovery from a crashed writer's leftover
    lease. Returns whether a lease existed. ONLY safe after confirming
    the holder process is gone — breaking a LIVE writer's lease
    re-opens the double-writer window the lease exists to close."""
    try:
        os.remove(lease_path(path))
        return True
    except FileNotFoundError:
        return False


def write_small_parquet(dir_path: str, rows: list[tuple], schema) -> None:
    """Driver-side commit of a SMALL driver-resident store artifact
    (centroid tables, codebooks, weight vectors — k to a few hundred
    rows): one parquet file inside ``dir_path``, written directly with
    pyarrow. The store contract already requires a POSIX-accessible
    path (manifests and leases use open()/O_EXCL at this same seam),
    and routing a tiny createDataFrame through a Spark write job costs
    a full scheduler round-trip (~1s) PER COMMIT — store lifecycles
    have several and the streaming twins pay it per micro-batch.
    Layout-compatible with spark.read.parquet(dir_path): a directory
    holding part files.

    ``schema`` is a pyarrow.Schema; ``rows`` are python tuples in
    schema order. Data-plane artifacts (corpus-sized code/signature
    frames) stay Spark writes — this seam is ONLY for state that
    already lives on the driver."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    cols = [
        pa.array([r[i] for r in rows], type=schema.field(i).type)
        for i in range(len(schema))
    ]
    table = pa.Table.from_arrays(cols, schema=schema)
    # fresh-subdir commits land in empty dirs; a same-name rewrite
    # (mode-overwrite semantics) is covered because the single part
    # file is replaced whole via the tmp+rename below
    tmp = os.path.join(dir_path, ".part-0.parquet.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(dir_path, "part-00000.parquet"))


def read_small_parquet(dir_path: str) -> list[dict]:
    """Driver-side read of a small store artifact dir — every
    ``*.parquet`` part file under ``dir_path`` (one for pyarrow-written
    dirs; possibly several plus _SUCCESS for legacy Spark-written
    stores, which this reader accepts unchanged), returned as a list
    of python dicts. The pyarrow decode yields plain ints/lists, same
    shapes the former spark.read...collect() rows carried."""
    import pyarrow.parquet as pq

    parts = sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet")
    )
    if not parts:
        raise FileNotFoundError(f"no parquet part files under {dir_path}")
    out: list[dict] = []
    for p in parts:
        out.extend(pq.read_table(p).to_pylist())
    return out
