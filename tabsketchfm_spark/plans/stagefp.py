"""Executed-stage fingerprints off the Spark UI REST API.

A query's executed-stage set — stage count (complete + skipped),
shuffle read/write bytes, input bytes — is a PLAN property:
byte-identical across runs of the same code on the same data while
wall time swings with the container (±49% documented since round 5).
bench.py embeds these per headline query so each round's bench
artifact proves plan-identity mechanically; scripts/stage_profile.py
uses the same probe for ad-hoc drift adjudication.

IDENTITY CAVEAT (round-9 verdict item 3, observed r9/r10): the
BYTE-VOLUMES are the trustworthy invariant. ``n_stages`` can jitter by
a few stages on MULTI-JOB / ITERATIVE queries (profiler two-pass, CC
loops, joinability's rank pass) — skipped-stage counting depends on
which exchanges the scheduler happens to reuse across the query's
jobs, which is scheduling- not plan-determined. Drift adjudication
should compare shuffle/input MB exactly and treat small n_stages
deltas on iterative ops as noise; a byte-volume change is the real
plan-drift signal.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

METRIC_KEYS = {
    "shuffle_read_mb": "shuffleReadBytes",
    "shuffle_write_mb": "shuffleWriteBytes",
    "input_mb": "inputBytes",
    "executor_run_ms": "executorRunTime",
    "gc_ms": "jvmGcTime",
}

# the subset of METRIC_KEYS that is deterministic (plan-derived);
# executor_run_ms / gc_ms are wall-like and excluded from fingerprints
FINGERPRINT_KEYS = ("shuffle_read_mb", "shuffle_write_mb", "input_mb")


def api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def stages(base: str, app_id: str) -> dict[tuple[int, int], dict]:
    out = {}
    # skipped stages too: a reused exchange changes the fingerprint and
    # must show up as such, not vanish
    for status in ("complete", "skipped"):
        for s in api(base, f"/api/v1/applications/{app_id}/stages?status={status}"):
            out[(s["stageId"], s["attemptId"])] = s
    return out


def stages_stable(
    base: str, app_id: str, before: dict, timeout_s: float = 15.0
) -> dict:
    """Poll until the snapshot is stable AND contains at least one
    stage beyond ``before`` — completion events can land in the UI
    store noticeably after the job returns, so agreement alone could
    be two pre-run snapshots (silently truncating the fingerprint on
    the loaded host this probe exists to diagnose). Warns on timeout
    instead of returning a quietly short fingerprint."""
    prev = stages(base, app_id)
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        time.sleep(0.3)
        cur = stages(base, app_id)
        if set(cur) == set(prev) and any(k not in before for k in cur):
            return cur
        prev = cur
    print(
        json.dumps(
            {
                "warning": "stage snapshot did not stabilize with new "
                f"stages within {timeout_s}s; fingerprint may be truncated"
            }
        ),
        file=sys.stderr,
    )
    return prev


def stages_settled(base: str, app_id: str, timeout_s: float = 10.0) -> dict:
    """A 'before' snapshot that is safe to diff against: poll until two
    consecutive snapshots agree, so completion events still landing
    from PRIOR activity (warm-up, a previous query's runs 2-3 — UI
    store writes lag job completion on a loaded host) cannot be
    misattributed to the next query's fingerprint."""
    prev = stages(base, app_id)
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        time.sleep(0.2)
        cur = stages(base, app_id)
        if set(cur) == set(prev):
            return cur
        prev = cur
    return prev


def fingerprint(base: str, app_id: str, before: dict) -> dict:
    """Plan-fingerprint of the stages executed since ``before``:
    {"n_stages": N, "shuffle_read_mb": X, "shuffle_write_mb": X,
    "input_mb": X}."""
    after = stages_stable(base, app_id, before)
    new = [s for k, s in after.items() if k not in before]
    fp = {"n_stages": len(new)}
    for out_key in FINGERPRINT_KEYS:
        total = sum(s.get(METRIC_KEYS[out_key], 0) for s in new)
        fp[out_key] = round(total / 1e6, 2)
    return fp
