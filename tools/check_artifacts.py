#!/usr/bin/env python
"""Artifact-staleness guard (VERDICT r5 #1, hardened per ADVICE r6).

Round 5's and round 6's final commits both changed query source
WITHOUT regenerating CORRECTNESS_SWEEP.json, so the committed
artifact vouched for code it had never run against. The first
version of this guard compared git commit ancestry, which had two
holes (ADVICE r6):

* a close-out commit that lands source changes and the regenerated
  artifact TOGETHER made check #2 fail forever (the artifact's stamp
  is HEAD *before* the commit, so the source's last commit always
  postdates it), and
* a ``--partial`` overlay let records stamped at an old commit pass
  ancestry checks even when a later commit changed their queries.

Both vanish when freshness is judged by CONTENT, not history: the
sweep stamps each artifact (and each per-query record) with a SHA-256
digest over every engine source file's bytes, and this guard
recomputes that digest against the working tree. Equal digest ==
the artifact ran against byte-identical sources, no matter how many
commits, rebases, or dirty-tree windows happened in between.

Checks:

1. CORRECTNESS_SWEEP.json carries a top-level ``source_digest``.
2. That digest equals the digest of the working tree NOW.
3. Every per-query record's ``source_digest`` equals the top-level
   one — an overlay-merged record from a different source state
   cannot hide.

Run it before the round close-out commit (also wired into pytest as
tests/test_driver_preflight.py::test_artifacts_fresh):

    python tools/check_artifacts.py        # exit 0 = artifacts fresh
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOURCE_PATHS = ["big_data_final_project_spark", "__spark_entry__.py"]
# Both full-registry differentials are guarded: the sf0.01 sweep and —
# since round 10 (VERDICT r9 #2) — the sf0.1 pass, which used to be a
# stdout-only claim. Round 11 (VERDICT r10 #3) adds the solo
# floor-of-N watch-list bench: a perf adjudication is only citable
# while it matches the tree it measured.
ARTIFACTS = (
    "CORRECTNESS_SWEEP.json",
    "CORRECTNESS_SF01.json",
    "BENCH_SOLO.json",
    # round 12: the two new robustness axes are guarded too — a
    # layout-invariance or unicode claim is only citable while it
    # matches the working tree
    "INVARIANCE_SWEEP.json",
    "UNICODE_SWEEP.json",
)


def source_digest() -> str:
    """SHA-256 over (relative path, bytes) of every engine source file
    in the working tree, in sorted path order. Caches and compiled
    files are skipped; everything else counts — a .py edit, a new
    module, or a deleted file all change the digest."""
    h = hashlib.sha256()
    files: list[str] = []
    for root_rel in SOURCE_PATHS:
        full = os.path.join(REPO, root_rel)
        if os.path.isfile(full):
            files.append(root_rel)
            continue
        for dirpath, dirnames, filenames in os.walk(full):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith((".pyc", ".pyo")):
                    continue
                files.append(
                    os.path.relpath(os.path.join(dirpath, fn), REPO)
                )
    for rel in sorted(files):
        h.update(rel.encode())
        h.update(b"\0")
        with open(os.path.join(REPO, rel), "rb") as fh:
            h.update(fh.read())
        h.update(b"\0")
    return h.hexdigest()


def _check_one(fname: str, now: str) -> list[str]:
    path = os.path.join(REPO, fname)
    if not os.path.exists(path):
        return [f"{fname} does not exist"]
    with open(path) as fh:
        artifact = json.load(fh)
    problems: list[str] = []
    art_digest = artifact.get("source_digest")
    if not art_digest:
        problems.append(
            f"{fname} has no 'source_digest' stamp — regenerate with "
            "the current sweep tools"
        )
    elif now != art_digest:
        problems.append(
            f"{fname}: source tree digest {now[:12]} != artifact digest "
            f"{art_digest[:12]} — engine source changed after the "
            "sweep ran; regenerate (run shards + merge)"
        )
    else:
        stale = sorted(
            name
            for name, r in artifact.get("queries", {}).items()
            if r.get("source_digest") not in (None, art_digest)
        )
        # None is not allowed either — a record without a stamp
        # could come from any source state.
        unstamped = sorted(
            name
            for name, r in artifact.get("queries", {}).items()
            if r.get("source_digest") is None
        )
        if stale:
            problems.append(
                f"{fname}: {len(stale)} record(s) produced at a different "
                f"source state (e.g. {stale[:3]}) — rerun those "
                "shards and re-merge"
            )
        if unstamped:
            problems.append(
                f"{fname}: {len(unstamped)} record(s) carry no "
                f"source_digest (e.g. {unstamped[:3]}) — regenerate "
                "those shards"
            )
    if not problems:
        n = artifact.get("n_queries")
        print(f"OK: {fname} ({n} queries) is fresh vs sources")
    return problems


def main() -> int:
    now = source_digest()
    problems: list[str] = []
    for fname in ARTIFACTS:
        problems.extend(_check_one(fname, now))
    if problems:
        for p in problems:
            print(f"FAIL: {p}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
