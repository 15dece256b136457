#!/usr/bin/env python
"""Artifact-staleness guard (VERDICT r5 "Next round" #1).

Round 5's final commit changed a query implementation WITHOUT
regenerating that query's CORRECTNESS_SWEEP.json record, so the
committed artifact briefly vouched for code it had never run against.
This check makes that impossible to ship silently: it FAILS unless the
committed sweep artifact postdates every source change.

Checks, in order:

1. CORRECTNESS_SWEEP.json carries a top-level "commit" stamp (written
   by tools/correctness_sweep.py merge).
2. The last commit touching any engine source
   (big_data_final_project_spark/, __spark_entry__.py) is an ancestor
   of — i.e. no newer than — the artifact's generation commit.
3. No UNCOMMITTED engine-source change is newer than the artifact
   file itself (mtime comparison; catches the dirty-working-tree
   window before the close-out commit).
4. Every per-query record's commit stamp resolves to a commit that is
   an ancestor of the artifact's generation commit (overlay-merged
   records from a --partial merge are allowed, but only if nothing
   touched the sources after they were produced — guarded by #2).

Run it before the round close-out commit:

    python tools/check_artifacts.py        # exit 0 = artifacts fresh
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOURCE_PATHS = ["big_data_final_project_spark", "__spark_entry__.py"]
ARTIFACT = os.path.join(REPO, "CORRECTNESS_SWEEP.json")


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True
    )


def _is_ancestor(maybe_older: str, newer: str) -> bool:
    return _git("merge-base", "--is-ancestor", maybe_older, newer).returncode == 0


def main() -> int:
    problems: list[str] = []

    if not os.path.exists(ARTIFACT):
        print("FAIL: CORRECTNESS_SWEEP.json does not exist")
        return 1
    with open(ARTIFACT) as fh:
        artifact = json.load(fh)

    # 1. generation stamp present
    art_commit = artifact.get("commit")
    if not art_commit:
        problems.append(
            "artifact has no 'commit' stamp — regenerate with the "
            "current tools/correctness_sweep.py"
        )
    elif _git("cat-file", "-e", f"{art_commit}^{{commit}}").returncode != 0:
        # Generated on a dirty tree before the close-out commit: the
        # stamp is HEAD at generation time, which must still exist.
        problems.append(f"artifact commit stamp {art_commit} not found in repo")

    # 2. last source commit must not postdate the artifact's commit
    if art_commit and not problems:
        src_last = _git(
            "log", "-1", "--format=%H", "--", *SOURCE_PATHS
        ).stdout.strip()
        if src_last and not _is_ancestor(src_last, art_commit):
            problems.append(
                f"source commit {src_last[:12]} postdates artifact commit "
                f"{art_commit[:12]} — a query changed after the sweep ran; "
                "rerun the affected shard(s) and re-merge"
            )

    # 3. dirty-tree window: uncommitted source edits newer than the file
    art_mtime = os.path.getmtime(ARTIFACT)
    dirty = _git("status", "--porcelain", "--", *SOURCE_PATHS).stdout
    for line in dirty.splitlines():
        rel = line[3:].split(" -> ")[-1].strip().strip('"')
        full = os.path.join(REPO, rel)
        if os.path.exists(full) and os.path.getmtime(full) > art_mtime:
            problems.append(
                f"uncommitted source edit newer than artifact: {rel}"
            )

    # 4. per-record stamps must not postdate the artifact's commit
    if art_commit and not problems:
        stamps = {
            r.get("commit")
            for r in artifact.get("queries", {}).values()
            if r.get("commit")
        }
        for stamp in sorted(stamps):
            if _git("cat-file", "-e", f"{stamp}^{{commit}}").returncode != 0:
                continue  # produced on a since-rebased tree; #2 still guards
            if not _is_ancestor(stamp, art_commit) and not stamp.startswith(
                art_commit[: len(stamp)]
            ):
                problems.append(
                    f"record commit stamp {stamp} postdates artifact commit"
                )

    if problems:
        for p in problems:
            print(f"FAIL: {p}")
        return 1
    n = artifact.get("n_queries")
    print(f"OK: CORRECTNESS_SWEEP.json ({n} queries) is fresh vs sources")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
