#!/usr/bin/env python
"""Flag registry entries whose query fn or oracle SQL changed AFTER
their driver-green round (VERDICT r5 item 2).

A driver-green stamp in CORRECTNESS_r{N}.json proves the entry's code
as of round N's close commit — any later edit (including edits to a
shared helper the fn calls) silently demotes that proof. This script:

1. finds each entry's first driver-green round from the committed
   CORRECTNESS_r*.json files;
2. locates each round's close commit (`git log --grep '^round N:'`);
3. checks out each needed close commit into a detached worktree and
   runs scripts/registry_hashes.py there (fn hash = helper-closure
   source hash, oracle hash = SQL text hash);
4. compares against the working tree and writes HASH_DRIFT.json:
   {entry: {"green": "rNN", "changed": "fn"|"oracle"|"fn+oracle"}}
   for every stale entry (empty object = clean).

Exit code 1 if any stale entry is NOT inside the current ~50-key
driver window (i.e. not scheduled for a re-check), else 0.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.check_output(["git", *args], cwd=REPO, text=True)


def _is_green(row: dict) -> bool:
    if row.get("err"):
        return False
    hm = row.get("hash_match")
    return bool(hm) if hm is not None else bool(row.get("rows_match"))


def _round_close_commit(n: int) -> str | None:
    out = _git(
        "log", "--format=%H %s", "--grep", f"^round {n}: verdict"
    ).strip()
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        if subj.startswith(f"round {n}:"):
            return sha
    return None


def _hashes_at(commit: str | None) -> dict:
    """registry_hashes.py output at `commit` (None = working tree)."""
    if commit is None:
        out = subprocess.check_output(
            [sys.executable, os.path.join(REPO, "scripts", "registry_hashes.py")],
            cwd=REPO,
            text=True,
        )
        return json.loads(out)
    wt = tempfile.mkdtemp(prefix=f"hashdrift_{commit[:8]}_")
    try:
        _git("worktree", "add", "-f", "--detach", wt, commit)
        os.makedirs(os.path.join(wt, "scripts"), exist_ok=True)
        shutil.copy(
            os.path.join(REPO, "scripts", "registry_hashes.py"),
            os.path.join(wt, "scripts", "registry_hashes.py"),
        )
        out = subprocess.check_output(
            [sys.executable, os.path.join(wt, "scripts", "registry_hashes.py")],
            cwd=wt,
            text=True,
        )
        return json.loads(out)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


def main() -> int:
    import glob

    first_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for name, row in json.load(open(path)).items():
            if _is_green(row) and name not in first_green:
                first_green[name] = rnd

    head = _hashes_at(None)
    needed_rounds = sorted({r for n, r in first_green.items() if n in head})
    snapshots: dict[int, dict] = {}
    for r in needed_rounds:
        commit = _round_close_commit(r)
        if commit is None:
            print(f"warning: no close commit found for round {r}", file=sys.stderr)
            continue
        snapshots[r] = _hashes_at(commit)

    stale: dict[str, dict] = {}
    for name, r in sorted(first_green.items()):
        cur = head.get(name)
        snap = snapshots.get(r, {}).get(name)
        if cur is None or snap is None:
            continue
        if snap != cur:
            which = []
            if snap["fn"] != cur["fn"]:
                which.append("fn")
            if snap["oracle"] != cur["oracle"]:
                which.append("oracle")
            stale[name] = {"green": f"r{r:02d}", "changed": "+".join(which)}

    out_path = os.path.join(REPO, "HASH_DRIFT.json")
    with open(out_path, "w") as f:
        json.dump(stale, f, indent=1, sort_keys=True)

    # registry order, not the sorted hash-dump order
    import __spark_entry__ as entrymod

    window = list(entrymod.queries())[:50]
    unscheduled = [n for n in stale if n not in window]
    print(
        f"HASH_DRIFT.json: {len(stale)} stale entr{'y' if len(stale)==1 else 'ies'}"
        f" (changed after driver-green); {len(unscheduled)} NOT in the"
        f" current 50-key window"
    )
    for n in sorted(stale):
        mark = "" if n in window else "  <-- NOT re-windowed"
        print(f"  {n:40s} green={stale[n]['green']} changed={stale[n]['changed']}{mark}")
    return 1 if unscheduled else 0


if __name__ == "__main__":
    raise SystemExit(main())
