#!/usr/bin/env python
"""Flag registry entries whose query fn or oracle SQL changed AFTER
their driver-green round (VERDICT r5 item 2).

A driver-green stamp in CORRECTNESS_r{N}.json proves the entry's code
as of round N's close commit — any later edit (including edits to a
shared helper the fn calls) silently demotes that proof. This script:

1. finds each entry's LAST driver-green round from the committed
   CORRECTNESS_r*.json files (the most recent stamp is the proof to
   protect — an entry re-checked in a later window is covered up to
   that round's close, not its first green round);
2. locates each round's close commit (`git log --grep '^round N:'`);
3. checks out each needed close commit into a detached worktree and
   runs scripts/registry_hashes.py there (fn hash = helper-closure
   source hash, oracle hash = SQL text hash);
4. compares against the working tree and writes HASH_DRIFT.json:
   {entry: {"green": "rNN", "changed": "fn"|"oracle"|"fn+oracle"}}
   for every stale entry (empty object = clean).

Exit code 1 if any stale entry is NOT inside the current ~50-key
driver window (i.e. not scheduled for a re-check), else 0. When the
flag count exceeds the window, the overflow may be recorded in
HASH_DRIFT_BACKLOG.json ({"scheduled_round": "rNN", "entries":
{name: flag}}); entries listed there count as scheduled PROVIDED they
sit in the registry's front section (position <= 100 — one rotation
away from the window head) — a backlog entry parked deeper is
reported unscheduled again. The backlog file
self-expires: once an entry is re-checked green, its drift flag
clears on the next run and a leftover backlog row is reported stale.
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

    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for name, row in json.load(open(path)).items():
            if _is_green(row):
                last_green[name] = max(rnd, last_green.get(name, 0))

    head = _hashes_at(None)
    needed_rounds = sorted({r for n, r in last_green.items() if n in head})
    snapshots: dict[int, dict] = {}
    for r in needed_rounds:
        commit = _round_close_commit(r)
        if commit is None:
            print(f"warning: no close commit found for round {r}", file=sys.stderr)
            continue
        snapshots[r] = _hashes_at(commit)

    stale: dict[str, dict] = {}
    for name, r in sorted(last_green.items()):
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

    registry = list(entrymod.queries())
    window = registry[:50]

    backlog_path = os.path.join(REPO, "HASH_DRIFT_BACKLOG.json")
    deferred: set[str] = set()
    stale_backlog_rows: list[str] = []
    if os.path.exists(backlog_path):
        bl = json.load(open(backlog_path))
        # scheduled = flagged stale AND parked in the FRONT SECTION
        # (registry position <= 100: one rotation away from the
        # window head) — parked deeper and "scheduled" would be an
        # empty promise. A fixed bound, not 50+len(entries): slicing
        # by the file's row count made every entry's status depend on
        # how many OTHER rows had been pruned after going green (the
        # documented self-expiry flow would shift the slice and
        # falsely fail the still-stale tail).
        front = set(registry[50:100])
        for n in bl.get("entries", {}):
            if n not in stale:
                stale_backlog_rows.append(n)
            elif n in front:
                deferred.add(n)

    unscheduled = [n for n in stale if n not in window and n not in deferred]
    print(
        f"HASH_DRIFT.json: {len(stale)} stale entr{'y' if len(stale)==1 else 'ies'}"
        f" (changed after driver-green); {len(deferred)} deferred via"
        f" HASH_DRIFT_BACKLOG.json; {len(unscheduled)} NOT scheduled"
    )
    for n in sorted(stale):
        mark = (
            "" if n in window
            else "  (deferred -> backlog head)" if n in deferred
            else "  <-- NOT re-windowed"
        )
        print(f"  {n:40s} green={stale[n]['green']} changed={stale[n]['changed']}{mark}")
    for n in sorted(stale_backlog_rows):
        print(f"  note: backlog row '{n}' no longer flags stale — prune it")
    return 1 if unscheduled else 0


if __name__ == "__main__":
    raise SystemExit(main())
