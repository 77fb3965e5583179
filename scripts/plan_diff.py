"""Plan-shape regression gate: diff two PLANS.md snapshots.

The scale contract is the PLAN, not the timing: a query that silently
gains an Exchange (one more shuffle of the fact table) or a Python
stage (JVM hot path fell off codegen into row transfer) can pass every
correctness check and still be a 100-TB regression. This compares the
per-query metric rows of two generated PLANS.md files and reports:

- queries whose exchange count INCREASED (the shuffle budget grew);
- queries that gained a python stage (✓ appeared) or lost their
  top-k heap (TakeOrderedAndProject degraded to a global sort);
- queries whose broadcast joins DECREASED while sort-merge joins
  increased (a dimension join fell off the broadcast path);
- queries added/removed.

Exit code 1 when any regression class is non-empty, so a round driver
or CI can gate on it. Intentional plan changes are re-baselined simply
by regenerating PLANS.md.

Deliberate plan changes carry an explicit WAIVER below — (query,
metric) pairs with a one-line justification, printed with the diff so
a reviewer sees the claim next to the flag instead of a silently
green gate. A waiver only suppresses the exact metric it names.

Usage: python scripts/plan_diff.py OLD_PLANS.md NEW_PLANS.md
       (e.g. OLD from `git show <rev>:PLANS.md > /tmp/old.md`)
"""

from __future__ import annotations

import re
import sys

# (query, metric) -> justification. Reviewed each round; stale waivers
# (the metric no longer differs) are reported so they get pruned.
WAIVERS: dict[tuple[str, str], str] = {
    # (near_dup_dedup, broadcast) and (dedup_triangles, broadcast)
    # pruned in the extended r7 session: both r7-close baselines
    # already carry the hermetic standalone plans, so the
    # capture-methodology waivers no longer fire (stale-waiver notes
    # confirmed both). (ivf_drift_report, exchanges) was pruned the
    # same way at r7 open.
    #
    # r8 verify-phase metering (VERDICT r7 item 4): the audits'
    # verification legs are now persisted + force-materialized inside
    # metering.phase('verify'/'build') so bench can attribute their
    # cost. The captured plan therefore shows the comparison legs
    # reading InMemoryRelations instead of one exchange-reused
    # subtree — exchange COUNT rises while runtime work falls or
    # holds (isolated repeat-5, CHANGELOG_r08: the rebuild/closure
    # now computes once into cache instead of riding reuse across
    # legs). Deliberate; prune when the r8-close baseline carries
    # these plans.
    # (the three r8 verify-metering exchange waivers were pruned at
    # r8 close: the close baseline carries the metered plans, so the
    # metric no longer differs — stale-waiver notes confirmed.)
}


def parse(path: str) -> dict[str, dict]:
    rows: dict[str, dict] = {}
    for line in open(path):
        m = re.match(
            r"\| (\w+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) "
            r"\| (✓|\s*) \| (✓|\s*) \|",
            line,
        )
        if not m:
            continue
        name, exch, bhj, smj, bnlj, pushed, heap, py = m.groups()
        rows[name] = {
            "exchanges": int(exch),
            "bhj": int(bhj),
            "smj": int(smj),
            "bnlj": int(bnlj),
            "pushed": int(pushed),
            "heap": heap.strip() == "✓",
            "python": py.strip() == "✓",
        }
    return rows


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = parse(sys.argv[1]), parse(sys.argv[2])
    regressions: list[str] = []
    notes: list[str] = []
    waived: list[str] = []

    fired: set[tuple[str, str]] = set()

    def flag(q: str, metric: str, msg: str) -> None:
        why = WAIVERS.get((q, metric))
        if why:
            # record the exact (query, metric) tuple here rather than
            # re-parsing it out of the printed message (ADVICE r6: the
            # string round-trip keyed staleness by query only, so a
            # query with waivers on two metrics could suppress one's
            # staleness, and broke if message formats changed).
            fired.add((q, metric))
            waived.append(f"WAIVED {msg}\n        {why}")
        else:
            regressions.append(msg)

    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if n["exchanges"] > o["exchanges"]:
            flag(
                q,
                "exchanges",
                f"EXCHANGES {q}: {o['exchanges']} -> {n['exchanges']}",
            )
        if n["python"] and not o["python"]:
            flag(q, "python", f"PYTHON-STAGE {q}: plan gained a Python stage")
        if o["heap"] and not n["heap"]:
            flag(q, "heap", f"TOPK-HEAP {q}: TakeOrderedAndProject lost")
        if n["smj"] > o["smj"] and n["bhj"] < o["bhj"]:
            flag(
                q,
                "broadcast",
                f"BROADCAST-LOST {q}: BHJ {o['bhj']} -> {n['bhj']}, "
                f"SMJ {o['smj']} -> {n['smj']}",
            )
        if n["pushed"] < o["pushed"]:
            notes.append(
                f"pushdown {q}: pushed-filter scans "
                f"{o['pushed']} -> {n['pushed']}"
            )
    for q in sorted(set(new) - set(old)):
        notes.append(f"added {q}")
    for q in sorted(set(old) - set(new)):
        notes.append(f"removed {q}")
    for r in regressions:
        print(r)
    for w in waived:
        print(w)
    # stale waivers: the metric no longer differs — prune the entry
    for (q, metric), _ in WAIVERS.items():
        if q in set(old) & set(new) and (q, metric) not in fired:
            print(f"note  stale waiver ({q}, {metric}) — prune it")
    for x in notes:
        print(f"note  {x}")
    print(
        f"compared {len(set(old) & set(new))} queries: "
        f"{len(regressions)} plan regressions, {len(waived)} waived"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
