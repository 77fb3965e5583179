"""Round-over-round bench regression report.

Usage: python scripts/bench_diff.py BENCH_r01.json BENCH_r02.json [ratio]

Compares per-query best-of-N timings between two bench outputs and
prints queries slower than ``ratio``× (default 1.5) the old time with
an absolute floor of 0.15 s (sub-100 ms timings are scheduler noise),
plus queries added/removed. Exit code 1 when regressions exist, so CI
or a round driver can gate on it.
"""

from __future__ import annotations

import json
import re
import sys


def _load_timings(path: str) -> dict[str, float]:
    """Accept either a bench.py output or the round driver's wrapper
    ({"tail": "<truncated stdout>"}); for the latter, recover whatever
    per-query pairs survive in the tail."""
    doc = json.load(open(path))
    if "queries" in doc:
        return doc["queries"]
    tail = doc.get("tail", "")
    return {
        name: float(val)
        for name, val in re.findall(r'"([a-z0-9_]+)\\?":\s*([0-9.]+)', tail)
        if name not in ("sf", "value", "wall_sec", "repeat", "n_queries")
    }


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_doc = json.load(open(sys.argv[1]))
    new_doc = json.load(open(sys.argv[2]))
    old = _load_timings(sys.argv[1])
    new = _load_timings(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    # methodology drift makes per-query ratios apples-to-oranges (e.g.
    # the r5→r6 min-of-2 → median-of-3 switch, or the side-write skip
    # landing between rounds) — say so instead of letting the first
    # post-change diff read as a real win/regression (ADVICE r5)
    for field in ("stat", "repeat", "order"):
        ov, nv = old_doc.get(field), new_doc.get(field)
        if ov != nv:
            print(
                f"NOTE: bench methodology changed ({field}:"
                f" {ov!r} -> {nv!r}) — per-query ratios below are not"
                " like-for-like; confirm via plan_diff before reading"
                " them as operator changes"
            )

    regressions = []
    improved = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n > o * ratio and n - o > 0.15:
            regressions.append((name, o, n))
        elif o > n * ratio and o - n > 0.15:
            improved.append((name, o, n))
    for name, o, n in sorted(regressions, key=lambda x: x[1] - x[2]):
        print(f"SLOWER  {name}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x)")
    for name, o, n in sorted(improved, key=lambda x: x[2] - x[1]):
        print(f"faster  {name}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x)")
    for name in sorted(set(new) - set(old)):
        print(f"added   {name}: {new[name]:.3f}s")
    for name in sorted(set(old) - set(new)):
        print(f"REMOVED {name} (was {old[name]:.3f}s)")

    # persisted-index entries: track the SERVE path (the scale-
    # relevant latency) separately from the build+serve total
    osplit = old_doc.get("index_splits", {})
    nsplit = new_doc.get("index_splits", {})
    for name in sorted(set(osplit) | set(nsplit)):
        o, n = osplit.get(name), nsplit.get(name)
        if o and n:
            ver = ""
            if "verify_sec" in o or "verify_sec" in n:
                ver = (
                    f", verify {o.get('verify_sec', 0.0):.2f}s ->"
                    f" {n.get('verify_sec', 0.0):.2f}s"
                )
            print(
                f"index   {name}: build {o['build_sec']:.2f}s ->"
                f" {n['build_sec']:.2f}s, serve {o['serve_sec']:.2f}s ->"
                f" {n['serve_sec']:.2f}s" + ver
            )
        elif n:
            ver = (
                f" / verify {n['verify_sec']:.2f}s"
                if "verify_sec" in n else ""
            )
            print(
                f"index   {name}: build {n['build_sec']:.2f}s /"
                f" serve {n['serve_sec']:.2f}s" + ver + " (no prior split)"
            )

    t_old = sum(old.values())
    t_new = sum(new.values())
    shared_old = sum(v for k, v in old.items() if k in new)
    shared_new = sum(v for k, v in new.items() if k in old)
    print(
        f"\ntotals: {t_old:.1f}s -> {t_new:.1f}s "
        f"(shared queries {shared_old:.1f}s -> {shared_new:.1f}s)"
    )
    return 1 if regressions or (set(old) - set(new)) else 0


if __name__ == "__main__":
    raise SystemExit(main())
