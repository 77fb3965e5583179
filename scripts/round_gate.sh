#!/usr/bin/env bash
# Round close-out gate: run before committing a round's final state.
#
#   bash scripts/round_gate.sh [baseline-git-ref]
#
# 1. full unit suite
# 2. full oracle sweep at driver correctness scale (sf0.01)
# 3. standalone closing bench (no concurrent Spark sessions — check!)
# 4. per-query regression diff vs the given baseline ref's
#    BENCH_LOCAL.json (default: previous commit of that file)
#
# Exits non-zero on the first failing stage so it can gate a commit.
set -euo pipefail
cd "$(dirname "$0")/.."

BASELINE_REF="${1:-HEAD}"

if pgrep -f "org.apache.spark" | grep -qv $$; then
    echo "WARNING: other JVMs are running — bench numbers will be" \
         "polluted (measured 1.3-2x uniform inflation). Consider" \
         "stopping them first." >&2
fi

echo "== 0/4 import/name-resolution smoke (seconds — run this alone" \
     "before ANY snapshot commit, not only at round close)" >&2
python scripts/smoke_imports.py

echo "== 1/4 pytest" >&2
python -m pytest tests/ -q

echo "== 2/4 oracle sweep (sf0.01)" >&2
python scripts/check_oracle.py /root/testdata/sf0.01 \
    --json=/tmp/gate_sweep.json | tail -1 | tee /tmp/gate_oracle
grep -q " 0 fail" /tmp/gate_oracle
echo "== hash drift: entries changed after their driver-green round" >&2
python scripts/hash_drift.py
python scripts/coverage_report.py --local=/tmp/gate_sweep.json

echo "== 3/4 closing bench (standalone)" >&2
git show "${BASELINE_REF}:BENCH_LOCAL.json" > /tmp/gate_bench_base.json \
     2>/dev/null || cp BENCH_LOCAL.json /tmp/gate_bench_base.json
python bench.py > /tmp/gate_bench_out 2>/dev/null
tail -1 /tmp/gate_bench_out

echo "== 4/4 bench diff vs ${BASELINE_REF}" >&2
python scripts/bench_diff.py /tmp/gate_bench_base.json BENCH_LOCAL.json

echo "== plans: inventory + diff vs ${BASELINE_REF}" >&2
git show "${BASELINE_REF}:PLANS.md" > /tmp/gate_plans_base.md \
     2>/dev/null || cp PLANS.md /tmp/gate_plans_base.md
python scripts/plan_inventory.py
python scripts/plan_diff.py /tmp/gate_plans_base.md PLANS.md

echo "GATE PASSED" >&2
