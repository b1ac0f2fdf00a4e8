#!/usr/bin/env bash
# One-command round gate: every check the driver/judge runs, in the
# order that fails fastest. Usage: scripts/run_all_checks.sh [round_n]
# (round_n writes PARITY_r{N}.json). Each step's command is the same
# one documented in .claude/skills/verify/SKILL.md.
set -uo pipefail
cd "$(dirname "$0")/.."

round="${1:-}"
fail=0
step() {
  echo "==== $1"
  shift
  "$@" || { echo "^^^^ FAILED: $*"; fail=1; }
}

step "testdata schema drift (fails fast on harness regeneration)" \
  python scripts/check_schemas.py

step "floor coverage (every registered query armed or excluded)" \
  python scripts/check_floor_coverage.py

step "full pytest" \
  python -m pytest tests/ -q

step "oracle parity, engine session, sf0.001" \
  python scripts/check_parity.py /root/testdata/sf0.001

step "oracle parity, DRIVER-DEFAULT ANSI session, odd TZ, sf0.01" \
  env TZ=America/Santiago SPARK_GRAFT_PARITY_DEFAULT_SESSION=1 \
  python scripts/check_parity.py /root/testdata/sf0.01

if [ -n "$round" ]; then
  step "full-registry parity artifact -> PARITY_r${round}.json" \
    env SPARK_GRAFT_PARITY_OUT="PARITY_r${round}.json" \
    python scripts/check_parity.py /root/testdata/sf0.01
fi

step "codegen health (expect: codegen fallback lines: 0)" \
  python scripts/check_codegen.py

step "bench (read machine_factor + regressions in the JSON line)" \
  python bench.py

exit $fail
