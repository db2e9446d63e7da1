#!/usr/bin/env bash
# Cross-sf verification sweep: run the full driver contract (Verify dump +
# DuckDB oracle compare) at MULTIPLE scale factors and diff the verdicts.
# Edge rows that only exist at some scales (empty groups, sub-threshold
# buckets, single-member clusters) get covered by the sf the driver does
# NOT run; a query green at sf0.01 but red at sf0.001 is a latent bug.
#
# Usage: tools/sweep.sh [sf ...]    (default: 0.001 0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
sfs=("${@:-0.001 0.01}")
[ $# -eq 0 ] && sfs=(0.001 0.01)
fail=0
for sf in "${sfs[@]}"; do
  out="/tmp/graft_sweep_sf${sf}"
  echo "=== sf${sf}: Verify → ${out}"
  sbt -batch "runMain graft.Verify /root/testdata/sf${sf} ${out}" \
    > "/tmp/graft_sweep_sf${sf}.log" 2>&1 || { echo "VERIFY FAILED sf${sf}"; fail=1; continue; }
  grep "\[verify\].*failed" "/tmp/graft_sweep_sf${sf}.log" && fail=1
  echo "=== sf${sf}: DuckDB oracle compare"
  # Run check.py ONCE and grep the captured output. Piping check.py
  # straight into `grep -q` is a trap under pipefail: grep -q exits at
  # the first match, SIGPIPE kills check.py (141), the pipeline goes
  # non-zero, and `&& fail=1` is skipped EXACTLY when a FAIL line exists.
  check_out="$(python3 tools/check.py "/root/testdata/sf${sf}" "${out}")"
  printf '%s\n' "${check_out}" | tail -3
  [ "$(printf '%s\n' "${check_out}" | grep -c '^FAIL')" -gt 0 ] && fail=1
done
exit $fail
