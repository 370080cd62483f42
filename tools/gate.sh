#!/bin/bash
# End-of-round self-gate (VERDICT r9 item 1): run graft.Verify + the gate
# compare on the CURRENT commit and write a SHA-stamped artifact to
# artifacts/correctness_r<N>.json, so the driver's own gate file can be
# reconciled against a committed, known-commit result — a stale driver
# capture (the r9 phantom hash-fails) is then provably stale.
#
# Usage: tools/gate.sh <roundN> [sfDir]   (default sfDir /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/gate.sh <roundN> [sfDir]}"
SF="${2:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft-gate-XXXX)"
sbt -batch "runMain graft.Verify $SF $OUT" >"$OUT/verify.log" 2>&1 || {
  tail -30 "$OUT/verify.log"; echo "Verify FAILED"; exit 1; }
GATE_JSON="artifacts/correctness_r${ROUND}.json" python3 tools/compare.py "$SF" "$OUT"
# second pass with the DRIVER-faithful comparator (pandas frames, sorted by
# every column): catches what the duckdb-read canon structurally cannot —
# complex-typed output cells (the r11 'unhashable ndarray' errors) and
# Decimal-vs-float repr seams (the r11 q91 hash-red)
python3 tools/driver_compare.py "$SF" "$OUT"
