#!/bin/bash
# Round-4 chip evidence run.  The perf-relevant code changed (satellite
# half-rate demod), so per CLAUDE.md the matrix reruns as r04.  Steps:
#   1. real-chip parity suite          (pytest -m tpu — now 3 tests incl.
#      transmission; VERDICT r3 item 6 wants the 3/3 log COMMITTED)
#   2. transmission-hop roofline       (results/sat_roofline_r04.json —
#      new satellite numbers + the per-stage stream-engine bound,
#      VERDICT r3 item 1)
#   3. 15-row best-of-3 bench matrix   (results/chip_matrix_r04.json —
#      RESUMABLE: rerun this script after any interruption)
#   4. interleaved A/B variance test   (results/ab_variance_r04.json —
#      VERDICT r3 item 5; resumable, 3 reps x 4 rows)
#   5. headline bench                  (one JSON line, results/)
# Each step logs to results/chip_evidence_r04.log; steps are independent
# (a failure does not stop the next).  After the matrix prints "done",
# refresh BASELINE.md's tables from the JSON artifacts and commit.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_evidence_r04.log
mkdir -p results
{
  echo "=== chip evidence run $(date -u +%FT%TZ) ==="
  echo "--- 1. tpu parity suite (3 tests)"
  timeout 2700 python -m pytest tests/test_tpu_parity.py -m tpu -q
  echo "rc=$?"
  echo "--- 2. transmission-hop roofline"
  timeout 3600 python scripts/sat_roofline_r04.py
  echo "rc=$?"
  echo "--- 3. chip matrix (best-of-3 x 15 rows, resumable)"
  timeout 9000 python scripts/chip_matrix_r04.py --iters 60
  echo "rc=$?"
  echo "--- 4. interleaved A/B variance (4 regressed rows x 3 reps)"
  timeout 7200 python scripts/ab_variance_r04.py --iters 30 --reps 3
  echo "rc=$?"
  echo "--- 5. headline bench"
  timeout 3600 python bench.py
  echo "rc=$?"
  echo "=== done $(date -u +%FT%TZ) ==="
} 2>&1 | tee -a "$LOG"
