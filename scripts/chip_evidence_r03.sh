#!/bin/bash
# Round-3 chip evidence run (VERDICT r2 item 1): the complete 15-row
# matrix as a COMMITTED artifact.  Runs, in order:
#   1. real-chip parity suite          (pytest -m tpu)
#   2. 15-row best-of-3 bench matrix   (results/chip_matrix_r03.json —
#      RESUMABLE: rerun this script after any interruption; finished
#      rows are skipped)
#   3. P2 stencil-delta re-measurement (results/p2_stencil_delta.json)
#   4. headline bench                  (one JSON line, results/)
# Each step logs to results/chip_evidence_r03.log; steps are independent
# (a failure does not stop the next).  After the matrix prints its
# "done" line, refresh BASELINE.md's tables from the JSON artifacts and
# commit them together.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_evidence_r03.log
mkdir -p results
{
  echo "=== chip evidence run $(date -u +%FT%TZ) ==="
  echo "--- 1. tpu parity suite"
  timeout 1800 python -m pytest tests/test_tpu_parity.py -m tpu -q
  echo "rc=$?"
  echo "--- 2. chip matrix (best-of-3 x 15 rows, resumable)"
  timeout 9000 python scripts/chip_matrix_r03.py --iters 60
  echo "rc=$?"
  echo "--- 3. P2 stencil delta"
  timeout 3600 python scripts/p2_stencil_delta.py
  echo "rc=$?"
  echo "--- 4. headline bench"
  timeout 3600 python bench.py
  echo "rc=$?"
  echo "=== done $(date -u +%FT%TZ) ==="
} 2>&1 | tee -a "$LOG"
