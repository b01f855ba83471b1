#!/bin/bash
# Round-2 chip evidence run (VERDICT r1 items 4 + 8): execute the moment
# the TPU tunnel is back.  Runs, in order:
#   1. real-chip parity suite        (pytest -m tpu)
#   2. 13-row best-of-3 bench matrix (results/chip_matrix_r02.json)
#   3. P2 stencil-delta measurement  (results/p2_stencil_delta.json)
#   4. headline bench                (one JSON line, results/)
# Each step logs to results/chip_evidence_r02.log; steps are independent
# (a failure does not stop the next).  After a successful run, refresh
# BASELINE.md's tables from the two JSON artifacts and commit them
# together.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_evidence_r02.log
mkdir -p results
{
  echo "=== chip evidence run $(date -u +%FT%TZ) ==="
  echo "--- 1. tpu parity suite"
  timeout 1800 python -m pytest tests/test_tpu_parity.py -m tpu -q
  echo "rc=$?"
  echo "--- 2. chip matrix (best-of-3 x 13 rows)"
  timeout 5400 python scripts/chip_matrix_r02.py
  echo "rc=$?"
  echo "--- 3. P2 stencil delta"
  timeout 3600 python scripts/p2_stencil_delta.py
  echo "rc=$?"
  echo "--- 4. headline bench"
  timeout 3600 python bench.py
  echo "rc=$?"
  echo "=== done $(date -u +%FT%TZ) ==="
} 2>&1 | tee -a "$LOG"
