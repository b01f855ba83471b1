#!/bin/bash
# Round-5 chip evidence run.  Perf-relevant evidence changed shape this
# round (variance-aware matrix, post-fold roofline restatement, first
# sound-chain rows, niir closure).  Steps:
#   1. real-chip parity suite          (pytest -m tpu — 4 tests)
#   2. post-fold hop roofline          (results/sat_roofline_r05.json —
#      retries on fresh connections until the stage fractions are usable,
#      VERDICT r4 item 5)
#   3. 17-row variance-aware matrix    (results/chip_matrix_r05.json —
#      RESUMABLE; cross-round-median outlier rows re-measure on fresh
#      connections and carry `corroborated`, VERDICT r4 item 4; includes
#      the two NEW sound rows, VERDICT r4 item 6)
#   4. niir interleaved A/B closure    (results/niir_ab_r05.json —
#      6 reps x {niir, ntsc443}, VERDICT r4 item 9)
#   5. headline bench                  (one JSON line, results/)
# Each step logs to results/chip_evidence_r05.log; steps are independent
# (a failure does not stop the next).  After the matrix prints "done",
# refresh BASELINE.md's tables from the JSON artifacts and commit.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_evidence_r05.log
mkdir -p results
{
  echo "=== chip evidence run $(date -u +%FT%TZ) ==="
  echo "--- 1. tpu parity suite (4 tests)"
  timeout 3600 python -m pytest tests/test_tpu_parity.py -m tpu -q
  echo "rc=$?"
  echo "--- 2. post-fold hop roofline (fresh-connection retries)"
  timeout 14400 python scripts/sat_roofline_r05.py
  echo "rc=$?"
  echo "--- 3. variance-aware chip matrix (17 rows incl. sound, resumable)"
  timeout 14400 python scripts/chip_matrix_r05.py --iters 60
  echo "rc=$?"
  echo "--- 4. niir A/B closure (6 reps x 2 rows)"
  timeout 10800 python scripts/niir_ab_r05.py --iters 30 --reps 6
  echo "rc=$?"
  echo "--- 5. headline bench"
  timeout 3600 python bench.py
  echo "rc=$?"
  echo "=== done $(date -u +%FT%TZ) ==="
} 2>&1 | tee -a "$LOG"
