"""Round-4 chip evidence matrix — RESUMABLE (VERDICT r2 item 1; rerun for round 4 because the satellite demod path changed (half-rate rework)).

Both r02 runs died or were cut off mid-matrix because the orchestrator
wrote its JSON only at the end; this one reuses chip_matrix_r02.py's
per-row subprocess protocol unchanged (same shapes, same relay-honest
best-of-3 slope timing, same halving retry) but:

* appends each finished row to ``results/chip_matrix_r04.json`` and
  ``results/chip_evidence_r04.log`` IMMEDIATELY, so a killed run loses at
  most one row;
* on restart, rows already recorded (matched by row index + batch) are
  skipped — rerun to completion after any interruption;
* the previously-uncaptured / round-3-changed rows run FIRST (rf hop,
  d2mac, satellite hop, SECAM-1440) so the highest-value numbers land
  even if the tunnel drops;
* writes a ``done`` marker line when every row is present.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
R02 = os.path.join(HERE, "chip_matrix_r02.py")
sys.path.insert(0, os.path.dirname(HERE))

JSON_PATH = "results/chip_matrix_r04.json"
LOG_PATH = "results/chip_evidence_r04.log"

#: row indices into chip_matrix_r02.py's CONFIGS+SPECIAL list, highest
#: value first: 12=rf-vsb-hop, 13=d2mac, 14=satellite-fm-hop, 4=SECAM
#: interp 1440 (the r02 OOM row), then the composite matrix
ORDER = [12, 13, 14, 4, 0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11]


def _log(msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG_PATH, "a") as f:
        f.write(line + "\n")


def main(batch: int, iters: int, cpu: bool) -> None:
    os.makedirs("results", exist_ok=True)
    state = {"ts": time.time(), "batch": batch, "iters": iters,
             "rows": {}}
    if os.path.exists(JSON_PATH):
        with open(JSON_PATH) as f:
            prev = json.load(f)
        if prev.get("batch") == batch and prev.get("iters") == iters:
            state = prev
            state["rows"] = {int(k): v for k, v in state["rows"].items()}
            _log(f"resume: {len(state['rows'])}/{len(ORDER)} rows present")
        else:
            _log("existing JSON has different batch/iters — starting fresh")

    for row in ORDER:
        if row in state["rows"] and "error" not in state["rows"][row]:
            continue
        row_json = None
        for b in (batch, batch // 2, batch // 4):
            if b < 1:
                break
            cmd = [sys.executable, R02, "--row", str(row),
                   "--batch", str(b), "--iters", str(iters)]
            if cpu:
                cmd.append("--cpu")
            t0 = time.time()
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=3000)
            except subprocess.TimeoutExpired:
                _log(f"row {row} batch {b}: timeout")
                continue
            lines = [ln for ln in p.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if p.returncode == 0 and lines:
                row_json = json.loads(lines[-1])
                if b != batch:
                    row_json["batch_reduced_from"] = batch
                row_json["wall_s"] = round(time.time() - t0, 1)
                break
            tail = p.stderr.strip().splitlines()[-1:] if p.stderr else []
            _log(f"row {row} failed at batch {b} (rc={p.returncode}); "
                 f"tail: {tail}")
        if row_json is None:
            row_json = {"row": row, "error": "failed at every batch size"}
        state["rows"][row] = row_json
        with open(JSON_PATH, "w") as f:
            json.dump({**state,
                       "rows": {str(k): v for k, v in state["rows"].items()}},
                      f, indent=1)
        _log(f"row {row}: {json.dumps(row_json)}")

    missing = [r for r in ORDER
               if r not in state["rows"] or "error" in state["rows"][r]]
    if missing:
        _log(f"INCOMPLETE: rows {missing} missing/failed — rerun to resume")
        sys.exit(1)
    _log(f"done: all {len(ORDER)} rows recorded in {JSON_PATH}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU validation only — do NOT commit CPU artifacts")
    a = ap.parse_args()
    main(a.batch, a.iters, a.cpu)
