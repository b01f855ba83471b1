"""Round-5 niir bisect-or-close (VERDICT r4 item 9).

The niir r02 reading (2297.7 Mpix/s) was never reproduced: seven
measurements across two later sessions land 1984-2101, a ~9% residual
the variance adjudication could not resolve under the demonstrated ~2x
per-connection noise floor — ab_variance_r04.json itself tagged the row
"tight in-session: cross-session delta real, bisect" before the prose
overruled it.  This script runs the decisive experiment the verdict
asked for: niir interleaved against a DELIBERATELY-VARIED sibling
(ntsc443 notch — same notch code path, different standard constants)
across >= 6 fresh subprocess connections each (A B A B ...).

Decision rule, recorded in the artifact:
* if niir's cross-connection band stays within ~10% while ntsc443 swings
  >= 1.5x (its demonstrated behavior), the r02 2297.7 is adjudicated "a
  fast-backend draw, unreproducible" and the row stops being tracked;
* if niir itself swings >= 1.5x across these connections, the r02 value
  was ordinary variance and there was never a regression to bisect;
* only if niir is tight AND its band contains neither ~2298 nor the
  1984-2101 r03/r04 band does a code bisect remain on the table.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
R02 = os.path.join(HERE, "chip_matrix_r02.py")

ROWS = {7: "niir/notch", 8: "ntsc443/notch"}
JSON_PATH = "results/niir_ab_r05.json"


def main(batch: int, iters: int, reps: int, cpu: bool) -> None:
    os.makedirs("results", exist_ok=True)
    state = {"ts": time.time(), "batch": batch, "iters": iters,
             "order": [], "meas": {str(r): [] for r in ROWS}}
    if os.path.exists(JSON_PATH):
        with open(JSON_PATH) as f:
            prev = json.load(f)
        if prev.get("batch") == batch and prev.get("iters") == iters:
            state = prev
    done = min(len(v) for v in state["meas"].values())
    for rep in range(done, reps):
        for row in ROWS:
            if len(state["meas"][str(row)]) > rep:
                continue
            cmd = [sys.executable, R02, "--row", str(row),
                   "--batch", str(batch), "--iters", str(iters)]
            if cpu:
                cmd.append("--cpu")
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=2400)
            except subprocess.TimeoutExpired:
                print(f"rep {rep} row {row}: timeout", flush=True)
                continue
            lines = [ln for ln in p.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if p.returncode == 0 and lines:
                rj = json.loads(lines[-1])
                mp = rj.get("mpix_per_s")
                state["meas"][str(row)].append(mp)
                state["order"].append([row, mp])
                print(f"rep {rep} {ROWS[row]}: {mp} Mpix/s", flush=True)
            else:
                tail = p.stderr.strip().splitlines()[-1:] if p.stderr else []
                print(f"rep {rep} row {row} FAILED: {tail}", flush=True)
            with open(JSON_PATH, "w") as f:
                json.dump(state, f, indent=1)

    niir = [m for m in state["meas"]["7"] if m]
    sib = [m for m in state["meas"]["8"] if m]
    verdict = {"niir_meas": niir, "ntsc443_meas": sib}
    if len(niir) >= 4 and len(sib) >= 4:
        n_spread = (max(niir) - min(niir)) / max(niir)
        s_spread = (max(sib) - min(sib)) / max(sib)
        verdict["niir_spread_pct"] = round(100 * n_spread, 1)
        verdict["ntsc443_spread_pct"] = round(100 * s_spread, 1)
        if n_spread >= 0.33:
            verdict["verdict"] = (
                "niir itself swings across connections: the r02 2297.7 was "
                "ordinary per-connection variance — closed, stop tracking"
            )
        elif max(niir) >= 2200.0:
            verdict["verdict"] = (
                "niir reproduced its r02 band on a fresh connection — "
                "closed, the r03/r04 readings drew slower backends"
            )
        elif s_spread >= 0.8 * n_spread + 0.1:
            verdict["verdict"] = (
                "niir band tight while the sibling swings: r02 2297.7 "
                "adjudicated a fast-backend draw, unreproducible — closed, "
                "stop tracking (record in BASELINE.md)"
            )
        else:
            verdict["verdict"] = (
                "both rows tight and niir off both known bands — a code "
                "bisect remains on the table"
            )
    else:
        verdict["verdict"] = "insufficient data"
    state["verdict"] = verdict
    with open(JSON_PATH, "w") as f:
        json.dump(state, f, indent=1)
    print(json.dumps(verdict, indent=1))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    main(a.batch, a.iters, a.reps, a.cpu)
