"""Interleaved A/B test of the relay-variance attribution (VERDICT r3
item 5).

Four composite matrix rows regressed 10-15% r02->r03 (niir 2297.7->
1984.3, ntsc443 2137.9->1852.8, pal_n 2089.9->1815.2, pal60 2197.4->
1932.1) and the drop was attributed to relay session variance without a
test.  Their code is IDENTICAL across r02/r03 (the round-3 work touched
the transmission layers only), so the attribution is testable by
measuring the four rows REPEATEDLY AND INTERLEAVED in one session
(A B C D A B C D ...): if the within-session spread is >= the r02->r03
delta, "variance" stands; if the rows are tight in-session, the
cross-session deltas were real and need a bisect.

Reuses chip_matrix_r02.py's single-row subprocess protocol unchanged
(one process per measurement, so each gets a fresh relay connection —
the thing that varies).  Appends results/ab_variance_r04.json.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
R02 = os.path.join(HERE, "chip_matrix_r02.py")

#: chip_matrix_r02.CONFIGS indices of the four regressed rows
ROWS = {7: "niir/notch", 8: "ntsc443/notch", 10: "pal_n/comb3",
        11: "pal60/delayline"}
#: the r02 -> r03 Mpix/s pairs being adjudicated
DELTAS = {7: (2297.7, 1984.3), 8: (2137.9, 1852.8),
          10: (2089.9, 1815.2), 11: (2197.4, 1932.1)}

JSON_PATH = "results/ab_variance_r04.json"


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

    verdicts = {}
    for row, name in ROWS.items():
        ms = [m for m in state["meas"][str(row)] if m]
        if len(ms) < 2:
            verdicts[name] = {"verdict": "insufficient data", "meas": ms}
            continue
        spread = (max(ms) - min(ms)) / max(ms)
        r02, r03 = DELTAS[row]
        delta = (r02 - r03) / r02
        verdicts[name] = {
            "meas_mpix_per_s": [round(m, 1) for m in ms],
            "in_session_spread_pct": round(100 * spread, 1),
            "r02_to_r03_delta_pct": round(100 * delta, 1),
            "verdict": ("variance confirmed" if spread >= 0.6 * delta
                        else "tight in-session: cross-session delta real,"
                             " bisect"),
        }
    state["verdicts"] = verdicts
    with open(JSON_PATH, "w") as f:
        json.dump(state, f, indent=1)
    print(json.dumps(verdicts, indent=1))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    main(a.batch, a.iters, a.reps, a.cpu)
