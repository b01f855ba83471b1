"""Round-5 chip evidence matrix — RESUMABLE and VARIANCE-AWARE.

The r04 matrix shipped two rows its own adjudication called ~2x wrong
(pal comb3 1139.7, pal60 1102.0 — per-connection backend roulette;
BASELINE.md "never attribute <2x deltas without an interleaved A/B"),
with the correction living in prose.  This orchestrator applies that rule
to the artifact itself (VERDICT r4 item 4):

* each row runs in its own subprocess (fresh relay connection), same
  relay-honest best-of-3 slope protocol as chip_matrix_r02.py;
* after a row lands, its Mpix/s is compared against the CROSS-ROUND
  MEDIAN (loaded from the committed r02/r03/r04 JSONs): a deviation
  beyond 1.5x in either direction triggers an immediate RE-MEASURE on a
  fresh subprocess connection (up to 2 retries); every measurement is
  recorded in ``measurements`` and the row's headline ``mpix_per_s`` is
  the best of them (relay noise only ever slows a row down);
* each row carries ``corroborated``: true when its headline is within
  1.5x of the cross-round median OR a re-measure agreed with the first
  reading within 25% (two fresh connections agreeing IS the
  corroboration for a genuinely-changed row), so no uncorroborated
  outlier can ship as a bare number again.

Also appends the two NEW sound rows (VERDICT r4 item 6, via
chip_rows_r05.py): the RF hop with FM mono + NICAM, and the satellite
hop with the audio subcarrier ladder — the flagship "television WITH
SOUND" paths' first chip numbers.
"""

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
R02 = os.path.join(HERE, "chip_matrix_r02.py")
R05S = os.path.join(HERE, "chip_rows_r05.py")
sys.path.insert(0, os.path.dirname(HERE))

JSON_PATH = "results/chip_matrix_r05.json"
LOG_PATH = "results/chip_evidence_r05.log"

#: rows 0-14 = chip_matrix_r02.py indices (priority order: hops + the
#: previously-flagged variance rows first); "rf-sound"/"sat-sound" = the
#: new sound rows (chip_rows_r05.py)
ORDER = ["rf-sound", "sat-sound", 12, 14, 13, 11, 2,
         0, 1, 3, 4, 5, 6, 7, 8, 9, 10]

#: cross-round medians come from these committed artifacts
PRIOR_JSONS = ["results/chip_matrix_r02.json", "results/chip_matrix_r03.json",
               "results/chip_matrix_r04.json"]


def _log(msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG_PATH, "a") as f:
        f.write(line + "\n")


def _row_key(rj: dict) -> tuple:
    return (rj.get("standard"), rj.get("decoder"),
            tuple(rj.get("shape", [])[1:]))


def _load_priors() -> dict:
    """(standard, decoder, (lines, samples)) -> [Mpix/s across rounds]."""
    priors: dict = {}
    for path in PRIOR_JSONS:
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        rows = data.get("rows")
        rows = rows.values() if isinstance(rows, dict) else rows
        for rj in rows:
            mp = rj.get("mpix_per_s")
            if mp:
                priors.setdefault(_row_key(rj), []).append(mp)
    return priors


def _run_once(row, batch: int, iters: int, cpu: bool):
    """One subprocess measurement (fresh relay connection); returns the
    row JSON or None."""
    if isinstance(row, str):
        cmd = [sys.executable, R05S, "--row", row,
               "--batch", str(batch), "--iters", str(iters)]
    else:
        cmd = [sys.executable, R02, "--row", str(row),
               "--batch", str(batch), "--iters", str(iters)]
    if cpu:
        cmd.append("--cpu")
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
    except subprocess.TimeoutExpired:
        _log(f"row {row}: timeout")
        return None
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if p.returncode == 0 and lines:
        return json.loads(lines[-1])
    tail = p.stderr.strip().splitlines()[-1:] if p.stderr else []
    _log(f"row {row} failed (rc={p.returncode}); tail: {tail}")
    return None


def _measure_row(row, batch: int, iters: int, cpu: bool, priors: dict):
    """Measure with halving-batch fallback, then variance adjudication."""
    rj = None
    for b in (batch, batch // 2, batch // 4):
        if b < 1:
            break
        t0 = time.time()
        rj = _run_once(row, b, iters, cpu)
        if rj is not None:
            if b != batch:
                rj["batch_reduced_from"] = batch
            rj["wall_s"] = round(time.time() - t0, 1)
            break
    if rj is None or not rj.get("mpix_per_s"):
        return rj

    meas = [rj["mpix_per_s"]]
    prior = priors.get(_row_key(rj))
    median = statistics.median(prior) if prior else None
    rj["cross_round_median"] = median

    def _ok(v):
        return median is not None and median / 1.5 <= v <= median * 1.5

    retries = 0
    while median is not None and not _ok(max(meas)) and retries < 2:
        _log(f"row {row}: {max(meas)} vs cross-round median {median} "
             "deviates >1.5x — re-measuring on a fresh connection")
        retries += 1
        r2 = _run_once(row, rj["shape"][0], iters, cpu)
        if r2 is not None and r2.get("mpix_per_s"):
            meas.append(r2["mpix_per_s"])
            if abs(meas[-1] - meas[0]) <= 0.25 * max(meas):
                break  # two fresh connections agree: genuinely changed

    rj["measurements"] = meas
    rj["mpix_per_s"] = max(meas)
    rj["corroborated"] = bool(
        _ok(rj["mpix_per_s"])
        or (len(meas) >= 2
            and abs(meas[-1] - meas[0]) <= 0.25 * max(meas))
        or median is None  # new row: no priors to corroborate against
    )
    return rj


def main(batch: int, iters: int, cpu: bool) -> None:
    os.makedirs("results", exist_ok=True)
    priors = _load_priors()
    state = {"ts": time.time(), "batch": batch, "iters": iters, "rows": {}}
    if os.path.exists(JSON_PATH):
        with open(JSON_PATH) as f:
            prev = json.load(f)
        if prev.get("batch") == batch and prev.get("iters") == iters:
            state = prev
            _log(f"resume: {len(state['rows'])}/{len(ORDER)} rows present")
        else:
            _log("existing JSON has different batch/iters — starting fresh")

    for row in ORDER:
        key = str(row)
        if key in state["rows"] and "error" not in state["rows"][key]:
            continue
        rj = _measure_row(row, batch, iters, cpu, priors)
        if rj is None:
            rj = {"row": key, "error": "failed at every batch size"}
        state["rows"][key] = rj
        with open(JSON_PATH, "w") as f:
            json.dump(state, f, indent=1)
        _log(f"row {row}: {json.dumps(rj)}")

    missing = [str(r) for r in ORDER
               if str(r) not in state["rows"]
               or "error" in state["rows"][str(r)]]
    if missing:
        _log(f"INCOMPLETE: rows {missing} missing/failed — rerun to resume")
        sys.exit(1)
    uncorr = [k for k, v in state["rows"].items()
              if not v.get("corroborated")]
    _log(f"done: all {len(ORDER)} rows recorded in {JSON_PATH}"
         + (f"; UNCORROBORATED rows remain: {uncorr}" if uncorr else
            "; every row corroborated"))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU validation only — do NOT commit CPU artifacts")
    a = ap.parse_args()
    main(a.batch, a.iters, a.cpu)
