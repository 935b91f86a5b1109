#!/usr/bin/env python3
"""Run the DuckDB oracle gate on a SYNTHESIZED corpus dir and emit a
CORRECTNESS-style JSON artifact (r12 verdict #5: extend the oracle gate
one notch up the scale ladder — the driver only provisions
sf0.001/0.01/0.1, so the synth1/synth10 corpora from tools/ScaleSynth
are the next rungs).

Usage: correctness_synth.py <synthDir> <verifyOutDir> <artifact.json> <label>

Expects `graft.Verify <synthDir> <verifyOutDir> <prefix>` to have been
run for every query under test (oracle_sql.json + per-query parquet in
verifyOutDir). Reuses oracle_check.py's compare (same gate the driver
replicates) via subprocess and parses its PASS/FAIL lines. Queries with
no dumped Spark output are treated as not-under-test and skipped.

This is a DEV TOOL ONLY (driver-side python deps).
"""
import datetime
import json
import re
import subprocess
import sys


def main() -> int:
    synth_dir, out_dir, artifact, label = sys.argv[1:5]
    proc = subprocess.run(
        [sys.executable, "scripts/oracle_check.py", synth_dir, out_dir],
        capture_output=True, text=True)
    results = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            results[m.group(1)] = {"status": "pass",
                                   "rows": int(m.group(2))}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            if "no spark output" in m.group(2):
                continue  # not dumped => not under test at this rung
            results[m.group(1)] = {"status": "fail",
                                   "reason": m.group(2)[:300]}
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    doc = {
        "label": label,
        "sf_dir": synth_dir,
        "generated_utc": datetime.datetime.utcnow()
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_fail": len(results) - n_pass,
        "queries": dict(sorted(results.items())),
    }
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{artifact}: {n_pass}/{len(results)} pass")
    return 0 if n_pass == len(results) and results else 1


if __name__ == "__main__":
    sys.exit(main())
