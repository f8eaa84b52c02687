#!/usr/bin/env python3
"""Generate bands.json from a QUIET-session bench sidecar.

Usage: python3 scripts/gen_bands.py [sidecar ...]

Reads one or more target/bench_queries.json records (from full
graft.Bench runs on a quiet box), takes the per-query MIN across all
of them as the expected-min band, and writes bands.json at the repo
root. graft.Bench reads that file at the end of every run and flags
`outliers` (min > band * tolerance_factor + tolerance_floor_sec) in
its artifact, so a driver-side bench inflated by ambient host noise
self-identifies the rows needing an isolated re-measure.

Regenerate (and commit) whenever a query's quiet-gate cost moves for
a REASON — new plan, new query — so the band stays an honest
expectation rather than drifting into either always-green or
always-red.
"""
import json
import sys

def main():
    sidecars = sys.argv[1:] or ["target/bench_queries.json"]
    bands = {}
    for path in sidecars:
        rec = json.load(open(path))
        mins = rec.get("queries_min") or rec.get("queries") or {}
        for name, v in mins.items():
            bands[name] = min(bands.get(name, float("inf")), float(v))
    out = {
        # 2x: the repo's own cross-round regression bar (BASELINE.md)
        "tolerance_factor": 2.0,
        # absolute jitter floor: a 0.1 s band must not flag a 0.3 s
        # ambient wobble; real regressions on sub-second queries are
        # caught by the factor once they cross ~1 s
        "tolerance_floor_sec": 0.75,
        "bands": {k: round(v, 3) for k, v in sorted(bands.items())},
    }
    with open("bands.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"bands.json written: {len(bands)} queries from "
          f"{len(sidecars)} sidecar(s)")

if __name__ == "__main__":
    main()
