#!/usr/bin/env python3
"""Cross-round per-query bench drift comparison (r14 verdict, next-round
#8): read two durable bench records (the full JSON line Bench emits —
`{"queries": {...}, "meta": {"job_floor_sec": ...}, ...}` — or a bare
`{"name": seconds}` map), normalize by the per-job scheduling floor when
both records carry one (the round-9 lesson: floor moves across sandbox
VM generations masquerade as regressions on byte-identical plans), and
emit a JSON adjudication-candidate report: every query slower than
THRESHOLD x its prior number AND over the absolute floor, plus the
queries that disappeared or appeared.

The output is meant to be committed next to BENCH_rN.json each round
(e.g. BENCH_DRIFT_r15.json) so >2x drifts are FILED, not discovered by
the next judge. Driver-side dev tool, stdlib only. Usage:
    python3 tools/compare_bench.py PREV.json CURR.json [> BENCH_DRIFT_rN.json]
"""
import json
import sys

THRESHOLD = 2.0   # the fresh-session guard's ratio (r14 tightened 3 -> 2)
ABS_FLOOR = 1.0   # seconds — sub-second jitter never files


def load(path):
    with open(path) as f:
        rec = json.load(f)
    if "queries" in rec and isinstance(rec["queries"], dict):
        floor = (rec.get("meta") or {}).get("job_floor_sec")
        return rec["queries"], floor
    return rec, None


def main(prev_path, curr_path):
    prev, prev_floor = load(prev_path)
    curr, curr_floor = load(curr_path)
    floor_ratio = None
    if prev_floor and curr_floor:
        floor_ratio = round(curr_floor / prev_floor, 3)
    drifts = []
    for name in sorted(set(prev) & set(curr)):
        p, c = prev[name], curr[name]
        if p <= 0:
            # Bench rounds to 4 dp, so a sub-0.1 ms prior can record as
            # 0.0. Clamp to the rounding quantum instead of skipping:
            # a genuine regression from a sub-0.1 ms prior to multi-
            # second current must stay visible to drift detection.
            p = 0.0001
        if c > THRESHOLD * p and c > ABS_FLOOR:
            entry = {
                "query": name,
                "prev_sec": round(p, 4),
                "curr_sec": round(c, 4),
                "ratio": round(c / p, 2),
            }
            if floor_ratio:
                entry["floor_normalized_ratio"] = round(
                    (c / curr_floor) / (p / prev_floor), 2)
            drifts.append(entry)
    drifts.sort(key=lambda e: -e["ratio"])
    report = {
        "prev": prev_path,
        "curr": curr_path,
        "threshold": THRESHOLD,
        "abs_floor_sec": ABS_FLOOR,
        "n_common": len(set(prev) & set(curr)),
        "removed": sorted(set(prev) - set(curr)),
        "added": sorted(set(curr) - set(prev)),
        "job_floor_prev_sec": prev_floor,
        "job_floor_curr_sec": curr_floor,
        "job_floor_ratio": floor_ratio,
        "drift_candidates": drifts,
        "verdict": ("CLEAN: no per-query drift over threshold"
                    if not drifts else
                    f"{len(drifts)} drift candidate(s) need adjudication "
                    "(check floor_normalized_ratio first: candidates that "
                    "track the floor ratio are environment, not plans)"),
    }
    json.dump(report, sys.stdout, indent=2)
    print()
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
