#!/usr/bin/env python3
"""Regenerate BENCH_BASELINE_QUERIES.json (the bench canary's committed
per-query floor) from a full `graft.Bench` run's stdout log.

Usage: python3 tools/make_bench_baseline.py <bench_log> [out_json]

Reads the `total_detail` line (per-query [min, median, max]) and the final
machine line (cpu_probe_s, sf), writes {sf, cpu_probe_s, queries: {name:
min}}. Commit the output; graft.Bench compares every later run against it
(see graft.BenchCanary).
"""
import json
import sys


def main() -> None:
    log_path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE_QUERIES.json"
    detail = machine = None
    with open(log_path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            # sbt prefixes nothing on stdout println lines, but be tolerant
            i = line.find('{"metric":')
            if i < 0:
                continue
            obj = json.loads(line[i:])
            if obj.get("metric") == "total_detail":
                detail = obj
            elif obj.get("metric") == "total":
                machine = obj
    if detail is None or machine is None:
        sys.exit("log has no total_detail/total lines — not a full bench run")
    mins = {name: cells[0] for name, cells in detail["queries"].items()
            if cells and cells[0] >= 0}
    out = {
        "sf": machine["sf"],
        "cpu_probe_s": machine["cpu_probe_s"],
        "stat": "min_of_3",
        "queries": dict(sorted(mins.items())),
    }
    # memory-bandwidth vintage (round-15-late): when the committed
    # baseline carries it, BenchCanary normalizes with the more
    # forgiving of the cpu/mem probe ratios
    if "mem_probe_s" in machine:
        out["mem_probe_s"] = machine["mem_probe_s"]
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}: {len(mins)} queries, "
          f"cpu_probe_s={out['cpu_probe_s']}, sf={out['sf']}")


if __name__ == "__main__":
    main()
