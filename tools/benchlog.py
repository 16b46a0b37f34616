#!/usr/bin/env python3
"""Summarize a graft.Bench stderr log: per-query best time, rep pair,
gc/codegen/jobs/tasks diag, sorted by best time descending; plus
aggregate totals and the canary line. Usage: benchlog.py <stderr-log>
[topN]"""
import re, sys

def main(path, top=40):
    pat = re.compile(
        r"\[bench\] (\S+) ([0-9.]+)s \(([0-9./]+)\) gc=(\d+)ms "
        r"codegen=(\d+)(?: resid=(\d+)blk/(\d+)MB)?"
        r"(?: jobs=(\d+) tasks=(\d+))?")
    rows = []
    canary = None
    for line in open(path, errors="replace"):
        m = pat.search(line)
        if m:
            rows.append((m.group(1), float(m.group(2)), m.group(3),
                         int(m.group(4)), int(m.group(5)),
                         int(m.group(8) or 0), int(m.group(9) or 0)))
        if "[bench] canary:" in line:
            canary = line.strip().split("canary: ", 1)[1]
    rows.sort(key=lambda r: -r[1])
    total = sum(r[1] for r in rows)
    print(f"queries={len(rows)} total_best={total:.1f}s canary={canary}")
    print(f"{'query':38s} {'best':>7s} {'reps':>14s} {'gc_ms':>7s} "
          f"{'cgen':>5s} {'jobs':>5s} {'tasks':>7s} {'s/job':>6s}")
    for name, dt, reps, gc, cg, jobs, tasks in rows[:top]:
        spj = dt * 2 / jobs if jobs else 0  # jobs span both reps
        print(f"{name:38s} {dt:7.2f} {reps:>14s} {gc:7d} {cg:5d} "
              f"{jobs:5d} {tasks:7d} {spj:6.3f}")
    print(f"... tail ({len(rows) - top} queries): "
          f"{sum(r[1] for r in rows[top:]):.1f}s")

if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
