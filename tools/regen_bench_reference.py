#!/usr/bin/env python3
"""Regenerate tools/bench_reference.txt from a recorded Bench run.

Usage: python3 tools/regen_bench_reference.py <bench-log> [out-file]

Reads the FULL per-query JSON line (the one carrying the complete
"queries" map, not the digest) from a `graft.Bench` log, sanity-checks
it (runs >= 3 so first-pass JIT bias is absorbed; zero errors; the sf
named in the line), and rewrites the reference file the comparability
check compares against. Run this after an INTENTIONAL perf change or
when new queries join the registry — never from a single-pass or
errored run, and never from a run at a different scale factor than the
one the driver benches (the `# sfdir:` directive records it; Bench
refuses cross-sf comparisons).
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    out_path = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_reference.txt"
    full = None
    with open(sys.argv[1]) as f:
        for line in f:
            if '"metric"' not in line:
                continue
            payload = line.split("[info] ", 1)[-1].strip()
            try:
                d = json.loads(payload)
            except json.JSONDecodeError:
                continue
            if "queries" in d:  # the digest line carries queries_n instead
                full = d
    if full is None:
        print("no full bench JSON line found", file=sys.stderr)
        return 1
    if full.get("runs", 0) < 3:
        print(f"refusing: runs={full.get('runs')} < 3 — single-pass "
              "medians carry first-run JIT bias", file=sys.stderr)
        return 1
    if full.get("errors"):
        print(f"refusing: errored queries {sorted(full['errors'])}",
              file=sys.stderr)
        return 1
    qs = {k: v for k, v in full["queries"].items() if v > 0}
    # relative MAD across the run's passes (Bench's "spread" map, added
    # r12) becomes the third column: Bench.comparabilityJson widens that
    # query's outlier tolerance to max(1.6, 1 + 6*rel_mad). Older logs
    # without the map write two columns (global 1.6 everywhere).
    spread = full.get("spread", {})
    total = sum(qs.values())
    with open(out_path, "w") as f:
        f.write(
            "# Reference per-query medians for Bench's comparability "
            "check.\n"
            f"# Source: {full['runs']}-run medians at {full['sf']}, "
            f"local[{full['cpus']}],\n"
            f"# {len(qs)} queries, {total:.1f} s total, zero errors.\n"
            "# Regenerate with tools/regen_bench_reference.py after an\n"
            "# intentional perf change or when the registry grows.\n"
            "# Columns: <query> <median_sec> [<rel_mad>] - the third\n"
            "# widens that query's comparability tolerance per its own\n"
            "# recorded run-to-run band.\n"
            f"# sfdir: {full['sf']}\n")
        for name in sorted(qs):
            if name in spread:
                f.write(f"{name} {qs[name]:.4f} {spread[name]:.4f}\n")
            else:
                f.write(f"{name} {qs[name]:.4f}\n")
    print(f"wrote {out_path}: {len(qs)} queries, {total:.1f} s total, "
          f"{len(spread)} with spread")
    return 0


if __name__ == "__main__":
    sys.exit(main())
