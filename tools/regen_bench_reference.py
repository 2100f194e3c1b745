#!/usr/bin/env python3
"""Regenerate tools/bench_reference.txt from recorded Bench runs.

Usage: python3 tools/regen_bench_reference.py <bench-log>... [-o out-file]

Reads EVERY full per-query JSON line (the ones carrying the complete
"queries" map, not the digest) across all given `graft.Bench` logs; each
such line is one recorded WINDOW. Windows are sanity-checked (runs >= 3
so first-pass JIT bias is absorbed; zero errors; one common sf across
windows) and blended into the reference the comparability check compares
against:

  - the reference median per query is the median of its per-window
    medians AFTER dividing out each window's uniform scale (host
    contention scales a window's queries together; normalizing it out
    leaves the clean-window-equivalent cost);
  - the third column is the query's per-side TOLERANCE
    (`# col3: tolerance` directive — Bench reads it directly):
    max(1.6, 1 + 6*worst within-window rel-MAD, 1.25 * worst observed
    cross-window deviation from the window's uniform scale). The
    cross-window term is the r12 lesson: IO-bound queries swing 2-3x
    BETWEEN contention windows while a clean window's internal spread
    is near zero, so a within-window-only band under-models exactly
    the variance the check exists to absorb.

Give it every trustworthy window of the round — at least one clean and,
when available, one recorded under load (that is where the IO-bound
deviation is observable). A single window degrades gracefully to the
within-window band. Every full bench line in every given log counts as
a window: pass logs whose runs all executed the FINAL code.

Run after an INTENTIONAL perf change or when new queries join the
registry — never from single-pass or errored runs, and never across
scale factors (the `# sfdir:` directive records it; Bench refuses
cross-sf comparisons).
"""
import json
import sys
from statistics import median


def parse_windows(paths):
    windows = []
    for path in paths:
        with open(path) as f:
            for line in f:
                if '"metric"' not in line:
                    continue
                payload = line.split("[info] ", 1)[-1].strip()
                try:
                    d = json.loads(payload)
                except json.JSONDecodeError:
                    continue
                if "queries" in d:  # digest lines carry queries_n instead
                    windows.append((path, d))
    return windows


def main() -> int:
    args = sys.argv[1:]
    out_path = "tools/bench_reference.txt"
    if "-o" in args:
        i = args.index("-o")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if not args:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    windows = parse_windows(args)
    if not windows:
        print("no full bench JSON line found", file=sys.stderr)
        return 1
    for path, w in windows:
        if w.get("filtered"):
            print(f"refusing: {path} has a SPARK_GRAFT_BENCH_ONLY window "
                  "— a partial query map is not a recorded window",
                  file=sys.stderr)
            return 1
        if w.get("runs", 0) < 3:
            print(f"refusing: {path} has a window with runs="
                  f"{w.get('runs')} < 3 — single-pass medians carry "
                  "first-run JIT bias", file=sys.stderr)
            return 1
        if w.get("errors"):
            print(f"refusing: {path} window has errored queries "
                  f"{sorted(w['errors'])}", file=sys.stderr)
            return 1
    sfs = {w["sf"] for _, w in windows}
    if len(sfs) != 1:
        print(f"refusing: windows span scale factors {sorted(sfs)}",
              file=sys.stderr)
        return 1
    sf = sfs.pop()

    # per-window positive medians and spreads
    wqs = [{k: v for k, v in w["queries"].items() if v > 0}
           for _, w in windows]
    wspread = [w.get("spread", {}) for _, w in windows]
    names = sorted(set().union(*[set(q) for q in wqs]))

    # provisional reference = cross-window median, for estimating each
    # window's uniform scale
    ref0 = {n: median([q[n] for q in wqs if n in q]) for n in names}
    scales = []
    for q in wqs:
        ratios = [q[n] / ref0[n] for n in q if ref0[n] > 0]
        scales.append(median(ratios) if ratios else 1.0)

    # scale-normalized medians + tolerance components
    out_lines = []
    for n in names:
        norm = [q[n] / s for q, s in zip(wqs, scales) if n in q]
        refv = median(norm)
        dev = max(max(x / refv, refv / x) for x in norm) if refv > 0 else 1.0
        within = max((sp.get(n, 0.0) for sp in wspread), default=0.0)
        tol = max(1.6, 1.0 + 6.0 * within, 1.25 * dev)
        out_lines.append(f"{n} {refv:.4f} {tol:.4f}\n")

    total = sum(median([q[n] / s for q, s in zip(wqs, scales) if n in q])
                for n in names)
    # calibration baseline — Bench compares its own probe against this
    # to classify a window as contended (machine-attributable) instead
    # of leaving an outlier cluster for a judge to adjudicate. The
    # baseline is the MINIMUM across windows, not the median: the
    # workflow deliberately records loaded windows to teach the
    # tolerance model, and a loaded-majority rebuild would inflate a
    # median baseline until genuinely contended runs read clean — the
    # minimum is the machine at its cleanest, which is what "contended
    # relative to" must mean. The probe's thread count rides along:
    # mean-wall ratios are only comparable at one thread count, and
    # Bench refuses a mismatch.
    calibs = [w["calibration"] for _, w in windows
              if isinstance(w.get("calibration"), dict)]
    calib_line = ""
    if calibs:
        threads = sorted({c["threads"] for c in calibs if "threads" in c})
        if len(threads) > 1:
            # Mixed thread counts: mean-wall probe readings are only
            # comparable at ONE thread count, and Bench treats a
            # threads-less directive as the legacy compare-anyway path —
            # so restrict the baseline to the windows at the MODAL
            # thread count rather than silently mixing incomparable
            # readings (refuse-rather-than-misclassify, per Bench's
            # contract). Ties break to the higher count (more windows
            # are probed at the full box than at an odd restriction).
            counts = {t: sum(1 for c in calibs if c.get("threads") == t)
                      for t in threads}
            modal = max(threads, key=lambda t: (counts[t], t))
            dropped = [t for t in threads if t != modal]
            calibs = [c for c in calibs if c.get("threads") == modal]
            print("warning: windows probed with differing thread counts "
                  f"{threads} — baseline restricted to the {counts[modal]}"
                  f" window(s) at modal threads={modal}; ignored probe(s) "
                  f"at {dropped}", file=sys.stderr)
        cpu = min(c["cpu_s"] for c in calibs)
        io = min(c["io_s"] for c in calibs)
        thr = next((c["threads"] for c in calibs if "threads" in c), None)
        thr_part = f" threads={thr}" if thr is not None else ""
        spread = max(c["cpu_s"] for c in calibs) / cpu
        if spread > 2.0:
            print(f"note: calibration cpu spread {spread:.1f}x across "
                  "windows (loaded windows present) — baseline uses the "
                  "cleanest window", file=sys.stderr)
        calib_line = f"# calibration: cpu_s={cpu:.3f} io_s={io:.3f}{thr_part}\n"
    with open(out_path, "w") as f:
        f.write(
            "# Reference per-query medians for Bench's comparability "
            "check.\n"
            f"# Source: {len(windows)} window(s), runs>=3 each, zero "
            f"errors, at {sf};\n"
            f"# {len(names)} queries, {total:.1f} s scale-normalized "
            "total. Window scales:\n")
        for (path, w), s, q in zip(windows, scales, wqs):
            f.write(f"#   {path}: {sum(q.values()):.1f} s, {len(q)} "
                    f"queries, uniform scale {s:.3f}\n")
        f.write(
            "# Regenerate with tools/regen_bench_reference.py after an\n"
            "# intentional perf change or when the registry grows; feed\n"
            "# it every trustworthy window of the round (clean AND\n"
            "# loaded).\n"
            "# Columns: <query> <median_sec> <tolerance> - col3 is the\n"
            "# per-side comparability tolerance (1.6-floored), built\n"
            "# from the worst observed cross-window deviation and the\n"
            "# within-window MAD band.\n"
            "# col3: tolerance\n"
            f"# sfdir: {sf}\n" + calib_line)
        f.writelines(out_lines)
    print(f"wrote {out_path}: {len(names)} queries over {len(windows)} "
          f"window(s), {total:.1f} s normalized total, window scales "
          f"{[f'{s:.3f}' for s in scales]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
