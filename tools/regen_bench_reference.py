#!/usr/bin/env python3
"""Regenerate tools/bench_reference.txt from recorded Bench runs.

Usage: python3 tools/regen_bench_reference.py <bench-log>... [-o out-file]

Reads EVERY full per-query JSON line (the ones carrying the complete
"queries" map, not the digest) across all given `graft.Bench` logs; each
such line is one recorded WINDOW. Windows are sanity-checked (runs >= 3
so first-pass JIT bias is absorbed; zero errors; one common sf across
windows) and blended into the reference the comparability check compares
against:

  - windows are first CLASSIFIED clean vs loaded by their calibration
    probe against the cleanest window's (cpu_s > 1.5x the minimum or
    io_s > 2.5x — the same gate Bench uses for `contended`); windows
    without a probe count as clean only when NO window carries one
    (the legacy path);
  - the reference median per query comes from CLEAN windows ONLY (r15
    VERDICT: a loaded window's medians must never shift the center the
    regression check compares against) — each clean window's medians
    divided by its uniform scale, then medianed; at least TWO clean
    windows are required, or the script refuses;
  - the third column is the query's per-side TOLERANCE
    (`# col3: tolerance` directive — Bench reads it directly):
    max(1.6, 1 + 6*worst within-window rel-MAD, 1.25 * worst observed
    cross-window deviation from the window's uniform scale), where the
    deviation term reads ALL windows including loaded ones — that is
    where IO-bound cross-window swings are observable (the r12
    lesson). Sub-second queries cap at 2.8 per side: a loaded window
    must not widen a tiny query's tripwire past ~3x, where a genuine
    2-3x regression would pass silently (r15 VERDICT wrong #2).

Give it every trustworthy window of the round — at least two clean
and, when available, one recorded under load. Every full bench line in
every given log counts as a window: pass logs whose runs all executed
the FINAL code.

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

    # clean/loaded classification, two gates:
    #  1. calibration probe vs the cleanest window (Bench's own
    #     contended gate: cpu >1.5x or io >2.5x the minimum);
    #     probe-less windows pass only on the all-legacy path;
    #  2. the window's own uniform SCALE >1.10x the probe-clean
    #     windows' median scale — the r15 window-D shape: a
    #     sub-saturation co-tenant the probe under-reads while the
    #     whole window runs uniformly 15% hot (the wall clock IS the
    #     evidence the probe missed).
    wcal = [w.get("calibration") if isinstance(w.get("calibration"), dict)
            else None for _, w in windows]
    have_cal = [c for c in wcal if c]
    if have_cal:
        cpu_min = min(c["cpu_s"] for c in have_cal)
        io_min = min(c["io_s"] for c in have_cal)
        probe_clean = [c is not None and c["cpu_s"] <= 1.5 * cpu_min
                       and c["io_s"] <= 2.5 * io_min for c in wcal]
    else:
        probe_clean = [True] * len(windows)
    if not any(probe_clean):
        print("refusing: every window's probe reads contended — record "
              "a clean final-code window first", file=sys.stderr)
        return 1

    def window_scales(ref):
        out = []
        for q in wqs:
            ratios = [q[n] / ref[n] for n in q if ref.get(n, 0) > 0]
            out.append(median(ratios) if ratios else 1.0)
        return out

    def provisional_ref(mask):
        sel = [q for q, c in zip(wqs, mask) if c]
        return {n: median([q[n] for q in sel if n in q])
                for n in names if any(n in q for q in sel)}

    scales0 = window_scales(provisional_ref(probe_clean))
    med_scale = median([s for s, c in zip(scales0, probe_clean) if c])
    clean = [pc and s <= 1.10 * med_scale
             for pc, s in zip(probe_clean, scales0)]
    n_clean = sum(clean)
    if n_clean < 2:
        print(f"refusing: only {n_clean} clean window(s) — the median "
              "needs at least 2 (record another uncontended final-code "
              "window; loaded windows may only feed tolerances)",
              file=sys.stderr)
        return 1

    # final reference center = cross-CLEAN-window median; every window
    # (loaded included) gets a scale against it — the tolerance term
    # below normalizes loaded windows by theirs
    ref0 = provisional_ref(clean)
    scales = window_scales(ref0)

    # medians from CLEAN windows only; tolerance deviation from ALL
    out_lines = []
    for n in names:
        cnorm = [q[n] / s for q, s, c in zip(wqs, scales, clean)
                 if c and n in q]
        if not cnorm:
            # seen only in loaded windows (shouldn't happen with a full
            # registry, but a clean-window query drop must not crash) —
            # fall back to the loaded readings rather than omit the row
            cnorm = [q[n] / s for q, s in zip(wqs, scales) if n in q]
        refv = median(cnorm)
        allnorm = [q[n] / s for q, s in zip(wqs, scales) if n in q]
        dev = (max(max(x / refv, refv / x) for x in allnorm)
               if refv > 0 else 1.0)
        within = max((sp.get(n, 0.0) for sp in wspread), default=0.0)
        tol = max(1.6, 1.0 + 6.0 * within, 1.25 * dev)
        if refv < 1.0:
            # sub-second cap (r15 VERDICT wrong #2): loaded-window swings
            # must not push a tiny query's regression tripwire past ~3x
            tol = min(tol, 2.8)
        out_lines.append(f"{n} {refv:.4f} {tol:.4f}\n")

    total = sum(median([q[n] / s for q, s, c in zip(wqs, scales, clean)
                        if c and n in q] or
                       [q[n] / s for q, s in zip(wqs, scales) if n in q])
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
        for ((path, w), s, q, c) in zip(windows, scales, wqs, clean):
            role = ("clean: feeds col2 medians + col3 tolerance" if c
                    else "LOADED: feeds col3 tolerance only")
            f.write(f"#   {path}: {sum(q.values()):.1f} s, {len(q)} "
                    f"queries, uniform scale {s:.3f} [{role}]\n")
        f.write(
            "# Regenerate with tools/regen_bench_reference.py after an\n"
            "# intentional perf change or when the registry grows; feed\n"
            "# it every trustworthy window of the round (clean AND\n"
            "# loaded).\n"
            "# Columns: <query> <median_sec> <tolerance>. col2 medians\n"
            f"# come from the {n_clean} clean window(s) ONLY; col3 is\n"
            "# the per-side comparability tolerance (1.6-floored,\n"
            "# capped at 2.8 for sub-second medians), built from the\n"
            "# worst cross-window deviation over ALL windows (loaded\n"
            "# included) and the within-window MAD band.\n"
            "# col3: tolerance\n"
            f"# sfdir: {sf}\n" + calib_line)
        f.writelines(out_lines)
    print(f"wrote {out_path}: {len(names)} queries over {len(windows)} "
          f"window(s), {total:.1f} s normalized total, window scales "
          f"{[f'{s:.3f}' for s in scales]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
