#!/usr/bin/env python3
"""Sync the README's test-count line from an actual `sbt test` log.

The run-instructions comment in README.md ("# N unit/property checks")
drifted twice when maintained by hand. This script derives the number
from the suite itself: point it at a captured `sbt test` log, it greps
the final summary line sbt prints ("Tests: succeeded N, failed 0, ...")
and rewrites the README comment in place. Refuses to sync a failing run.

Usage: python3 tools/sync_readme_testcount.py <sbt-test-log> [README.md]
"""
import re
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    log_path = sys.argv[1]
    readme_path = sys.argv[2] if len(sys.argv) > 2 else "README.md"

    with open(log_path, "r", errors="replace") as f:
        log = f.read()
    # sbt aggregates scalatest results into one final line per run; take
    # the LAST match so partial/per-suite lines never win.
    matches = re.findall(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), ignored (\d+)",
        log,
    )
    if not matches:
        print("no 'Tests: succeeded N' summary line found in %s" % log_path,
              file=sys.stderr)
        return 1
    succeeded, failed, canceled, ignored = (int(x) for x in matches[-1])
    if failed or canceled:
        print("refusing to sync from a run with failed=%d canceled=%d"
              % (failed, canceled), file=sys.stderr)
        return 1

    with open(readme_path, "r") as f:
        readme = f.read()
    line_re = re.compile(r"# \d+ unit/property checks")
    if not line_re.search(readme):
        print("README has no '# N unit/property checks' line to sync",
              file=sys.stderr)
        return 1
    updated = line_re.sub("# %d unit/property checks" % succeeded, readme)
    if updated == readme:
        print("README already in sync: %d checks" % succeeded)
        return 0
    with open(readme_path, "w") as f:
        f.write(updated)
    print("README synced: %d unit/property checks" % succeeded)
    return 0


if __name__ == "__main__":
    sys.exit(main())
