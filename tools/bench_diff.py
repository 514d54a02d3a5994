#!/usr/bin/env python
"""Compare two bench artifacts (BENCH_FULL.json / BENCH_r{N}.json) per
query: prints a table of old vs new seconds and the ratio, sorted by the
biggest regressions first, plus the headline throughput deltas.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.25]

Exit code 1 when any shared query regressed past the threshold — usable
as a pre-commit/CI tripwire on top of the per-round driver artifacts
(round-over-round comparison shouldn't depend on eyeballing two JSONs).
Host-variance caveat: same-code entries have been observed to swing ±25%
run-to-run on a noisy box (NOTES.md round-6 bench notes); thresholds
below ~1.3 will false-positive there.
"""

from __future__ import annotations

import json
import signal
import sys

# behave like a unix filter under `| head` (no BrokenPipeError traceback)
try:
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
except (AttributeError, ValueError):  # pragma: no cover - non-POSIX
    pass


def main() -> int:
    argv = sys.argv[1:]
    threshold = 1.25
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:
                i += 1
                threshold = float(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    # medians-of-N artifacts (query_stats, r7+) carry per-entry run counts;
    # annotate them so a 1-run number is read with the right skepticism
    nstats = new.get("query_stats", {})
    shared = sorted(set(oq) & set(nq))
    rows = []
    for k in shared:
        o, n = oq[k], nq[k]
        rows.append((n / o if o else float("inf"), k, o, n))
    rows.sort(reverse=True)
    print(f"{'query':42s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for ratio, k, o, n in rows:
        flag = "  <-- REGRESSION" if ratio > threshold else ""
        runs = nstats.get(k, {}).get("runs")
        tag = f" (median of {runs})" if runs and runs > 1 else ""
        print(f"{k:42s} {o:8.3f} {n:8.3f} {ratio:7.2f}{tag}{flag}")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"\nremoved ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)}")
    print(f"\nshared-total: old {sum(oq[k] for k in shared):.1f}s "
          f"new {sum(nq[k] for k in shared):.1f}s")
    for key in (
        "snapshot_rows_per_sec",
        "apply_events_per_sec",
        "live_snapshot_rows_per_sec",
        "live_upsert_events_per_sec",
    ):
        if key in old and key in new:
            print(f"{key}: {old[key]} -> {new[key]}")
    worst = [k for r, k, _, _ in rows if r > threshold]
    if worst:
        print(f"\n{len(worst)} queries past {threshold}x: {', '.join(worst[:10])}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
