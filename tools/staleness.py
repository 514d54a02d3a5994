#!/usr/bin/env python
"""Staleness map: for every queries() entry, the last round with a driver
CORRECTNESS row, and the age that row will have after the CURRENT round's
window runs (entries in the first 50 get a fresh row this round).

Writes STALENESS.md. Run from the repo root:

    python tools/staleness.py [current_round]
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as m

    last: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", path).group(1))
        rounds.append(r)
        for q in json.load(open(path)):
            last[q] = r
    current = int(sys.argv[1]) if len(sys.argv) > 1 else max(rounds) + 1
    qs = list(m.queries())
    window = set(qs[:50])
    rows = []
    for q in qs:
        eff = current if q in window else last.get(q)
        age = None if eff is None else current - eff
        rows.append((q, last.get(q), q in window, age))
    max_age = max((a for _, _, _, a in rows if a is not None), default=None)
    # steady-state floor: with Q queries and a 50-slot window, a fair
    # rotation checks each entry every ceil(Q/50) rounds -> max age
    # ceil(Q/50) - 1 (2 at <=150 queries, 3 at 151-200, ...)
    floor = (len(qs) + 49) // 50 - 1
    never = [q for q, lr, w, _ in rows if lr is None and not w]
    # A never-checked entry outside the window is a FAILURE only while the
    # window still has a displaceable slot — one whose occupant is neither
    # structural (sentinels; the sf0.01-pinned ivf recall twins, which the
    # sf0.001 tripwire would flag by construction) nor itself
    # never-checked, and whose removal would not push its own last driver
    # row past the steady-state floor. When the window is saturated, the out-of-window
    # never-checked entries carry 3-SF local evidence + the pre-commit
    # tripwire until they rotate in next round — report, don't fail.
    structural = {
        "q1_pricing_summary",
        "changelog_latest_per_key",
        "minhash_neardup",
        "ivf_recall_topk",
        "ivf_batch_recall_topk",
    }
    displaceable = [
        q
        for q in qs[:50]
        if q not in structural
        and last.get(q) is not None
        and current - last[q] <= floor
    ]
    with open("STALENESS.md", "w") as f:
        f.write(
            f"# Driver-row staleness map (as of round {current})\n\n"
            f"{len(qs)} queries; the driver checks the first 50 per round.\n"
            f"`projected age` = rounds since the entry's last driver row,\n"
            f"counting an in-window entry as checked THIS round.\n\n"
            f"**Projected max age after round {current}: {max_age}**"
            f" (surface/window ratio {len(qs)}/50 makes {floor} the"
            f" steady-state floor; the pre-commit tail tripwire"
            f" value-verifies every out-of-window entry at sf0.001"
            f" in between).\n\n"
        )
        if never:
            f.write(
                "Entries with no driver row and not in this window "
                f"(MUST rotate next): {', '.join(never)}\n"
                + (
                    "(window SATURATED — every slot is structural, "
                    "never-checked, or an occupant whose removal would "
                    "push its driver-row age past the floor; these entries are "
                    "tripwire-verified until they rotate)\n\n"
                    if not displaceable
                    else "\n"
                )
            )
        f.write("| query | last driver row | in r{} window | projected age |\n".format(current))
        f.write("|---|---|---|---|\n")
        for q, lr, w, age in rows:
            f.write(
                f"| {q} | {'r' + str(lr) if lr else '—'} | "
                f"{'yes' if w else ''} | {age if age is not None else '—'} |\n"
            )
    print(f"STALENESS.md written: {len(qs)} queries, projected max age {max_age}")
    if never and displaceable:
        print(
            f"FAIL: {len(never)} never-checked entries outside the window "
            f"while displaceable slots exist ({displaceable[:5]}...): {never}"
        )
        return 1
    if never:
        print(
            f"note: window saturated; {len(never)} never-checked entries "
            f"ride the tripwire until r{current + 1}: {never}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
