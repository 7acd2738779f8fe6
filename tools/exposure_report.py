"""Driver-exposure telemetry (VERDICT r10 #8): diff CORRECTNESS_r*.json
against the live registry and report, per query, the last round whose
driver window graded it — the input the per-round GATE_PRIORITY re-aim
works from (registry.py), replacing the hand-maintained lists the r10
judge had to recompute by hand.

Usage:
    python tools/exposure_report.py            # full table + summary
    python tools/exposure_report.py --stale 4  # only queries whose last
                                               # exposure is >= 4 rounds
                                               # behind the newest file

Reads only the repo's committed CORRECTNESS files; never runs Spark.
"""
from __future__ import annotations

import glob
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def exposure() -> tuple[dict[str, int | None], int]:
    """(last_exposed_round per registered query — None = never graded,
    newest correctness round on disk)."""
    import __spark_entry__ as entry

    last: dict[str, int] = {}
    newest = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        newest = max(newest, rnd)
        with open(f) as fh:
            for name in json.load(fh):
                last[name] = rnd
    return {n: last.get(n) for n in entry.queries()}, newest


def main() -> None:
    stale_min = 0
    if "--stale" in sys.argv:
        stale_min = int(sys.argv[sys.argv.index("--stale") + 1])
    exp, newest = exposure()
    rows = sorted(exp.items(), key=lambda kv: (kv[1] or 0, kv[0]))
    shown = 0
    for name, rnd in rows:
        age = newest - rnd if rnd is not None else None
        if stale_min and (10**9 if age is None else age) < stale_min:
            continue
        shown += 1
        print(f"r{rnd if rnd is not None else '--':>2}  "
              f"age {age if age is not None else 'inf':>3}  {name}")
    hist = Counter(v for v in exp.values())
    print(f"\n{len(exp)} registered; newest file r{newest}; "
          f"shown {shown}; by last-exposed round: "
          + ", ".join(f"r{r}:{c}" for r, c in sorted(
              hist.items(), key=lambda kv: (kv[0] is None, kv[0]))))
    never = [n for n, v in exp.items() if v is None]
    if never:
        print(f"NEVER GRADED ({len(never)}): {', '.join(sorted(never))}")


if __name__ == "__main__":
    main()
