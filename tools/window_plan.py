"""Propose the next round's GATE_PRIORITY window (added round 13).

The driver grades the FIRST 50 entries of ``queries()`` each round, and
the registry's re-aim discipline is: (1) every query whose result code
path changed this round, and every NEW query, MUST hold a slot (a new
query outside the window would grade "never-checked"); (2) remaining
slots go to the longest-unexposed queries, oldest first. This tool
mechanizes that arithmetic on top of tools/exposure_report.py so a
future re-aim can't mis-count slots the way a hand-built list can —
the judge verifies the committed window against exactly this ordering.

Usage:
    python tools/window_plan.py [changed_or_new ...]

Prints the 50-slot proposal as a ready-to-paste GATE_PRIORITY body,
plus the deferral list (what falls off the window and when it was last
graded). Reads only committed CORRECTNESS files; never runs Spark.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.exposure_report import exposure  # noqa: E402

WINDOW = 50


def plan(changed: list[str], max_round: int | None = None
         ) -> tuple[list[str], list[tuple[str, int]]]:
    """``max_round`` pins the exposure snapshot to CORRECTNESS files
    <= that round — what the aim was computed FROM. The per-round test
    passes the aim round minus one, so the pin stays true after the
    driver records the new round's own file."""
    import __spark_entry__ as entry

    last, newest = exposure()
    if max_round is not None:
        filtered: dict[str, int] = {}
        import glob
        import json
        # iterate by PARSED round number, not filename order: the
        # lexicographic glob sort diverges at r100 (ADVICE r13), where
        # "_r100" sorts before "_r14" and stale grades would win
        files = glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_r*.json"))
        for f in sorted(files,
                        key=lambda p: int(p.rsplit("_r", 1)[1].split(".")[0])):
            rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
            if rnd > max_round:
                continue
            with open(f) as fh:
                for name in json.load(fh):
                    filtered[name] = rnd
        last, newest = filtered, max_round
    names = list(entry.queries())
    reg_order = {n: i for i, n in enumerate(names)}
    unknown = [c for c in changed if c not in reg_order]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")

    head = list(dict.fromkeys(changed))            # dedup, keep order
    # never-graded queries are implicitly head-of-window (they'd be
    # "never-checked" otherwise) even if not passed on the CLI
    for n in names:
        if last.get(n) is None and n not in head:
            head.append(n)
    rest = sorted((n for n in names if n not in head),
                  key=lambda n: (last.get(n, -1), reg_order[n]))
    window = head + rest[:WINDOW - len(head)]
    # the next queries OUTSIDE the window, oldest exposure first —
    # what the head block's size costs in deferrals
    cutoff = rest[WINDOW - len(head):WINDOW - len(head) + 10]
    return window, [(n, last.get(n)) for n in cutoff]


def main() -> None:
    changed = sys.argv[1:]
    window, deferred = plan(changed)
    print(f"# proposed window ({len(window)} slots; "
          f"head = {len(changed)} changed/new)")
    for n in window:
        print(f'    "{n}",')
    print("# next 10 OUTSIDE the window (oldest exposure first):")
    for n, r in deferred:
        print(f"#   {n} (last graded r{r})")


if __name__ == "__main__":
    main()
