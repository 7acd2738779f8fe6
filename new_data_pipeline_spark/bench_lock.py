"""Cross-process serialization of measurement jobs (bench, scale
audit): whichever starts second BLOCKS until the first finishes.

Why: both are wall-clock measurements on one shared machine — two
concurrent Spark drivers contend for the same 32 cores and each
other's numbers become noise. Round 6 concretized the cost: a scale
audit left running into the driver's bench window inflated the
recorded BENCH_r06 2.6x (63.2 s vs a 24.9 s quiet re-run). The lock
makes the serialization mechanical instead of procedural.

flock on a well-known file: advisory, auto-released on process death
(no stale-lock cleanup), and honest across independent interpreters.
A bounded wait keeps a wedged holder from stalling the driver forever
— after the timeout the waiter proceeds (a possibly-noisy measurement
beats no measurement) and says so on stderr.
"""

from __future__ import annotations

import fcntl
import os
import sys
import time

LOCK_PATH = "/tmp/ndp_measure.lock"
WAIT_SECONDS = 30 * 60  # longest legitimate holder: the full 10x audit


def acquire(label: str, wait_seconds: int = WAIT_SECONDS):
    """Take the machine-wide measurement lock; returns the open file
    handle (hold it for the process lifetime — flock releases on
    exit/death). Blocks up to ``wait_seconds``, then proceeds anyway
    with a loud stderr note so the overlap is at least visible."""
    fh = open(LOCK_PATH, "a+")
    deadline = time.monotonic() + wait_seconds
    notified = False
    while True:
        try:
            fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            fh.truncate(0)
            fh.write(f"{label} pid={os.getpid()}\n")
            fh.flush()
            return fh
        except BlockingIOError:
            if not notified:
                print(f"[{label}] waiting for measurement lock "
                      f"({LOCK_PATH}) held by another bench/audit run",
                      file=sys.stderr, flush=True)
                notified = True
            if time.monotonic() >= deadline:
                print(f"[{label}] lock wait timed out after "
                      f"{wait_seconds}s — proceeding UNSERIALIZED; "
                      "treat this measurement as contaminated",
                      file=sys.stderr, flush=True)
                return fh
            time.sleep(2.0)
