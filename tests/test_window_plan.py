"""The committed GATE_PRIORITY window must equal the mechanized
proposal (tools/window_plan.py) — the driver grades queries()[:50], so
a mis-counted hand edit silently starves the oldest-exposure queries.
Update R13_HEAD when re-aiming the window for a new round: the test
then verifies the new window is exactly head + oldest-first."""

from __future__ import annotations

import __spark_entry__ as entry
from tools.window_plan import WINDOW, plan

# The current round's head block: every changed-or-new registered
# query (the every-changed-query rule). PART OF THE RE-AIM CHECKLIST —
# update together with registry.GATE_PRIORITY each round.
R13_HEAD = [
    "sample_temperature_mixture",   # changed (ADVICE r12 decimal pin)
    "sim_ivf_serve_batches",        # new (VERDICT r12 #6)
    "multimodal_video_i420",        # new (VERDICT r12 #5)
]


def test_committed_window_matches_mechanized_plan():
    # max_round pins the exposure snapshot to what the r13 aim was
    # computed FROM (rounds <= 12), so the pin survives the driver
    # recording CORRECTNESS_r13 at the end of this round
    proposed, _deferred = plan(R13_HEAD, max_round=12)
    committed = list(entry.queries())[:WINDOW]
    assert proposed == committed, (
        "committed GATE_PRIORITY window diverges from the oldest-first "
        "proposal; first difference: "
        + str(next((a, b) for a, b in zip(proposed, committed)
                   if a != b)))


def test_head_block_is_registered_and_leading():
    committed = list(entry.queries())[:WINDOW]
    assert committed[:len(R13_HEAD)] == R13_HEAD
