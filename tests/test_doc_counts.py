"""Doc-count consistency gate (VERDICT r8 #7): the counts README.md and
BASELINE.md cite must equal the registry's actual size, so the docs
can't drift from the code the way "651 tests"/"194/194 oracles" did."""

from __future__ import annotations

import re


def _registered() -> int:
    import __spark_entry__ as entry
    return len(entry.queries())


def test_readme_query_count_matches_registry():
    text = open("/root/repo/README.md").read()
    m = re.search(r"\*\*(\d+) registered queries, all (\d+) ", text)
    assert m, "README must cite the registered-query count"
    n = _registered()
    assert int(m.group(1)) == n and int(m.group(2)) == n, (
        f"README cites {m.group(1)}/{m.group(2)} queries; registry has {n}")


def test_coverage_query_count_matches_registry():
    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"^(\d+) registered queries, ALL (\d+) ", text, re.M)
    assert m, "COVERAGE.md must cite the registered-query count"
    n = _registered()
    assert int(m.group(1)) == n and int(m.group(2)) == n, (
        f"COVERAGE.md cites {m.group(1)}/{m.group(2)} queries; "
        f"registry has {n}")


def test_oracle_coverage_is_total():
    """Every registered query carries an oracle (the repo invariant the
    docs advertise); a rows-only registration must be a deliberate,
    documented exception — there are none today."""
    import __spark_entry__ as entry
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracles: {missing}"


def test_readme_test_count_matches_collection():
    """The r8 verdict's hygiene nit: README cited '651 tests' while 673
    collected. Gate the cited count against pytest's own collection
    (a ~2.5 s subprocess; keeps the doc from drifting again)."""
    import re
    import subprocess
    import sys

    text = open("/root/repo/README.md").read()
    m = re.search(r"\*\*(\d+) tests\*\*", text)
    assert m, "README must cite the test count in bold"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    cm = re.search(r"(\d+) tests collected", out.stdout)
    assert cm, f"could not parse collection output: {out.stdout[-200:]}"
    assert int(m.group(1)) == int(cm.group(1)), (
        f"README cites {m.group(1)} tests; pytest collects {cm.group(1)}")


def test_baseline_snapshot_counts_are_current_or_round_scoped():
    """VERDICT r9 #8: historical BASELINE.md sections must not carry
    "N/N oracles"-style counts that read as CURRENT state. Every such
    count must either equal the live registry size or sit on a line
    that names the round it snapshots (e.g. "(the r8 registry)")."""
    n = _registered()
    text = open("/root/repo/BASELINE.md").read()
    for line in text.splitlines():
        for m in re.finditer(r"(\d+)/(\d+) (?:oracles?|queries)", line):
            a, b = int(m.group(1)), int(m.group(2))
            if a == b == n:
                continue
            assert re.search(r"\br(?:ound[- ])?\d+\b|\bas of\b", line), (
                f"undated stale count in BASELINE.md: {line.strip()!r} "
                f"(registry has {n}; date-scope the line or update it)")


def test_coverage_numeric_registry_claims_are_current_or_round_scoped():
    """VERDICT r10 #5: COVERAGE.md:126 said "all 195 oracles" while the
    registry held 221 — the headline gate above missed it. Every
    "N oracles"/"N queries"/"N registered" claim anywhere in
    COVERAGE.md must now equal the live registry size or sit on a line
    that names the round it snapshots."""
    n = _registered()
    text = open("/root/repo/COVERAGE.md").read()
    for line in text.splitlines():
        for m in re.finditer(
                r"\b(\d+) (?:oracles?\b|(?:registered )?queries\b)|"
                r"\b(?:all|ALL) (\d+)\b", line):
            cited = int(m.group(1) or m.group(2))
            if cited == n:
                continue
            assert re.search(r"\br(?:ound[- ])?\d+\b|\bas of\b", line), (
                f"undated stale count in COVERAGE.md: {line.strip()!r} "
                f"(registry has {n}; date-scope the line or update it)")
