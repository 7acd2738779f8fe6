"""TPC-H completion suite (tpch_suite2): derived-partsupp properties.

Oracle parity for the seven queries is covered by test_oracle_parity
(they are registered); these tests pin the partsupp generator itself —
the part both engines must agree on for the oracles to mean anything.
"""

from __future__ import annotations

import duckdb
import pytest

from new_data_pipeline_spark.operators.tpch_suite2 import (
    _ORACLE_PS, _partsupp)
from tests.conftest import SF_DIR
from new_data_pipeline_spark.catalog import table_path


@pytest.fixture(scope="module")
def ps_rows(spark):
    return {(r.ps_partkey, r.ps_suppkey): (r.ps_availqty,
                                           r.ps_supplycost_cents)
            for r in _partsupp(spark, SF_DIR).collect()}


def test_four_distinct_suppliers_per_part(spark, ps_rows):
    from collections import Counter
    per_part = Counter(pk for pk, _ in ps_rows)
    assert set(per_part.values()) == {4}, "dbgen rule: 4 suppliers/part"


def test_supplier_keys_in_range(ps_rows):
    assert all(0 <= sk < 100 for _, sk in ps_rows)
    assert all(1 <= aq <= 9000 and 100 <= cc < 100000
               for aq, cc in ps_rows.values())


def test_matches_oracle_cte(ps_rows):
    con = duckdb.connect()
    for t in ("part", "supplier"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(SF_DIR, t)}')")
    got = con.execute(
        f"WITH {_ORACLE_PS} SELECT ps_partkey, ps_suppkey, ps_availqty,"
        f" ps_supplycost_cents FROM partsupp").fetchall()
    assert {(r[0], r[1]): (r[2], r[3]) for r in got} == ps_rows


def test_not_all_parts_share_supplier_sets(ps_rows):
    # the p_partkey // S term staggers the stride so supplier load is
    # spread; adjacent parts must not collide onto identical sets
    sets = {}
    for pk, sk in ps_rows:
        sets.setdefault(pk, set()).add(sk)
    distinct = {frozenset(v) for v in sets.values()}
    assert len(distinct) > 50
