"""Randomized differential testing: generate random filter/join/
aggregate compositions over the testdata schema and render each spec
TWICE — once as a DataFrame chain (the engine surface under test) and
once as ANSI SQL for DuckDB — so the cross-check covers both Spark's
execution AND this repo's expression-translation conventions (decimal
money sums, timestamp literal typing, alias discipline).

The fixed 140+-query registry is green; randomized plans are where the
next correctness bug hides (optimizer edge cases, null semantics under
OR, type coercion on literals). Every case is seed-pinned: a failure
reproduces with ``generate(seed)`` and nothing else.

Design constraints that keep the differential exact (no tolerance):
- aggregates are restricted to forms with engine-exact parity: counts,
  distinct counts, min/max, integer sums, and decimal-cast money sums
  (functions/exact.py) — never raw double sums or avg, whose result
  depends on reduction order;
- timestamp literals are cast to the COLUMN's Spark type (the testdata
  mixes TIMESTAMP_NTZ and LTZ-under-UTC), while DuckDB's naive
  TIMESTAMP literal matches both wall-clock-for-wall-clock;
- every output column is aliased identically on both sides (the
  comparator sorts columns by name).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog

# ---------------------------------------------------------------- schema

NUM_COLS: dict[str, list[str]] = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "events": ["value"],
}
INT_COLS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey", "p_size"],
    "nation": ["n_nationkey", "n_regionkey"],
    "region": ["r_regionkey"],
    "events": ["event_id", "user_id"],
}
TS_COLS: dict[str, list[str]] = {
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
    "events": ["ts"],
}
# low-cardinality string columns with (stable) observed domains; a
# literal that stops existing after a testdata regen only changes
# selectivity, never parity
STR_COLS: dict[str, dict[str, list[str]]] = {
    "lineitem": {"l_returnflag": ["A", "N", "R"],
                 "l_linestatus": ["F", "O"]},
    "orders": {"o_orderstatus": ["F", "O", "P"],
               "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                   "4-NOT SPECIFIED", "5-LOW"]},
    "customer": {"c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE",
                                  "HOUSEHOLD", "MACHINERY"]},
    "part": {"p_type": ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
                        "STANDARD"]},
    "events": {"event_type": ["click", "error", "purchase", "signup",
                              "view"]},
    "nation": {},
    "region": {"r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE",
                          "MIDDLE EAST"]},
    "supplier": {},
}
# observed numeric ranges (loose; only literal placement, not parity)
NUM_RANGE: dict[str, tuple[float, float]] = {
    "l_quantity": (1, 50), "l_extendedprice": (900, 100000),
    "l_discount": (0.0, 0.1), "l_tax": (0.0, 0.08),
    "o_totalprice": (900, 500000), "c_acctbal": (-999, 10000),
    "s_acctbal": (-999, 10000), "p_retailprice": (900, 2100),
    "value": (0, 1000),
}
INT_RANGE: dict[str, tuple[int, int]] = {
    "l_orderkey": (1, 60000), "l_partkey": (1, 8000),
    "l_suppkey": (1, 400), "l_linenumber": (1, 7),
    "o_orderkey": (1, 60000), "o_custkey": (1, 6000),
    "c_custkey": (1, 6000), "c_nationkey": (0, 24),
    "s_suppkey": (1, 400), "s_nationkey": (0, 24),
    "p_partkey": (1, 8000), "p_size": (1, 50),
    "n_nationkey": (0, 24), "n_regionkey": (0, 4),
    "r_regionkey": (0, 4), "event_id": (1, 200000),
    "user_id": (1, 6000),
}
TS_RANGE = ("1992-01-01", "1998-12-01")

# FK edges: (from_table, from_col, to_table, to_col)
EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]
BASES = ("lineitem", "orders", "customer", "events", "part")

# group-by candidates: bounded-cardinality columns only
GROUP_COLS: dict[str, list[str]] = {
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment", "c_nationkey"],
    "supplier": ["s_nationkey"],
    "part": ["p_type", "p_size"],
    "nation": ["n_name"],
    "region": ["r_name"],
    "events": ["event_type"],
}


@dataclass
class Predicate:
    """sql is the DuckDB rendering; spark is a ZERO-ARG closure that
    builds the Column (Column construction needs a live SparkContext,
    and specs must be generable without one — all randomness is drawn
    at generate() time, so the closure is deterministic)."""
    sql: str
    spark: object                 # () -> Column


@dataclass
class Case:
    seed: int
    tables: list[str]
    joins: list[tuple[str, str, str, str]]
    pred_sql: str | None
    group_cols: list[str]
    agg_sql: list[str]            # aliased SQL aggregate expressions
    _spark_pred: object = field(default=None, repr=False)   # () -> Column
    _spark_aggs: list = field(default_factory=list, repr=False)  # thunks

    def sql(self) -> str:
        frm = self.tables[0]
        for lt, lc, rt, rc in self.joins:
            frm += f" JOIN {rt} ON {lt}.{lc} = {rt}.{rc}"
        q = "SELECT "
        sel = [f"{c} AS g{i}" for i, c in enumerate(self.group_cols)]
        sel += self.agg_sql
        q += ", ".join(sel) + f" FROM {frm}"
        if self.pred_sql:
            q += f" WHERE {self.pred_sql}"
        if self.group_cols:
            q += " GROUP BY " + ", ".join(
                f"g{i}" for i in range(len(self.group_cols)))
        return q

    def spark_df(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        df = catalog.load(spark, sf_dir, self.tables[0])
        loaded = {self.tables[0]: df}
        for lt, lc, rt, rc in self.joins:
            right = catalog.load(spark, sf_dir, rt)
            loaded[rt] = right
            df = df.join(right, F.col(lc) == F.col(rc), "inner")
        if self._spark_pred is not None:
            df = df.filter(self._spark_pred())
        dims = [F.col(c).alias(f"g{i}")
                for i, c in enumerate(self.group_cols)]
        aggs = [a() for a in self._spark_aggs]
        if dims:
            return df.groupBy(*dims).agg(*aggs)
        return df.agg(*aggs)


def _ts_literal(rng: random.Random) -> str:
    y = rng.randint(1992, 1998)
    m = rng.randint(1, 12)
    d = rng.randint(1, 28)
    return f"{y:04d}-{m:02d}-{d:02d} 00:00:00"


def _one_predicate(rng: random.Random, tables: list[str],
                   spark_types: dict[str, str]) -> Predicate:
    kinds = []
    for t in tables:
        kinds += [("num", t, c) for c in NUM_COLS.get(t, [])]
        kinds += [("int", t, c) for c in INT_COLS.get(t, [])]
        kinds += [("ts", t, c) for c in TS_COLS.get(t, [])]
        kinds += [("str", t, c) for c in STR_COLS.get(t, {})]
    kind, t, c = rng.choice(kinds)
    if kind == "num":
        lo, hi = NUM_RANGE[c]
        v = round(lo + rng.random() * (hi - lo), 2)
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        sp = {"<": lambda: F.col(c) < v, "<=": lambda: F.col(c) <= v,
              ">": lambda: F.col(c) > v, ">=": lambda: F.col(c) >= v,
              "<>": lambda: F.col(c) != v}[op]
        return Predicate(f"{c} {op} {v}", sp)
    if kind == "int":
        lo, hi = INT_RANGE[c]
        v = rng.randint(lo, hi)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>", "%"])
        if op == "%":
            m = rng.choice([2, 3, 5, 7])
            r = rng.randrange(m)
            return Predicate(f"{c} % {m} = {r}",
                             lambda: F.col(c) % m == r)
        sp = {"<": lambda: F.col(c) < v, "<=": lambda: F.col(c) <= v,
              ">": lambda: F.col(c) > v, ">=": lambda: F.col(c) >= v,
              "=": lambda: F.col(c) == v,
              "<>": lambda: F.col(c) != v}[op]
        return Predicate(f"{c} {op} {v}", sp)
    if kind == "ts":
        v = _ts_literal(rng)
        op = rng.choice(["<", ">="])
        # literal typed to the COLUMN's Spark type: the testdata mixes
        # TIMESTAMP_NTZ (l_shipdate/o_orderdate) and LTZ (events.ts,
        # normalized by catalog.load under the pinned UTC zone)
        ty = spark_types[c]
        sp = ((lambda: F.col(c) < F.lit(v).cast(ty)) if op == "<"
              else (lambda: F.col(c) >= F.lit(v).cast(ty)))
        return Predicate(f"{c} {op} TIMESTAMP '{v}'", sp)
    pool = STR_COLS[t][c]
    if rng.random() < 0.3 and len(pool) >= 2:
        vals = rng.sample(pool, k=rng.randint(2, min(3, len(pool))))
        in_sql = ", ".join(f"'{v}'" for v in vals)
        return Predicate(f"{c} IN ({in_sql})",
                         lambda: F.col(c).isin(vals))
    v = rng.choice(pool)
    if rng.random() < 0.5:
        return Predicate(f"{c} = '{v}'", lambda: F.col(c) == v)
    return Predicate(f"{c} <> '{v}'", lambda: F.col(c) != v)


def _aggregates(rng: random.Random, tables: list[str]
                ) -> tuple[list[str], list]:
    """1-3 exact-parity aggregates, alias-synchronized."""
    from new_data_pipeline_spark.functions.exact import money

    options = [("count_star", None, None)]
    for t in tables:
        options += [("count", t, c) for c in INT_COLS.get(t, [])]
        options += [("ndv", t, c)
                    for c in INT_COLS.get(t, []) + list(STR_COLS.get(t, {}))]
        options += [("minmax_i", t, c) for c in INT_COLS.get(t, [])]
        options += [("minmax_n", t, c) for c in NUM_COLS.get(t, [])]
        options += [("minmax_s", t, c) for c in STR_COLS.get(t, {})]
        options += [("minmax_t", t, c) for c in TS_COLS.get(t, [])]
        options += [("sum_i", t, c) for c in INT_COLS.get(t, [])]
        options += [("money", t, c) for c in NUM_COLS.get(t, [])]
    picks = rng.sample(options, k=min(rng.randint(1, 3), len(options)))
    sqls, sparks = [], []
    def thunk(kind, c, a, mm=None):
        if kind == "count_star":
            return lambda: F.count(F.lit(1)).alias(a)
        if kind == "count":
            return lambda: F.count(c).alias(a)
        if kind == "ndv":
            return lambda: F.countDistinct(c).alias(a)
        if kind == "minmax":
            return lambda: (F.min(c) if mm == "MIN"
                            else F.max(c)).alias(a)
        if kind == "sum_i":
            return lambda: F.sum(c).alias(a)
        return lambda: F.sum(money(c)).cast("double").alias(a)

    for i, (kind, _, c) in enumerate(picks):
        a = f"a{i}"
        if kind == "count_star":
            sqls.append(f"COUNT(*) AS {a}")
            sparks.append(thunk("count_star", c, a))
        elif kind == "count":
            sqls.append(f"COUNT({c}) AS {a}")
            sparks.append(thunk("count", c, a))
        elif kind == "ndv":
            sqls.append(f"COUNT(DISTINCT {c}) AS {a}")
            sparks.append(thunk("ndv", c, a))
        elif kind in ("minmax_i", "minmax_n", "minmax_s", "minmax_t"):
            mm = rng.choice(["MIN", "MAX"])
            sqls.append(f"{mm}({c}) AS {a}")
            sparks.append(thunk("minmax", c, a, mm))
        elif kind == "sum_i":
            # DuckDB sums BIGINT into HUGEINT (-> object/float in
            # pandas); pin both engines to BIGINT
            sqls.append(f"CAST(SUM({c}) AS BIGINT) AS {a}")
            sparks.append(thunk("sum_i", c, a))
        else:  # money: decimal-cast sum, double at the boundary
            sqls.append(f"CAST(SUM(CAST({c} AS DECIMAL(12,2))) "
                        f"AS DOUBLE) AS {a}")
            sparks.append(thunk("money", c, a))
    return sqls, sparks


# unique row keys per table: the tiebreak that makes window orderings
# and LIMIT selections total (hence engine-deterministic).
# CAUTION (caught live by the round-12 frame family, seed 180): the
# synthetic lineitem does NOT honor the TPC-H (l_orderkey,
# l_linenumber) primary key — l_linenumber is drawn independently, so
# ~24% of rows collide on the pair at every SF. The tiebreak is the
# 6-column prefix verified distinct at sf0.001/0.01/0.1; even under a
# regen that collides it, tied rows would agree on every emitted
# column (all fuzz window payloads come from INT_COLS ⊆ this set), so
# the output multiset stays engine-deterministic.
UNIQUE_KEYS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                 "l_quantity", "l_extendedprice"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
    "events": ["event_id"],
}


@dataclass
class SqlPairCase:
    """A spec whose two renderings are prebuilt: the SQL text and a
    zero-arg-closure-based DataFrame builder (same lazy-Column
    discipline as Case)."""
    seed: int
    kind: str
    _sql: str
    _build: object        # (spark, sf_dir) -> DataFrame

    def sql(self) -> str:
        return self._sql

    def spark_df(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        return self._build(spark, sf_dir)


def _gen_window(seed: int, rng: random.Random) -> SqlPairCase:
    """Window-function case: deterministic ranks/offsets/running sums
    under a TOTAL ordering (order col + unique key tiebreak)."""
    from pyspark.sql import Window

    t = rng.choice(BASES)
    part = rng.choice(GROUP_COLS[t])
    order_pool = INT_COLS.get(t, []) + NUM_COLS.get(t, [])         + TS_COLS.get(t, [])
    ocol = rng.choice(order_pool)
    desc = rng.random() < 0.5
    keys = UNIQUE_KEYS[t]
    icol = rng.choice(INT_COLS[t])
    fn = rng.choice(["row_number", "rank", "dense_rank",
                     "part_sum", "run_sum", "lag"])
    topn = rng.randint(2, 4)

    dirn = "DESC" if desc else "ASC"
    order_sql = ", ".join([f"{ocol} {dirn}"] + keys)
    if fn == "row_number":
        w_sql = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {order_sql})"
    elif fn == "rank":
        w_sql = f"RANK() OVER (PARTITION BY {part} ORDER BY {ocol} {dirn})"
    elif fn == "dense_rank":
        w_sql = f"DENSE_RANK() OVER (PARTITION BY {part} ORDER BY {ocol} {dirn})"
    elif fn == "part_sum":
        w_sql = f"CAST(SUM({icol}) OVER (PARTITION BY {part}) AS BIGINT)"
    elif fn == "run_sum":
        w_sql = (f"CAST(SUM({icol}) OVER (PARTITION BY {part} "
                 f"ORDER BY {order_sql} ROWS BETWEEN UNBOUNDED PRECEDING "
                 f"AND CURRENT ROW) AS BIGINT)")
    else:
        w_sql = f"LAG({icol}) OVER (PARTITION BY {part} ORDER BY {order_sql})"

    keys_sql = ", ".join(keys)
    if fn == "row_number":
        sql = (f"SELECT * FROM (SELECT {keys_sql}, {w_sql} AS w0 "
               f"FROM {t}) WHERE w0 <= {topn}")
    else:
        sql = f"SELECT {keys_sql}, {w_sql} AS w0 FROM {t}"

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        oc = F.col(ocol).desc() if desc else F.col(ocol).asc()
        full = Window.partitionBy(part).orderBy(
            oc, *[F.col(k) for k in keys])
        byval = Window.partitionBy(part).orderBy(oc)
        if fn == "row_number":
            out = df.select(*keys, F.row_number().over(full).alias("w0"))
            return out.filter(F.col("w0") <= topn)
        if fn == "rank":
            return df.select(*keys, F.rank().over(byval).alias("w0"))
        if fn == "dense_rank":
            return df.select(*keys,
                             F.dense_rank().over(byval).alias("w0"))
        if fn == "part_sum":
            w = Window.partitionBy(part)
            return df.select(*keys, F.sum(icol).over(w)
                             .cast("bigint").alias("w0"))
        if fn == "run_sum":
            w = full.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow)
            return df.select(*keys, F.sum(icol).over(w)
                             .cast("bigint").alias("w0"))
        return df.select(*keys, F.lag(icol).over(full).alias("w0"))

    return SqlPairCase(seed=seed, kind=f"window:{fn}", _sql=sql,
                       _build=build)


def _gen_window_frames(seed: int, rng: random.Random) -> SqlPairCase:
    """Window FRAME case (round 12, VERDICT r11 #3): the divergence
    zone the plain window family never reaches — sliding/centered ROWS
    frames, value-based RANGE frames (peer rows included), NTILE bucket
    boundaries, LEAD with an explicit default, FIRST/LAST_VALUE over an
    explicit full frame, and NULL-INJECTED partition keys (both engines
    must route the NULL group into one partition).

    Determinism rules: every ROWS frame orders by a TOTAL ordering
    (order col + unique-key tiebreak); RANGE frames order by the value
    column alone, which is engine-deterministic because RANGE includes
    ALL peers of the current row regardless of their physical order;
    integer sums are cast to BIGINT on both sides."""
    from pyspark.sql import Window

    t = rng.choice(BASES)
    keys = UNIQUE_KEYS[t]
    icol = rng.choice(INT_COLS[t])
    part = rng.choice(GROUP_COLS[t])
    # NULL partition-key injection: map one domain value to NULL via
    # CASE on BOTH sides (string group cols only, known domains)
    null_v = None
    domain = STR_COLS.get(t, {}).get(part)
    if domain and rng.random() < 0.4:
        null_v = rng.choice(domain)
    if null_v is not None:
        part_sql = (f"CASE WHEN {part} = '{null_v}' THEN NULL "
                    f"ELSE {part} END")
        def part_col():
            return (F.when(F.col(part) == null_v, F.lit(None))
                    .otherwise(F.col(part)))
    else:
        part_sql = part
        def part_col():
            return F.col(part)

    ocol = rng.choice(INT_COLS[t])
    desc = rng.random() < 0.5
    dirn = "DESC" if desc else "ASC"
    total_sql = ", ".join([f"{ocol} {dirn}"] + keys)
    fn = rng.choice(["rows_slide", "rows_centered", "range_cur",
                     "range_bounded", "ntile", "lead_default",
                     "first_value", "last_value"])
    k = rng.randint(1, 5)
    buckets = rng.randint(2, 7)
    off = rng.randint(1, 3)
    dflt = rng.randint(-9, -1)

    if fn == "rows_slide":
        w_sql = (f"CAST(SUM({icol}) OVER (PARTITION BY {part_sql} "
                 f"ORDER BY {total_sql} ROWS BETWEEN {k} PRECEDING "
                 f"AND CURRENT ROW) AS BIGINT)")
    elif fn == "rows_centered":
        w_sql = (f"CAST(SUM({icol}) OVER (PARTITION BY {part_sql} "
                 f"ORDER BY {total_sql} ROWS BETWEEN {k} PRECEDING "
                 f"AND {k} FOLLOWING) AS BIGINT)")
    elif fn == "range_cur":
        w_sql = (f"CAST(SUM({icol}) OVER (PARTITION BY {part_sql} "
                 f"ORDER BY {ocol} {dirn} RANGE BETWEEN UNBOUNDED "
                 f"PRECEDING AND CURRENT ROW) AS BIGINT)")
    elif fn == "range_bounded":
        # value-based bounded frame: ASC only (offset direction is
        # unambiguous on both engines), single numeric order column
        w_sql = (f"CAST(SUM({icol}) OVER (PARTITION BY {part_sql} "
                 f"ORDER BY {ocol} ASC RANGE BETWEEN {k} PRECEDING "
                 f"AND CURRENT ROW) AS BIGINT)")
    elif fn == "ntile":
        w_sql = (f"CAST(NTILE({buckets}) OVER (PARTITION BY {part_sql} "
                 f"ORDER BY {total_sql}) AS BIGINT)")
    elif fn == "lead_default":
        w_sql = (f"CAST(LEAD({icol}, {off}, {dflt}) OVER "
                 f"(PARTITION BY {part_sql} ORDER BY {total_sql}) "
                 f"AS BIGINT)")
    elif fn == "first_value":
        w_sql = (f"CAST(FIRST_VALUE({icol}) OVER (PARTITION BY "
                 f"{part_sql} ORDER BY {total_sql} ROWS BETWEEN "
                 f"UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
                 f"AS BIGINT)")
    else:
        w_sql = (f"CAST(LAST_VALUE({icol}) OVER (PARTITION BY "
                 f"{part_sql} ORDER BY {total_sql} ROWS BETWEEN "
                 f"UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
                 f"AS BIGINT)")

    keys_sql = ", ".join(keys)
    sql = (f"SELECT {keys_sql}, {part_sql} AS g0, {w_sql} AS w0 "
           f"FROM {t}")

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        oc = F.col(ocol).desc() if desc else F.col(ocol).asc()
        total = Window.partitionBy(part_col()).orderBy(
            oc, *[F.col(kk) for kk in keys])
        if fn == "rows_slide":
            w = total.rowsBetween(-k, Window.currentRow)
            expr = F.sum(icol).over(w).cast("bigint")
        elif fn == "rows_centered":
            w = total.rowsBetween(-k, k)
            expr = F.sum(icol).over(w).cast("bigint")
        elif fn == "range_cur":
            w = (Window.partitionBy(part_col()).orderBy(oc)
                 .rangeBetween(Window.unboundedPreceding,
                               Window.currentRow))
            expr = F.sum(icol).over(w).cast("bigint")
        elif fn == "range_bounded":
            w = (Window.partitionBy(part_col())
                 .orderBy(F.col(ocol).asc()).rangeBetween(-k, 0))
            expr = F.sum(icol).over(w).cast("bigint")
        elif fn == "ntile":
            expr = F.ntile(buckets).over(total).cast("bigint")
        elif fn == "lead_default":
            expr = F.lead(icol, off, dflt).over(total).cast("bigint")
        elif fn == "first_value":
            w = total.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
            expr = F.first(icol).over(w).cast("bigint")
        else:
            w = total.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
            expr = F.last(icol).over(w).cast("bigint")
        return df.select(*keys, part_col().alias("g0"),
                         expr.alias("w0"))

    return SqlPairCase(seed=seed, kind=f"window_frame:{fn}", _sql=sql,
                       _build=build)


def _gen_window_multi(seed: int, rng: random.Random) -> SqlPairCase:
    """Multi-window case (round 12): TWO window functions with
    DIFFERENT partition keys in one SELECT — Catalyst plans stacked
    Window operators with an exchange+sort between them (and reuses
    the exchange when the specs happen to agree); single-window
    families never exercise the stacking or the inter-window sort."""
    from pyspark.sql import Window

    t = rng.choice(BASES)
    keys = UNIQUE_KEYS[t]
    icol = rng.choice(INT_COLS[t])
    parts = GROUP_COLS[t]
    p1 = rng.choice(parts)
    p2 = rng.choice(parts)      # may equal p1: the exchange-reuse case
    ocol = rng.choice(INT_COLS[t])
    desc = rng.random() < 0.5
    dirn = "DESC" if desc else "ASC"
    total_sql = ", ".join([f"{ocol} {dirn}"] + keys)
    w0_sql = (f"CAST(SUM({icol}) OVER (PARTITION BY {p1} "
              f"ORDER BY {total_sql} ROWS BETWEEN UNBOUNDED PRECEDING "
              f"AND CURRENT ROW) AS BIGINT)")
    fn2 = rng.choice(["part_sum", "rank", "count"])
    if fn2 == "part_sum":
        w1_sql = f"CAST(SUM({icol}) OVER (PARTITION BY {p2}) AS BIGINT)"
    elif fn2 == "rank":
        w1_sql = (f"CAST(RANK() OVER (PARTITION BY {p2} "
                  f"ORDER BY {ocol} {dirn}) AS BIGINT)")
    else:
        w1_sql = f"CAST(COUNT(*) OVER (PARTITION BY {p2}) AS BIGINT)"
    keys_sql = ", ".join(keys)
    sql = (f"SELECT {keys_sql}, {w0_sql} AS w0, {w1_sql} AS w1 "
           f"FROM {t}")

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        oc = F.col(ocol).desc() if desc else F.col(ocol).asc()
        total = Window.partitionBy(p1).orderBy(
            oc, *[F.col(k) for k in keys])
        w0 = (F.sum(icol)
              .over(total.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow))
              .cast("bigint"))
        if fn2 == "part_sum":
            w1 = F.sum(icol).over(Window.partitionBy(p2)).cast("bigint")
        elif fn2 == "rank":
            w1 = (F.rank().over(Window.partitionBy(p2).orderBy(oc))
                  .cast("bigint"))
        else:
            w1 = (F.count(F.lit(1)).over(Window.partitionBy(p2))
                  .cast("bigint"))
        return df.select(*keys, w0.alias("w0"), w1.alias("w1"))

    return SqlPairCase(seed=seed, kind=f"window_multi:{fn2}", _sql=sql,
                       _build=build)


def _gen_window_join(seed: int, rng: random.Random) -> SqlPairCase:
    """Window-over-join case (round 12): a window function evaluated on
    an N:1 fact→dim joined frame — the partition key can come from the
    DIM side, so Catalyst must place the window above the join (and may
    reorder the join below the sort). Single-table window families
    never reach this planner path.

    Determinism: the join is fact→dim on an FK edge, so fact-row
    multiplicity is preserved and the fact table's unique key remains a
    total tiebreak for ROWS-frame functions."""
    from pyspark.sql import Window

    lt, lc, rt, rc = rng.choice(EDGES)
    keys = UNIQUE_KEYS[lt]
    icol = rng.choice(INT_COLS[lt])
    # partition column from EITHER side (dim side is the novel path)
    part_pool = GROUP_COLS.get(rt, []) + GROUP_COLS.get(lt, [])
    part = rng.choice(part_pool)
    ocol = rng.choice(INT_COLS[lt] + NUM_COLS.get(lt, []))
    desc = rng.random() < 0.5
    dirn = "DESC" if desc else "ASC"
    total_sql = ", ".join([f"{ocol} {dirn}"] + keys)
    fn = rng.choice(["row_number", "rank", "run_sum", "part_sum"])
    if fn == "row_number":
        w_sql = (f"ROW_NUMBER() OVER (PARTITION BY {part} "
                 f"ORDER BY {total_sql})")
    elif fn == "rank":
        w_sql = f"RANK() OVER (PARTITION BY {part} ORDER BY {ocol} {dirn})"
    elif fn == "run_sum":
        w_sql = (f"CAST(SUM({icol}) OVER (PARTITION BY {part} "
                 f"ORDER BY {total_sql} ROWS BETWEEN UNBOUNDED "
                 f"PRECEDING AND CURRENT ROW) AS BIGINT)")
    else:
        w_sql = f"CAST(SUM({icol}) OVER (PARTITION BY {part}) AS BIGINT)"
    keys_sql = ", ".join(keys)
    sql = (f"SELECT {keys_sql}, {part} AS g0, {w_sql} AS w0 "
           f"FROM {lt} JOIN {rt} ON {lt}.{lc} = {rt}.{rc}")

    def build(spark, sf_dir):
        left = catalog.load(spark, sf_dir, lt)
        right = catalog.load(spark, sf_dir, rt)
        df = left.join(right, F.col(lc) == F.col(rc), "inner")
        oc = F.col(ocol).desc() if desc else F.col(ocol).asc()
        total = Window.partitionBy(part).orderBy(
            oc, *[F.col(k) for k in keys])
        if fn == "row_number":
            expr = F.row_number().over(total)
        elif fn == "rank":
            expr = F.rank().over(Window.partitionBy(part).orderBy(oc))
        elif fn == "run_sum":
            w = total.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
            expr = F.sum(icol).over(w).cast("bigint")
        else:
            expr = (F.sum(icol).over(Window.partitionBy(part))
                    .cast("bigint"))
        return df.select(*keys, F.col(part).alias("g0"),
                         expr.alias("w0"))

    return SqlPairCase(seed=seed, kind=f"window_join:{fn}", _sql=sql,
                       _build=build)


def _gen_setop(seed: int, rng: random.Random) -> SqlPairCase:
    """Set-operation case: two filtered projections of one table under
    UNION / UNION ALL / INTERSECT / EXCEPT (+ ALL variants)."""
    t = rng.choice(BASES)
    keys = UNIQUE_KEYS[t]
    extra = rng.choice(GROUP_COLS[t])
    cols = keys + ([extra] if extra not in keys else [])
    cols_sql = ", ".join(cols)
    ic = rng.choice(INT_COLS[t])
    lo, hi = INT_RANGE[ic]
    mid = rng.randint(lo, hi)
    m2 = rng.choice([2, 3, 5])
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
                     "INTERSECT ALL", "EXCEPT ALL"])
    sql = (f"SELECT {cols_sql} FROM {t} WHERE {ic} <= {mid} "
           f"{op} SELECT {cols_sql} FROM {t} WHERE {ic} % {m2} = 0")

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        a = df.filter(F.col(ic) <= mid).select(*cols)
        b = df.filter(F.col(ic) % m2 == 0).select(*cols)
        if op == "UNION ALL":
            return a.union(b)
        if op == "UNION":
            return a.union(b).distinct()
        if op == "INTERSECT":
            return a.intersect(b)
        if op == "INTERSECT ALL":
            return a.intersectAll(b)
        if op == "EXCEPT ALL":
            return a.exceptAll(b)
        return a.subtract(b)

    return SqlPairCase(seed=seed, kind=f"setop:{op}", _sql=sql,
                       _build=build)


def _gen_scalar_exprs(seed: int, rng: random.Random) -> SqlPairCase:
    """Scalar-expression case: 2-3 nested function compositions
    projected row-wise over a whole table (keyed, so the comparison is
    total). This axis hunts FUNCTION-semantics divergence rather than
    plan divergence.

    Template discipline — only verified-identical semantics:
    - substr is 1-based positive-index on both engines;
    - floor/ceil are wrapped in CAST(... AS BIGINT) because DuckDB's
      floor returns DOUBLE where Spark returns LONG;
    - double→int casts are BANNED outright (Spark truncates, DuckDB
      rounds — a real engine divergence this generator must not step
      on); scaling goes through explicit FLOOR;
    - round() on DOUBLE is banned too (BigDecimal-expansion HALF_UP vs
      multiply-and-round can differ on binary ties)."""
    t = rng.choice(BASES)
    keys = UNIQUE_KEYS[t]
    templates: list[tuple[str, object]] = []
    for s in STR_COLS.get(t, {}):
        templates += [
            (f"upper({s})", (lambda c: lambda: F.upper(F.col(c)))(s)),
            (f"length({s})", (lambda c: lambda:
             F.length(F.col(c)).cast("bigint"))(s)),
            (f"substr({s}, 1, 3)", (lambda c: lambda:
             F.substring(F.col(c), 1, 3))(s)),
            (f"replace({s}, 'A', '_')", (lambda c: lambda:
             F.replace(F.col(c), F.lit("A"), F.lit("_")))(s)),
            (f"concat({s}, '|', {s})", (lambda c: lambda:
             F.concat(F.col(c), F.lit("|"), F.col(c)))(s)),
        ]
    for i in INT_COLS.get(t, []):
        m = rng.choice([3, 5, 7])
        lo, hi = INT_RANGE[i]
        lit = rng.randint(lo, hi)
        templates += [
            (f"{i} % {m}", (lambda c, mm: lambda:
             (F.col(c) % mm).cast("bigint"))(i, m)),
            (f"abs({i} - {lit})", (lambda c, ll: lambda:
             F.abs(F.col(c) - ll).cast("bigint"))(i, lit)),
            (f"CASE WHEN {i} > {lit} THEN 'hi' ELSE 'lo' END",
             (lambda c, ll: lambda:
              F.when(F.col(c) > ll, "hi").otherwise("lo"))(i, lit)),
        ]
    for n in NUM_COLS.get(t, []):
        templates += [
            (f"CAST(FLOOR({n} * 100) AS BIGINT)", (lambda c: lambda:
             F.floor(F.col(c) * 100).cast("bigint"))(n)),
            (f"CAST(CEIL({n}) AS BIGINT)", (lambda c: lambda:
             F.ceil(F.col(c)).cast("bigint"))(n)),
        ]
    for ts in TS_COLS.get(t, []):
        part = rng.choice(["year", "month", "day"])
        fn = {"year": F.year, "month": F.month, "day": F.dayofmonth}[part]
        templates += [
            (f"CAST({part}({ts}) AS BIGINT)",
             (lambda c, f: lambda: f(F.col(c)).cast("bigint"))(ts, fn)),
            (f"date_trunc('month', {ts})", (lambda c: lambda:
             F.date_trunc("month", F.col(c)))(ts)),
        ]
    picks = rng.sample(templates, k=min(rng.randint(2, 3), len(templates)))
    sel_sql = list(keys) + [f"{sql} AS e{i}"
                            for i, (sql, _) in enumerate(picks)]
    sql = f"SELECT {', '.join(sel_sql)} FROM {t}"

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        cols = [F.col(k) for k in keys]
        cols += [thunk().alias(f"e{i}")
                 for i, (_, thunk) in enumerate(picks)]
        return df.select(*cols)

    return SqlPairCase(seed=seed, kind="scalar_exprs", _sql=sql,
                       _build=build)


def _gen_outerjoin(seed: int, rng: random.Random) -> SqlPairCase:
    """Outer/semi/anti join case — the null-semantics divergence zone
    the inner-join Case shape never reaches: LEFT/FULL padding rows
    feeding null-skipping aggregates, and EXISTS/NOT EXISTS rendered as
    Spark left_semi/left_anti.

    Parity notes: predicates stay on the LEFT table (they commute with
    LEFT/semi/anti joins, and FULL joins get no predicate at all —
    a WHERE on a full join would drop right-only padding rows, which
    the pre-join Spark filter would not); group dims come only from
    tables whose columns survive the join kind."""
    kind = rng.choice(["left", "full", "semi", "anti"])
    edge = rng.choice(EDGES)
    if rng.random() < 0.5:
        lt, lc, rt, rc = edge[2], edge[3], edge[0], edge[1]   # dim side left
    else:
        lt, lc, rt, rc = edge
    spark_types = {"l_shipdate": "timestamp_ntz",
                   "o_orderdate": "timestamp_ntz",
                   "ts": "timestamp"}
    pred = None
    if kind != "full" and rng.random() < 0.5:
        pred = _one_predicate(rng, [lt], spark_types)
    allowed = [lt] if kind in ("semi", "anti") else [lt, rt]
    dims_pool = [c for t in allowed for c in GROUP_COLS.get(t, [])]
    n_dims = rng.randint(0, min(2, len(dims_pool)))
    group_cols = rng.sample(dims_pool, k=n_dims) if n_dims else []
    agg_sql, agg_spark = _aggregates(rng, allowed)

    sel = [f"{c} AS g{i}" for i, c in enumerate(group_cols)] + agg_sql
    where = []
    if pred is not None:
        where.append(f"({pred.sql})")
    if kind in ("left", "full"):
        frm = (f"{lt} {'LEFT' if kind == 'left' else 'FULL'} JOIN {rt} "
               f"ON {lt}.{lc} = {rt}.{rc}")
    else:
        frm = lt
        op = "EXISTS" if kind == "semi" else "NOT EXISTS"
        where.append(f"{op} (SELECT 1 FROM {rt} "
                     f"WHERE {lt}.{lc} = {rt}.{rc})")
    sql = f"SELECT {', '.join(sel)} FROM {frm}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if group_cols:
        sql += " GROUP BY " + ", ".join(
            f"g{i}" for i in range(len(group_cols)))

    how = {"left": "left", "full": "full",
           "semi": "left_semi", "anti": "left_anti"}[kind]

    def build(spark, sf_dir):
        left = catalog.load(spark, sf_dir, lt)
        right = catalog.load(spark, sf_dir, rt)
        if pred is not None:
            left = left.filter(pred.spark())
        df = left.join(right, F.col(lc) == F.col(rc), how)
        dims = [F.col(c).alias(f"g{i}") for i, c in enumerate(group_cols)]
        aggs = [a() for a in agg_spark]
        return df.groupBy(*dims).agg(*aggs) if dims else df.agg(*aggs)

    return SqlPairCase(seed=seed, kind=f"outerjoin:{kind}", _sql=sql,
                       _build=build)


def _gen_joinshape(seed: int, rng: random.Random) -> SqlPairCase:
    """Row-level join-shape case (round 13, VERDICT r12 #7): emits the
    JOINED ROWS themselves — so outer-join NULL extension, RIGHT joins,
    semi/anti dedup semantics, and NULL join keys are all visible per
    row, where the aggregated outerjoin family collapses them into
    null-skipping aggregates.

    Divergence nests this reaches:
    - NULL-extended int columns (Spark toPandas and DuckDB .df() must
      both widen to float64 + NaN — the canonicalizer tags NaN);
    - join-key NULLs: with probability ~1/2 each side's key is wrapped
      in the SAME NULLIF(key, v) on both engines — SQL NULL = NULL
      never matches, so a dedup bug on either side flips row counts;
    - semi/anti as EXISTS vs Spark left_semi/left_anti: the output is
      the LEFT rows un-amplified, so a duplicate-emitting rewrite is
      caught row-for-row (the aggregated family could mask it in a
      SUM);
    - partial overlap: each side is independently sliced by a modulus
      predicate on its join key, so fact rows genuinely lose their dim
      match (an unsliced FK edge never exercises the padding path).

    Determinism: output columns are the sides' UNIQUE_KEYS plus the
    raw join keys — a total key for every surviving row, so the
    multiset comparator needs no ordering assumptions."""
    kind = rng.choice(["inner", "left", "right", "full", "semi", "anti"])
    edge = rng.choice(EDGES)
    if rng.random() < 0.5:
        lt, lc, rt, rc = edge[2], edge[3], edge[0], edge[1]   # dim left
    else:
        lt, lc, rt, rc = edge

    # Column construction is DEFERRED into thunks (the family's SQL
    # must render with no active SparkSession — the generator contract
    # every other family honors).
    def _slice(t: str, c: str) -> tuple[str, object] | None:
        # modulus slice on the join key: keeps ~1/m of the side at any
        # SF, and guarantees matchless rows on the other side
        if rng.random() < 0.7:
            m = rng.randint(2, 7)
            r = rng.randrange(m)
            return (f"{t}.{c} % {m} = {r}",
                    lambda c=c, m=m, r=r:
                    F.col(c) % F.lit(m) == F.lit(r))
        return None

    def _key(t: str, c: str) -> tuple[str, object]:
        # NULLIF-wrapped join key (~1/2 per side), identical on both
        # engines; v sits in the key's observed low range so NULLs
        # really occur at every SF
        if rng.random() < 0.5:
            lo, hi = INT_RANGE[c]
            v = rng.randint(lo, min(hi, lo + 40))
            return (f"NULLIF({t}.{c}, {v})",
                    lambda c=c, v=v: F.expr(f"nullif({c}, {v})"))
        return f"{t}.{c}", (lambda c=c: F.col(c))

    lpred, rpred = _slice(lt, lc), _slice(rt, rc)
    lkey_sql, lkey_spark = _key(lt, lc)
    rkey_sql, rkey_spark = _key(rt, rc)

    def _dedup(cols: list[str]) -> list[str]:
        seen: list[str] = []
        for c in cols:
            if c not in seen:
                seen.append(c)
        return seen

    if kind in ("semi", "anti"):
        out_cols = _dedup(UNIQUE_KEYS[lt] + [lc])
        qual = [f"{lt}.{c}" for c in out_cols]
        where = [p[0] for p in (lpred,) if p is not None]
        sub_where = [f"{lkey_sql} = {rkey_sql}"]
        if rpred is not None:
            sub_where.append(rpred[0])
        op = "EXISTS" if kind == "semi" else "NOT EXISTS"
        where.append(f"{op} (SELECT 1 FROM {rt} "
                     f"WHERE {' AND '.join(sub_where)})")
        sql = (f"SELECT {', '.join(qual)} FROM {lt} "
               f"WHERE {' AND '.join(where)}")
    else:
        out_cols = _dedup(UNIQUE_KEYS[lt] + [lc]
                          + UNIQUE_KEYS[rt] + [rc])
        # qualification by ownership (names are table-prefixed, so a
        # column belongs to exactly one side)
        lcols = set(UNIQUE_KEYS[lt] + [lc])
        qual = [f"{lt}.{c}" if c in lcols else f"{rt}.{c}"
                for c in out_cols]
        jk = {"inner": "JOIN", "left": "LEFT JOIN",
              "right": "RIGHT JOIN", "full": "FULL JOIN"}[kind]
        lsub = (f"(SELECT * FROM {lt} WHERE {lpred[0]}) {lt}"
                if lpred is not None else lt)
        rsub = (f"(SELECT * FROM {rt} WHERE {rpred[0]}) {rt}"
                if rpred is not None else rt)
        sql = (f"SELECT {', '.join(qual)} FROM {lsub} {jk} {rsub} "
               f"ON {lkey_sql} = {rkey_sql}")

    how = {"inner": "inner", "left": "left", "right": "right",
           "full": "full", "semi": "left_semi", "anti": "left_anti"}[kind]

    def build(spark, sf_dir):
        left = catalog.load(spark, sf_dir, lt)
        right = catalog.load(spark, sf_dir, rt)
        if lpred is not None:
            left = left.filter(lpred[1]())
        if rpred is not None:
            right = right.filter(rpred[1]())
        df = left.join(right, lkey_spark() == rkey_spark(), how)
        return df.select(*out_cols)

    return SqlPairCase(seed=seed, kind=f"joinshape:{kind}", _sql=sql,
                       _build=build)


def _gen_scalarsubq(seed: int, rng: random.Random) -> SqlPairCase:
    """Correlated scalar-subquery case (round 13): per parent row, 1-2
    aggregates of its children as (SELECT agg FROM fact WHERE fk = pk)
    columns — DuckDB executes the correlation, Spark's twin is the
    MANUAL decorrelation (left join against the pre-aggregated child
    frame), so the case gates exactly the rewrite Catalyst performs
    under the hood. Empty-children semantics ride in the result:
    COUNT -> 0, SUM/MIN/MAX -> NULL, identical in both engines."""
    # child->parent FK edges with usable child aggregates
    edge = rng.choice([e for e in EDGES
                       if e[0] in ("lineitem", "orders", "customer")])
    ft, fk, pt, pk = edge
    keys = UNIQUE_KEYS[pt]
    slice_m = rng.randint(2, 6)
    slice_r = rng.randrange(slice_m)
    # (kind, inner SQL agg, alias, Spark thunk); SUMs get the BIGINT
    # pin outside the subquery (the _aggregates HUGEINT device)
    agg_pool = [("count", "COUNT(*)", "cnt",
                 lambda: F.count(F.lit(1))),
                *[("sum", f"SUM({c})", f"s_{c}",
                   (lambda c=c: F.sum(F.col(c))))
                  for c in INT_COLS.get(ft, [])[:2]],
                *[("minmax", f"MIN({c})", f"mn_{c}",
                   (lambda c=c: F.min(F.col(c))))
                  for c in INT_COLS.get(ft, [])[:2]],
                ("minmax", f"MAX({fk})", "mx_fk",
                 lambda: F.max(F.col(fk)))]
    picks = rng.sample(agg_pool, k=rng.randint(1, 2))

    def _sub(kind: str, sql_agg: str, alias: str) -> str:
        sub = f"(SELECT {sql_agg} FROM {ft} WHERE {ft}.{fk} = {pt}.{pk})"
        if kind == "sum":
            sub = f"CAST({sub} AS BIGINT)"
        return f"{sub} AS {alias}"

    sub_cols = ", ".join(_sub(k, s, a) for k, s, a, _ in picks)
    sql = (f"SELECT {', '.join(keys)}, {sub_cols} FROM {pt} "
           f"WHERE {pk} % {slice_m} = {slice_r}")

    def build(spark, sf_dir):
        parent = (catalog.load(spark, sf_dir, pt)
                  .filter(F.col(pk) % slice_m == slice_r))
        child = (catalog.load(spark, sf_dir, ft)
                 .groupBy(fk)
                 .agg(*[fn().alias(alias) for _, _, alias, fn in picks]))
        joined = parent.join(child, F.col(pk) == F.col(fk), "left")
        out = [F.col(k) for k in keys]
        for kind, _, alias, _fn in picks:
            col = F.col(alias)
            if kind == "count":
                # a correlated COUNT over no rows is 0, not NULL
                col = F.coalesce(col, F.lit(0))
            out.append(col.alias(alias))
        return joined.select(*out)

    return SqlPairCase(seed=seed, kind="scalarsubq", _sql=sql,
                       _build=build)


def _gen_toplimit(seed: int, rng: random.Random) -> SqlPairCase:
    """Global ORDER BY ... LIMIT under a total ordering: the selected
    SET is deterministic (the comparator is order-insensitive)."""
    t = rng.choice(BASES)
    keys = UNIQUE_KEYS[t]
    order_pool = INT_COLS.get(t, []) + NUM_COLS.get(t, [])         + TS_COLS.get(t, [])
    ocol = rng.choice(order_pool)
    desc = rng.random() < 0.5
    n = rng.randint(5, 40)
    dirn = "DESC" if desc else "ASC"
    order_sql = ", ".join([f"{ocol} {dirn}"] + keys)
    cols = keys + ([ocol] if ocol not in keys else [])
    sql = (f"SELECT {', '.join(cols)} FROM {t} "
           f"ORDER BY {order_sql} LIMIT {n}")

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        oc = F.col(ocol).desc() if desc else F.col(ocol).asc()
        return (df.orderBy(oc, *[F.col(k) for k in keys])
                .select(*cols).limit(n))

    return SqlPairCase(seed=seed, kind="toplimit", _sql=sql,
                       _build=build)


def _gen_grouping(seed: int, rng: random.Random) -> SqlPairCase:
    """ROLLUP/CUBE case (round 11): 2 bounded-cardinality dims over one
    base table with 1-3 exact-parity aggregates — the grouping-set
    family's null-extended rows exercise null-dim stringification and
    per-grouping partial aggregation, a shape the plain GROUP BY fuzz
    never reaches. Deterministic by construction: the aggregate menu is
    the shared exact-parity set and the comparator's sorted-row hash is
    order-blind."""
    eligible = [t for t in BASES if len(GROUP_COLS.get(t, [])) >= 2]
    t = rng.choice(eligible)
    dims = rng.sample(GROUP_COLS[t], k=2)
    op = rng.choice(["ROLLUP", "CUBE"])
    agg_sql, agg_spark = _aggregates(rng, [t])
    sql = (f"SELECT {', '.join(dims)}, {', '.join(agg_sql)} "
           f"FROM {t} GROUP BY {op} ({', '.join(dims)})")

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        grouped = (df.rollup(*dims) if op == "ROLLUP" else df.cube(*dims))
        return grouped.agg(*[a() for a in agg_spark])

    return SqlPairCase(seed=seed, kind="grouping", _sql=sql, _build=build)


def _gen_having(seed: int, rng: random.Random) -> SqlPairCase:
    """GROUP BY … HAVING case (round 11): post-aggregation filtering on
    an exact count — Catalyst plans it as a Filter ABOVE the aggregate,
    a placement the predicate fuzz (always below) never exercises. The
    count driving the HAVING is also emitted (aliased identically on
    both sides) so the survivors' threshold is visible in the hash."""
    eligible = [t for t in BASES if GROUP_COLS.get(t)]
    t = rng.choice(eligible)
    dims = rng.sample(GROUP_COLS[t],
                      k=rng.randint(1, min(2, len(GROUP_COLS[t]))))
    agg_sql, agg_spark = _aggregates(rng, [t])
    k = rng.randint(2, 50)
    sql = (f"SELECT {', '.join(dims)}, {', '.join(agg_sql)}, "
           f"COUNT(*) AS hn FROM {t} "
           f"GROUP BY {', '.join(dims)} HAVING COUNT(*) >= {k}")

    def build(spark, sf_dir):
        df = catalog.load(spark, sf_dir, t)
        return (df.groupBy(*dims)
                .agg(*[a() for a in agg_spark],
                     F.count(F.lit(1)).alias("hn"))
                .filter(F.col("hn") >= k))

    return SqlPairCase(seed=seed, kind="having", _sql=sql, _build=build)


def generate(seed: int):
    """Deterministic spec from a seed. Shape mix: ~19% filter/join/agg
    compositions (Case), ~12% window functions, ~10% window FRAMES
    (ROWS/RANGE frames, ntile, lead-default, first/last_value, NULL
    partition keys — round 12), ~5% window-over-join (round 12), ~4%
    stacked multi-window (round 12), ~6% set operations, ~6% global
    top-N, ~10% aggregated outer/semi/anti joins, ~8% ROW-LEVEL join
    shapes (NULL extension, right joins, NULL join keys, semi/anti
    dedup — round 13), ~8% row-wise scalar expression compositions,
    ~7% ROLLUP/CUBE grouping sets, ~5% GROUP BY + HAVING, ~5%
    correlated scalar subqueries vs manual decorrelation (round 13;
    carved from the agg tail so earlier seeds keep their shapes) —
    every shape rendered twice (DataFrame + SQL) and compared
    exactly."""
    rng = random.Random(seed)
    shape = rng.random()
    if shape < 0.12:
        return _gen_window(seed, rng)
    if shape < 0.22:
        return _gen_window_frames(seed, rng)
    if shape < 0.27:
        return _gen_window_join(seed, rng)
    if shape < 0.31:
        return _gen_window_multi(seed, rng)
    if shape < 0.37:
        return _gen_setop(seed, rng)
    if shape < 0.43:
        return _gen_toplimit(seed, rng)
    if shape < 0.53:
        return _gen_outerjoin(seed, rng)
    if shape < 0.61:
        return _gen_joinshape(seed, rng)
    if shape < 0.69:
        return _gen_scalar_exprs(seed, rng)
    if shape < 0.76:
        return _gen_grouping(seed, rng)
    if shape < 0.81:
        return _gen_having(seed, rng)
    if shape < 0.86:
        return _gen_scalarsubq(seed, rng)
    return _generate_agg(seed, rng)


def _generate_agg(seed: int, rng: random.Random) -> Case:
    """Base table, 0-2 FK joins, 0-3 predicates joined by AND/OR, 0-2
    group dims, 1-3 aggregates."""
    base = rng.choice(BASES)
    tables = [base]
    joins: list[tuple[str, str, str, str]] = []
    for _ in range(rng.randint(0, 2)):
        cand = [e for e in EDGES if e[0] in tables and e[2] not in tables]
        if not cand:
            break
        e = rng.choice(cand)
        joins.append(e)
        tables.append(e[2])

    # Spark types for ts literals (static: catalog normalizes events.ts
    # to LTZ 'timestamp'; the TPC-H dates stay NTZ as stored)
    spark_types = {"l_shipdate": "timestamp_ntz",
                   "o_orderdate": "timestamp_ntz",
                   "ts": "timestamp"}

    n_preds = rng.randint(0, 3)
    pred_sql, spark_pred = None, None
    if n_preds:
        parts = [_one_predicate(rng, tables, spark_types)
                 for _ in range(n_preds)]
        pred_sql, spark_pred = parts[0].sql, parts[0].spark
        for p in parts[1:]:
            if rng.random() < 0.3:
                pred_sql = f"({pred_sql}) OR ({p.sql})"
                spark_pred = (lambda a, b: lambda: a() | b())(
                    spark_pred, p.spark)
            else:
                pred_sql = f"({pred_sql}) AND ({p.sql})"
                spark_pred = (lambda a, b: lambda: a() & b())(
                    spark_pred, p.spark)

    dims_pool = [c for t in tables for c in GROUP_COLS.get(t, [])]
    n_dims = rng.randint(0, min(2, len(dims_pool)))
    group_cols = rng.sample(dims_pool, k=n_dims) if n_dims else []

    agg_sql, agg_spark = _aggregates(rng, tables)
    return Case(seed=seed, tables=tables, joins=joins,
                pred_sql=pred_sql, group_cols=group_cols,
                agg_sql=agg_sql, _spark_pred=spark_pred,
                _spark_aggs=agg_spark)
