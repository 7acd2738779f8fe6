"""Drive a SUBSET of registered queries against the DuckDB oracle —
same bare-session + canonicalization as drive_entry.py, but only for
the query names given on the command line (fast inner loop when adding
an operator).

Usage: python tools/drive_one.py <query_name> [<query_name> ...]
"""
import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

spark = (SparkSession.builder.master("local[8]")
         .appName("verify-one")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, oracles = e.queries(), e.oracle_sql()


def canon(cols, rows):
    ix = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(str(r[i]) for i in ix) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


fails = []
for name in sys.argv[1:]:
    if name not in qs:
        fails.append(name)
        print(f"UNKNOWN {name}")
        continue
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"RUNS  {name} (no oracle, {len(srows)} rows)")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_n = len(srows) == len(orows)
        ok = ok_cols and ok_n and canon(scols, srows) == canon(ocols, orows)
        if ok:
            print(f"MATCH {name} ({len(srows)} rows)")
        else:
            fails.append(name)
            print(f"MISMATCH {name}: cols={ok_cols} n={ok_n} "
                  f"spark_n={len(srows)} oracle_n={len(orows)}")
            if not ok_cols:
                print(f"  spark cols:  {sorted(scols)}")
                print(f"  oracle cols: {sorted(ocols)}")
            ix_s = sorted(range(len(scols)), key=lambda i: scols[i])
            ix_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sl = sorted(",".join(str(r[i]) for i in ix_s) for r in srows)
            ol = sorted(",".join(str(r[i]) for i in ix_o) for r in orows)
            for a, b in zip(sl, ol):
                if a != b:
                    print(f"  first diff:\n  spark:  {a}\n  oracle: {b}")
                    break
    except Exception as ex:
        fails.append(name)
        print(f"ERROR {name}: {str(ex)[:400]}")

sys.exit(1 if fails else 0)
