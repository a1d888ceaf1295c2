#!/usr/bin/env python
"""Ad-hoc oracle check: compare declared queries against oracle_sql()
on DuckDB at an arbitrary SF (the pytest mirror is pinned to sf0.01).

Usage: python scripts/oracle_check.py SF_DIR [query ...]
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from compressed_vec_spark.spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(list(df.columns)).reset_index(drop=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("oracle-check", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    duck = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'"
                if os.path.isdir(p) else
                f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    for name in names:
        try:
            got = normalize(qs[name](spark, sf_dir).toPandas())
            # oracle SQL may be built at call time (fixture paths) — the
            # Spark query above must run first to write those fixtures
            want = normalize(duck.execute(oracles[name]).df())
            got.columns = [c.lower() for c in got.columns]
            want.columns = [c.lower() for c in want.columns]
            ok_rows = len(got) == len(want)
            ok_vals = ok_rows and all(
                (got[c].astype(str).values == want[c].astype(str).values).all()
                for c in want.columns)
            print(f"{'OK ' if ok_vals else 'FAIL'} {name} "
                  f"spark={len(got)} oracle={len(want)}", flush=True)
            if not ok_vals:
                failures += 1
                print(got.head(), "\n---\n", want.head())
        except Exception as e:
            failures += 1
            print(f"ERR  {name}: {e!r}"[:400], flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
