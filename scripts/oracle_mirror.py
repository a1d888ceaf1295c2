#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run queries() vs
oracle_sql() on DuckDB at a given SF and compare rows/schema/values.

Usage: python scripts/oracle_mirror.py [query ...]   (default: all)
Env:   CVX_SF_DIR (default /root/testdata/sf0.01), CVX_CORES (default 8)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    import duckdb
    import pandas as pd
    import __spark_entry__ as entry
    from compressed_vec_spark.spark.session import get_spark

    sf_dir = os.environ.get("CVX_SF_DIR", "/root/testdata/sf0.01")
    cores = int(os.environ.get("CVX_CORES", "8"))
    qs, osql = entry.queries(), entry.oracle_sql()
    names = sys.argv[1:] or list(qs)

    spark = get_spark("cvx-oracle-mirror", cores=cores)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in osql:
                print(f"{name:32s} rows={len(sdf):6d}  (no oracle: rows-only)")
                continue
            odf = con.execute(osql[name]).df()
            cols = sorted(sdf.columns)
            if cols != sorted(odf.columns):
                raise AssertionError(f"schema {cols} vs {sorted(odf.columns)}")
            s = sdf[cols].sort_values(cols).reset_index(drop=True)
            o = odf[cols].sort_values(cols).reset_index(drop=True)
            o = o.astype({c: s[c].dtype for c in cols})
            ok = s.shape == o.shape and bool(s.equals(o))
            print(f"{name:32s} rows={len(s):6d}  match={ok}")
            if not ok:
                failed.append(name)
                if s.shape == o.shape:
                    neq = (s != o).any(axis=1)
                    print(s[neq].head(5))
                    print(o[neq].head(5))
                else:
                    print("  shapes:", s.shape, o.shape)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name:32s} ERROR: {type(e).__name__}: {e}")
    spark.stop()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
