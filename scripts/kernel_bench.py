#!/usr/bin/env python
"""Per-column codec kernel table (single-core numbers for BENCH.md).

Waits (optionally) for a quiet window on this shared host before
measuring — pure-CPU kernel numbers taken under neighbor contention are
meaningless.  Prints one JSON line per column plus a whole-row summary.

Usage:
  python scripts/kernel_bench.py [--wait-quiet SECONDS] [--rows N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def probe() -> float:
    """Pure-CPU contention probe: ~0.10 s on a quiet host."""
    a = np.zeros(50_000_000, dtype=np.uint8)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.bincount(a, minlength=256)
        best = min(best, time.perf_counter() - t0)
    return best


def wait_quiet(budget_sec: float, threshold: float = 0.30) -> float:
    t_end = time.time() + budget_sec
    p = probe()
    while p > threshold and time.time() < t_end:
        time.sleep(30)
        p = probe()
    return p


def main() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    from compressed_vec_spark.codecs import chunk as ck
    from compressed_vec_spark.spark import webtable
    from compressed_vec_spark.spark.session import get_spark

    wait = 0.0
    rows = 40000
    args = sys.argv[1:]
    if "--wait-quiet" in args:
        wait = float(args[args.index("--wait-quiet") + 1])
    if "--rows" in args:
        rows = int(args[args.index("--rows") + 1])

    spark = get_spark("cvx-kernel-bench", cores=8)
    pdf = webtable.webpages(spark, rows, partitions=8).toPandas()
    spark.stop()

    p = wait_quiet(wait) if wait else probe()
    out = {"probe_sec": round(p, 3), "rows": rows, "columns": {}}
    tot_raw = tot_enc = tot_t = tot_dt = 0.0
    for col in ("text", "url", "html", "lang", "warc_ts"):
        s = pdf[col]
        if col == "warc_ts":
            name, blob, _ = ck.encode_column(s)
            raw = len(s) * 8
            best = bd = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                ck.encode_column(s)
                best = min(best, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                ck.decode_column(blob)
                bd = min(bd, time.perf_counter() - t0)
            tot_dt += bd
        else:
            typ = pa.large_binary() if col == "html" else pa.large_utf8()
            arr = pa.array(s if col == "html" else s.fillna(""), type=typ)
            name, blob, _ = ck.encode_column_arrow(arr, None)
            raw = int(pc.sum(pc.binary_length(
                arr.cast(pa.large_binary()))).as_py())
            best = bd = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                ck.encode_column_arrow(arr, None)
                best = min(best, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                ck.decode_column(blob)
                bd = min(bd, time.perf_counter() - t0)
            tot_dt += bd
        tot_raw += raw
        tot_enc += len(blob)
        tot_t += best
        out["columns"][col] = {
            "codec": name, "raw_mb": round(raw / 1e6, 2),
            "ratio": round(raw / len(blob), 3),
            "enc_mb_s": round(raw / 1e6 / best, 1),
            "dec_mb_s": round(raw / 1e6 / bd, 1) if bd else None,
        }
    out["whole_row"] = {
        "raw_mb": round(tot_raw / 1e6, 2),
        "ratio": round(tot_raw / tot_enc, 3),
        "enc_mb_s": round(tot_raw / 1e6 / tot_t, 1),
        "dec_mb_s": round(tot_raw / 1e6 / tot_dt, 1),
    }
    out["probe_after_sec"] = round(probe(), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
