"""Local differential harness mimicking the driver's t2 correctness gate.

Runs every registry query on Spark AND its DuckDB oracle at a given sf
dir, then compares row count, sorted column names, and an
order-insensitive value representation. Exit code 1 on any mismatch.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonical float: repr at 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append("\x1f".join(normalize_cell(row[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from hadoop_mapreduce_spark import get_spark
    from hadoop_mapreduce_spark.registry import ORACLE, QUERIES

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        sql = ORACLE.get(name)
        if sql is None:
            status = "rows-only" if len(srows) >= 0 else "??"
            print(f"ok    {name:28s} {len(srows):7d} rows  ({status}, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sc = canon([tuple(r) for r in srows], scols)
            oc = canon(orows, ocols)
            if sc != oc:
                ndiff = sum(1 for a, b in zip(sc, oc) if a != b)
                problems.append(f"values differ ({ndiff} of {len(sc)} rows)")
                for a, b in list(zip(sc, oc))[:2000]:
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  oracle: {b[:200]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"ok    {name:28s} {len(srows):7d} rows  (match, {time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
