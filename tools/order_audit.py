"""Audit: does every oracle's top-level ORDER BY pin a TOTAL order?

tests/test_oracle_parity_all.py compares rows IN EMITTED ORDER whenever
the oracle has an ORDER BY; a non-total sort key would make that
comparison flaky (Spark and DuckDB may interleave tied rows
differently). This tool proves the property on data rather than by
eyeball: for each oracle it extracts the final top-level ORDER BY key,
wraps the oracle as a subquery, and asks DuckDB whether any key tuple
occurs more than once at the given sf. Queries with duplicated keys are
printed as NON-TOTAL and belong in _TIED_ORDER (or should grow a
tie-breaker column in BOTH the query and the oracle — preferred).

Usage: python tools/order_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def top_level_order_by(sql: str) -> str | None:
    """Return the expression list of the LAST depth-0 ORDER BY, or None."""
    depth = 0
    last = None
    for m in re.finditer(r"\(|\)|ORDER\s+BY", sql, re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            last = m.end()
    if last is None:
        return None
    tail = sql[last:]
    # clause runs to LIMIT / end; strip direction + null-placement noise
    tail = re.split(r"\bLIMIT\b", tail, flags=re.IGNORECASE)[0]
    tail = re.sub(r"\b(ASC|DESC|NULLS\s+FIRST|NULLS\s+LAST)\b", "", tail,
                  flags=re.IGNORECASE)
    # the probe selects from the oracle's OUTPUT, where source-table
    # aliases no longer exist — `e.event_id` is output column `event_id`
    tail = re.sub(r"\b[A-Za-z_]\w*\.", "", tail)
    return tail.strip().rstrip(";").strip()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from hadoop_mapreduce_spark.registry import ORACLE

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    non_total, no_order, errors = [], [], []
    for name, sql in sorted(ORACLE.items()):
        key = top_level_order_by(sql)
        if key is None:
            no_order.append(name)
            continue
        # positional keys (ORDER BY 1, 2) → resolve to output column names
        if re.fullmatch(r"[\d\s,]+", key):
            cols = [d[0] for d in con.execute(sql).description]
            key = ", ".join(f'"{cols[int(p) - 1]}"'
                            for p in re.split(r"\s*,\s*", key.strip()))
        probe = (f"SELECT {key}, COUNT(*) AS __n FROM ({sql.rstrip().rstrip(';')}) "
                 f"GROUP BY ALL HAVING COUNT(*) > 1 LIMIT 5")
        try:
            dups = con.execute(probe).fetchall()
        except Exception as e:  # noqa: BLE001
            errors.append((name, str(e).splitlines()[0][:120]))
            continue
        if dups:
            non_total.append((name, key, len(dups)))
            print(f"NON-TOTAL  {name}: key ({key}) has tied tuples, e.g. {dups[0]}")
        else:
            print(f"total      {name:32s} ({key})")

    print()
    print(f"{len(no_order)} oracles with no top-level ORDER BY "
          f"(multiset comparison applies): {no_order}")
    for name, err in errors:
        print(f"ERROR      {name}: {err}")
    if non_total:
        print(f"\n{len(non_total)} NON-TOTAL order keys: "
              f"{[n for n, _, _ in non_total]}")
        return 1
    print("\nall ordered oracles have total sort keys at this sf")
    return 0


if __name__ == "__main__":
    sys.exit(main())
