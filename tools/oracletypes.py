#!/usr/bin/env python3
"""Static type sweep over an oracle_sql.json: flag output columns whose
DuckDB type Spark cannot emit.

Usage: python3 tools/oracletypes.py <sfDir> <oracle_sql.json>

DuckDB's sum(BIGINT) returns HUGEINT (INT128) and integer division on it
stays HUGEINT; the driver's typed fetch path converts HUGEINT/DECIMAL to
float64, so such a column formats as `3.0` where Spark's BIGINT prints `3`
— hash-red on equal values (the four-round q44 saga). Binding is lazy
(relation .types never executes the query), so this sweep is instant even
for oracles that would be slow to run.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)  # lazy: binds types, does not execute
            bad = [f"{c}:{t}" for c, t in zip(
                       [d[0] for d in rel.description], rel.types)
                   if str(t).upper().startswith(BANNED)]
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
            continue
        if bad:
            print(f"FLAG {name}: {', '.join(bad)} — cast to BIGINT/DOUBLE")
            n_bad += 1
    print(f"== {len(oracle)} oracles, {n_bad} flagged ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
