#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <name>.parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB (tables = parquet files in sfDir), and
compares: row count, column names (sorted), and values (rows sorted by all
columns). Reports exact and tolerant (1e-9 rel) float mismatches separately.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def fmt_class(duck_type):
    """Collapse a DuckDB type name to the class that decides how the
    driver's typed fetch path FORMATS the value.

    The driver hashes a typed conversion of each result (pandas-style):
    HUGEINT/DECIMAL become float64 there, so `sum(BIGINT)` (HUGEINT in
    DuckDB) prints `3.0` where Spark's BIGINT prints `3` — values equal,
    hash red. fetchall() can't see this (Python ints arrive exact), which
    hid the q44 family for four rounds; this classifier can.
    """
    t = str(duck_type).upper()
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
        return "float"  # pandas-converts to float64 -> '3.0' formatting
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("JSON", "VARCHAR"):
        return "str"  # DuckDB JSON formats as its string body (driver-green)
    return t


def type_mismatches(gcols, gtypes, ecols, etypes):
    """Column-name-matched format-class diffs between Spark output and
    oracle output. Any hit is a latent driver hash-red even when every
    value compares equal."""
    gmap = {c: fmt_class(t) for c, t in zip(gcols, gtypes)}
    out = []
    for c, t in zip(ecols, etypes):
        ec = fmt_class(t)
        if c in gmap and gmap[c] != ec:
            out.append(f"{c}: spark={gmap[c]} oracle={ec}({t})")
    return out


def rows_sorted(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]

    # Floats are rounded in the sort key so tiny drift cannot sort the two
    # sides into different orders and mispair rows in the zip-compare.
    def key_of(x):
        if isinstance(x, float):
            return (x is None, f"{x:.6g}")
        return (x is None, str(x))

    return sorted(out, key=lambda t: tuple(key_of(x) for x in t))


def close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols, gtypes = [d[0] for d in got.description], got.types
            grows = got.fetchall()
            exp = con.sql(sql)
            ecols, etypes = [d[0] for d in exp.description], exp.types
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        tmis = type_mismatches(gcols, gtypes, ecols, etypes)
        if tmis:
            print(f"FAIL {name}: TYPE mismatch (driver hash would differ even "
                  f"on equal values): {'; '.join(tmis)}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        g = rows_sorted(gcols, grows)
        e = rows_sorted(ecols, erows)
        exact = sum(1 for a, b in zip(g, e) if a == b)
        if exact == len(g):
            print(f"PASS {name} ({len(g)} rows, exact)")
            n_pass += 1
            continue
        tol = sum(1 for a, b in zip(g, e)
                  if all(close(x, y) for x, y in zip(a, b)))
        if tol == len(g):
            print(f"WARN {name}: {len(g)-exact}/{len(g)} rows only tolerant-equal (float drift) — hash compare would FAIL")
            for a, b in zip(g, e):
                if a != b:
                    print(f"  got {a}\n  exp {b}")
                    break
            n_fail += 1
        else:
            print(f"FAIL {name}: {len(g)-tol}/{len(g)} rows differ")
            for a, b in zip(g, e):
                if not all(close(x, y) for x, y in zip(a, b)):
                    print(f"  got {a}\n  exp {b}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
