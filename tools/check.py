#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev tool only; the
engine itself is pure Scala/Spark).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each `<verifyOutDir>/<name>/` parquet (written by graft.Verify), runs
the matching SQL from `<verifyOutDir>/oracle_sql.json` in DuckDB with every
testdata table registered as a view, then compares: columns sorted by name,
rows sorted, values stringified (floats repr'd via round-trip).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: {exc}")
            n_bad += 1
            continue
        # Driver-parity dtype check: DuckDB HUGEINT/DECIMAL aggregates (e.g.
        # an uncast sum(BIGINT)) surface as float64 through pandas while the
        # Spark parquet column is int64 — the driver hashes "19525.0" vs
        # "19525" and fails even though fetchall() ints compare equal.
        try:
            g_kinds = {c: k.kind for c, k in con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df().dtypes.items()}
            e_kinds = {c: k.kind for c, k in con.execute(sql).df().dtypes.items()}
            kind_diff = {c: (g_kinds[c], e_kinds[c]) for c in g_kinds
                         if c in e_kinds and g_kinds[c] != e_kinds[c]
                         and {g_kinds[c], e_kinds[c]} & {"f"}}
        except Exception:
            kind_diff = {}
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        if kind_diff:
            print(f"FAIL {name}: dtype kind mismatch through pandas {kind_diff}"
                  " (cast the oracle aggregate, e.g. CAST(sum(x) AS BIGINT))")
            n_bad += 1
        elif gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
        elif gr != er:
            n_bad += 1
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; first diffs:")
            for a, b in list(zip(gr, er))[:200]:
                if a != b:
                    print(f"  spark={a}\n  duck ={b}")
                    break
            if len(gr) != len(er):
                print(f"  row-count mismatch")
        else:
            print(f"ok   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
