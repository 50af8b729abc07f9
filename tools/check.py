#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify
parquet output against DuckDB running SparkEntry.oracleSql on the same
testdata tables. Builder-side iteration tool only (driver has its own).

Usage: python3 tools/check.py [sfDir] [verifyOut]
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # date/datetime/pandas.Timestamp
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    pydict = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    return [tuple(norm(pydict[c][i]) for c in cols) for i in range(n)], cols


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(p.name for p in OUT.iterdir() if p.is_dir()):
        qdir = OUT / name
        spark_tbl = pq.read_table(qdir)
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={spark_tbl.num_rows}")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"✗ {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_rows, s_cols = rows_of(spark_tbl)
        d_rows, d_cols = rows_of(duck_tbl)
        if s_cols != d_cols:
            print(f"✗ {name}: column mismatch spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # the driver hashes pandas-level values, so arrow-type skew that
        # == tolerates (DuckDB hugeint -> Decimal vs Spark int64; list
        # cells) still hash-mismatches there. Flag it as a failure here.
        type_skew = []
        for c in s_cols:
            st = spark_tbl.schema.field(c).type
            dt = duck_tbl.schema.field(c).type
            for t, side in ((st, "spark"), (dt, "duck")):
                if pa.types.is_list(t) or pa.types.is_large_list(t) \
                        or pa.types.is_decimal(t):
                    type_skew.append(f"{c}: {side}={t}")
            if (st != dt and not (
                    pa.types.is_integer(st) and pa.types.is_integer(dt))
                    and not (pa.types.is_floating(st)
                             and pa.types.is_floating(dt))
                    and not (pa.types.is_timestamp(st)
                             and pa.types.is_timestamp(dt))
                    and not ((pa.types.is_string(st) or pa.types.is_large_string(st))
                             and (pa.types.is_string(dt) or pa.types.is_large_string(dt)))):
                type_skew.append(f"{c}: spark={st} duck={dt}")
        if type_skew:
            print(f"✗ {name}: ARROW TYPE SKEW {type_skew}")
            n_fail += 1
            continue
        # order-insensitive compare (and exact-order compare reported too)
        ordered_eq = s_rows == d_rows
        sorted_eq = sorted(s_rows, key=repr) == sorted(d_rows, key=repr)
        if sorted_eq:
            n_pass += 1
            flag = "" if ordered_eq else " (order differs)"
            print(f"✓ {name}: {len(s_rows)} rows{flag}")
        else:
            n_fail += 1
            print(f"✗ {name}: VALUE MISMATCH spark={len(s_rows)} duck={len(d_rows)} rows")
            ss, dd = sorted(s_rows, key=repr), sorted(d_rows, key=repr)
            shown = 0
            for i in range(max(len(ss), len(dd))):
                a = ss[i] if i < len(ss) else None
                b = dd[i] if i < len(dd) else None
                if a != b and shown < 3:
                    print(f"    spark: {a}\n    duck : {b}")
                    shown += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
