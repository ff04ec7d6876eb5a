"""Local replica of the driver's correctness gate: run every declared query
through Spark AND its DuckDB oracle, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

from apache_cassandra_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import oracle_sql, queries

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in os_:
            print(f"ok?  {name}: rows={len(s_rows)} (no oracle, rows-only check)")
            continue
        try:
            res = con.execute(os_[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(s_cols)} != {sorted(d_cols)}")
            continue
        # dtype audit (driver compares schemas; flag likely mismatches)
        duck_types = {d[0]: d[1] for d in res.description}
        spark_types = dict(sdf.dtypes)
        compat = {
            "bigint": {"NUMBER"},
            "int": {"NUMBER"},
            "double": {"NUMBER"},
            "string": {"STRING"},
            "boolean": {"bool"},
            "timestamp": {"DATETIME"},
        }
        for col in s_cols:
            st_, dt_ = spark_types[col], duck_types[col]
            if st_ in compat and dt_ not in compat[st_]:
                print(f"  ~ {name}.{col}: spark={st_} duckdb={dt_}")
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(s_rows)} != {len(d_rows)}")
            continue
        sn, dn = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
        if sn != dn:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            continue
        print(f"PASS {name}: rows={len(s_rows)}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match the oracle")


if __name__ == "__main__":
    main()
