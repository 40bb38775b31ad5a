"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 via Spark AND its ``oracle_sql()``
via DuckDB over the same parquet, compares row count, column names, and an
order-insensitive value comparison. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from clucene_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for r in rows:
        d = r if isinstance(r, dict) else dict(zip(cols, r))
        key = tuple(d[c] for c in sorted(d.keys()))
        # 9 decimals: tight enough to catch sub-6dp drift the driver's
        # exact value-hash would flag when a gate rotates back into the
        # window, loose enough for engine float formatting parity
        out.append(tuple(round(v, 9) if isinstance(v, float) else v for v in key))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    # data-derived oracle constants (e.g. the trained-IVF centroids) must be
    # computed from the SAME parquet this check compares against
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            ddf = con.sql(oracles[name])
            drows = ddf.fetchall()
            dcols = ddf.columns
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"cols {scols} != {dcols}"))
            print(f"FAIL {name}: cols {scols} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} != {len(drows)}"))
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            continue
        sn = normalize([r.asDict() for r in srows], scols)
        dn = normalize(drows, dcols)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ {diff}")
            continue
        print(f"OK   {name} ({len(srows)} rows)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
