"""Dev harness: compare Spark queries() vs DuckDB oracle_sql() at one or
more scale factors (the driver runs sf0.01; pytest runs sf0.001).

Usage: python scripts/oracle_dev.py [sf0.001|sf0.01] name [name ...]
       python scripts/oracle_dev.py sf0.01 --all
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    args = sys.argv[1:]
    sf = args.pop(0) if args and args[0].startswith("sf") else "sf0.01"
    sf_dir = f"/root/testdata/{sf}"

    import __spark_entry__ as E
    names = sorted(E.oracle_sql()) if args == ["--all"] else args

    from graphlab_spark.session import get_spark
    spark = get_spark(app_name="oracle_dev", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for name in names:
        if name not in os_:
            print(f"{name}: NO ORACLE (skipped)")
            continue
        t0 = time.time()
        sp = sorted(tuple(r) for r in qs[name](spark, sf_dir).collect())
        t1 = time.time()
        try:
            dk = sorted(tuple(r) for r in con.execute(os_[name]).fetchall())
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: DUCKDB ERROR {str(exc)[:400]}")
            failures.append(name)
            continue
        t2 = time.time()
        ok = sp == dk
        msg = f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(sp)}/{len(dk)}"
        msg += f" spark={t1 - t0:.1f}s duck={t2 - t1:.1f}s"
        print(msg)
        if not ok:
            failures.append(name)
            sset, dset = set(sp), set(dk)
            print("  spark_only:", sorted(sset - dset)[:5])
            print("  duck_only :", sorted(dset - sset)[:5])
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
