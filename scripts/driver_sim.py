#!/usr/bin/env python
"""Driver simulation: vanilla session + the exact __spark_entry__
contract + DuckDB compare for the first-50 priority queries — the
strongest pre-round signal (verify skill item 5).

Usage: python scripts/driver_sim.py [master] [shuffle_partitions] [sf_dir] [n]
Defaults: local[16], engine default shuffle partitions, sf0.01, 50.
"""

import importlib.util
import sys
import time

sys.path.insert(0, ".")

MASTER = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
SHUF = sys.argv[2] if len(sys.argv) > 2 else None
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
N = int(sys.argv[4]) if len(sys.argv) > 4 else 50


def main():
    from pyspark.sql import SparkSession

    from tests.oracle import compare, duck_connection

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    b = SparkSession.builder.master(MASTER)  # NO engine confs: the
    if SHUF:                                 # queries must self-prepare
        b = b.config("spark.sql.shuffle.partitions", SHUF)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    con = duck_connection(SF)
    names = list(qs)[:N]
    bad = []
    t0 = time.time()
    for i, name in enumerate(names):
        t = time.time()
        try:
            df = qs[name](spark, SF)
            if name not in oracles:
                nrows = df.count()
                status = f"rows-only ({nrows})"
            else:
                problems = compare(name, df, con, oracles[name])
                status = "OK" if not problems else "; ".join(problems)
                if problems:
                    bad.append(name)
        except Exception as e:  # noqa: BLE001
            status = f"EXC {type(e).__name__}: {e}"[:300]
            bad.append(name)
        print(f"[{i+1:2}/{len(names)}] {name}: {status} "
              f"({time.time()-t:.1f}s)")
    print(f"\n{len(names)-len(bad)}/{len(names)} green in "
          f"{time.time()-t0:.0f}s  master={MASTER} shuf={SHUF} sf={SF}")
    if bad:
        print("RED:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
