#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization guide §1 calls for).

Modes:
  python bench_extra.py plans  <sf_dir> <out_dir> [query ...]
      Write .explain("formatted") for each query (gated entry or bench
      override config — the same callable bench.py times) to
      <out_dir>/<query>.txt. No execution, cheap.
  python bench_extra.py time   <sf_dir> [query ...]
      Isolated best-of-5 noop-sink walls per query (quiet-load protocol),
      one JSON line to stdout. Uses the same session conf as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

from bench import ANALYTICS_QUERIES, BENCH_QUERY_OVERRIDES, CPUS, bench_conf


def _spark():
    from ore_etl_spark.session import get_spark

    return get_spark("bench-extra", cpus=CPUS,
                     shuffle_partitions=max(CPUS * 2, 16),
                     extra_conf=bench_conf())


def _fn(name: str):
    import __spark_entry__ as entry_mod

    return BENCH_QUERY_OVERRIDES.get(name) or entry_mod.queries()[name]


def capture_plans(sf_dir: str, out_dir: str, names: list[str]) -> None:
    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = _fn(name)
        prepare = getattr(fn, "prepare", None)
        if prepare is not None:
            prepare(spark, sf_dir)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {out_dir}/{name}.txt ({len(plan)} bytes)")


def time_queries(sf_dir: str, names: list[str], trials: int = 5) -> None:
    spark = _spark()
    out = {}
    for name in names:
        fn = _fn(name)
        prepare = getattr(fn, "prepare", None)
        if prepare is not None:
            prepare(spark, sf_dir)
        walls = []
        for t in range(trials):
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(walls), "trials": walls}
        print(f"{name}: best={min(walls)} trials={walls}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": CPUS,
                      "loadavg": list(os.getloadavg()), "queries": out}))


def main():
    mode = sys.argv[1]
    sf_dir = sys.argv[2]
    if mode == "plans":
        out_dir = sys.argv[3]
        names = sys.argv[4:] or ANALYTICS_QUERIES
        capture_plans(sf_dir, out_dir, names)
    elif mode == "time":
        names = sys.argv[3:] or ANALYTICS_QUERIES
        time_queries(sf_dir, names)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
