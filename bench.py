#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline workload at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "cdc_apply_throughput", "value": <events/sec>, "unit":
     "events/sec", "queries": {...per-query seconds...}, "sf": 0.1}

Headline: end-to-end CDC apply (synthetic WAL -> decode -> LWW ->
MERGE-commit) events/sec, which is BASELINE.json's metric. The WAL is
synthesized by the deterministic generator (no external data; generation is
NOT timed). Analytics probes from __spark_entry__ are timed individually.

Scaling mode (north rule evidence): ``python bench.py --scaling`` runs the
same apply job in two fresh subprocesses at local[N] and local[4N] on the
SAME pre-generated input, then writes BENCH/BASELINE.md with both
throughputs and efficiency = T(4N) / (4 * T(N)).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_KEYS = int(os.environ.get("BENCH_WAL_KEYS", "250000"))
BENCH_BATCHES = int(os.environ.get("BENCH_BATCHES", "4"))

ANALYTICS_QUERIES = [
    "cdc_replay_state", "cdc_asof_join", "agg_top_users", "agg_daily",
    "win_running_total", "pricing_summary", "join_two_aggs",
    "explode_token_popularity",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def gen_wal(spark, out_dir: str, n_keys: int) -> int:
    from ore_etl_spark.datagen.wal import generate_wal

    ev = generate_wal(spark, n_keys=n_keys, n_repos=max(50, n_keys // 1000),
                      n_partitions=32)
    ev.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir).count()


def run_apply(spark, wal_dir: str, work_dir: str, n_events: int,
              batches: int) -> dict:
    from ore_etl_spark.pipeline.apply import CdcApplyPipeline, target_schema
    from ore_etl_spark.tables.merge_table import MergeTable

    tbl = MergeTable.create(
        spark, f"{work_dir}/target", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=64,
    )
    pipe = CdcApplyPipeline(spark, wal_dir, tbl, f"{work_dir}/state",
                            collect_metrics=False)
    lo, hi = pipe.delivery_range()
    span = max(1, (hi - lo) // batches + 1)
    t0 = time.time()
    pipe.run(batch_span=span)
    wall = time.time() - t0
    n_rows = tbl.read().count()
    return {"wall_sec": round(wall, 3), "events_per_sec": round(n_events / wall, 1),
            "n_events": n_events, "n_final_rows": n_rows,
            "table_version": tbl.version}


def run_analytics(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in ANALYTICS_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def bench_once(cpus: int, wal_dir: str | None, keep_json_only: bool = False) -> dict:
    from ore_etl_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=max(cpus * 2, 16))
    work = tempfile.mkdtemp(prefix="ore_bench_")
    try:
        own_wal = wal_dir is None
        if own_wal:
            wal_dir = f"{work}/wal"
            n_events = gen_wal(spark, wal_dir, BENCH_KEYS)
        else:
            n_events = spark.read.parquet(wal_dir).count()
        apply_res = run_apply(spark, wal_dir, work, n_events, BENCH_BATCHES)
        queries = {} if keep_json_only else run_analytics(spark, SF_DIR)
        return {"cpus": cpus, "apply": apply_res, "queries": queries}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--scaling", action="store_true",
                    help="run local[N] vs local[4N] and write BENCH/BASELINE.md")
    ap.add_argument("--wal-dir", default=None,
                    help="pre-generated WAL parquet (for scaling subprocesses)")
    ap.add_argument("--subprocess-json", action="store_true",
                    help="internal: apply-only run, emit one JSON line")
    args = ap.parse_args()

    if args.subprocess_json:
        res = bench_once(args.cpus, args.wal_dir, keep_json_only=True)
        print(json.dumps(res))
        return

    if args.scaling:
        run_scaling(args)
        return

    res = bench_once(args.cpus, args.wal_dir)
    per_q = dict(res["queries"])
    per_q["cdc_apply_full"] = res["apply"]["wall_sec"]
    print(json.dumps({
        "metric": "cdc_apply_throughput",
        "value": res["apply"]["events_per_sec"],
        "unit": "events/sec",
        "queries": per_q,
        "sf": _sf_of(SF_DIR),
        "n_events": res["apply"]["n_events"],
        "cpus": args.cpus,
    }))


def run_scaling(args):
    """Same job, same input, local[N] vs local[4N] -> BENCH/BASELINE.md."""
    n = max(2, args.cpus // 4)
    n4 = args.cpus
    wal_dir = tempfile.mkdtemp(prefix="ore_scaling_wal_") + "/wal"
    from ore_etl_spark.session import get_spark

    spark = get_spark("bench-gen", cpus=n4)
    n_events = gen_wal(spark, wal_dir, BENCH_KEYS)
    spark.stop()

    results = {}
    for cpus in (n, n4):
        out = subprocess.run(
            [sys.executable, __file__, "--subprocess-json",
             "--cpus", str(cpus), "--wal-dir", wal_dir],
            capture_output=True, text=True, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)

    t_n = results[n]["apply"]["events_per_sec"]
    t_4n = results[n4]["apply"]["events_per_sec"]
    eff = t_4n / (4 * t_n)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — scaling-efficiency evidence (north rule)

Protocol: identical CDC apply job (decode -> LWW dedup -> MERGE commit,
{BENCH_BATCHES} micro-batches) over the SAME pre-generated WAL
({n_events} events, {BENCH_KEYS} keys, hot-repo skew, dups + late +
corrupt events), run in two fresh JVMs at two parallelism levels.
In-sandbox stand-in for N vs 4N executors per BASELINE.json.

| parallelism | wall (s) | throughput (events/s) |
|---|---|---|
| local[{n}] | {results[n]['apply']['wall_sec']} | {t_n} |
| local[{n4}] | {results[n4]['apply']['wall_sec']} | {t_4n} |

**Scaling efficiency** = T(4N) / (4 * T(N)) = {t_4n:.1f} / (4 * {t_n:.1f})
= **{eff:.3f}** (target >= 0.8)

Reference single-node baseline (BASELINE.md): 1,000-2,000 events/s.
""")
    print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 3),
                      "unit": "ratio", "throughput": {f"local[{n}]": t_n,
                                                      f"local[{n4}]": t_4n},
                      "n_events": n_events}))
    shutil.rmtree(os.path.dirname(wal_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
