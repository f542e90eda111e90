"""External-DB (JDBC) source — reference postgres.ts:40-97 semantics over
embedded Derby (the JDBC database bundled with Spark) as the in-sandbox
stand-in for Postgres:

- min/max seq probe pushed down as SQL;
- parallel partitioned range scan with an inclusive pushed-down predicate;
- per-block JSON `data` array flattened to per-transaction rows with the
  reference's exact extraction rules (first signature / 'unknown',
  blockTime fallback 0, meta.err fallback NULL, full element JSON kept).
"""

import json

import pytest
from pyspark.sql import functions as F

from ore_etl_spark.sources.jdbc import (block_tx_schema, flatten_block_rows,
                                        read_seq_range, seq_range)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _tx(sig, block_time=None, err=None, extra=None):
    d = {"transaction": {"signatures": [sig] if sig else []}}
    if block_time is not None:
        d["blockTime"] = block_time
    if err is not None:
        d["meta"] = {"err": err}
    if extra:
        d.update(extra)  # unknown fields must survive into parsed_data
    return d


@pytest.fixture(scope="module")
def derby(spark, tmpdir_factory):
    """A Derby table shaped like the reference's public.ore: one row per
    block range, `data` holding the JSON array of transactions (Postgres
    jsonb stand-in)."""
    url = f"jdbc:derby:{tmpdir_factory.mktemp('derby')}/oredb;create=true"
    blocks = [
        (100, [_tx("sigA", 11, None), _tx("sigB", None, "oops",
                                          {"custom": {"deep": 1}})]),
        (101, [_tx(None, 22)]),          # no signatures -> 'unknown'
        (102, []),                        # empty array -> no rows
        (103, [_tx("sigC")]),
        (200, [_tx("sigD", 44)]),
    ]
    rows = [(seq, json.dumps(data)) for seq, data in blocks]
    df = spark.createDataFrame(rows, "from_block_number int, data string")
    (df.write.format("jdbc").option("url", url)
       .option("dbtable", "ore").option("driver", DRIVER).save())
    return url


def test_seq_range_pushed_down(spark, derby):
    lo, hi = seq_range(spark, derby, "ore", "from_block_number",
                       driver=DRIVER)
    assert (lo, hi) == (100, 200)


def test_partitioned_range_scan_filters_and_stripes(spark, derby):
    df = read_seq_range(spark, derby, "ore", "from_block_number",
                        lo=100, hi=103, n_partitions=4, driver=DRIVER)
    # the range predicate reaches the database, not Spark
    assert df.rdd.getNumPartitions() == 4
    seqs = sorted(r["from_block_number"] for r in df.collect())
    assert seqs == [100, 101, 102, 103]  # inclusive both ends, 200 pruned


def test_flatten_matches_reference_extraction(spark, derby):
    df = read_seq_range(spark, derby, "ore", "from_block_number",
                        lo=100, hi=200, n_partitions=2, driver=DRIVER)
    out = flatten_block_rows(df).orderBy("slot", "tx_index").collect()
    got = [(r["slot"], r["tx_index"], r["signature"], r["block_time"],
            r["err"]) for r in out]
    assert got == [
        (100, 0, "sigA", 11, None),
        (100, 1, "sigB", 0, "oops"),   # blockTime fallback 0
        (101, 0, "unknown", 22, None),  # no signature -> 'unknown'
        (103, 0, "sigC", 0, None),
        (200, 0, "sigD", 44, None),
    ]
    # block 102's empty array yielded nothing (Array.isArray guard parity)
    assert all(r["slot"] != 102 for r in out)
    # parsed_data keeps the FULL element including fields outside the
    # extraction schema (the dynamic parsedData surface)
    sig_b = next(r for r in out if r["signature"] == "sigB")
    assert json.loads(r if isinstance((r := sig_b["parsed_data"]), str)
                      else r)["custom"] == {"deep": 1}


def test_flatten_is_narrow_no_shuffle(spark, derby):
    df = read_seq_range(spark, derby, "ore", "from_block_number",
                        lo=100, hi=200, n_partitions=2, driver=DRIVER)
    plan = flatten_block_rows(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # explode rides the scan stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
