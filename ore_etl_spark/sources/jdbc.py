"""External-DB (JDBC) change-event source (SURVEY §2.1 S6 family).

The reference can read its raw blocks straight from Postgres
(/root/reference/src/datasource/postgres.ts:40-97): a MIN/MAX range probe
over a sequence column, then a range scan of ``(seq, data)`` rows where
``data`` is a JSON array of per-block transactions that gets flattened to
one row per transaction (first signature, blockTime fallback 0, err
fallback NULL, full object kept as parsedData).

Spark-first shape:

- ``seq_range``: one-row MIN/MAX pushed down AS SQL (a dbtable subquery —
  the database scans its index; Spark never pulls the table).
- ``read_seq_range``: Spark's partitioned JDBC read — ``numPartitions``
  executors each issue a stripe of the range (partitionColumn +
  lower/upperBound), and the explicit range filter is pushed into every
  stripe's WHERE clause. This is how a 10^10-row source table reads in
  parallel instead of through one connection.
- ``flatten_block_rows``: the per-block JSON array explodes to per-tx rows
  with the reference's exact extraction semantics — all JVM expressions
  (from_json + posexplode), no Python in the row path.

Works against any JDBC database whose driver jar is on the Spark
classpath; tests use embedded Derby (bundled with Spark) as the stand-in
for Postgres, with ``data`` stored as a JSON VARCHAR the way Postgres
stores jsonb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def seq_range(
    spark: SparkSession,
    url: str,
    table: str,
    seq_col: str,
    driver: str | None = None,
) -> tuple[int | None, int | None]:
    """(min, max) of ``seq_col`` — pushed down to the database as SQL.

    Mirrors the reference's getSlotRange (postgres.ts:40-57): the probe
    that bounds every incremental fetch. Runs as a one-row subquery scan
    on the DB side; (None, None) on an empty table.
    """
    # ANSI double-quoting: Spark's JDBC writer creates case-preserved
    # quoted identifiers, which unquoted references would fold away
    # (Derby/Postgres fold to upper/lower case respectively)
    q = f'"{seq_col}"'
    sub = (f'(SELECT MIN({q}) AS "lo", MAX({q}) AS "hi" '
           f"FROM {table}) q")
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", sub)
    if driver:
        reader = reader.option("driver", driver)
    row = reader.load().collect()[0]
    return (None if row["lo"] is None else int(row["lo"]),
            None if row["hi"] is None else int(row["hi"]))


def read_seq_range(
    spark: SparkSession,
    url: str,
    table: str,
    seq_col: str,
    lo: int,
    hi: int,
    n_partitions: int = 8,
    columns: list[str] | None = None,
    driver: str | None = None,
) -> DataFrame:
    """Parallel range scan: ``WHERE seq_col BETWEEN lo AND hi`` striped
    across ``n_partitions`` concurrent JDBC connections.

    partitionColumn/lowerBound/upperBound STRIPE the read (they do not
    filter), so the inclusive range predicate is applied explicitly —
    Spark pushes it into each stripe's generated WHERE clause, and the
    database serves every stripe from its ``seq_col`` index (reference
    getTransactions, postgres.ts:59-67, parallelized).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", seq_col)
        .option("lowerBound", str(lo))
        .option("upperBound", str(hi + 1))
        .option("numPartitions", str(max(1, n_partitions)))
    )
    if driver:
        reader = reader.option("driver", driver)
    df = reader.load().filter(
        (F.col(seq_col) >= lo) & (F.col(seq_col) <= hi))
    if columns:
        df = df.select(*columns)
    return df


# the per-transaction shape inside a block's `data` array — the subset the
# reference extracts (postgres.ts:73-90); parsedData keeps the full object
def block_tx_schema() -> T.ArrayType:
    return T.ArrayType(T.StructType([
        T.StructField("transaction", T.StructType([
            T.StructField("signatures", T.ArrayType(T.StringType())),
        ])),
        T.StructField("blockTime", T.LongType()),
        T.StructField("meta", T.StructType([
            T.StructField("err", T.StringType()),
        ])),
    ]))


def flatten_block_rows(
    df: DataFrame,
    seq_col: str = "from_block_number",
    data_col: str = "data",
    tx_schema: T.ArrayType | None = None,
) -> DataFrame:
    """One row per transaction from per-block JSON arrays.

    Reference parity (postgres.ts:70-93): signature = first signature or
    'unknown'; block_time = blockTime or 0; err = meta.err or NULL;
    parsedData = the full transaction object (kept as its JSON text so
    schema-on-read stays additive — the dynamic parsedData surface).
    ``posexplode`` preserves the in-block transaction order the
    reference's loop produced; blocks whose array is NULL/empty yield no
    rows, like the Array.isArray guard. Narrow (no shuffle): the flatten
    runs inside the scan stage.
    """
    txs = F.from_json(F.col(data_col), tx_schema or block_tx_schema())
    raw = F.from_json(F.col(data_col), T.ArrayType(T.StringType()))
    ex = df.select(
        F.col(seq_col).cast("long").alias("slot"),
        F.posexplode(F.arrays_zip(txs.alias("tx"), raw.alias("raw")))
        .alias("tx_index", "z"),
    )
    tx = F.col("z.tx")
    return ex.select(
        "slot",
        "tx_index",
        # try_element_at: NULL (not an ANSI error) when signatures is empty
        F.coalesce(F.try_element_at(tx["transaction"]["signatures"], F.lit(1)),
                   F.lit("unknown")).alias("signature"),
        F.coalesce(tx["blockTime"], F.lit(0)).alias("block_time"),
        tx["meta"]["err"].alias("err"),
        F.col("z.raw").alias("parsed_data"),
    )
