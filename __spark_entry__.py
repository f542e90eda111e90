"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay on sf0.001. ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operator set); ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet views. Column names are aliased identically
on both sides; float aggregates are rounded on both sides so the driver's
value-hash compares stably.

The CDC queries derive a deterministic change-event WAL from the shared
``documents`` table (see ore_etl_spark/datagen/sql_wal.py) so the engine's
replay semantics — vectorized payload decode, in-batch LWW dedup,
delete/tombstone handling — are checkable against a pure SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ore_etl_spark.datagen.sql_wal import WAL_SQL, derive_wal
from ore_etl_spark.operators.asof import asof_join_union
from ore_etl_spark.operators.decode import decode_events
from ore_etl_spark.operators.lww import dedupe_lww


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _utc(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Small single-file dims (documents/embeddings) arrive as ONE input
    split; CPU-heavy per-row work (md5 minhash, shingling, gram explode,
    vector math) would otherwise run on one core. Spread rows first —
    every downstream derivation here is hash-based and
    partitioning-independent (same trick as datagen/sql_wal.derive_wal;
    measured 222 s -> ~20 s for minhash LSH at sf0.1 on local[32])."""
    return df.repartition(spark.sparkContext.defaultParallelism)


def _dsum(col, scale: int = 4):
    """Exact, order-independent group sum of a double column.

    ``round(sum(double), k)`` is a hash flake: Spark's partial-agg combine
    order varies run-to-run, so a float sum sitting within ~1e-12 of a
    rounding boundary flips digits (the round-2 ``win_sessionize`` failure).
    Accumulating in decimal(38,6) makes the sum exact and associative —
    identical bits at any parallelism — then round + cast back to double.
    Oracle side mirrors with ``round(sum(x::DECIMAL(38,6)), k)::DOUBLE``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(38,6)")), scale).cast("double")


def _davg(col, scale: int = 6):
    """Order-independent avg: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(c), scale
    )


# ---------------------------------------------------------------------------
# CDC engine queries (SURVEY §2.1-2.3, §2.8 surfaces)
# ---------------------------------------------------------------------------

def q_cdc_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full WAL replay -> converged state (S7+A7+T5 semantics).

    Exercises the real operator chain: payload encode->vectorized decode
    (identity on content), in-batch LWW dedup, DELETE filtering. Equivalent
    to MergeTable replay collapsed to one batch (the multi-batch path is
    covered by tests/test_apply_e2e.py against the pandas oracle).
    """
    wal = derive_wal(spark, sf_dir)
    decoded = decode_events(wal).filter(F.col("is_valid"))
    live = dedupe_lww(decoded, ["repo", "path"], ["commit_seq", "event_seq"])
    return live.filter(F.col("op") != "DELETE").select(
        "repo", "path", "commit", "lang", "commit_seq",
        F.col("content_sha256"), F.col("content_len"),
    )


def q_cdc_wal_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S5: watermark-bounded ordered scan with predicate pushdown."""
    wal = derive_wal(spark, sf_dir, with_payload=False)
    return wal.filter(
        (F.col("commit_seq") > 1000000) & (F.col("commit_seq") <= 2000500)
        & (F.col("op") != "DELETE")
    ).select("repo", "path", "commit_seq", "event_seq", "op", "lang")


def q_cdc_watermark_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S4: per-source-partition watermark range."""
    wal = derive_wal(spark, sf_dir, with_payload=False)
    return wal.groupBy("repo").agg(
        F.min("commit_seq").alias("min_seq"),
        F.max("commit_seq").alias("max_seq"),
        F.count("*").alias("n_events"),
    )


def q_cdc_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: in-batch LWW dedup — per repo, survivors and dropped counts."""
    wal = derive_wal(spark, sf_dir, with_payload=False)
    live = dedupe_lww(wal, ["repo", "path"], ["commit_seq", "event_seq"])
    return live.groupBy("repo").agg(
        F.count("*").alias("n_keys"),
        F.max("commit_seq").alias("hwm"),
        F.sum(F.when(F.col("op") == "DELETE", 1).otherwise(0)).alias("n_tombstones"),
    )


def q_cdc_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2: lag-based sequence-gap detection per stream partition."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    gaps = ev.withColumn("prev_id", F.lag("event_id").over(w)).withColumn(
        "gap", F.col("event_id") - F.col("prev_id")
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("gap").alias("max_gap"),
        F.sum(F.when(F.col("gap") > 100, 1).otherwise(0)).alias("n_big_gaps"),
    )


def q_cdc_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: as-of join — each purchase gets the latest prior click (per user).

    Union + ordered-window implementation (sort-merge as-of, one shuffle,
    no row explosion) — the scalable replacement for the reference's
    query-per-event lookup (reset-etl.ts:272-314).
    """
    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_union(
        purchases,
        clicks.withColumnRenamed("event_id", "click_id"),
        on=["user_id"], time_col="ts", value_cols=["click_id"], tie_col="click_id",
    )
    return out.select("event_id", "user_id", "click_id")


_CHANGELOG_W1 = 250  # watermark: v0 events for doc_id <= 250 (sf-independent)


def q_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC *read* side (MergeTable.changes / Delta-CDF analog): keyed delta
    between the LWW state at watermark W1 and the final state. Emits
    insert / delete / update_preimage / update_postimage rows; keys whose
    winning version is identical on both sides emit nothing, and a key
    created+deleted inside the interval emits nothing (net effect).
    The table-backed variant (manifest-diff bucket pruning) is pinned by
    tests/test_changelog_gc.py; this functional form is the oracle gate."""
    keys, vers = ["repo", "path"], ["commit_seq", "event_seq"]
    wal = derive_wal(spark, sf_dir, with_payload=False).filter(~F.col("corrupt"))
    cols = ["repo", "path", "op", "commit_seq", "content"]
    a = dedupe_lww(wal.filter(F.col("commit_seq") <= _CHANGELOG_W1), keys, vers)
    b = dedupe_lww(wal, keys, vers)
    j = a.select(*cols).alias("a").join(
        b.select(*cols).alias("b"),
        (F.col("a.repo") == F.col("b.repo")) & (F.col("a.path") == F.col("b.path")),
        "full_outer",
    )
    a_live = F.col("a.repo").isNotNull() & (F.col("a.op") != F.lit("DELETE"))
    b_live = F.col("b.repo").isNotNull() & (F.col("b.op") != F.lit("DELETE"))
    ver_changed = (
        F.coalesce(F.col("a.commit_seq"), F.lit(-1))
        != F.coalesce(F.col("b.commit_seq"), F.lit(-1))
    )

    def img(side: str, ctype: str, cond):
        return F.when(cond, F.struct(
            F.col(f"{side}.repo").alias("repo"),
            F.col(f"{side}.path").alias("path"),
            F.lit(ctype).alias("change_type"),
            F.col(f"{side}.commit_seq").alias("commit_seq"),
            F.sha2(F.col(f"{side}.content"), 256).alias("content_sha256"),
        ))

    upd = a_live & b_live & ver_changed
    packed = F.array_compact(F.array(
        img("b", "insert", b_live & ~a_live & ver_changed),
        img("a", "delete", a_live & ~b_live),
        img("a", "update_preimage", upd),
        img("b", "update_postimage", upd),
    ))
    return j.select(F.explode(packed).alias("c")).select("c.*")


# ---------------------------------------------------------------------------
# Analytics probes (SURVEY §2.5-2.7)
# ---------------------------------------------------------------------------

def q_cdc_quarantine_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: undecodable payloads -> quarantine, never fail the batch.

    The engine decides validity from the payload bytes alone; the oracle
    recomputes the corrupt set from the WAL derivation rule. Counts must
    match per repo."""
    wal = derive_wal(spark, sf_dir)
    bad = decode_events(wal).filter(~F.col("is_valid"))
    return bad.groupBy("repo").agg(
        F.count("*").alias("n_quarantined"),
        F.min("commit_seq").alias("first_bad_seq"),
    )


def q_agg_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W5: top-K by sum with count + countDistinct (top miners analog)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            _dsum("value").alias("total_value"),
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(10)
    )


def q_agg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: group by categorical: count/sum/avg (automation-vs-manual analog)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        _dsum("value").alias("sum_value"),
        _davg("value").alias("avg_value"),
    )


def q_agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/T9: daily tumbling-window stats."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        _dsum("value").alias("sum_value"),
    )


def q_agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6: global aggregate (round-stats analog)."""
    ev = _read(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        _davg("value").alias("avg_value"),
    )


def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: bucketed histogram of event values."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", (F.floor(F.col("value") / 50) * 50).cast("long"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def q_agg_multi_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: N predicate-counts in one pass (vs reference's 7 scans)."""
    ev = _read(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchase"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
        F.sum(F.when(F.col("value") > 500, 1).otherwise(0)).alias("n_high_value"),
        F.sum(F.when(F.col("props").rlike('"k": 9'), 1).otherwise(0)).alias("n_k9"),
    )


def q_win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: running total per user over event order."""
    ev = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


def q_win_lag_downtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: downtime detection — per-user inter-event gaps > 1h."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # parquet ts is NTZ
    gaps = ev.withColumn("gap_s", epoch - F.lag(epoch).over(w))
    return gaps.filter(F.col("gap_s") > 3600).select(
        "user_id", "event_id", "gap_s"
    )


def q_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (W1-W3 composition): per-user sessions split on
    inter-event gaps > 30 min — lag for the gap, a running sum of
    new-session flags for the session id, then one aggregate per session.
    One shuffle on user_id feeds both windows and the groupBy (same key),
    so the plan stays a single exchange at any scale."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # parquet ts is NTZ
    s = (
        ev.withColumn("gap_s", epoch - F.lag(epoch).over(w))
        .withColumn(
            "new_sess",
            F.when(F.col("gap_s").isNull() | (F.col("gap_s") > 1800), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(epoch) - F.min(epoch)).alias("dur_s"),
        _dsum("value").alias("total_value"),
    )


def q_sort_recent_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: recent-N scan (sort desc + limit -> TakeOrderedAndProject)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(20)
        .select("event_id", "user_id", "event_type")
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the headline relational aggregate."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            _davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_two_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3: combine two aggregates on a shared key (per-round analog)."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    o_agg = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        _dsum("o_totalprice").alias("total_spent"),
    )
    # r6 (guide §2.3: aggregate before you shuffle): collapse lineitem to
    # one exact-decimal partial sum per order BEFORE the orders join —
    # the join then shuffles ~N_orders rows instead of every lineitem row
    # (map-side combine already collapses co-located order lines on the
    # scan side). Decimal sums are exact and associative, so
    # round(sum(partial sums)) is bit-identical to the flat
    # round(sum(lines)) the oracle computes.
    li_per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("_q"))
    li_agg = (
        li_per_order.join(orders.select("o_orderkey", "o_custkey"),
                          F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum("_q"), 4).cast("double").alias("total_qty"))
    )
    return o_agg.join(li_agg, "o_custkey", "outer").select(
        "o_custkey", "n_orders", "total_spent", "total_qty"
    )


def q_explode_token_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: explode + group (square-popularity analog) over document tokens."""
    d = _spread(spark, _read(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Reference decode-surface parity (SURVEY §2.3): the reference's scalar
# decode shapes re-expressed as vectorized column programs over `events`
# ---------------------------------------------------------------------------

def q_decode_log_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: log-line regex extraction. Synthesizes 'Round #N: deploying X SOL
    to K squares' lines (log-parser.ts:85-216 shape) and parses them back
    with regexp_extract — round-trip must be lossless."""
    ev = _read(spark, sf_dir, "events")
    logline = F.concat(
        F.lit("Round #"), F.col("event_id").cast("string"),
        F.lit(": deploying "), F.round(F.col("value"), 2).cast("string"),
        F.lit(" SOL to "), (F.col("user_id") % 25 + 1).cast("string"),
        F.lit(" squares"),
    )
    pat = r"Round #(\d+): deploying ([\d.]+) SOL to (\d+) squares"
    return ev.select(
        "event_id",
        F.regexp_extract(logline, pat, 1).cast("long").alias("round_id"),
        F.regexp_extract(logline, pat, 2).cast("double").alias("amount_sol"),
        F.regexp_extract(logline, pat, 3).cast("int").alias("n_squares"),
    )


def q_decode_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: 25-bit mask -> set-bit index array (instruction-parser.ts:40-45)."""
    ev = _read(spark, sf_dir, "events")
    mask = (F.col("event_id") % 33554432).cast("long")
    # shiftright(col, n) needs a literal n — shift via 2^i division instead
    squares = F.filter(
        F.sequence(F.lit(0), F.lit(24)),
        lambda i: (mask / F.pow(F.lit(2.0), i.cast("double"))).cast("long") % 2 == 1,
    )
    return ev.select(
        "event_id",
        F.size(squares).alias("n_squares"),
        F.try_element_at(squares, F.lit(1)).alias("first_square"),
        F.try_element_at(squares, F.lit(-1)).alias("last_square"),
    )


def q_decode_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5/D8: positional account extraction + coalesce fallback chain
    (instruction-parser.ts:88-229, deploy-etl.ts:213-223): role layout
    switches on a type discriminator; authority falls back signer -> first."""
    ev = _read(spark, sf_dir, "events")
    accounts = F.array(
        F.concat(F.lit("acc"), F.col("user_id").cast("string")),
        F.concat(F.lit("acc"), (F.col("event_id") % 100).cast("string")),
        F.concat(F.lit("acc"), F.floor(F.col("value")).cast("string")),
    )
    itype = (F.col("event_id") % 4).cast("int")
    signer = F.element_at(accounts, 1)
    authority = (
        F.when(itype == 2, F.element_at(accounts, 3))
        .when(itype == 3, F.element_at(accounts, 2))
        .otherwise(F.lit(None))
    )
    automation = F.when(itype == 3, F.element_at(accounts, 3)).otherwise(F.lit(None))
    return ev.select(
        "event_id",
        F.coalesce(authority, signer, F.element_at(accounts, 1)).alias("authority"),
        (automation.isNotNull()).alias("is_automation"),
    )


def q_decode_multiline_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: multi-part log merge — last non-null wins across a stream
    (log-parser.ts:218-244): carry the latest qualifying marker forward."""
    ev = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker = F.when(F.col("value") > 300, F.col("event_type"))
    return ev.select(
        "event_id", "user_id",
        F.last(marker, ignorenulls=True).over(w).alias("last_big_type"),
    )


def q_decode_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12: SOL<->lamports x1e9 integer round-trip (log-parser.ts:5-6)."""
    ev = _read(spark, sf_dir, "events")
    lamports = F.round(F.col("value") * 1e9).cast("long")
    return ev.select(
        "event_id", lamports.alias("lamports"),
        F.round(lamports / 1e9, 6).alias("sol_roundtrip"),
    )


def q_decode_balance_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15: post-pre balance delta via zip_with (reset-etl.ts:206-231)."""
    e = _spread(spark, _read(spark, sf_dir, "embeddings"))
    pre = F.col("embedding")
    post = F.transform(pre, lambda x: x.cast("double") * 1.1)
    delta = F.zip_with(post, F.transform(pre, lambda x: x.cast("double")),
                       lambda a, b: a - b)
    return e.select(
        "vec_id",
        F.round(F.aggregate(delta, F.lit(0.0), lambda acc, v: acc + v), 4)
        .alias("total_delta"),
        F.size(F.filter(delta, lambda v: v > 0)).alias("n_positive"),
    )


def q_decode_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10: literal best-of-N candidate selection — the reference's 3-tier
    preference cascade (deploy-etl.ts:146-210): prefer a candidate with
    mask != 0 AND |amount - expected| < 1000; else the first with
    mask != 0; else the first candidate. Candidates are an array<struct>
    filtered per tier; the winner's fields are emitted with the tier."""
    ev = _read(spark, sf_dir, "events")
    base = F.round(F.col("value") * 1e9).cast("long")

    def cand(i: int):
        mask = F.when((F.col("event_id") + i) % 3 == 0, F.lit(0).cast("long")) \
            .otherwise((F.col("event_id") + i) % 33554432)
        amount = base + F.when((F.col("event_id") * i) % 2 == 0,
                               F.lit(i * 100)).otherwise(F.lit(i * 10000))
        # diff precomputed INTO the struct: a HOF lambda capturing an outer
        # column (base) trips Spark's codegen fallback (isNull-rvalue bug);
        # with lambda-only references the filter stays in codegen
        return F.struct(mask.alias("mask"), amount.alias("amount"),
                        F.abs(amount - base).alias("diff"))

    cands = F.array(cand(1), cand(2), cand(3))
    t1 = F.filter(cands, lambda c: (c["mask"] != 0) & (c["diff"] < 1000))
    t2 = F.filter(cands, lambda c: c["mask"] != 0)
    tier = (F.when(F.size(t1) > 0, 1).when(F.size(t2) > 0, 2).otherwise(3)
            .cast("int"))
    # first element of (tier1 ++ tier2 ++ all) IS the cascade winner —
    # t1 ⊆ t2 ⊆ cands, so concat order encodes the preference; cands is
    # never empty so element_at(.., 1) is total. (A when-chain of
    # try_element_at(..)[field] branches trips Spark's isNull-rvalue
    # codegen bug and falls back to interpreted eval; this form compiles.)
    chosen = F.element_at(F.concat(t1, t2, cands), 1)
    return ev.select(
        "event_id", tier.alias("tier"),
        chosen["mask"].alias("chosen_mask"),
        chosen["amount"].alias("chosen_amount"),
    )


def q_decode_xor_rng(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14: XOR-fold RNG % N (reference board-position draw,
    instruction-parser.ts XOR-fold shape): hash -> 4 u32 words -> XOR fold
    -> pmod 25. md5-based portable analog (the reference folds u64 words of
    a b58-decoded signature; u64 overflows signed SQL integers, so the
    fold here is 4 LE-independent u32 words covering the whole digest)."""
    ev = _read(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    words = [F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
             for i in range(4)]
    fold = words[0].bitwiseXOR(words[1]).bitwiseXOR(words[2]).bitwiseXOR(words[3])
    return ev.select(
        "event_id", fold.alias("xor_fold"),
        F.pmod(fold, F.lit(25)).cast("int").alias("square"),
    )


def q_router_multi_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 router: one event fans out to 0..N typed records; a purchase
    emits BOTH purchase_rec and spend_rec (the claim_ore/claim_yield
    double-emit, activity-parser.test.ts:158-161)."""
    ev = _read(spark, sf_dir, "events")
    recs = F.when(
        F.col("event_type") == "purchase",
        F.array(F.lit("purchase_rec"), F.lit("spend_rec")),
    ).when(
        F.col("event_type") == "error", F.array(F.lit("error_rec"))
    ).when(
        F.col("event_type") == "signup", F.array(F.lit("user_rec"))
    ).otherwise(F.array().cast("array<string>"))
    return (
        ev.select(F.explode(recs).alias("record_type"), "value")
        .groupBy("record_type")
        .agg(F.count("*").alias("n"), _dsum("value").alias("sum_value"))
    )


def q_anti_join_unprocessed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: anti-join "skip already processed" shape (CODE-REVIEW.md:59-81):
    customers with no orders (left_anti against the processed-keys set)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return (
        cust.join(orders.select("o_custkey").distinct(),
                  cust.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS/CUBE (noted built-in in SURVEY §2.5)."""
    li = _read(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum("l_quantity").alias("sum_qty")
    )


def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: top-K per group via row_number (top-2 events per user by value)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("user_id", "event_id", "rk")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators (first-class: dedup / text / similarity)
# ---------------------------------------------------------------------------

def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + token counting + lang-id heuristic per document.

    r6 plan shape (guide §1.2): tokenize ONCE per row into two shared
    array columns (split+filter HOFs sit outside codegen subexpression
    elimination, so the flat form re-tokenized ~7x per row), then derive
    every feature from the arrays; quality reuses the already-rounded
    ratio columns — identical arithmetic, identical values (same
    ``*_from_tokens`` expressions the string forms delegate to)."""
    from ore_etl_spark.functions.text import (
        lang_id_from_tokens, mean_token_len_from_tokens, punct_ratio,
        quality_score_from, stopword_ratio_from_tokens, tokens,
        word_token_count,
    )

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    c = F.col("text")
    base = d.select(
        "doc_id", c.alias("text"),
        tokens(c).alias("_tk"),
        tokens(F.lower(c)).alias("_lt"),
    )
    feat = base.select(
        "doc_id",
        F.size("_tk").alias("n_tokens"),
        word_token_count(F.col("text")).alias("n_word_tokens"),
        punct_ratio(F.col("text")).alias("punct_ratio"),
        stopword_ratio_from_tokens(F.col("_lt")).alias("stopword_ratio"),
        mean_token_len_from_tokens(F.col("_tk")).alias("mean_token_len"),
        F.length("text").alias("_len"),
        lang_id_from_tokens(F.col("_lt")).alias("lang_pred"),
    )
    return feat.select(
        "doc_id", "n_tokens", "n_word_tokens", "punct_ratio",
        "stopword_ratio", "mean_token_len",
        quality_score_from(F.col("_len"), F.col("punct_ratio"),
                           F.col("stopword_ratio")).alias("quality"),
        "lang_pred",
    )


def q_pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus assembly: pack documents (doc_id order) into training
    shards of ~2000 tokens — shard = floor(preceding_tokens / budget),
    a pure function of global order + token counts. The engine runs a
    DISTRIBUTED prefix sum (domain-ranged local cumsums + a P-row
    offset fold; no single-task global window — the plan shape is
    pinned in tests/test_sampling.py); the oracle replays the same
    definition as one SQL window, which is fine at sf0.01 and would be
    the 100 TB bottleneck the engine avoids."""
    from ore_etl_spark.functions.sampling import pack_token_shards
    from ore_etl_spark.functions.text import token_count

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))
    return pack_token_shards(toks, budget=2000, num_partitions=8).select(
        "doc_id", "n_tokens", "shard")


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment via a portable
    md5-derived draw (reproducible outside Spark — the DuckDB oracle
    recomputes the exact same md5 arithmetic). Checked via
    scripts/check_oracles.py's EXTRA_ORACLES (the 50-slot driver gate
    is full; rotation policy in COVERAGE.md)."""
    from ore_etl_spark.functions.sampling import hash_split

    d = _read(spark, sf_dir, "documents").select("doc_id")
    return hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document chunking: 32-token training windows with 8 tokens
    of overlapping context (tokenize -> sequence -> one explode, pure
    JVM, no shuffle). 32/8 is sized so the sf0.01 corpus (10-99 tokens
    per doc) exercises BOTH paths — short docs stay single-chunk, long
    ones split into up to 4 overlapping windows. EXTRA_ORACLES-checked:
    DuckDB reproduces the integer chunk boundaries and the joined chunk
    text byte-for-byte."""
    from ore_etl_spark.functions.text import chunk_documents

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    return chunk_documents(d, max_tokens=32, overlap=8)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing audit. The corpus is synthetic, so each document is
    first augmented with DETERMINISTIC pii-shaped spans (an email, an
    IPv4, a card-PAN digit run derived from doc_id) using the same
    string expression on both engines — the oracle then proves the
    redaction itself, not just a no-op pass over clean text.
    EXTRA_ORACLES-checked (the 50-slot gate is full; policy in
    COVERAGE.md)."""
    from ore_etl_spark.functions.text import pii_redact

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 card 4111111111111111"),
        ).alias("text"))
    return pii_redact(aug).select("doc_id", "clean_text", "n_email",
                                  "n_ipv4", "n_longnum")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by normalized-content digest (hash groupBy)."""
    from ore_etl_spark.functions.dedup import exact_dup_groups

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    return exact_dup_groups(d)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (shingle -> minhash -> band -> bucket join)."""
    from ore_etl_spark.functions.dedup import minhash_lsh_candidates

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    return (
        minhash_lsh_candidates(d, n_hashes=8, band_size=2)
        .groupBy("id_a", "id_b").agg(F.count("*").alias("n_bands"))
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters: LSH candidate pairs -> connected components
    (alternating large-star/small-star, O(log n) rounds) -> canonical
    cluster label (= min doc_id) per clustered doc. The step that turns
    near-dup PAIRS into KEEP/DROP decisions; oracle replays the closure
    with a recursive CTE."""
    from ore_etl_spark.functions.dedup import (
        connected_components, minhash_lsh_candidates,
    )

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    # no .distinct() here (r6): connected_components dedups its edge set
    # internally (and checkpoints the projected pairs), so a distinct on
    # this side was a redundant extra shuffle of the candidate list
    pairs = minhash_lsh_candidates(d, n_hashes=8, band_size=2).select(
        "id_a", "id_b"
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component")
    )


def q_dedup_chunk_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked-fingerprint partial-match blocking: docs sharing any
    (chunk_idx, chunk_md5) are edit-locality candidates. Fixed 64-char
    chunks are prefix-stable, so a doc and its tail-edited variant still
    collide on every untouched chunk. The corpus here is documents plus a
    deterministic tail-edited copy of each doc (doc_id + 10^6) — each
    original must pair with its variant on all its full chunks. Equi-join
    on the chunk key: the no-all-pairs LSH-banding shape."""
    from ore_etl_spark.functions.text import chunk_fingerprints

    d = _spread(spark, _read(spark, sf_dir, "documents")).select("doc_id", "text")
    variant = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" edited tail marker")).alias("text"),
    )
    corpus = d.unionByName(variant)
    ch = corpus.select(
        "doc_id",
        F.posexplode(chunk_fingerprints(F.col("text"))).alias("idx", "h"),
    )
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(
            b,
            (F.col("a.idx") == F.col("b.idx"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )


def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/Pile-style): flag corpus docs that
    share any word 8-gram with a benchmark set. Benchmark = docs with
    doc_id % 31 == 0; corpus docs with doc_id % 10 == 3 are deterministically
    contaminated by appending the first 8 tokens of benchmark doc
    (doc_id % 17) * 31 — the query must flag exactly those (plus any organic
    collisions). The benchmark n-gram side is small -> broadcast equi-join
    on the gram, never an all-pairs scan."""
    from ore_etl_spark.functions.dedup import norm_text, shingles

    d = _spread(spark, _read(spark, sf_dir, "documents")).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 31 == 0)
    snippet = F.concat_ws(
        " ", F.slice(F.filter(F.split(norm_text(F.col("text")), " "),
                              lambda t: t != ""), 1, 8)
    )
    bsnip = bench.select((F.col("doc_id") / 31).cast("long").alias("bk"),
                         snippet.alias("snip"))
    corpus = (
        d.withColumn("bk", (F.col("doc_id") % 17).cast("long"))
        .join(F.broadcast(bsnip), "bk", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 10 == 3) & F.col("snip").isNotNull(),
                F.concat(F.col("text"), F.lit(" "), F.col("snip")),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    # NOTE (r6 optimization, guide §2.3/§2.4): no ``.distinct()`` here —
    # ``shingles`` already ``array_distinct``s per doc, so the exploded
    # (id, gram) rows are unique by construction and the old distinct was
    # a pure no-op that shuffled the FULL corpus gram explosion (~N×L
    # rows) before the broadcast probe could discard ~all of it (the
    # largest sf1 wall, 12.3 s). The corpus side is now a map-only
    # explode feeding the broadcast hash join.
    grams = lambda df, idc: df.select(  # noqa: E731
        F.col("doc_id").alias(idc),
        F.explode(shingles(F.col("text"), 8)).alias("g"),
    )
    bg = grams(bench, "bench_id")
    cg = grams(corpus, "doc_id")
    hits = cg.join(F.broadcast(bg), "g").filter(
        F.col("doc_id") != F.col("bench_id")
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("bench_id").alias("n_bench_sources"),
        F.count("*").alias("n_shared_grams"),
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document + docs sharing a signature
    (explode->codegen-agg signature form; values identical to simhash16)."""
    from ore_etl_spark.functions.dedup import simhash_signatures_agg

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    sigs = simhash_signatures_agg(d, "text", "doc_id", bits=16)
    return sigs.groupBy(F.col("sig").alias("simhash")).agg(
        F.count("*").alias("n_docs"), F.min("id").alias("min_doc_id")
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard verification over LSH candidate pairs (never all-pairs)."""
    from ore_etl_spark.functions.dedup import (
        jaccard_from_shingles, minhash_lsh_candidates, shingles,
    )

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    cands = minhash_lsh_candidates(d, n_hashes=8, band_size=2) \
        .select("id_a", "id_b").distinct()
    # r6 (guide §1.2): shingle ONCE PER DOC in the join-side projections —
    # the old per-pair ngram_jaccard(text_a, text_b) redid both documents'
    # shingling for every candidate pair (pairs >> docs at scale; 183 s at
    # sf1). jaccard_from_shingles computes the identical rounded value
    # from the same arrays, so the gated output is unchanged.
    a = d.select(F.col("doc_id").alias("id_a"),
                 shingles(F.col("text")).alias("_sa"))
    b = d.select(F.col("doc_id").alias("id_b"),
                 shingles(F.col("text")).alias("_sb"))
    # plain equi-joins: AQE broadcasts while documents fit the threshold and
    # falls back to shuffled joins beyond it — a forced broadcast() here
    # would OOM the driver once documents outgrow sandbox scale
    joined = cands.join(a, "id_a").join(b, "id_b")
    return joined.select(
        "id_a", "id_b",
        jaccard_from_shingles(F.col("_sa"), F.col("_sb")).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.2)


def q_dedup_simhash_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance <= 3 via bit-band
    blocking (4 bands of 4 bits; pigeonhole guarantees every <=3-bit pair
    shares a band) + exact bit_count(xor) verification. Never all-pairs."""
    from ore_etl_spark.functions.dedup import simhash_radius_pairs

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    out = simhash_radius_pairs(d, radius=3, n_bands=4)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id=0 query embedding."""
    from ore_etl_spark.functions.similarity import cosine_topk_brute

    e = _spread(spark, _read(spark, sf_dir, "embeddings"))
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return cosine_topk_brute(e.filter(F.col("vec_id") != 0), list(qvec),
                             k=10, round_to=4)


def q_sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN: probe only the query's signature bucket, exact
    cosine re-rank within it. Hyperplanes are literal array columns (one
    aggregate per plane — no per-(plane, dim) expression unroll)."""
    from ore_etl_spark.functions.similarity import lsh_bucket_ann

    e = _spread(spark, _read(spark, sf_dir, "embeddings"))
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return lsh_bucket_ann(e.filter(F.col("vec_id") != 0), list(qvec),
                          k=10, n_planes=4, round_to=4)


def q_sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: 8 sampled-centroid cells (vectors vec_id 1..8 as the
    coarse quantizer — k-means init without iterations, deterministic for
    the oracle), argmin-L2 assignment, probe = 2 nearest cells, exact
    cosine re-rank inside them."""
    from ore_etl_spark.functions.similarity import ivf_ann

    e = _spread(spark, _read(spark, sf_dir, "embeddings"))
    rows = (e.filter((F.col("vec_id") >= 0) & (F.col("vec_id") <= 8))
            .select("vec_id", "embedding").collect())
    by_id = {r["vec_id"]: list(r["embedding"]) for r in rows}
    qvec = by_id[0]
    cell_ids = list(range(1, 9))
    centroids = [by_id[i] for i in cell_ids]
    return ivf_ann(e.filter(F.col("vec_id") != 0), qvec, centroids,
                   k=10, nprobe=2, round_to=4, cell_ids=cell_ids)


def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: exact percentiles per group (median / p90 via linear
    interpolation — Spark percentile() == DuckDB quantile_cont)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


def q_sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, label-blocked (never all-pairs)."""
    from ore_etl_spark.functions.similarity import cosine_pairs_threshold

    e = _spread(spark, _read(spark, sf_dir, "embeddings"))
    return cosine_pairs_threshold(e, threshold=0.3, round_to=4)


def q_sim_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + count (embedding column aggregates:
    element-wise array mean via posexplode -> groupBy, the scalable shape)."""
    e = _spread(spark, _read(spark, sf_dir, "embeddings"))
    ex = e.select("label", F.posexplode("embedding").alias("dim", "x"))
    # Exact decimal accumulation at both levels: float sums are combine-order
    # dependent, and this query folds twice (per-dim avg, then norm over dims).
    xd = F.col("x").cast("double").cast("decimal(38,12)")
    cent = ex.groupBy("label", "dim").agg(
        (F.sum(xd).cast("double") / F.count("x")).alias("c"),
        F.count("*").alias("n"),
    )
    cc = (F.col("c") * F.col("c")).cast("decimal(38,12)")
    return cent.groupBy("label").agg(
        F.round(F.sqrt(F.sum(cc).cast("double")), 4).alias("centroid_norm"),
        F.max("n").alias("n_vectors"),
    )


def q_sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN join — per-row top-k neighbors for EVERY vector (round-2
    VERDICT missing #2), gated against GROUND TRUTH (round-4 ADVICE: the
    old oracle mirrored the banded-LSH algorithm in SQL, so a shared
    algorithmic bug would pass). Here the production ``knn_join``
    machinery (candidate equi-join → per-vector-norm cosine re-rank →
    row_number() <= k) runs with degenerate banding (n_bands=1,
    band_bits=0): every vector lands in one bucket, candidates = all
    pairs, so the result is EXACT top-k — and the SQL oracle is a plain
    brute-force N² window query with no LSH in it. The sub-quadratic
    banded path (n_bands=2, band_bits=2) is what the BENCH measures at
    sf0.1 (bench.py BENCH_QUERY_OVERRIDES) and what the recall gates in
    tests/test_ann_recall.py bound against this same brute force."""
    from ore_etl_spark.functions.similarity import knn_join

    e = _spread(spark, _read(spark, sf_dir, "embeddings"))
    return knn_join(e, k=3, dim=64, n_bands=1, band_bits=0,
                    max_bucket_rows=None,
                    round_to=4).withColumnRenamed("rank", "rk")


def _synth_media(d: DataFrame) -> DataFrame:
    """Deterministic multimodal column over documents: binary media bytes
    with REAL (ASCII) container magics — GIF89a with a parseable LE u16
    logical-screen descriptor (dims encoded as printable bytes), RIFF, ID3
    — so extract_media_meta's binary header parse is exercised while the
    bytes stay UTF-8-safe (DuckDB's sha256 is VARCHAR-only, so the oracle
    hashes the same byte sequence as a string)."""
    did = F.col("doc_id")
    wl = F.char(65 + did % 26)
    wh = F.char(65 + F.floor(did / 26).cast("long") % 26)
    hl = F.char(65 + (did * 3) % 26)
    hh = F.char(65 + (did * 5) % 26)
    gif = F.concat(F.lit("GIF89a"), wl, wh, hl, hh)
    prefix = (
        F.when(did % 7 == 0, gif)
        .when(did % 7 == 1, F.lit("RIFF"))
        .when(did % 7 == 2, F.lit("ID3"))
        .otherwise(F.lit(""))
    )
    return d.select(
        "doc_id",
        F.encode(F.concat(prefix, F.col("text")), "UTF-8").alias("media"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary media column -> typed metadata struct
    via Arrow-batched mapInPandas (format sniff, GIF dims binary parse,
    sha256, byte length — see functions/multimodal). Oracle recomputes the
    same bytes in SQL: format by magic prefix, GIF dims from hex(encode()),
    sha256 over the identical UTF-8 byte sequence."""
    from ore_etl_spark.functions.multimodal import extract_media_meta

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    out = extract_media_meta(_synth_media(d), "media")
    return out.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("media_sha256"),
    )


def q_multimodal_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-prune-before-decode (the multimodal design goal,
    functions/multimodal.py:15-17): filter on cheap sniffed metadata
    (format, width) BEFORE any pixel decode would run, then aggregate —
    the expensive decode stage only ever sees the pruned row set
    (tests/test_multimodal.py pins the pruned-rowcount-through-decode)."""
    from ore_etl_spark.functions.multimodal import extract_media_meta

    d = _spread(spark, _read(spark, sf_dir, "documents"))
    meta = extract_media_meta(_synth_media(d), "media")
    pruned = meta.filter(
        (F.col("meta.format") == "gif") & (F.col("meta.width") >= 17000)
    )
    return pruned.agg(
        F.count("*").alias("n_gif_big"),
        F.sum(F.col("meta.n_bytes")).alias("sum_bytes"),
        F.min(F.col("meta.width")).alias("min_width"),
        F.max(F.col("meta.height")).alias("max_height"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_replay_state": q_cdc_replay_state,
    "cdc_wal_scan": q_cdc_wal_scan,
    "cdc_watermark_range": q_cdc_watermark_range,
    "cdc_lww_dedup": q_cdc_lww_dedup,
    "cdc_gap_audit": q_cdc_gap_audit,
    "cdc_asof_join": q_cdc_asof_join,
    "cdc_quarantine_audit": q_cdc_quarantine_audit,
    "cdc_changelog": q_cdc_changelog,
    "decode_log_regex": q_decode_log_regex,
    "decode_bitmask": q_decode_bitmask,
    "decode_positional": q_decode_positional,
    "decode_multiline_merge": q_decode_multiline_merge,
    # decode_unit_conversion (D12) retired from the gating set round 4:
    # the driver evaluates exactly 50 entries in dict order, and keeping
    # it here rotated multimodal_filter_pushdown out of CORRECTNESS_r03.
    # D12 stays pinned by tests/test_wal_and_decode.py; the 50-slot
    # rotation policy is documented in COVERAGE.md.
    "decode_balance_delta": q_decode_balance_delta,
    "decode_candidates": q_decode_candidates,
    "decode_xor_rng": q_decode_xor_rng,
    "router_multi_emit": q_router_multi_emit,
    "anti_join_unprocessed": q_anti_join_unprocessed,
    "agg_cube": q_agg_cube,
    "win_topk_per_group": q_win_topk_per_group,
    "agg_top_users": q_agg_top_users,
    "agg_by_type": q_agg_by_type,
    "agg_daily": q_agg_daily,
    "agg_global_stats": q_agg_global_stats,
    "agg_histogram": q_agg_histogram,
    "win_running_total": q_win_running_total,
    "win_lag_downtime": q_win_lag_downtime,
    "win_sessionize": q_win_sessionize,
    "sort_recent_n": q_sort_recent_n,
    "pricing_summary": q_pricing_summary,
    "join_two_aggs": q_join_two_aggs,
    "explode_token_popularity": q_explode_token_popularity,
    "text_features": q_text_features,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_components": q_dedup_components,
    "dedup_chunk_fingerprint": q_dedup_chunk_fingerprint,
    "text_decontaminate": q_text_decontaminate,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_radius": q_dedup_simhash_radius,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "sim_topk_cosine": q_sim_topk_cosine,
    "sim_lsh_ann": q_sim_lsh_ann,
    "sim_ivf_ann": q_sim_ivf_ann,
    "agg_percentiles": q_agg_percentiles,
    "sim_neardup_pairs": q_sim_neardup_pairs,
    "sim_label_centroid": q_sim_label_centroid,
    "sim_knn_join": q_sim_knn_join,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_filter_pushdown": q_multimodal_filter_pushdown,
    # round 5 rotation (policy in COVERAGE.md): agg_multi_count (A10,
    # a trivial one-pass predicate-count subsumed by the other aggs)
    # retired to EXTRA_ORACLES + pytest to seat the corpus-assembly op
    "pack_token_shards": q_pack_token_shards,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_cdc_replay_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ore_etl_spark.functions.text import LANG_MARKERS, STOPWORDS

    def sql_list(words):
        return ", ".join(f"'{w}'" for w in words)

    stop_in = sql_list(STOPWORDS)
    hits = {
        lang: ("len(list_filter(lt, t -> list_contains(["
               + sql_list(LANG_MARKERS[lang]) + "], t)))")
        for lang in sorted(LANG_MARKERS)
    }
    # argmax with greatest-lang-code tie-break (mirrors struct array_max)
    lang_case = f"""CASE
        WHEN greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']}) = 0
          THEN 'und'
        WHEN {hits['fr']} >= {hits['es']} AND {hits['fr']} >= {hits['en']}
         AND {hits['fr']} >= {hits['de']} THEN 'fr'
        WHEN {hits['es']} >= {hits['en']} AND {hits['es']} >= {hits['de']} THEN 'es'
        WHEN {hits['en']} >= {hits['de']} THEN 'en'
        ELSE 'de' END"""

    # shared LSH CTEs (tokens -> 3-shingles -> 8 md5-string minhashes ->
    # 4 bands of 2 -> same-bucket candidate pairs); mirrors functions/dedup
    mh_list = ", ".join(
        f"list_min(list_transform(sg, s -> md5('s{i}|' || s)))" for i in range(8)
    )
    lsh_ctes = f"""
        toks AS (
          SELECT doc_id, text,
                 list_filter(string_split(
                   regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '),
                   t -> t <> '') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 1)),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sg
          FROM toks),
        sig AS (SELECT doc_id, [{mh_list}] AS mh FROM sh),
        bands AS (
          SELECT doc_id, b.band,
                 mh[b.band * 2 + 1] || ',' || mh[b.band * 2 + 2] AS band_key
          FROM sig, LATERAL unnest([0, 1, 2, 3]) AS b(band)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.band
          FROM bands a JOIN bands b2
            ON a.band = b2.band AND a.band_key = b2.band_key
           AND a.doc_id < b2.doc_id)
    """

    # shared SimHash CTEs: tokens -> md5-nibble 16-bit token hash -> per-bit
    # votes -> 16-bit signature; mirrors functions/dedup.simhash16
    simhash_ctes = """
        tok AS (
          SELECT doc_id, u.tok
          FROM (SELECT doc_id,
                  list_filter(string_split(
                    regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '),
                    t -> t <> '') AS tk
                FROM documents) d,
               LATERAL unnest(d.tk) AS u(tok)),
        th AS (
          SELECT doc_id,
            (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) AS h
          FROM tok),
        votes AS (
          SELECT doc_id, b.i,
                 sum(CASE WHEN (h // (1 << b.i)) % 2 = 1 THEN 1 ELSE -1 END) AS v
          FROM th, LATERAL unnest(generate_series(0, 15)) AS b(i)
          GROUP BY doc_id, b.i),
        sig AS (
          SELECT doc_id,
                 sum(CASE WHEN v > 0 THEN (1 << i) ELSE 0 END)::BIGINT AS simhash
          FROM votes GROUP BY doc_id)
    """

    # shared synthetic-media CTEs (mirror __spark_entry__._synth_media):
    # ASCII container magics keep the bytes UTF-8-safe, so sha256(VARCHAR)
    # hashes the identical byte sequence Spark's sha256(binary) sees; GIF
    # dims are re-parsed from the raw bytes via hex(encode()) -> '0x' cast
    media_ctes = """
        m AS (
          SELECT doc_id,
            CASE WHEN doc_id % 7 = 0 THEN 'GIF89a'
                   || chr((65 + doc_id % 26)::INT)
                   || chr((65 + (doc_id // 26) % 26)::INT)
                   || chr((65 + (doc_id * 3) % 26)::INT)
                   || chr((65 + (doc_id * 5) % 26)::INT)
                 WHEN doc_id % 7 = 1 THEN 'RIFF'
                 WHEN doc_id % 7 = 2 THEN 'ID3'
                 ELSE '' END || text AS s
          FROM documents),
        meta AS (
          SELECT doc_id, s,
            CASE WHEN starts_with(s, 'GIF87a') OR starts_with(s, 'GIF89a')
                   THEN 'gif'
                 WHEN starts_with(s, 'RIFF') THEN 'riff'
                 WHEN starts_with(s, 'ID3') THEN 'mp3'
                 ELSE 'unknown' END AS format,
            hex(encode(s)) AS hx,
            octet_length(encode(s)) AS nb
          FROM m),
        mm AS (
          SELECT doc_id, s, format, nb,
            CASE WHEN format = 'gif' AND nb >= 10 THEN
              (('0x' || substr(hx, 13, 2))::INT
               + 256 * ('0x' || substr(hx, 15, 2))::INT)::INT END AS width,
            CASE WHEN format = 'gif' AND nb >= 10 THEN
              (('0x' || substr(hx, 17, 2))::INT
               + 256 * ('0x' || substr(hx, 19, 2))::INT)::INT END AS height
          FROM meta)
    """

    # hyperplane-LSH CTEs over the 64-dim embeddings table (mirror
    # functions/similarity.hyperplane: md5-derived double in [-1, 1),
    # sequential left-to-right float fold = Spark's aggregate())
    ann_ctes = """
        planes AS (
          SELECT p.plane,
                 list_transform(generate_series(0, 63),
                   d -> ('0x' || substr(md5('hp' || p.plane || 'd' || d), 1, 8))
                          ::BIGINT / 2147483648.0 - 1.0) AS h
          FROM (SELECT unnest(generate_series(0, 3)) AS plane) p),
        dots AS (
          SELECT e.vec_id, e.embedding, pl.plane,
                 list_sum(list_transform(generate_series(1, 64),
                   i -> e.embedding[i]::DOUBLE * pl.h[i])) AS dv
          FROM embeddings e CROSS JOIN planes pl),
        sigs AS (
          SELECT vec_id, embedding,
                 string_agg(CASE WHEN dv >= 0 THEN '1' ELSE '0' END,
                            '' ORDER BY plane) AS sig
          FROM dots GROUP BY vec_id, embedding)
    """

    wal = f"WITH wal AS ({WAL_SQL})"
    return {
        "cdc_replay_state": f"""
            {wal}, ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path
                ORDER BY commit_seq DESC, event_seq DESC) AS rn
              FROM wal WHERE NOT corrupt)
            SELECT repo, path, commit, lang, commit_seq,
                   sha256(content) AS content_sha256,
                   length(content)::BIGINT AS content_len
            FROM ranked WHERE rn = 1 AND op <> 'DELETE'
        """,
        "cdc_quarantine_audit": f"""
            {wal}
            SELECT repo, count(*) AS n_quarantined,
                   min(commit_seq) AS first_bad_seq
            FROM wal WHERE corrupt GROUP BY repo
        """,
        "cdc_changelog": f"""
            {wal}, ra AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path
                ORDER BY commit_seq DESC, event_seq DESC) AS rn
              FROM wal WHERE NOT corrupt AND commit_seq <= {_CHANGELOG_W1}),
            rb AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path
                ORDER BY commit_seq DESC, event_seq DESC) AS rn
              FROM wal WHERE NOT corrupt),
            a AS (SELECT * FROM ra WHERE rn = 1),
            b AS (SELECT * FROM rb WHERE rn = 1),
            j AS (
              SELECT a.op AS a_op, b.op AS b_op,
                     a.repo AS a_repo, a.path AS a_path,
                     b.repo AS b_repo, b.path AS b_path,
                     a.commit_seq AS a_seq, b.commit_seq AS b_seq,
                     a.content AS a_content, b.content AS b_content,
                     (a.op IS NOT NULL AND a.op <> 'DELETE') AS a_live,
                     (b.op IS NOT NULL AND b.op <> 'DELETE') AS b_live,
                     coalesce(a.commit_seq, -1) <> coalesce(b.commit_seq, -1)
                       AS ver_changed
              FROM a FULL OUTER JOIN b
                ON a.repo = b.repo AND a.path = b.path)
            SELECT b_repo AS repo, b_path AS path, 'insert' AS change_type,
                   b_seq AS commit_seq, sha256(b_content) AS content_sha256
            FROM j WHERE b_live AND NOT a_live AND ver_changed
            UNION ALL
            SELECT a_repo, a_path, 'delete', a_seq, sha256(a_content)
            FROM j WHERE a_live AND NOT b_live
            UNION ALL
            SELECT a_repo, a_path, 'update_preimage', a_seq, sha256(a_content)
            FROM j WHERE a_live AND b_live AND ver_changed
            UNION ALL
            SELECT b_repo, b_path, 'update_postimage', b_seq, sha256(b_content)
            FROM j WHERE a_live AND b_live AND ver_changed
        """,
        "text_features": f"""
            WITH base AS (
              SELECT doc_id, text,
                list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '') AS tk,
                list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                            t -> t <> '') AS lt
              FROM documents),
            feats AS (
              SELECT doc_id, text, tk, lt,
                len(tk) AS n_tokens,
                len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
                    t -> t <> '')) AS n_word_tokens,
                round((length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]',
                       '', 'g'))) / greatest(length(text), 1), 6) AS punct_ratio,
                round(len(list_filter(lt, t -> list_contains([{stop_in}], t)))
                      / greatest(len(lt), 1), 6) AS stopword_ratio,
                round(coalesce(list_sum(list_transform(tk, t -> length(t))), 0)
                      / greatest(len(tk), 1), 6) AS mean_token_len,
                {lang_case} AS lang_pred
              FROM base)
            SELECT doc_id, n_tokens, n_word_tokens, punct_ratio,
                   stopword_ratio, mean_token_len,
                   round((least(length(text) / 500.0, 1.0)
                          + greatest(0.0, 1.0 - punct_ratio * 5)
                          + least(stopword_ratio * 4, 1.0)) / 3, 6) AS quality,
                   lang_pred
            FROM feats
        """,
        "dedup_exact": """
            SELECT md5(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS digest,
                   count(*) AS n_docs, min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        "dedup_minhash_lsh": f"""
            WITH {lsh_ctes}
            SELECT id_a, id_b, count(*) AS n_bands FROM cand GROUP BY 1, 2
        """,
        "text_decontaminate": """
            WITH toks AS (
              SELECT doc_id, text,
                     list_filter(string_split(
                       regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '),
                       t -> t <> '') AS tk
              FROM documents),
            bsnip AS (
              SELECT doc_id // 31 AS bk,
                     array_to_string(tk[1:8], ' ') AS snip
              FROM toks WHERE doc_id % 31 = 0),
            corpus AS (
              SELECT d.doc_id,
                     CASE WHEN d.doc_id % 10 = 3 AND b.snip IS NOT NULL
                          THEN d.text || ' ' || b.snip ELSE d.text END AS text
              FROM documents d LEFT JOIN bsnip b ON b.bk = d.doc_id % 17),
            ctoks AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '),
                       t -> t <> '') AS tk
              FROM corpus),
            cg AS (
              SELECT DISTINCT doc_id,
                     concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
                               tk[i+4], tk[i+5], tk[i+6], tk[i+7]) AS g
              FROM ctoks,
                   LATERAL unnest(generate_series(1,
                     greatest(len(tk) - 7, 1))) AS s(i)),
            bg AS (
              SELECT DISTINCT doc_id AS bench_id,
                     concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
                               tk[i+4], tk[i+5], tk[i+6], tk[i+7]) AS g
              FROM toks,
                   LATERAL unnest(generate_series(1,
                     greatest(len(tk) - 7, 1))) AS s(i)
              WHERE doc_id % 31 = 0)
            SELECT c.doc_id, count(DISTINCT b.bench_id) AS n_bench_sources,
                   count(*) AS n_shared_grams
            FROM cg c JOIN bg b ON c.g = b.g AND c.doc_id <> b.bench_id
            GROUP BY c.doc_id
        """,
        "dedup_chunk_fingerprint": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text || ' edited tail marker'
              FROM documents),
            n AS (
              SELECT doc_id,
                     regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g') AS s
              FROM corpus),
            c AS (
              SELECT doc_id, i.i AS idx,
                     md5(substr(s, (i.i * 64 + 1)::INT, 64)) AS h
              FROM n, LATERAL unnest(generate_series(0,
                     least(ceil(length(s) / 64.0), 64)::INT - 1)) AS i(i)
              WHERE length(s) > 0)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM c a JOIN c b
              ON a.idx = b.idx AND a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        """,
        "dedup_components": f"""
            WITH RECURSIVE {lsh_ctes},
            pairs AS (SELECT DISTINCT id_a, id_b FROM cand),
            e AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b AS u, id_a AS v FROM pairs),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u
            )
            SELECT u AS doc_id, least(u, min(v)) AS component
            FROM reach GROUP BY u
        """,
        "dedup_simhash": f"""
            WITH {simhash_ctes}
            SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
            FROM sig GROUP BY 1
        """,
        "dedup_simhash_radius": f"""
            WITH {simhash_ctes},
            bands AS (
              SELECT doc_id, simhash, b.band,
                     (simhash >> (4 * b.band)) & 15 AS band_key
              FROM sig, LATERAL unnest(generate_series(0, 3)) AS b(band)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                     a.simhash AS sa, b2.simhash AS sb
              FROM bands a JOIN bands b2
                ON a.band = b2.band AND a.band_key = b2.band_key
               AND a.doc_id < b2.doc_id)
            SELECT id_a, id_b, bit_count(xor(sa, sb))::INT AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        """,
        "dedup_ngram_jaccard": f"""
            WITH {lsh_ctes},
            pairs AS (SELECT DISTINCT id_a, id_b FROM cand),
            j AS (
              SELECT p.id_a, p.id_b,
                round(len(list_filter(sa.sg, s -> list_contains(sb.sg, s)))
                      / greatest(len(sa.sg) + len(sb.sg)
                        - len(list_filter(sa.sg, s -> list_contains(sb.sg, s))),
                        1), 6) AS jaccard
              FROM pairs p
              JOIN sh sa ON sa.doc_id = p.id_a
              JOIN sh sb ON sb.doc_id = p.id_b)
            SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.2
        """,
        "sim_topk_cosine": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]),
                     4) AS cos_sim
            FROM embeddings WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
        """,
        "sim_ivf_ann": """
            WITH cent AS (
              SELECT vec_id AS cell, embedding AS c
              FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
            asg AS (
              SELECT e.vec_id, e.embedding, ct.cell,
                     list_sum(list_transform(generate_series(1, 64),
                       i -> (e.embedding[i]::DOUBLE - ct.c[i]::DOUBLE)
                          * (e.embedding[i]::DOUBLE - ct.c[i]::DOUBLE))) AS d
              FROM embeddings e CROSS JOIN cent ct),
            ranked AS (
              SELECT vec_id, embedding, cell,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d, cell) AS rn
              FROM asg),
            cells AS (SELECT vec_id, embedding, cell FROM ranked WHERE rn = 1),
            qcells AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2)
            SELECT v.vec_id,
                   round(list_cosine_similarity(v.embedding::DOUBLE[],
                     (SELECT embedding FROM embeddings
                      WHERE vec_id = 0)::DOUBLE[]), 4) AS cos_sim
            FROM cells v
            WHERE v.cell IN (SELECT cell FROM qcells) AND v.vec_id <> 0
            ORDER BY cos_sim DESC, v.vec_id ASC LIMIT 10
        """,
        "agg_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90,
                   round(quantile_cont(value, 0.99), 4) AS p99
            FROM events GROUP BY event_type
        """,
        "sim_knn_join": """
            -- ground truth: brute-force all-pairs cosine top-3, NO LSH
            -- (round-4 ADVICE: an oracle that re-implements the banded
            -- algorithm can share its bugs; this one cannot)
            WITH scored AS (
              SELECT a.vec_id AS id, b.vec_id AS nbr,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 4)
                       AS cos_sim
              FROM embeddings a JOIN embeddings b
                ON a.vec_id <> b.vec_id),
            r AS (
              SELECT id, nbr, cos_sim,
                     row_number() OVER (PARTITION BY id
                                        ORDER BY cos_sim DESC, nbr ASC) AS rk
              FROM scored)
            SELECT id, nbr, cos_sim, rk FROM r WHERE rk <= 3
        """,
        "sim_lsh_ann": f"""
            WITH {ann_ctes},
            q AS (SELECT sig, embedding FROM sigs WHERE vec_id = 0)
            SELECT s.vec_id,
                   round(list_cosine_similarity(s.embedding::DOUBLE[],
                                                q.embedding::DOUBLE[]), 4)
                     AS cos_sim
            FROM sigs s, q
            WHERE s.sig = q.sig AND s.vec_id <> 0
            ORDER BY cos_sim DESC, s.vec_id ASC LIMIT 10
        """,
        "multimodal_meta": f"""
            WITH {media_ctes}
            SELECT doc_id, format, width, height, nb::BIGINT AS n_bytes,
                   sha256(s) AS media_sha256
            FROM mm
        """,
        "multimodal_filter_pushdown": f"""
            WITH {media_ctes}
            SELECT count(*) AS n_gif_big, sum(nb)::BIGINT AS sum_bytes,
                   min(width)::INT AS min_width, max(height)::INT AS max_height
            FROM mm WHERE format = 'gif' AND width >= 17000
        """,
        "decode_candidates": """
            WITH c AS (
              SELECT event_id, round(value * 1e9)::BIGINT AS base,
                [{'mask': CASE WHEN (event_id + 1) % 3 = 0 THEN 0
                               ELSE (event_id + 1) % 33554432 END,
                  'amount': round(value * 1e9)::BIGINT
                    + CASE WHEN (event_id * 1) % 2 = 0 THEN 100 ELSE 10000 END},
                 {'mask': CASE WHEN (event_id + 2) % 3 = 0 THEN 0
                               ELSE (event_id + 2) % 33554432 END,
                  'amount': round(value * 1e9)::BIGINT
                    + CASE WHEN (event_id * 2) % 2 = 0 THEN 200 ELSE 20000 END},
                 {'mask': CASE WHEN (event_id + 3) % 3 = 0 THEN 0
                               ELSE (event_id + 3) % 33554432 END,
                  'amount': round(value * 1e9)::BIGINT
                    + CASE WHEN (event_id * 3) % 2 = 0 THEN 300 ELSE 30000 END}
                ] AS cands
              FROM events),
            t AS (
              SELECT event_id, cands,
                list_filter(cands, x -> x.mask <> 0
                            AND abs(x.amount - base) < 1000) AS t1,
                list_filter(cands, x -> x.mask <> 0) AS t2
              FROM c)
            SELECT event_id,
              (CASE WHEN len(t1) > 0 THEN 1
                    WHEN len(t2) > 0 THEN 2 ELSE 3 END)::INT AS tier,
              CASE WHEN len(t1) > 0 THEN t1[1].mask
                   WHEN len(t2) > 0 THEN t2[1].mask
                   ELSE cands[1].mask END AS chosen_mask,
              CASE WHEN len(t1) > 0 THEN t1[1].amount
                   WHEN len(t2) > 0 THEN t2[1].amount
                   ELSE cands[1].amount END AS chosen_amount
            FROM t
        """,
        "decode_xor_rng": """
            WITH h AS (
              SELECT event_id, md5(event_id::VARCHAR) AS hx FROM events),
            f AS (
              SELECT event_id,
                xor(xor(('0x' || substr(hx, 1, 8))::BIGINT,
                        ('0x' || substr(hx, 9, 8))::BIGINT),
                    xor(('0x' || substr(hx, 17, 8))::BIGINT,
                        ('0x' || substr(hx, 25, 8))::BIGINT)) AS xor_fold
              FROM h)
            SELECT event_id, xor_fold, (xor_fold % 25)::INT AS square FROM f
        """,
        "sim_neardup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4)
                     AS cos_sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 4) >= 0.3
        """,
        "sim_label_centroid": """
            WITH ex AS (
              SELECT label, d.dim, embedding[d.dim]::DOUBLE AS x
              FROM embeddings,
                   LATERAL unnest(generate_series(1, len(embedding))) AS d(dim)),
            cent AS (
              SELECT label, dim,
                     sum(x::DECIMAL(38,12))::DOUBLE / count(x) AS c,
                     count(*) AS n
              FROM ex GROUP BY 1, 2)
            SELECT label,
                   round(sqrt(sum((c * c)::DECIMAL(38,12))::DOUBLE), 4)
                     AS centroid_norm,
                   max(n) AS n_vectors
            FROM cent GROUP BY label
        """,
        "cdc_wal_scan": f"""
            {wal}
            SELECT repo, path, commit_seq, event_seq, op, lang FROM wal
            WHERE commit_seq > 1000000 AND commit_seq <= 2000500
              AND op <> 'DELETE'
        """,
        "cdc_watermark_range": f"""
            {wal}
            SELECT repo, min(commit_seq) AS min_seq, max(commit_seq) AS max_seq,
                   count(*) AS n_events
            FROM wal GROUP BY repo
        """,
        "cdc_lww_dedup": f"""
            {wal}, ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path
                ORDER BY commit_seq DESC, event_seq DESC) AS rn
              FROM wal)
            SELECT repo, count(*) AS n_keys, max(commit_seq) AS hwm,
                   sum(CASE WHEN op = 'DELETE' THEN 1 ELSE 0 END)::BIGINT AS n_tombstones
            FROM ranked WHERE rn = 1 GROUP BY repo
        """,
        "cdc_gap_audit": """
            WITH g AS (
              SELECT user_id, event_id,
                     event_id - lag(event_id) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS gap
              FROM events)
            SELECT user_id, count(*) AS n_events, max(gap) AS max_gap,
                   sum(CASE WHEN gap > 100 THEN 1 ELSE 0 END)::BIGINT AS n_big_gaps
            FROM g GROUP BY user_id
        """,
        "cdc_asof_join": """
            SELECT p.event_id, p.user_id,
                   (SELECT c.event_id FROM events c
                     WHERE c.user_id = p.user_id AND c.event_type = 'click'
                       AND c.ts <= p.ts
                     ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
            FROM events p WHERE p.event_type = 'purchase'
        """,
        "decode_log_regex": """
            WITH lines AS (
              SELECT event_id,
                'Round #' || event_id || ': deploying ' || round(value, 2)
                || ' SOL to ' || (user_id % 25 + 1) || ' squares' AS logline
              FROM events)
            SELECT event_id,
              regexp_extract(logline, 'Round #(\\d+): deploying ([\\d.]+) SOL to (\\d+) squares', 1)::BIGINT AS round_id,
              regexp_extract(logline, 'Round #(\\d+): deploying ([\\d.]+) SOL to (\\d+) squares', 2)::DOUBLE AS amount_sol,
              regexp_extract(logline, 'Round #(\\d+): deploying ([\\d.]+) SOL to (\\d+) squares', 3)::INT AS n_squares
            FROM lines
        """,
        "decode_bitmask": """
            WITH m AS (
              SELECT event_id,
                list_filter(generate_series(0, 24),
                  i -> ((event_id % 33554432) // (1 << i)) % 2 = 1) AS squares
              FROM events)
            SELECT event_id, len(squares) AS n_squares,
                   squares[1] AS first_square, squares[-1] AS last_square
            FROM m
        """,
        "decode_positional": """
            WITH a AS (
              SELECT event_id, (event_id % 4)::INT AS itype,
                ['acc' || user_id,
                 'acc' || (event_id % 100),
                 'acc' || floor(value)::BIGINT] AS accounts
              FROM events)
            SELECT event_id,
              coalesce(CASE WHEN itype = 2 THEN accounts[3]
                            WHEN itype = 3 THEN accounts[2] END,
                       accounts[1], accounts[1]) AS authority,
              (CASE WHEN itype = 3 THEN accounts[3] END) IS NOT NULL
                AS is_automation
            FROM a
        """,
        "decode_multiline_merge": """
            SELECT event_id, user_id,
              last_value(CASE WHEN value > 300 THEN event_type END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS last_big_type
            FROM events
        """,
        "decode_balance_delta": """
            SELECT vec_id,
              round(coalesce(list_sum(list_transform(embedding,
                    x -> x * 1.1 - x)), 0), 4) AS total_delta,
              len(list_filter(list_transform(embedding, x -> x * 1.1 - x),
                  v -> v > 0)) AS n_positive
            FROM embeddings
        """,
        "router_multi_emit": """
            WITH fan AS (
              SELECT 'purchase_rec' AS record_type, value FROM events
                WHERE event_type = 'purchase'
              UNION ALL
              SELECT 'spend_rec', value FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT 'error_rec', value FROM events WHERE event_type = 'error'
              UNION ALL
              SELECT 'user_rec', value FROM events WHERE event_type = 'signup')
            SELECT record_type, count(*) AS n,
                   round(sum(value::DECIMAL(38,6)), 4)::DOUBLE AS sum_value
            FROM fan GROUP BY record_type
        """,
        "anti_join_unprocessed": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "agg_cube": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity::DECIMAL(38,6)), 4)::DOUBLE AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "win_topk_per_group": """
            WITH r AS (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id ASC) AS rk
              FROM events)
            SELECT user_id, event_id, rk FROM r WHERE rk <= 2
        """,
        "agg_top_users": """
            SELECT user_id,
                   round(sum(value::DECIMAL(38,6)), 4)::DOUBLE AS total_value,
                   count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id ASC LIMIT 10
        """,
        "agg_by_type": """
            SELECT event_type, count(*) AS n,
                   round(sum(value::DECIMAL(38,6)), 4)::DOUBLE AS sum_value,
                   round(sum(value::DECIMAL(38,6))::DOUBLE / count(value), 6)
                     AS avg_value
            FROM events GROUP BY event_type
        """,
        "agg_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
                   count(DISTINCT user_id) AS n_users,
                   round(sum(value::DECIMAL(38,6)), 4)::DOUBLE AS sum_value
            FROM events GROUP BY 1
        """,
        "agg_global_stats": """
            SELECT count(*) AS n, count(DISTINCT user_id) AS n_users,
                   min(event_id) AS min_id, max(event_id) AS max_id,
                   round(sum(value::DECIMAL(38,6))::DOUBLE / count(value), 6)
                     AS avg_value
            FROM events
        """,
        "agg_histogram": """
            SELECT (floor(value / 50) * 50)::BIGINT AS bucket, count(*) AS n
            FROM events GROUP BY 1
        """,
        "pack_token_shards": """
            WITH t AS (
              SELECT doc_id,
                     len(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                         t -> t <> ''))::BIGINT AS n_tokens
              FROM documents)
            SELECT doc_id, n_tokens,
                   ((sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) // 2000)::BIGINT AS shard
            FROM t
        """,
        "win_running_total": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (
                     PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_value
            FROM events
        """,
        "win_lag_downtime": """
            WITH g AS (
              SELECT user_id, event_id,
                     floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
              FROM events)
            SELECT user_id, event_id, gap_s FROM g WHERE gap_s > 3600
        """,
        "win_sessionize": """
            WITH g AS (
              SELECT user_id, event_id, ts, value,
                     floor(epoch(ts))::BIGINT AS ep,
                     floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
              FROM events),
            s AS (
              SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800
                             THEN 1 ELSE 0 END AS new_sess
              FROM g),
            u AS (
              SELECT *, sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
              FROM s)
            SELECT user_id, session_id, count(*) AS n_events,
                   (max(ep) - min(ep))::BIGINT AS dur_s,
                   round(sum(value::DECIMAL(38,6)), 4)::DOUBLE AS total_value
            FROM u GROUP BY user_id, session_id
        """,
        "sort_recent_n": """
            SELECT event_id, user_id, event_type FROM events
            ORDER BY ts DESC, event_id DESC LIMIT 20
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity::DECIMAL(38,6)), 4)::DOUBLE AS sum_qty,
                   round(sum(l_extendedprice::DECIMAL(38,6)), 4)::DOUBLE
                     AS sum_base_price,
                   round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)),
                         4)::DOUBLE AS sum_disc_price,
                   round(sum(l_discount::DECIMAL(38,6))::DOUBLE
                         / count(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_two_aggs": """
            WITH o_agg AS (
              SELECT o_custkey, count(*) AS n_orders,
                     round(sum(o_totalprice::DECIMAL(38,6)), 4)::DOUBLE
                       AS total_spent
              FROM orders GROUP BY o_custkey),
            li_agg AS (
              SELECT o.o_custkey,
                     round(sum(l.l_quantity::DECIMAL(38,6)), 4)::DOUBLE
                       AS total_qty
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              GROUP BY o.o_custkey)
            SELECT coalesce(o_agg.o_custkey, li_agg.o_custkey) AS o_custkey,
                   n_orders, total_spent, total_qty
            FROM o_agg FULL OUTER JOIN li_agg USING (o_custkey)
        """,
        "explode_token_popularity": """
            WITH toks AS (
              SELECT d.doc_id, t.token
              FROM documents d,
                   LATERAL unnest(string_split(d.text, ' ')) AS t(token)
              WHERE t.token <> '')
            SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
            FROM toks GROUP BY token ORDER BY n DESC, token ASC LIMIT 25
        """,
    }
