"""Local replica of the driver's correctness gate.

Runs every entry in __spark_entry__.queries() at sf0.01 and compares to the
matching oracle_sql() via DuckDB: row count, column names, and an
order-insensitive value comparison (rows sorted by all columns, column order
by name). Usage:  python scripts/check_oracles.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from ore_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# Queries whose float outputs are round()s of expressions the two engines
# compute with DIFFERENT operation orders (Spark aggregate-fold cosine vs
# DuckDB list_cosine_similarity; sqrt of a folded sum; percentile
# interpolation; ratio formulas). Both engines are individually
# deterministic, but a value landing exactly on a round(x, k) boundary can
# flip the last digit between them at some SF/seed. For these, a mismatch
# within one ulp of the last rounded digit is tolerated cell-wise.
# Decimal-accumulated sums/avgs stay bit-exact — they are NOT listed here.
FLOAT_TOL = {
    "sim_topk_cosine": 1e-4, "sim_lsh_ann": 1e-4, "sim_ivf_ann": 1e-4,
    "sim_knn_join": 1e-4, "sim_neardup_pairs": 1e-4,
    "sim_label_centroid": 1e-4, "text_features": 1e-3,
    "agg_percentiles": 1e-4, "decode_balance_delta": 1e-4,
    "dedup_ngram_jaccard": 1e-3,
}

# Tolerance is for boundary-straddling LAST-DIGIT flips, which are rare by
# construction — if more than this fraction of cells needs it, that's a
# systematic bias (e.g. a wrong rounding mode on every row), not a
# rounding-boundary coincidence, and the query FAILS (round-4 ADVICE).
# Absolute floor of 1 cell: a small-output query (e.g. a handful of
# groups x 4 columns) must not fail on one legitimate boundary flip just
# because 1/30 cells > 1%.
FLOAT_TOL_MAX_CELL_FRAC = 0.01

def _tol_budget(n_cells: int) -> int:
    return max(1, int(FLOAT_TOL_MAX_CELL_FRAC * n_cells))

# Queries verified HERE but deliberately outside the driver's 50-slot
# oracle_sql() gate (the driver evaluates exactly 50 entries in dict
# order; the rotation policy is in COVERAGE.md). Keeping the SQL here
# preserves the engine-vs-independent-oracle check locally — the pytest
# replacements only pin Spark self-consistency (round-4 ADVICE).
EXTRA_ORACLES = {
    "decode_unit_conversion": """
        SELECT event_id, round(value * 1e9)::BIGINT AS lamports,
               round(round(value * 1e9)::BIGINT / 1e9, 6) AS sol_roundtrip
        FROM events
    """,
    # round-5 rotation: A10 retired from the gate for pack_token_shards
    "agg_multi_count": """
        SELECT
          sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
          sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
          sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
          sum(CASE WHEN value > 500 THEN 1 ELSE 0 END)::BIGINT AS n_high_value,
          sum(CASE WHEN regexp_matches(props, '"k": 9') THEN 1 ELSE 0 END)::BIGINT AS n_k9
        FROM events
    """,
    # integer chunk boundaries reproduced exactly: chunk i of stride 24
    # covers tokens [i*24+1, i*24+32] (1-based list slice), one chunk
    # when n <= 32, else 1 + ceil((n-32)/24)
    "chunk_documents": """
        WITH t AS (
          SELECT doc_id,
                 coalesce(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                          x -> x <> ''), []) AS tk
          FROM documents),
        c AS (
          SELECT doc_id, tk,
                 CASE WHEN len(tk) <= 32 THEN 1
                      ELSE 1 + (len(tk) - 32 + 23) // 24 END AS nc
          FROM t),
        e AS (
          SELECT doc_id, tk,
                 unnest(generate_series(0, nc - 1)) AS chunk_id
          FROM c)
        SELECT doc_id, chunk_id::BIGINT AS chunk_id,
               array_to_string(tk[(chunk_id*24 + 1):(chunk_id*24 + 32)],
                               ' ') AS chunk_text,
               len(tk[(chunk_id*24 + 1):(chunk_id*24 + 32)])::BIGINT
                 AS n_tokens
        FROM e
    """,
    # identical pattern strings (PII_PATTERNS) and replacement order on
    # both engines; the pii spans are synthesized deterministically from
    # doc_id so the oracle proves the redaction, not a no-op
    "pii_redact": """
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id::VARCHAR
                      || '@example.com from 10.0.'
                      || (doc_id % 256)::VARCHAR
                      || '.7 card 4111111111111111' AS text
          FROM documents)
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '{email}', '<EMAIL>', 'g'),
                 '{ipv4}', '<IPV4>', 'g'),
                 '{longnum}', '<LONGNUM>', 'g') AS clean_text,
               len(regexp_extract_all(text, '{email}'))::INT AS n_email,
               len(regexp_extract_all(text, '{ipv4}'))::INT AS n_ipv4,
               len(regexp_extract_all(text, '{longnum}'))::INT AS n_longnum
        FROM aug
    """,
    # md5-portable split draw: the oracle recomputes the EXACT Spark
    # arithmetic (15 hex chars of md5('seed:id') mod 1e6 vs cumulative
    # weight thresholds) — engine-vs-independent-reimplementation
    "hash_split": """
        WITH d AS (
          SELECT doc_id,
                 ('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 15))
                   ::UBIGINT % 1000000 AS draw
          FROM documents)
        SELECT doc_id,
               CASE WHEN draw < 800000 THEN 'train'
                    WHEN draw < 900000 THEN 'val'
                    ELSE 'test' END AS split
        FROM d
    """,
}
# splice the VERBATIM shared patterns into the pii oracle (plain
# .replace, not .format — the regexes themselves contain {m,n} braces;
# DuckDB single-quoted strings keep backslashes literal, so the raw
# Java-regex string is also the RE2 string)
from ore_etl_spark.functions.text import PII_PATTERNS  # noqa: E402

for _k, _v in PII_PATTERNS.items():
    EXTRA_ORACLES["pii_redact"] = EXTRA_ORACLES["pii_redact"].replace(
        "{" + _k + "}", _v)

EXTRA_QUERIES = {
    "decode_unit_conversion": lambda spark, sf:
        entry_mod.q_decode_unit_conversion(spark, sf),
    "agg_multi_count": lambda spark, sf:
        entry_mod.q_agg_multi_count(spark, sf),
    "hash_split": lambda spark, sf:
        entry_mod.q_hash_split(spark, sf),
    "chunk_documents": lambda spark, sf:
        entry_mod.q_chunk_documents(spark, sf),
    "pii_redact": lambda spark, sf:
        entry_mod.q_pii_redact(spark, sf),
}


def norm(v):
    """Normalize a cell to a comparable string.

    Bit-exact for floats (repr), matching the strictness of the driver's
    value hash — the round-2 6-decimal rounding here masked the
    win_sessionize partial-agg-combine-order flake the driver caught.
    """
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == 0.0:  # collapse -0.0 / +0.0
            return "0.0"
        return repr(v)
    return str(v)


def rows_close(srows, orows, tol):
    """Cell-wise compare of two sorted row lists: strings must match
    exactly; float-parseable cells may differ by <= tol (one ulp of the
    last rounded digit). Sorting is by the normalized strings, so two
    near-equal floats can land in swapped sort positions — treat each
    column's multiset of parse-failures conservatively by falling back to
    exact compare when a cell pair can't both parse as float.

    Returns (ok, n_tolerated, n_cells): the caller bounds n_tolerated /
    n_cells so a systematic last-digit bias can't hide inside the
    tolerance (round-4 ADVICE)."""
    n_tol = n_cells = 0
    for a, b in zip(srows, orows):
        for x, y in zip(a, b):
            n_cells += 1
            if x == y:
                continue
            try:
                if abs(float(x) - float(y)) <= tol:
                    n_tol += 1
                    continue
            except ValueError:
                pass
            return False, n_tol, n_cells
    return True, n_tol, max(1, n_cells)


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = dict(entry_mod.queries())
    oracles = dict(entry_mod.oracle_sql())
    # local-only extras: gated here even though outside the driver's 50
    assert not set(EXTRA_QUERIES) & set(qs), "extra shadows a gated query"
    qs.update(EXTRA_QUERIES)
    oracles.update(EXTRA_ORACLES)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            df = fn(spark, SF_DIR)
            n = df.count()
            print(f"{name:35s} rows-only: {n} rows")
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:35s} ERROR: {e}")
            failures.append(name)
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"{name:35s} SCHEMA MISMATCH spark={s_cols} oracle={o_cols}")
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"{name:35s} ROWCOUNT MISMATCH spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        srows = sorted(
            tuple(norm(v) for v in row)
            for row in sdf[s_cols].itertuples(index=False, name=None)
        )
        orows = sorted(
            tuple(norm(v) for v in row)
            for row in odf[s_cols].itertuples(index=False, name=None)
        )
        if srows != orows and name in FLOAT_TOL:
            ok, n_tol, n_cells = rows_close(srows, orows, FLOAT_TOL[name])
            budget = _tol_budget(n_cells)
            if ok and n_tol <= budget:
                print(f"{name:35s} OK-within-tol ({len(sdf)} rows, "
                      f"tol={FLOAT_TOL[name]}, {n_tol}/{n_cells} cells "
                      f"tolerated)")
                continue
            if ok:
                print(f"{name:35s} TOLERANCE OVERUSE: {n_tol}/{n_cells} "
                      f"cells > budget {budget} "
                      f"— systematic bias, not boundary flips")
                failures.append(name)
                continue
        if srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"{name:35s} VALUE MISMATCH at sorted row {bad}:")
            print(f"  spark : {srows[bad]}")
            print(f"  oracle: {orows[bad]}")
            failures.append(name)
        else:
            print(f"{name:35s} OK ({len(sdf)} rows)")
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nall oracles OK")


if __name__ == "__main__":
    main()
