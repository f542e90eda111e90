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
    exact compare when a cell pair can't both parse as float."""
    for a, b in zip(srows, orows):
        for x, y in zip(a, b):
            if x == y:
                continue
            try:
                if abs(float(x) - float(y)) <= tol:
                    continue
            except ValueError:
                pass
            return False
    return True


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
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
        if srows != orows and name in FLOAT_TOL and rows_close(
                srows, orows, FLOAT_TOL[name]):
            print(f"{name:35s} OK-within-tol ({len(sdf)} rows, "
                  f"tol={FLOAT_TOL[name]})")
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
