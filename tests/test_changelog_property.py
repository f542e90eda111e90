"""Property: the changelog RECONSTRUCTS state. For any sequence of
merge batches and any pair of versions A <= B, applying changes(A, B) to
read(version=A) must yield exactly read(version=B):

    state(B) == state(A) - deletes - update_preimages
                         + inserts + update_postimages

This is the contract a downstream CDC consumer relies on (apply the keyed
delta, arrive at the same table) — stated as a property over randomized
batch sequences (inserts, updates, group moves, deletes, out-of-order
versions) and over both COW and MOR write paths with a compaction thrown
in between.
"""

import shutil
import tempfile

import pyspark.sql.types as T
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ore_etl_spark.tables.merge_table import MergeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit_seq", T.LongType()),
    T.StructField("event_seq", T.LongType()),
    T.StructField("content", T.StringType()),
    T.StructField("op", T.StringType()),
])

KEYS = [("r0", f"p{i}") for i in range(12)]


def snapshot_state(tbl, version):
    return {
        (r["repo"], r["path"]): (r["commit_seq"], r["event_seq"], r["content"])
        for r in tbl.read(version=version).collect()
    }


def apply_changelog(state_a: dict, changes: list) -> dict:
    out = dict(state_a)
    for r in changes:
        k = (r["repo"], r["path"])
        if r["_change_type"] in ("delete", "update_preimage"):
            # preimage/delete rows must match what state A holds
            assert out.get(k) == (r["commit_seq"], r["event_seq"], r["content"])
            if r["_change_type"] == "delete":
                out.pop(k)
        else:  # insert / update_postimage
            out[k] = (r["commit_seq"], r["event_seq"], r["content"])
    return out


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_changelog_reconstructs_any_version_pair(spark, data):
    work = tempfile.mkdtemp(prefix="cdfprop_")
    try:
        tbl = MergeTable.create(
            spark, f"{work}/t", T.StructType(SCHEMA.fields[:-1]),
            key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
            n_buckets=4,
        )
        mode = data.draw(st.sampled_from(["cow", "mor"]))
        n_batches = data.draw(st.integers(min_value=2, max_value=4))
        versions = [tbl.version]
        seq = 0
        for bi in range(n_batches):
            n_rows = data.draw(st.integers(min_value=1, max_value=6))
            rows = []
            for _ in range(n_rows):
                repo, path = data.draw(st.sampled_from(KEYS))
                op = data.draw(st.sampled_from(
                    ["INSERT", "UPDATE", "UPDATE", "DELETE"]))
                # out-of-order versions allowed: commit_seq drawn, not monotone
                cseq = data.draw(st.integers(min_value=1, max_value=50))
                seq += 1
                rows.append((repo, path, cseq, seq,
                             None if op == "DELETE" else f"c{cseq}.{seq}", op))
            df = spark.createDataFrame(rows, SCHEMA)
            if mode == "mor":
                tbl.merge_mor(df, f"b{bi}")
                if data.draw(st.booleans()):
                    tbl.compact(f"c{bi}")
            else:
                tbl.merge(df, f"b{bi}")
            versions.append(tbl.version)

        ia = data.draw(st.integers(min_value=0, max_value=len(versions) - 1))
        ib = data.draw(st.integers(min_value=ia, max_value=len(versions) - 1))
        va, vb = versions[ia], versions[ib]
        state_a = snapshot_state(tbl, va)
        state_b = snapshot_state(tbl, vb)
        changes = tbl.changes(va, vb).collect()
        assert apply_changelog(state_a, changes) == state_b
        # and the round-trip is exact: no spurious rows for unchanged keys
        changed_keys = {(r["repo"], r["path"]) for r in changes}
        for k in set(state_a) & set(state_b):
            if state_a[k] == state_b[k]:
                assert k not in changed_keys
    finally:
        shutil.rmtree(work, ignore_errors=True)
