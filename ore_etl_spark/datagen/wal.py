"""Deterministic synthetic change-event WAL generator (FIXTURES.md §1-2).

Generates (a) the ordered change-event log the engine replays and (b) a pure
pandas replay oracle for pytest. Everything is a pure function of
``(key_id, version, seed)`` via ``xxhash64``/``sha2`` — **no ``F.rand``**,
whose output depends on partition layout; hash-based randomness gives the
same WAL at local[1] and on 1000 executors, which is what makes the
two-parallelism scaling benchmark an apples-to-apples comparison.

Reference analog: the reference's fixtures are regex-sampled production
transactions (/root/reference/scripts/extract-samples.js:13-132); ours are
synthesized because BASELINE.json forbids external data, with the same
adversarial classes the reference meets in production:

- duplicate deliveries ~1%   (RABBITMQ-VOLUME-ANALYSIS.md:110-126)
- late / out-of-order ~2%    (delivery_seq != commit order; tests T5)
- truncated payloads ~0.5%   (DEPLOY-PARSE-ANALYSIS.md:63-73 -> quarantine)
- hot-repo skew (hot repo >= 20% of events; salting test, north rule)
- schema evolution: events past a seq threshold carry `size_bytes`

Built with `spark.range` + column functions only: generation is itself a
distributed Spark job (no driver-side loops), so the bench can synthesize
millions of events in seconds and the design point of 10^10 is a matter of
executor count, not generator rewrite.
"""

from __future__ import annotations

import base64
import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
OPS = ("INSERT", "UPDATE", "DELETE")


def _h(*cols, salt: str) -> F.Column:
    """Deterministic non-negative 63-bit hash of cols + salt."""
    return F.abs(F.xxhash64(F.lit(salt), *cols))


def _le_u32_hex(col: F.Column) -> F.Column:
    """Little-endian u32 as 8 hex chars (byte-swapped big-endian hex)."""
    h = F.lpad(F.lower(F.hex(col.cast("long"))), 8, "0")
    return F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )


def content_expr(repo, path, version, seed: int = SEED) -> F.Column:
    """Pseudo-source text: pure function of (repo, path, version, seed).

    Length 64..1087 chars; body is repeated sha256 hex of the identity —
    cheap, deterministic, and recomputable by the pandas oracle and the
    DuckDB oracle (both have sha256/md5 + string ops).
    """
    ident = F.concat_ws("|", repo, path, version.cast("string"), F.lit(str(seed)))
    block = F.sha2(ident, 256)  # 64 hex chars
    length = (F.pmod(_h(repo, path, version, salt=f"len{seed}"), F.lit(1024)) + 64).cast("int")
    return F.substring(F.repeat(block, 17), 1, length)  # 17*64 > 1087 max


def payload_expr(content: F.Column, version: F.Column) -> F.Column:
    """base64( [version:u32le][len:u32le] || utf8(content) ).

    Mirrors the reference's binary instruction layout
    ([type:u8][amount:u64le][mask:u32le], instruction-parser.ts:21-57):
    a little-endian fixed header followed by a body, base64-wrapped.
    Entirely JVM-side (hex/unhex/encode/base64) — zero Python.
    """
    hdr = F.concat(_le_u32_hex(version), _le_u32_hex(F.length(content)))
    # Spark's base64 is MIME-chunked (CRLF every 76 chars); strip to canonical
    return F.regexp_replace(
        F.base64(F.concat(F.unhex(hdr), F.encode(content, "UTF-8"))), "[\\r\\n]", ""
    )


def generate_wal(
    spark: SparkSession,
    n_keys: int = 2000,
    max_versions: int = 3,
    n_repos: int = 50,
    n_partitions: int = 8,
    seed: int = SEED,
    schema_evolution_after: float = 0.7,
    dup_rate_pct: int = 1,
    late_rate_pct: int = 2,
    corrupt_rate_permille: int = 5,
) -> DataFrame:
    """Build the ordered change-event WAL as a DataFrame.

    Columns: event_id, partition_id, delivery_seq, commit_seq, event_seq,
    op, repo, path, commit, lang, payload, ts, size_bytes.

    ``delivery_seq`` is arrival order (what watermarks/batching run on);
    ``(commit_seq, event_seq)`` is the LWW version order. ~late_rate% of
    events arrive displaced (delivery_seq >> commit order) to exercise the
    conditional-LWW merge. Total events ~= n_keys * (max_versions+1)/2.
    """
    keys = spark.range(n_keys).withColumnRenamed("id", "key_id")
    kv = keys.withColumn(
        "n_versions",
        (F.pmod(_h(F.col("key_id"), salt=f"nv{seed}"), F.lit(max_versions)) + 1).cast("int"),
    ).withColumn("version", F.explode(F.sequence(F.lit(0), F.col("n_versions") - 1)))

    # --- key -> (repo, path): hot repo 0 gets ~25% of keys (Zipf head) ----
    u = F.pmod(_h(F.col("key_id"), salt=f"repo{seed}"), F.lit(1000))
    repo_idx = F.when(u < 250, F.lit(0)).otherwise(
        F.pmod(_h(F.col("key_id"), salt=f"repo2{seed}"), F.lit(n_repos))
    )
    df = (
        kv.withColumn("repo_idx", repo_idx)
        .withColumn(
            "repo",
            F.concat(F.lit("org"), (F.col("repo_idx") % 10).cast("string"),
                     F.lit("/repo"), F.col("repo_idx").cast("string")),
        )
        # lang may change on UPDATE (column-update test, FIXTURES §2) but the
        # path — the upsert key — derives from the key alone, so successive
        # versions of a key actually collide in the MERGE
        .withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in ("py", "ts", "rs", "go", "java", "md")]),
                (F.pmod(_h(F.col("key_id"), F.col("version"), salt=f"lang{seed}"),
                        F.lit(6)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "ext",
            F.element_at(
                F.array(*[F.lit(x) for x in ("py", "ts", "rs", "go", "java", "md")]),
                (F.pmod(_h(F.col("key_id"), salt=f"ext{seed}"), F.lit(6)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "path",
            F.concat(F.lit("src/d"),
                     F.pmod(_h(F.col("key_id"), salt=f"dir{seed}"), F.lit(20)).cast("string"),
                     F.lit("/f"), F.col("key_id").cast("string"),
                     F.lit("."), F.col("ext")),
        )
    )

    # --- ordering: commits interleave keys round-robin --------------------
    df = (
        df.withColumn("commit_seq", (F.col("version").cast("long") * n_keys + F.col("key_id")))
        .withColumn("event_seq", F.col("key_id").cast("long"))
        .withColumn(
            "op",
            F.when(F.col("version") == 0, F.lit("INSERT"))
            .when(
                (F.col("version") == F.col("n_versions") - 1)
                & (F.pmod(_h(F.col("key_id"), salt=f"del{seed}"), F.lit(7)) == 0),
                F.lit("DELETE"),
            )
            .otherwise(F.lit("UPDATE")),
        )
        .withColumn("commit", F.substring(F.sha2(F.concat_ws(
            ":", F.col("repo"), F.col("path"), F.col("version").cast("string")), 256), 1, 40))
        .withColumn("content", content_expr(F.col("repo"), F.col("path"),
                                            F.col("version"), seed))
    )

    # --- payload encode + adversarial corruption --------------------------
    df = df.withColumn("payload", payload_expr(F.col("content"), F.col("version")))
    corrupt = F.pmod(_h(F.col("key_id"), F.col("version"), salt=f"cor{seed}"),
                     F.lit(1000)) < corrupt_rate_permille
    df = df.withColumn(
        "payload", F.when(corrupt, F.substring(F.col("payload"), 1, 6)).otherwise(F.col("payload"))
    )

    # --- late delivery + event ids + evolution column ---------------------
    late = F.pmod(_h(F.col("key_id"), F.col("version"), salt=f"late{seed}"),
                  F.lit(100)) < late_rate_pct
    displace = F.pmod(_h(F.col("key_id"), F.col("version"), salt=f"disp{seed}"),
                      F.lit(n_keys * 2)) + n_keys
    df = (
        df.withColumn(
            "delivery_seq",
            F.when(late, (F.col("commit_seq") + displace) * 10 + 1)
            .otherwise(F.col("commit_seq") * 10),
        )
        .withColumn("partition_id", F.pmod(F.xxhash64("repo"), F.lit(n_partitions)).cast("int"))
        .withColumn("event_id", F.sha2(F.concat_ws("#", F.col("repo"), F.col("path"),
                                                   F.col("commit_seq").cast("string")), 256))
        .withColumn("ts", F.timestamp_seconds(F.lit(1704067200) + F.col("commit_seq") * 7))
    )
    max_commit_seq = n_keys * max_versions
    evo_threshold = int(max_commit_seq * schema_evolution_after)
    df = df.withColumn(
        "size_bytes",
        F.when(F.col("commit_seq") >= evo_threshold,
               F.length(F.col("content")).cast("long")).otherwise(F.lit(None).cast("long")),
    )

    base_cols = ["event_id", "partition_id", "delivery_seq", "commit_seq", "event_seq",
                 "op", "repo", "path", "commit", "lang", "payload", "ts", "size_bytes"]
    events = df.select(*base_cols)

    # --- duplicate deliveries (verbatim, later arrival) --------------------
    dups = (
        events.filter(
            F.pmod(_h(F.col("event_id"), salt=f"dup{seed}"), F.lit(100)) < dup_rate_pct
        ).withColumn("delivery_seq", F.col("delivery_seq") + 5)
    )
    return events.unionByName(dups)


# --------------------------------------------------------------------------
# pandas replay oracle (FIXTURES.md §3) — no Spark, independent code path
# --------------------------------------------------------------------------

def decode_payload_py(payload_b64: str) -> tuple[int, str] | None:
    """Independent Python decode of the event payload (oracle side)."""
    try:
        raw = base64.b64decode(payload_b64, validate=True)
        if len(raw) < 8:
            return None
        version, length = struct.unpack("<II", raw[:8])
        body = raw[8:]
        if len(body) != length:
            return None
        return version, body.decode("utf-8")
    except Exception:
        return None


def replay_oracle(events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Replay the WAL in (commit_seq, event_seq) order with LWW + deletes.

    Pure pandas — the independent oracle pytest compares the engine's
    converged table against (FIXTURES.md §3). Undecodable payloads are
    skipped (they must land in quarantine, not in state).
    """
    ev = events_pdf.sort_values(["commit_seq", "event_seq", "delivery_seq"]).copy()
    state: dict[tuple[str, str], dict] = {}
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        decoded = decode_payload_py(row.payload)
        if decoded is None:
            continue  # quarantined
        version = (row.commit_seq, row.event_seq)
        cur = state.get(key)
        if cur is not None and version <= cur["_version"]:
            continue  # stale (LWW)
        if row.op == "DELETE":
            state[key] = {"_version": version, "_deleted": True}
        else:
            _, content = decoded
            state[key] = {
                "_version": version,
                "_deleted": False,
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lang": row.lang,
                "commit_seq": row.commit_seq,
                "event_seq": row.event_seq,
                "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
                "content_len": len(content),
                "size_bytes": getattr(row, "size_bytes", None),
            }
    rows = [v for v in state.values() if not v["_deleted"]]
    for r in rows:
        r.pop("_version"), r.pop("_deleted")
    cols = ["repo", "path", "commit", "lang", "commit_seq", "event_seq",
            "content_sha256", "content_len", "size_bytes"]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols].sort_values(["repo", "path"]).reset_index(drop=True)
