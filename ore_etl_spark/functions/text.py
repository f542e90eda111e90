"""Text-analysis operators for training-data pipelines (first-class ops).

All pure JVM column expressions (whole-stage codegen; no Python in the hot
path): language-ID heuristic, quality scoring, token counting, document
fingerprinting. Each has a DuckDB-expressible twin in __spark_entry__ so the
driver's oracle gates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny seeded stopword lists per language (heuristic lang-id evidence)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


# Java's \s is exactly [ \t\n\x0B\f\r]; RE2 (DuckDB) \s LACKS \x0B, so
# oracle-mirrored regexes spell the class out on BOTH engines — byte-
# identical tokenization even on control-whitespace text, instead of a
# latent false VALUE MISMATCH the printable-ASCII test corpus never hits.
WS_CLASS = r"[ \t\n\x0B\f\r]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (empty tokens dropped)."""
    return F.filter(F.split(col, WS_CLASS + "+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish token proxy: count of word-or-symbol chunks, a cheap
    stand-in for subword tokenizers.

    Counted as ``regexp_count('[A-Za-z0-9]+')`` — the number of maximal
    alphanumeric runs, which is exactly what the split-on-delimiters +
    drop-empties form counted (r6: the split materialized and filtered a
    full token array per row just to take its size — 2.06 s of the 2.37 s
    text_features wall at sf1; one regex scan, same value)."""
    return F.regexp_count(col, F.lit(r"[A-Za-z0-9]+"))


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[^\w \t\n\x0B\f\r]", ""))
    return F.round(n_punct / F.greatest(F.length(col), F.lit(1)), 6)


# The *_from_tokens forms take a precomputed token-array column so a
# multi-feature projection can tokenize ONCE and share the array (r6
# optimization, guide §1.2 per-task work: higher-order functions run
# outside whole-stage codegen's subexpression elimination, so each
# feature re-running split+filter was ~7 tokenizations per row in
# q_text_features). The string-column forms below delegate, so the
# expressions — and therefore every value — are unchanged.

def stopword_ratio_from_tokens(lower_toks: Column) -> Column:
    n_stop = F.size(F.filter(lower_toks, lambda t: t.isin(STOPWORDS)))
    return F.round(n_stop / F.greatest(F.size(lower_toks), F.lit(1)), 6)


def stopword_ratio(col: Column) -> Column:
    return stopword_ratio_from_tokens(tokens(F.lower(col)))


def mean_token_len_from_tokens(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def mean_token_len(col: Column) -> Column:
    return mean_token_len_from_tokens(tokens(col))


def quality_score_from(length_col: Column, punct_ratio_col: Column,
                       stopword_ratio_col: Column) -> Column:
    """Quality from already-computed (rounded) component columns — the
    exact arithmetic of ``quality_score`` with the ratios substituted."""
    len_score = F.least(length_col / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_col * 5)
    stop_sig = F.least(stopword_ratio_col * 4, F.lit(1.0))
    return F.round((len_score + punct_pen + stop_sig) / 3, 6)


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: favors mid-length docs with low
    punctuation density and non-trivial stopword presence (prose-like)."""
    return quality_score_from(F.length(col), punct_ratio(col),
                              stopword_ratio(col))


def lang_id_from_tokens(lower_toks: Column) -> Column:
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        hits = F.size(F.filter(lower_toks, lambda t: t.isin(markers)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of per-language marker-word hits.

    Deterministic tie-break by language code order; 'und' when no evidence.
    """
    return lang_id_from_tokens(tokens(F.lower(col)))


def fingerprint(col: Column) -> Column:
    """Deterministic whole-document fingerprint: md5 of normalized text."""
    norm = F.regexp_replace(F.lower(col), WS_CLASS + "+", " ")
    return F.md5(norm)


def chunk_fingerprints(col: Column, chunk_chars: int = 64,
                       max_chunks: int = 64) -> Column:
    """Fixed-width chunk fingerprints for partial-match blocking: the
    normalized text is cut into ``chunk_chars``-character chunks, each
    md5'd; (chunk_idx, chunk_hash) is the blocking key. Fixed (not
    length-relative) boundaries are PREFIX-STABLE: appending or editing
    near the end leaves every earlier chunk's hash intact, so a doc and
    its edited variant still collide on all untouched chunks — the
    blocking join stays an equi-join, the same no-all-pairs shape as
    minhash LSH. ``max_chunks`` bounds the array (and join fan-out) for
    pathological documents; boundaries are pure integer arithmetic so the
    DuckDB oracle reproduces the chunking byte-for-byte."""
    # bound-variable form (see dedup.shingles, r6): HOF lambdas re-evaluate
    # captured expressions per element, so referencing `norm` directly
    # inside the chunk lambda re-normalized the whole document once per
    # chunk; binding it via a one-element array evaluates it once per row
    norm = F.regexp_replace(F.lower(col), WS_CLASS + "+", " ")

    def build(s: Column) -> Column:
        ln = F.length(s)
        n = F.least(F.ceil(ln / F.lit(chunk_chars)),
                    F.lit(max_chunks)).cast("int")
        idx = F.sequence(F.lit(0), n - 1)
        fps = F.transform(
            idx,
            lambda i: F.md5(s.substr((i * chunk_chars + 1).cast("int"),
                                     F.lit(chunk_chars))),
        )
        return F.when(ln > 0, fps).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(norm), build), 1)


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_word_tokens", word_token_count(c))
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn("stopword_ratio", stopword_ratio(c))
        .withColumn("mean_token_len", mean_token_len(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("fingerprint", fingerprint(c))
    )


# PII patterns shared VERBATIM with the DuckDB oracle (Java regex and
# RE2 agree on this subset: char classes, bounded repetition, \b, one
# repeated capture group) — the redaction is reproducible outside Spark.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}(\.\d{1,3}){3}\b",
    # 13-19 digit runs: card-PAN-shaped identifiers
    "longnum": r"\b\d{13,19}\b",
}
PII_ORDER = ["email", "ipv4", "longnum"]  # replacement order is part of
# the contract: an email's host can contain dotted digits, so emails
# redact first and the later passes see the placeholder, not fragments


def pii_redact(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4 addresses, 13-19 digit
    runs) with typed placeholders, plus per-type match counts on the
    ORIGINAL text — the audit trail a compliance pass wants. Pure
    per-row JVM expressions (regexp_replace / regexp_count): no
    shuffle, no UDF, linear scans at any corpus size. Pattern-shaped
    false positives are by design — a scrubber errs toward redaction;
    swap PII_PATTERNS for a jurisdiction-specific set as needed."""
    c = F.col(text_col)
    out = c
    for name in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    # counts FIRST: withColumn re-resolves later F.col(text_col) against
    # the mutated frame, so an in-place scrub (out_col == text_col) would
    # otherwise count the already-redacted text and report zero matches
    res = df
    for name in PII_ORDER:
        res = res.withColumn(
            f"n_{name}", F.regexp_count(c, F.lit(PII_PATTERNS[name])))
    return res.withColumn(out_col, out)


def chunk_documents(df: DataFrame, max_tokens: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into training windows of at most ``max_tokens``
    whitespace tokens, consecutive chunks sharing ``overlap`` tokens of
    context (the standard long-document preprocessing step before
    packing/tokenization). Chunk ``i`` covers tokens
    ``[i*stride, i*stride + max_tokens)`` with ``stride = max_tokens -
    overlap``; a document of n <= max_tokens tokens yields exactly one
    chunk (an empty text yields one empty chunk — nothing vanishes),
    otherwise ``1 + ceil((n - max_tokens) / stride)`` chunks so every
    token is covered and no empty trailing chunk is emitted.

    Scale shape: tokenize -> sequence -> one explode, all JVM
    expressions — no shuffle, no UDF; output rows ~ total_tokens /
    stride. Boundaries are pure integer arithmetic, so the DuckDB
    oracle reproduces the chunking byte-for-byte."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    # NULL text tokenizes to NULL, which would NULL n_chunks and make
    # explode() silently DROP the document — coalesce to an empty token
    # array so it yields one empty chunk instead (nothing vanishes)
    d = df.withColumn(
        "_tk", F.coalesce(tokens(F.col(text_col)),
                          F.array().cast("array<string>")))
    n = F.size(F.col("_tk"))
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        # integer ceil((n - max_tokens) / stride) + 1; token counts are
        # far below 2^52 so the double floor is exact
        F.lit(1) + F.floor((n - max_tokens + stride - 1) / F.lit(stride))
    ).cast("long")
    piece = F.slice(F.col("_tk"),
                    (F.col("chunk_id") * stride + 1).cast("int"), max_tokens)
    return (
        d.withColumn("chunk_id",
                     F.explode(F.sequence(F.lit(0).cast("long"),
                                          n_chunks - 1)))
        .select(id_col, "chunk_id",
                F.array_join(piece, " ").alias("chunk_text"),
                F.size(piece).cast("long").alias("n_tokens"))
    )
