"""Text analysis for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no UDFs.
Token model: whitespace-separated words (the corpus is already normalized);
hashes are md5 hex so a SQL oracle (DuckDB) reproduces them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# compact English-ish stopword list used by the n-gram/stopword language
# heuristic; fixed order, shared with the SQL oracle.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this", "be",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("tokens", tokens_col(F.col(text_col)))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, n_distinct_tokens, max_token_len) — exact ints."""
    t = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_tokens"),
        F.array_max(F.transform(t, F.length)).cast("long").alias("max_token_len"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals (lengths / repetition / stopword density).

    Integer-scaled (x1e6, floor) so results hash exactly vs a SQL oracle.
    """
    t = tokens_col(F.col(text_col))
    n_tok = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(t, stop_arr))
    return docs.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.floor(n_distinct * F.lit(1_000_000) / n_tok).cast("long").alias("distinct_ratio_e6"),
        F.floor(n_stop * F.lit(1_000_000) / F.greatest(n_distinct, F.lit(1)))
        .cast("long")
        .alias("stopword_ratio_e6"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-density language heuristic: 'en' if >= 5% of distinct tokens
    are English stopwords, else 'other'. (The real corpus here is synthetic
    English-ish text; the point is the scalable shape: set-intersection of a
    token array against a broadcast lexicon, no UDF.)"""
    q = quality_score(docs, id_col, text_col)
    return q.select(
        id_col,
        F.when(F.col("stopword_ratio_e6") >= 50_000, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
        "stopword_ratio_e6",
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the token-normalized text (stable under
    whitespace variation) — the exact-dedup key."""
    norm = F.array_join(tokens_col(F.col(text_col)), " ")
    return docs.select(F.col(id_col), F.md5(norm).alias("fp"))


#: GPT-2-style pretokenizer shape, ASCII-safe subset shared verbatim with
#: the DuckDB oracle (both engines treat these classes identically):
#: optional leading space + a letter run, digit run, or punctuation run.
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bpe_pieces, n_distinct_pieces, n_ws_tokens) — token counting
    with the BPE-ish pretokenizer regex next to the whitespace count, the
    standard pair a training-data pipeline budgets with. Pure Column
    expressions (JVM regex), exact integers.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), 0)
    return docs.select(
        F.col(id_col),
        F.size(pieces).cast("long").alias("n_bpe_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_distinct_pieces"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_ws_tokens"),
    )
