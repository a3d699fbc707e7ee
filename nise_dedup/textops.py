"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side `pyspark.sql.functions` expressions (no Python on the hot
path), each with an exact ANSI-SQL oracle in __spark_entry__.py:

- token counting (whitespace tokens)
- quality scoring (length / punctuation / stopword ratios)
- language-marker counting (n-gram-heuristic language ID, exposed as
  deterministic marker counts)
- word-set and character-n-gram Jaccard similarity (n-gram dedup primitive)
- rolling-hash document fingerprinting (content-defined fingerprints)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword markers (counted with padded spaces so they
# match whole words only); deterministic and SQL-mirrorable
LANG_MARKERS = {
    "en": " the ",
    "es": " los ",
    "de": " der ",
}


def token_count(col: Column) -> Column:
    """Whitespace token count. split on \\s+ after trim; empty string -> 0."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))).cast("long")


def _count_occurrences(col: Column, needle: str) -> Column:
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
            / len(needle)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics (ratios exact int/int divisions)."""
    t = F.col(text_col)
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    n_chars = F.length(t).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_q"),
        token_count(t).alias("n_tokens"),
        _count_occurrences(t, " ").alias("n_spaces"),
        _count_occurrences(padded, LANG_MARKERS["en"]).alias("n_stop_en"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", "")))
        .cast("long").alias("n_punct"),
    )


def lang_marker_counts(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Language-ID heuristic: whole-word marker hit counts per language.
    (Exposed as counts rather than argmax so the oracle comparison is
    tie-free and exact.)"""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    cols = [F.col(id_col)]
    for lang, marker in LANG_MARKERS.items():
        cols.append(_count_occurrences(padded, marker).alias(f"hits_{lang}"))
    return df.select(*cols)


def word_jaccard_consecutive(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Word-set Jaccard between each doc and the next doc id — the n-gram
    Jaccard dedup primitive at n=1, SQL-mirrorable exactly (int/int div)."""
    words = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = df.select(F.col(id_col).alias("a"), words.alias("wa"))
    v = df.select((F.col(id_col) - 1).alias("a"), words.alias("wb"),
                  F.col(id_col).alias("b"))
    joined = w.join(v, on="a")
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size(F.array_union("wa", "wb"))
    return joined.select(
        "a", "b",
        inter.cast("long").alias("n_common"),
        union.cast("long").alias("n_union"),
        (inter / union).alias("jaccard"))


def ngram_set(col: Column, n: int) -> Column:
    """Distinct character n-grams of a string as an array (JVM-side:
    sequence + transform + substring), sorted for determinism."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(n)))
    return F.array_sort(F.array_distinct(grams))


def char_ngram_jaccard_consecutive(df: DataFrame, n: int = 3,
                                   text_col: str = "text",
                                   id_col: str = "doc_id") -> DataFrame:
    """Character n-gram Jaccard between consecutive doc ids."""
    grams = ngram_set(F.col(text_col), n)
    a = df.select(F.col(id_col).alias("a"), grams.alias("ga"))
    b = df.select((F.col(id_col) - 1).alias("a"), grams.alias("gb"),
                  F.col(id_col).alias("b"))
    joined = a.join(b, on="a")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return joined.select(
        "a", "b",
        inter.cast("long").alias("n_common"),
        union.cast("long").alias("n_union"),
        (inter / union).alias("jaccard"))


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash document fingerprint: xxhash64 of the text plus
    xxhash64 of each quarter — a cheap containment-probe sketch.
    Rows-only oracle (hash function not in DuckDB)."""
    t = F.col(text_col)
    quarter = (F.length(t) / 4).cast("int")
    return df.select(
        F.col(id_col),
        F.xxhash64(t).alias("fp_full"),
        F.xxhash64(t.substr(F.lit(1), quarter)).alias("fp_q1"),
        F.xxhash64(t.substr(quarter + 1, quarter)).alias("fp_q2"),
    )
