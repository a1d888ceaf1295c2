"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

Everything here is Spark built-ins (JVM-side, whole-stage codegen) —
no Python in the hot path at all; the oracle SQL re-expresses the same
formulas so results are cross-engine deterministic (integer/floor
arithmetic only, no float rounding hazards)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EN_STOPWORDS = ["the", "of", "and", "to", "in", "a", "is", "that", "for",
                "it", "with", "as", "on", "be", "at", "by", "this", "from"]


def token_count(col: Column) -> Column:
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.regexp_replace(t, " ", "")) + 1).cast("long")


def stopword_ratio_ppm(col: Column, stopwords: list[str] | None = None) -> Column:
    """parts-per-million of whitespace tokens that are English stopwords
    (n-gram-free heuristic language-ID signal)."""
    sw = stopwords or EN_STOPWORDS
    t = F.trim(col)
    toks = F.split(t, " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(sw)))
    total = F.greatest(F.size(toks), F.lit(1))
    return F.floor(hits.cast("double") * 1000000.0 / total).cast("long")


def lang_guess(col: Column, threshold_ppm: int = 150000) -> Column:
    return F.when(stopword_ratio_ppm(col) >= threshold_ppm, F.lit("en")) \
            .otherwise(F.lit("other"))


FP_WEIGHTS = [31 ** i for i in range(8)]  # literal weights: no float pow


def rolling_fingerprint(col_name: str, mod: int = 1 << 31) -> Column:
    """Deterministic document fingerprint: position-weighted byte sum
    with period-8 literal weights (a rolling-hash family member that is
    expressible identically in Spark SQL and ANSI SQL for oracle
    checking; weights as integer literals avoid pow() ulp hazards)."""
    warr = ",".join(str(w) for w in FP_WEIGHTS)
    return F.expr(
        f"pmod(aggregate(transform(split({col_name}, ''), (c, i) -> "
        f"CAST(ascii(c) AS BIGINT) * element_at(array({warr}), CAST(i % 8 AS INT) + 1)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x), CAST({mod} AS BIGINT))"
    ).cast("long")


def quality_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    c = F.col(text_col)
    length = F.length(c)
    spaces = length - F.length(F.regexp_replace(c, " ", ""))
    return df.select(
        id_col,
        length.cast("long").alias("n_chars"),
        token_count(c).alias("n_tokens"),
        F.floor(spaces.cast("double") * 1000000.0
                / F.greatest(length, F.lit(1))).cast("long").alias("space_ratio_ppm"),
        stopword_ratio_ppm(c).alias("stopword_ppm"),
        lang_guess(c).alias("lang_guess"),
    )
