"""ML feature-engineering operators: rolling stats, lags, target encoding.

The feature-generation step between the curated corpus/event stream and
model training. Same contracts as the rest of the engine: one exchange
per logical regroup (the per-key window), native expressions end to end,
deterministic under any partitioning (explicit order columns
everywhere — Spark DataFrames are unordered; see SURVEY §1.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_features(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window_rows: int = 7,
    lags: tuple[int, ...] = (1,),
    round_to: int = 6,
) -> DataFrame:
    """Per-key rolling mean/std/min/max over the PRECEDING
    ``window_rows`` rows (current row excluded — no target leakage) plus
    lag features: the standard tabular feature block for sequential
    training data.

    Scale design: everything rides ONE window exchange on ``key_col``;
    every statistic is a frame aggregate over the same sorted run, so
    adding more features adds zero shuffles. Rolling std uses the
    sum/sumsq frame identity (sample variance) rather than a second
    pass. Rows with an incomplete preceding frame emit what the frame
    holds (nulls when empty) — the model-side mask decision is the
    caller's."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    frame = w.rowsBetween(-window_rows, -1)
    v = F.col(value_col).cast("double")
    n = F.count(v).over(frame)
    s = F.sum(v).over(frame)
    ss = F.sum(v * v).over(frame)
    mean = F.when(n > 0, s / n)
    var = F.when(n > 1, (ss - s * s / n) / (n - 1))
    out = df.select(
        "*",
        n.alias(f"{value_col}_roll_n"),
        F.round(mean, round_to).alias(f"{value_col}_roll_mean"),
        F.round(F.when(var >= 0, F.sqrt(var)), round_to).alias(
            f"{value_col}_roll_std"
        ),
        F.round(F.min(v).over(frame), round_to).alias(f"{value_col}_roll_min"),
        F.round(F.max(v).over(frame), round_to).alias(f"{value_col}_roll_max"),
        *[
            F.round(F.lag(v, k).over(w), round_to).alias(f"{value_col}_lag{k}")
            for k in lags
        ],
    )
    return out


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: float = 20.0,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing toward the
    global mean — the high-cardinality-categorical workhorse:

        enc_i = (sum(y | cat) − y_i + m·global_mean) / (n_cat − 1 + m)

    Excluding the row's own target (LOO) is what prevents the encoded
    feature from leaking the label; smoothing ``m`` shrinks rare
    categories toward the prior. Singleton categories encode to the
    global mean exactly.

    Scale design: per-category sums ride ONE window exchange keyed by
    the category (no join back — the window IS the join); the global
    mean is a one-row broadcast. Deterministic: the encoding depends
    only on (category, own target), not row order."""
    y = F.col(target_col).cast("double")
    wc = Window.partitionBy(category_col)
    g = df.agg(
        (F.sum(y) / F.count(y)).alias("__gmean__")
    )
    cat_sum = F.sum(y).over(wc)
    cat_n = F.count(y).over(wc)
    enc = F.when(
        cat_n - 1 + F.lit(smoothing) > 0,
        (cat_sum - y + F.lit(smoothing) * F.col("__gmean__"))
        / (cat_n - 1 + F.lit(smoothing)),
    )
    return (
        df.crossJoin(F.broadcast(g))
        .withColumn(out_col or f"{category_col}_te", F.round(enc, round_to))
        .drop("__gmean__")
    )
