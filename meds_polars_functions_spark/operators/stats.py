"""Grouped statistical modeling primitives, all native expressions.

Beyond-reference analytics siblings of aggregate_code_metadata's
mergeable-statistics convention (reference aggregate_code_metadata.py:
33-41 stores sum/sum² so shards re-aggregate): each operator here
reduces the corpus to ALGEBRAIC sufficient statistics in one
partial-aggregated pass, then finishes with closed-form arithmetic on
the tiny result — so every one of them merges across shards/streams by
summing, and none ever shuffles raw rows more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group simple linear regression y = a + b·x via sufficient
    statistics: one partial-aggregated pass collects
    (n, Σx, Σy, Σxx, Σxy), slope/intercept/R² are closed-form on the
    group table. The statistics are additive, so per-shard tables merge
    by summing — the OLS analogue of the code-metadata reducer.

    slope = (nΣxy − ΣxΣy) / (nΣxx − (Σx)²); groups with zero x-variance
    return null slope/intercept (no trend is defined).
    Returns (group..., n, slope, intercept, r2)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    stats = (
        df.filter(
            x.isNotNull() & y.isNotNull() & ~F.isnan(x) & ~F.isnan(y)
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    n = F.col("n")
    den_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(den_x > 0, num / den_x)
    intercept = F.when(
        den_x > 0, (F.col("sy") - slope * F.col("sx")) / n
    )
    r2 = F.when((den_x > 0) & (den_y > 0), (num * num) / (den_x * den_y))
    return stats.select(
        *group_cols,
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    order_cols: list[str],
    state_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition table over per-user event streams:
    lag window keyed by user (ONE exchange — the same key the stream is
    naturally bucketed by), then a (prev, next) count agg and a
    row-normalized probability. Returns
    (prev_state, next_state, n, p) — the behavioral-model fit step.

    ``order_cols`` must deterministically order events within a user
    (e.g. [ts, event_id]); ties without a tiebreak would make the chain
    nondeterministic."""
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        df.withColumn("__prev__", F.lag(state_col).over(w))
        .filter(F.col("__prev__").isNotNull())
        .select(F.col("__prev__").alias("prev_state"), F.col(state_col).alias("next_state"))
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), round_to).alias("p"),
    )


def code_cooccurrence_pmi(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    min_count: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Pointwise mutual information over item co-occurrence within
    baskets (market-basket / code-comorbidity mining): baskets are the
    distinct (basket_cols) groups, pairs are generated INSIDE each
    basket from its sorted distinct-item array (map-side explode of
    array_combinations — never a basket×basket join), and PMI compares
    pair frequency against the independence baseline.

    Scale ledger: one exchange to collect per-basket item sets, one
    pair-count agg (pair fan-out is Σ k²/2 over basket sizes — bounded
    by the basket key's natural cardinality, e.g. events per
    user-hour), item marginals as a broadcast-sized dim joined twice.
    Returns (item_a, item_b, n_pair, pmi) with item_a < item_b."""
    baskets = (
        df.groupBy(*basket_cols)
        .agg(F.array_sort(F.collect_set(item_col)).alias("__items__"))
        .filter(F.size("__items__") >= 2)
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    pairs_expr = F.flatten(
        F.transform(
            F.col("__items__"),
            lambda a, i: F.transform(
                F.slice(F.col("__items__"), i + 2, F.size("__items__")),
                lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(pairs_expr).alias("__p__"))
        .groupBy(F.col("__p__.item_a").alias("item_a"), F.col("__p__.item_b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    marg = (
        baskets.select(F.explode("__items__").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    ma = marg.select(F.col("item").alias("item_a"), F.col("n_item").alias("__na__"))
    mb = marg.select(F.col("item").alias("item_b"), F.col("n_item").alias("__nb__"))
    return (
        pair_counts.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(
                F.log2(
                    (F.col("n_pair") * F.col("n_baskets"))
                    / (F.col("__na__") * F.col("__nb__"))
                ),
                round_to,
            ).alias("pmi"),
        )
    )


def grouped_welch_ttest(
    df: DataFrame,
    strata_cols: list[str],
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Per-stratum Welch two-sample t statistic comparing ``group_a``
    vs ``group_b`` — the A/B significance primitive (data-mixture
    experiments, cohort comparisons), from the same one-pass additive
    sufficient statistics as :func:`grouped_ols_trend`: (n, Σv, Σv²)
    per (stratum, group), then closed form

        t  = (mean_a − mean_b) / sqrt(s²_a/n_a + s²_b/n_b)
        df = Welch–Satterthwaite approximation

    with SAMPLE variance (n−1 denominator). Strata where either side
    has n < 2 or both variances are zero return null t. No p-value on
    purpose: the t CDF is not expressible in closed-form SQL, so the
    deterministic statistic is the oracle-checkable surface; feed t/df
    to scipy driver-side if needed (they are stratum-count-sized).
    Returns (strata..., n_a, n_b, mean_a, mean_b, t, df)."""
    v = F.col(value_col).cast("double")
    base = (
        df.filter(F.col(group_col).isin([group_a, group_b]) & v.isNotNull() & ~F.isnan(v))
        .groupBy(*strata_cols)
        .agg(
            *[
                agg
                for tag, val in (("a", group_a), ("b", group_b))
                for agg in (
                    F.count(F.when(F.col(group_col) == val, 1)).alias(f"n_{tag}"),
                    F.sum(F.when(F.col(group_col) == val, v)).alias(f"s_{tag}"),
                    F.sum(F.when(F.col(group_col) == val, v * v)).alias(f"ss_{tag}"),
                )
            ]
        )
    )
    def mean(tag):
        return F.col(f"s_{tag}") / F.col(f"n_{tag}")

    def var(tag):  # sample variance via sums: (Σv² − n·mean²) / (n−1)
        n = F.col(f"n_{tag}")
        return (F.col(f"ss_{tag}") - n * mean(tag) * mean(tag)) / (n - 1)

    se2 = var("a") / F.col("n_a") + var("b") / F.col("n_b")
    t = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0),
        (mean("a") - mean("b")) / F.sqrt(se2),
    )
    welch_df = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0),
        (se2 * se2)
        / (
            (var("a") / F.col("n_a")) * (var("a") / F.col("n_a")) / (F.col("n_a") - 1)
            + (var("b") / F.col("n_b")) * (var("b") / F.col("n_b")) / (F.col("n_b") - 1)
        ),
    )
    return base.select(
        *strata_cols,
        "n_a",
        "n_b",
        F.round(mean("a"), round_to).alias("mean_a"),
        F.round(mean("b"), round_to).alias("mean_b"),
        F.round(t, round_to).alias("t"),
        F.round(welch_df, round_to).alias("df"),
    )


def correlation_matrix(
    df: DataFrame,
    value_cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations of ``value_cols`` in ONE
    aggregation pass: all m + m(m+1)/2 sufficient statistics (per-column
    sums/sumsqs + pairwise cross-products) are computed as parallel
    aggregates over the same scan — never m² passes, never a
    row-matrix collect. Rows with a null/NaN in ANY column are dropped
    (complete-case, so every pair shares one n and the matrix is
    positive semi-definite). Output is the upper triangle
    (col_a, col_b, n, corr) with col_a < col_b in list order;
    zero-variance columns yield null corr."""
    cols = [F.col(c).cast("double") for c in value_cols]
    keep = None
    for c in cols:
        cond = c.isNotNull() & ~F.isnan(c)
        keep = cond if keep is None else (keep & cond)
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(c).alias(f"s{i}"))
        aggs.append(F.sum(c * c).alias(f"ss{i}"))
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"sp{i}_{j}"))
    stats = df.filter(keep).agg(*aggs)
    n = F.col("n")
    rows = []
    for i in range(len(value_cols)):
        for j in range(i + 1, len(value_cols)):
            num = n * F.col(f"sp{i}_{j}") - F.col(f"s{i}") * F.col(f"s{j}")
            di = n * F.col(f"ss{i}") - F.col(f"s{i}") * F.col(f"s{i}")
            dj = n * F.col(f"ss{j}") - F.col(f"s{j}") * F.col(f"s{j}")
            rows.append(
                F.struct(
                    F.lit(value_cols[i]).alias("col_a"),
                    F.lit(value_cols[j]).alias("col_b"),
                    n.alias("n"),
                    F.round(
                        F.when((di > 0) & (dj > 0), num / F.sqrt(di * dj)),
                        round_to,
                    ).alias("corr"),
                )
            )
    return stats.select(F.explode(F.array(*rows)).alias("__r__")).select(
        "__r__.col_a", "__r__.col_b", "__r__.n", "__r__.corr"
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns + Cramér's V effect size — the categorical counterpart of
    :func:`correlation_matrix` (is language associated with source? is
    event type associated with user cohort?).

    One count aggregation over (a, b); marginals derive from the cell
    table with window sums (no second scan); the statistic is
    Σ (observed − expected)² / expected over observed cells plus the
    zero-observed cells' contribution Σ expected (added in closed form:
    for cells with o=0 the term is exactly e, and Σe over missing cells
    = n − Σe over present cells — so absent combinations are accounted
    without materializing the full cross product). Returns one row
    (n, dof, chi2, cramers_v). No p-value by design (chi2 CDF is not
    closed-form SQL; the statistic is the oracle-checkable surface)."""
    a, b = F.col(col_a), F.col(col_b)
    cells = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a__"), b.alias("__b__"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wa = Window.partitionBy("__a__")
    wb = Window.partitionBy("__b__")
    wall = Window.partitionBy(F.lit(1))
    with_e = cells.select(
        "o",
        (
            F.sum("o").over(wa) * F.sum("o").over(wb) / F.sum("o").over(wall).cast("double")
        ).alias("e"),
        F.sum("o").over(wall).alias("n"),
        F.size(F.collect_set("__a__").over(wall)).alias("ka"),
        F.size(F.collect_set("__b__").over(wall)).alias("kb"),
    )
    agg = with_e.groupBy("n", "ka", "kb").agg(
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "__present__"
        ),
        F.sum("e").alias("__e_present__"),
    )
    chi2 = F.col("__present__") + (F.col("n") - F.col("__e_present__"))
    dof = (F.col("ka") - 1) * (F.col("kb") - 1)
    v = F.when(
        dof > 0,
        F.sqrt(chi2 / (F.col("n") * F.least(F.col("ka") - 1, F.col("kb") - 1))),
    )
    return agg.select(
        "n",
        dof.alias("dof"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(v, round_to).alias("cramers_v"),
    )
