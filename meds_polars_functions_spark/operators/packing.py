"""Sequence packing: assign documents to fixed-token-budget training
bins (context windows).

Beyond-reference training-data operator. Real packers run greedy
first-fit; the distributed, deterministic formulation here is
contiguous-fill: documents are hash-sharded (engine-portable md5 bucket,
map-side), deterministically ordered within each shard, and a per-shard
running token total assigns each document to the bin its first token
falls in. Every step is a native expression or window — the only
exchange is the hash partition on (shard), and the cumulative-sum window
is per-shard, so parallelism = n_shards (size it to the cluster; bins
are shard-local so no coordination crosses shards).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_bucket(col: F.Column, n: int) -> F.Column:
    """Engine-portable uniform bucket in [0, n): md5 hex prefix -> int.
    Matches ``('0x' || substr(md5(x), 1, 8))::BIGINT % n`` in DuckDB."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(n)


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """(id, shard, bin, n_tokens): contiguous-fill packing of documents
    into ``max_tokens`` context windows, per md5 shard.

    bin = floor(exclusive-prefix-sum(n_tokens) / max_tokens) in shard
    order of ``id_col`` — deterministic on any engine/partitioning.
    Documents longer than ``max_tokens`` occupy (and overflow) their own
    window, exactly as a sequential packer would before truncation.
    """
    n_tokens = F.size(
        F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    )
    sharded = df.select(
        F.col(id_col).alias("id"),
        _md5_bucket(F.col(id_col), n_shards).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return sharded.select(
        "id",
        "shard",
        F.floor((cum - F.col("n_tokens")) / F.lit(max_tokens)).alias("bin"),
        "n_tokens",
    )


def packing_stats(packed: DataFrame, max_tokens: int = 2048) -> DataFrame:
    """Per-(shard, bin) fill statistics: document count, token sum, and
    fill ratio against the window budget."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("token_sum"),
        F.round(F.sum("n_tokens") / F.lit(float(max_tokens)), 6).alias(
            "fill_ratio"
        ),
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic data-mixture downsampling: keep each row with its
    source's probability, decided by the row's md5 bucket — map-side,
    no RNG state, reproducible on any engine/partitioning (the same
    mechanism as ``split_patients.hash_split_expr``; ``salt`` draws an
    independent sample). This is how a 100 TB corpus gets re-weighted
    (e.g. upweight books, downweight crawl) without a shuffle or a
    driver-side plan: weight w keeps a w-fraction of each source.
    Sources absent from ``weights`` keep ``default_weight``.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(0x100000000))
    )
    w = F.lit(float(default_weight))
    for name, frac in weights.items():
        w = F.when(F.col(source_col) == name, F.lit(float(frac))).otherwise(w)
    return df.filter(bucket < w)


def class_balanced_sample(
    df: DataFrame,
    class_col: str,
    id_col: str,
    n_per_class: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic class balancing: keep at most ``n_per_class`` rows
    per class, chosen by md5 order of the id (engine-portable, salt for
    an independent draw). One exchange on the class key; the md5 rank is
    map-side."""
    from pyspark.sql import Window

    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(class_col).orderBy(order, id_col)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n_per_class)
        .drop("__rn__")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    fraction: float,
    salt: str = "",
    min_per_stratum: int = 0,
) -> DataFrame:
    """Deterministic PROPORTIONAL stratified sampling: every stratum
    contributes exactly ``max(ceil(fraction * n_s), min(min_per_stratum,
    n_s))`` rows, chosen by md5 order of ``(id, salt)`` — the
    engine-portable rank, so the same (data, fraction, salt) yields the
    same sample on any engine that can md5 (the class_balanced_sample /
    hash_split replay discipline).

    Differs from :func:`class_balanced_sample` (FIXED n per class —
    balancing flattens the class distribution) exactly where it
    matters: proportional allocation PRESERVES the strata mix while
    bounding total volume, the standard corpus-downsampling contract
    (per-source/per-language budgets that track corpus shares), with
    ``min_per_stratum`` as the small-strata floor (capped at the
    stratum size, so tiny strata are kept whole, never upsampled).

    100 TB shape: the per-stratum targets are ONE metadata-sized
    aggregate (|strata| rows) broadcast onto the corpus — the corpus
    itself moves through exactly ONE hash exchange on the strata key
    for the rank window. A hot stratum is one partition's ordered run
    (the same bound as every window op here); for network-bound
    shuffles the map-side bottom-k prune (functions/skew.py
    topk_per_group with k = max target) composes in front without
    changing the result — any row a local prune drops is provably
    outside its stratum's target under the same total order.
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    clash = sorted({"__rn__", "__k__"} & set(df.columns))
    if clash:
        raise ValueError(
            f"stratified_sample: input already carries reserved column(s) "
            f"{clash}; rename them (they would be silently overwritten)"
        )
    strata = list(strata_cols)
    targets = df.groupBy(*strata).agg(
        F.greatest(
            F.ceil(F.count(F.lit(1)) * F.lit(float(fraction))),
            F.least(F.count(F.lit(1)), F.lit(int(min_per_stratum))),
        )
        .cast("long")
        .alias("__k__")
    )
    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*strata).orderBy(order, id_col)
    return (
        df.join(F.broadcast(targets), strata)
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= F.col("__k__"))
        .drop("__rn__", "__k__")
    )


def weighted_group_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Per-group deterministic weighted sampling without replacement —
    :func:`weighted_sample`'s Efraimidis-Spirakis exponential race run
    INSIDE each group: every row draws the same engine-portable md5
    u-value and races with key ``-ln(u) / w``; the k smallest keys PER
    GROUP are a correctly-distributed weighted sample of that group.

    Differs from :func:`weighted_sample` (GLOBAL top-k — one winner set
    for the whole corpus) in the partitioning of the race, which is the
    whole point: per-source/per-class weighted budgets in one pass.
    Same key arithmetic bit-for-bit (md5 u-draw, ``-ln(u)/w``, round(9)
    + id tiebreak, ``w <= 0`` never wins), so the DuckDB replay oracle
    carries over per group. NaN weights are excluded like ``w <= 0``
    (ADVICE r13 item 4: without the explicit guard a NaN weight races
    with a NaN key, which sorts LAST instead of being dropped — visible
    only in groups with fewer than k positive-weight rows, and
    engine-divergent because DuckDB's NaN orders differently).

    100 TB shape: the key is a pure map-side expression; selection is
    one hash exchange on the group key + a rank window (k rows kept per
    group). The map-side prune (topk_per_group ascending on the key)
    composes in front for network-bound shuffles, provably
    output-identical.
    """
    clash = sorted({"__sk__", "__rn__"} & set(df.columns))
    if clash:
        raise ValueError(
            f"weighted_group_sample: input already carries reserved "
            f"column(s) {clash}; rename them (they would be silently "
            f"overwritten)"
        )
    p = 2147483647
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(p)
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(p + 1))
    wgt = F.col(weight_col).cast("double")
    key = F.when(
        (wgt > 0) & ~F.isnan(wgt), -F.log(u) / wgt
    ).otherwise(F.lit(float("inf")))
    win = Window.partitionBy(*group_cols).orderBy(F.asc("__sk__"), F.asc(id_col))
    return (
        df.withColumn("__sk__", F.round(key, 9))
        .filter(F.col("__sk__") != float("inf"))
        .withColumn("__rn__", F.row_number().over(win))
        .filter(F.col("__rn__") <= k)
        .drop("__sk__", "__rn__")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global permutation of the corpus — the "shuffle your
    training data" primitive. Order key is md5(id || salt): uniform,
    engine-portable, reproducible, and re-drawable by changing the salt
    (epoch number as salt = a fresh permutation per epoch with zero
    stored state).

    At scale this is a range-partition-then-local-sort, NOT a global
    sort through one reducer: Spark's sort samples the md5 key space,
    range-partitions into ``n_partitions`` balanced chunks (md5 keys are
    uniform, so no skew by construction), and sorts each chunk locally.
    Downstream sequential readers see the permuted order shard by shard.
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    out = df.withColumn("__shuffle_key__", key)
    if n_partitions is not None:
        out = out.repartitionByRange(n_partitions, "__shuffle_key__")
        return out.sortWithinPartitions("__shuffle_key__").drop("__shuffle_key__")
    return out.sort("__shuffle_key__").drop("__shuffle_key__")


def shuffle_positions(df: DataFrame, id_col: str, salt: str = "") -> DataFrame:
    """(id, pos): each row's 1-based position in the deterministic
    permutation — the verifiable face of ``deterministic_shuffle`` (a
    global row_number, driver-window-free only in test scale; production
    readers consume the sorted shards directly and never materialize
    positions)."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return (
        df.select(F.col(id_col), key.alias("__k__"))
        .withColumn("pos", F.row_number().over(Window.orderBy("__k__", id_col)))
        .drop("__k__")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 exponential race): each row draws u in (0, 1] from
    the engine-portable md5 hash of (id, salt) and races with key
    ``-ln(u) / w`` — the k SMALLEST keys are a correctly-distributed
    weighted sample, in one pass with no per-group state.

    Why this is the 100 TB sampler: it needs no total weight, no second
    pass, and no coordination — the key is a pure map-side expression,
    selection is a global top-k (TakeOrdered: per-partition heads, then
    a k-sized merge on one reducer), and the same (data, salt, k) always
    yields the same sample on any engine that can md5. Re-draw by
    changing the salt. Rows with weight <= 0 never win (key = +inf)."""
    p = 2147483647
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % F.lit(p)
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(p + 1))
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, -F.log(u) / w).otherwise(F.lit(float("inf")))
    return (
        df.withColumn("__sk__", F.round(key, 9))
        .orderBy(F.asc("__sk__"), F.asc(id_col))
        .limit(k)
        .drop("__sk__")
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture resampling: target share of source ``s``
    is ``count(s)^alpha / sum_t count(t)^alpha`` (the multilingual /
    multi-corpus alpha-sampling rule of mBERT / XLM-R / T5, alpha < 1
    upweights small sources), realized as a DETERMINISTIC per-source
    keep-rate over md5 buckets of the row id — the adaptive sibling of
    ``mixture_sample``, which needs hand-set weights.

    ``target_total`` is the desired output row count (defaults to the
    input count). Keep rate ``min(1, share * target / count)`` — a
    source already smaller than its target share keeps everything
    (upsampling is out of scope for a filter).

    Scale design: one count agg over the source key (tiny), rates
    derived driver-free in a BROADCAST one-row-per-source dim joined
    back map-side; the keep decision is the same engine-portable md5
    bucket as ``mixture_sample`` — no RNG, no shuffle of the corpus."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__c__"))
    tot = counts.agg(
        F.sum(F.pow(F.col("__c__"), F.lit(alpha))).alias("__wsum__"),
        F.sum("__c__").alias("__n__"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            (F.pow(F.col("__c__"), F.lit(alpha)) / F.col("__wsum__"))
            * (F.coalesce(F.lit(target_total), F.col("__n__")) / F.col("__c__")),
        ).alias("__rate__"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(0x100000000))
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket < F.col("__rate__"))
        .drop("__rate__")
    )
