"""Skew-mitigation helpers.

AQE handles skewed *joins* automatically (split oversized partitions);
these helpers cover the aggregation-side cases AQE cannot fix:

- ``count_distinct_twophase``: exact distinct counts whose first phase
  spreads each group's distinct-set construction across
  (group, value)-hashed partitions — a hot group's values no longer land
  on one task. Spark's built-in countDistinct expands to a similar
  two-phase plan per aggregate; this form also lets several distinct
  counts share one pass and makes the strategy explicit/controllable.
- ``salted_collect_list``: per-group ordered collect where one group's
  payload would overflow a task — phase 1 collects per (group, salt),
  phase 2 merges the (few, pre-sorted) chunks. Order is preserved by
  sorting chunk structs on their first element.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_distinct_twophase(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Exact per-group distinct count as dedup-then-count.

    Phase 1 shuffles on (group, value) — cardinality-bounded, skew-free;
    phase 2 counts per group. Equivalent to
    ``groupBy(group).agg(countDistinct(col))`` for any data distribution.
    """
    out_col = out_col or f"{distinct_col}_n_distinct"
    deduped = df.select(*group_cols, distinct_col).dropDuplicates(
        [*group_cols, distinct_col]
    )
    return deduped.groupBy(*group_cols).agg(
        F.count(F.col(distinct_col)).alias(out_col)
    )


def salted_collect_list(
    df: DataFrame,
    group_cols: Sequence[str],
    payload_col: str,
    order_col: str,
    n_salts: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Ordered per-group collect_list that survives pathological groups.

    Phase 1: collect sorted (order, payload) structs per (group, salt) —
    each task holds at most ~1/n_salts of a hot group. Phase 2: merge the
    n_salts chunks per group, sort chunks by their first order key, and
    flatten. Output order equals a direct ordered collect.
    """
    out_col = out_col or f"{payload_col}_list"
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts))
    chunked = (
        df.withColumn("__salt__", salt)
        .groupBy(*group_cols, "__salt__")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(order_col).alias("o"), F.col(payload_col).alias("v"))
                )
            ).alias("__chunk__")
        )
    )
    merged = chunked.groupBy(*group_cols).agg(
        F.flatten(F.collect_list("__chunk__")).alias("__all__")
    )
    # structs sort by their first field (the order key): one final
    # group-local sort of at most |group| small structs
    return merged.select(
        *group_cols,
        F.transform(F.array_sort(F.col("__all__")), lambda s: s["v"]).alias(out_col),
    )


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tie_cols: Sequence[str] = (),
    rank_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per group with a MAP-SIDE prune.

    The direct formulation (``row_number().over(partitionBy(group))``,
    see q_top_orders_per_customer) shuffles EVERY row to rank a handful;
    at 100 TB that exchange is the whole job. Here phase 1 keeps at most
    k rows per group within each input partition — no shuffle, Arrow
    batches, any row it drops is provably outside the global top-k under
    the same total order — and phase 2 runs the exact window over the
    ≤ k·n_partitions survivors per group. Results are identical to the
    direct window for any data distribution; ``tie_cols`` (ascending)
    make the order total, so ranks are deterministic.

    Regime note (measured, SCALE.md): on local[32] the RAM-speed shuffle
    makes the direct window FASTER — the Arrow prune pass costs more
    than the bytes it saves. Reach for this form when the shuffle is
    network-bound or the group×row volume makes the full exchange the
    bottleneck; default to the plain window below that.
    """
    sort_cols = [order_col, *tie_cols]
    pandas_asc = [ascending] + [True] * len(tie_cols)
    groups = list(group_cols)

    def prune(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(sort_cols, ascending=pandas_asc)
                    .groupby(groups, sort=False)
                    .head(k)
                )

    pruned = df.mapInPandas(prune, df.schema)
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        *[F.col(c).asc() for c in tie_cols],
    ]
    w = Window.partitionBy(*groups).orderBy(*order)
    ranked = pruned.withColumn("__rn__", F.row_number().over(w)).filter(
        F.col("__rn__") <= k
    )
    if rank_col:
        return ranked.withColumnRenamed("__rn__", rank_col)
    return ranked.drop("__rn__")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the skewed ``left``, REPLICATE ``right``
    across all salts, join on (keys, salt).

    AQE's skew-join split handles most cases at runtime; this is the
    explicit fallback for the ones it can't — a skewed stream side, a
    key so hot one split still overflows, or an engine-pinned plan where
    AQE is off. Each hot key's rows spread over ``n_salts`` tasks at the
    cost of shuffling ``right`` ``n_salts``× (keep right the smaller
    side). Result is identical to ``left.join(right, on, how)`` for
    inner/left joins (each right row meets each left row exactly once —
    on its salt).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = list(on)
    salt = (F.hash(F.monotonically_increasing_id()) % n_salts + n_salts) % n_salts
    l_salted = left.withColumn("__salt__", salt.cast("int"))
    r_replicated = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt__", F.col("__salt__").cast("int"))
    return l_salted.join(r_replicated, [*keys, "__salt__"], how).drop("__salt__")
