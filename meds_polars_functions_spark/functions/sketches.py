"""Mergeable distinct-count sketches (Apache DataSketches HLL, native in
Spark — ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

Beyond-reference scale extension of the reference's mergeable-statistics
convention (aggregate_code_metadata.py:33-41 stores sum/sum² so shards
re-aggregate without recompute): distinct counts are the ONE stat in the
code-metadata aggregation (A1: ``n_unique(patient_id)``) that is not
algebraic — exact ``countDistinct`` cannot be merged across pre-agged
shards/datasets. An HLL sketch column can: union is lossless between
sketches of the same lgK, so per-dataset metadata tables merge by
``hll_union_agg`` with no re-scan of the facts. At 100 TB this is the
difference between re-reading every dataset to refresh global code
stats and a metadata-sized union.

Accuracy: exact in sparse mode (cardinality ≲ 2^lgK/4), ~0.4-1.6%
relative error above it (lgK 12 default). All JVM-native — no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _require_identifiers(fn: str, **cols: str) -> None:
    """The *_flags forms splice column names into SQL FILTER clauses
    (FILTER (WHERE <col>)), so they accept bare column IDENTIFIERS
    only — reject anything expression-shaped up front instead of
    letting it parse as SQL (ADVICE r12 collision-guard class)."""
    for role, name in cols.items():
        if not isinstance(name, str) or not name.isidentifier():
            raise ValueError(
                f"{fn}: {role} must be a bare column identifier, got {name!r}"
            )


def _require_duration(fn: str, window: str) -> None:
    """The windowed forms splice the window length into ``INTERVAL
    {window}`` SQL — accept only a plain ``<number> <unit>`` duration
    (the shape ``F.window`` takes), rejecting anything
    expression-shaped up front (the same guard class as
    :func:`_require_identifiers`)."""
    import re

    if not isinstance(window, str) or not re.fullmatch(
        r"\d+\s+[A-Za-z]+", window.strip()
    ):
        raise ValueError(
            f"{fn}: window must be a plain '<n> <unit>' duration, got {window!r}"
        )


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col``: one exchange with
    map-side partial sketches (the sketch IS the combine state), output
    one binary column per group — storable in parquet next to the other
    mergeable aggregates."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(out_col)
    )


def merge_sketch_tables(
    tables: list[DataFrame],
    group_cols: list[str],
    sketch_col: str,
) -> DataFrame:
    """Reduce pre-sketched tables (per shard / per dataset) into one:
    union + ``hll_union_agg`` per group. Lossless for equal-lgK sketches;
    the analogue of the reference's shard reducer (A3/J5) for the
    non-algebraic distinct count."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def estimate_sketch(df: DataFrame, sketch_col: str, out_col: str | None = None) -> DataFrame:
    """Replace a binary sketch column with its cardinality estimate."""
    out_col = out_col or sketch_col
    return df.withColumn(out_col, F.hll_sketch_estimate(sketch_col)).drop(
        *([] if out_col == sketch_col else [sketch_col])
    )


def bitmap_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT mergeable distinct count of an integer key via Spark's
    native roaring-style bitmap aggregates (``bitmap_bucket_number`` /
    ``bitmap_bit_position`` / ``bitmap_construct_agg``): keys hash to a
    (bucket, bit) address, each (group, bucket) reduces to one 4 KB
    bitmap with map-side partial combine, and the per-group count is the
    sum of per-bucket popcounts. Two narrow exchanges of bitmap rows —
    never a wide distinct shuffle of the raw keys — and, unlike the HLL
    path above, zero error. Use for integer ids at any cardinality; use
    HLL when keys aren't integral or ±1% is acceptable."""
    _require_identifiers("bitmap_distinct", key_col=key_col)
    addressed = df.select(
        *group_cols,
        F.expr(f"bitmap_bucket_number({key_col})").alias("__bkt__"),
        F.expr(f"bitmap_bit_position({key_col})").alias("__pos__"),
    )
    per_bucket = addressed.groupBy(*group_cols, "__bkt__").agg(
        F.expr("bitmap_construct_agg(__pos__)").alias("__bm__")
    )
    return per_bucket.groupBy(*group_cols).agg(
        F.sum(F.expr("bitmap_count(__bm__)")).alias(out_col)
    )


def bitmap_distinct_state(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Per-(group, bucket) bitmap state — the storable/mergeable form of
    :func:`bitmap_distinct` (write next to other shard aggregates)."""
    _require_identifiers("bitmap_distinct_state", key_col=key_col)
    return (
        df.select(
            *group_cols,
            F.expr(f"bitmap_bucket_number({key_col})").alias("__bkt__"),
            F.expr(f"bitmap_bit_position({key_col})").alias("__pos__"),
        )
        .groupBy(*group_cols, "__bkt__")
        .agg(F.expr("bitmap_construct_agg(__pos__)").alias("__bm__"))
    )


def merge_bitmap_states(
    tables: list[DataFrame], group_cols: list[str], out_col: str = "n_distinct"
) -> DataFrame:
    """Merge per-shard bitmap states losslessly (``bitmap_or_agg``) and
    finish to exact per-group counts — the bitmap analogue of
    :func:`merge_sketch_tables`, with no accuracy loss."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    merged = out.groupBy(*group_cols, "__bkt__").agg(
        F.expr("bitmap_or_agg(__bm__)").alias("__bm__")
    )
    return merged.groupBy(*group_cols).agg(
        F.sum(F.expr("bitmap_count(__bm__)")).alias(out_col)
    )


def bitmap_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    group_cols: list[str],
    key_col: str,
) -> DataFrame:
    """EXACT per-group set-overlap join of two corpora: for each group,
    the distinct-key counts of side A, side B, their union, their
    intersection (inclusion-exclusion: ``|A∩B| = |A|+|B|-|A∪B|``) and
    the Jaccard — all from ONE pass over the tagged union using
    FILTER-ed native bitmap aggregates.

    The grouped "sketch join" in its zero-error form (VERDICT r12 item
    3's named candidate): audience overlap / retention intersection /
    cross-corpus contamination mass per group, without ever joining or
    shuffling raw key pairs.

    100 TB shape — the :func:`bitmap_distinct` discipline twice over:

    - Keys hash map-side to (bucket, bit); the tagged union flows into
      ONE hash exchange on ``(group, bucket)`` where the three bitmaps
      (A / B / all) build with map-side partial combine — 4 KB of state
      per populated (group, bucket, side), NEVER a row-pair expansion
      and never a wide distinct shuffle.
    - The second exchange carries only per-bucket popcounts (longs) to
      the per-group closing sum. A hot group is spread across its
      buckets, so group skew dilutes into the bucket dimension for
      free.
    - Zero Python, zero Join nodes, exact integers — unlike the HLL
      path (:func:`hll_overlap`) there is no estimator error term, so
      the result is engine-portable and strictly oracle-checkable.

    Returns one row per group present on EITHER side:
    ``(*group_cols, n_a, n_b, n_union, n_inter, jaccard)`` with
    ``jaccard = n_inter / n_union`` rounded at 9 (0.0 when the union is
    empty, which only happens on empty input groups). Requires an
    integral ``key_col`` (the bitmap address space), like
    :func:`bitmap_distinct`.
    """
    _require_identifiers("bitmap_overlap", key_col=key_col)
    a = df_a.select(*group_cols, key_col).withColumn("__side__", F.lit(0))
    b = df_b.select(*group_cols, key_col).withColumn("__side__", F.lit(1))
    u = a.unionByName(b)
    addressed = u.select(
        *group_cols,
        "__side__",
        F.expr(f"bitmap_bucket_number({key_col})").alias("__bkt__"),
        F.expr(f"bitmap_bit_position({key_col})").alias("__pos__"),
    )
    per_bucket = addressed.groupBy(*group_cols, "__bkt__").agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(__pos__)"
            " FILTER (WHERE __side__ = 0))"
        ).alias("__ca__"),
        F.expr(
            "bitmap_count(bitmap_construct_agg(__pos__)"
            " FILTER (WHERE __side__ = 1))"
        ).alias("__cb__"),
        F.expr("bitmap_count(bitmap_construct_agg(__pos__))").alias("__cu__"),
    )
    return _overlap_close(per_bucket, group_cols)


def _overlap_close(per_bucket: DataFrame, group_cols: list[str]) -> DataFrame:
    """Shared closing for the bitmap overlap forms: per-bucket popcounts
    -> per-group counts -> inclusion-exclusion + round-9 jaccard."""
    counts = per_bucket.groupBy(*group_cols).agg(
        F.sum(F.coalesce("__ca__", F.lit(0))).alias("n_a"),
        F.sum(F.coalesce("__cb__", F.lit(0))).alias("n_b"),
        F.sum("__cu__").alias("n_union"),
    )
    inter = F.col("n_a") + F.col("n_b") - F.col("n_union")
    return counts.select(
        *group_cols,
        "n_a",
        "n_b",
        "n_union",
        inter.alias("n_inter"),
        F.round(
            F.when(F.col("n_union") > 0, inter / F.col("n_union")).otherwise(
                F.lit(0.0)
            ),
            9,
        ).alias("jaccard"),
    )


def bitmap_overlap_flags(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    in_a_col: str,
    in_b_col: str,
) -> DataFrame:
    """:func:`bitmap_overlap` when both memberships are boolean FLAGS on
    ONE frame (e.g. "active in window A / window B" computed from the
    same scan) — the single-pass form: the two-sided API unions two
    filtered branches of the same subtree, which Spark plans as TWO
    corpus scans; here the corpus is scanned ONCE, rows in neither side
    are dropped map-side, and the same (group, bucket) exchange builds
    all three bitmaps via FILTER-ed aggregates. Output is identical to
    ``bitmap_overlap(df.filter(a), df.filter(b), ...)`` by construction
    (same memberships, same bitmap algebra). Flag columns must be bare
    column names (they are spliced into FILTER clauses; anything
    expression-shaped raises ValueError)."""
    _require_identifiers(
        "bitmap_overlap_flags",
        key_col=key_col,
        in_a_col=in_a_col,
        in_b_col=in_b_col,
    )
    d = df.filter(F.col(in_a_col) | F.col(in_b_col))
    addressed = d.select(
        *group_cols,
        F.col(in_a_col),
        F.col(in_b_col),
        F.expr(f"bitmap_bucket_number({key_col})").alias("__bkt__"),
        F.expr(f"bitmap_bit_position({key_col})").alias("__pos__"),
    )
    per_bucket = addressed.groupBy(*group_cols, "__bkt__").agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(__pos__)"
            f" FILTER (WHERE {in_a_col}))"
        ).alias("__ca__"),
        F.expr(
            "bitmap_count(bitmap_construct_agg(__pos__)"
            f" FILTER (WHERE {in_b_col}))"
        ).alias("__cb__"),
        F.expr("bitmap_count(bitmap_construct_agg(__pos__))").alias("__cu__"),
    )
    return _overlap_close(per_bucket, group_cols)


def hll_overlap_flags(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    in_a_col: str,
    in_b_col: str,
    lgk: int = 12,
) -> DataFrame:
    """:func:`hll_overlap`'s single-pass flagged form: one corpus scan,
    one (group)-keyed exchange with MAP-SIDE PARTIAL SKETCHES building
    all three HLL states via FILTER-ed ``hll_sketch_agg`` — no sketch
    tables, no union step, zero joins. Estimates are identical to the
    two-sided path: an HLL register state depends only on the SET of
    inserted values (hashing is idempotent), and each FILTER admits
    exactly the side's value set. Use this when both memberships derive
    from one frame; use :func:`hll_overlap_from_sketches` when the
    sides are pre-maintained sketch tables. Flag/key columns must be
    bare identifiers (spliced into FILTER clauses; raises otherwise)."""
    _require_identifiers(
        "hll_overlap_flags",
        key_col=key_col,
        in_a_col=in_a_col,
        in_b_col=in_b_col,
    )
    # ADVICE r14 (same class): lgk is f-string-spliced into the FILTER-ed
    # aggregate SQL — coerce so a non-int argument cannot become text.
    lgk = int(lgk)
    d = df.filter(F.col(in_a_col) | F.col(in_b_col))
    agg = d.groupBy(*group_cols).agg(
        F.expr(
            f"hll_sketch_agg({key_col}, {lgk}) FILTER (WHERE {in_a_col})"
        ).alias("__ua__"),
        F.expr(
            f"hll_sketch_agg({key_col}, {lgk}) FILTER (WHERE {in_b_col})"
        ).alias("__ub__"),
        F.expr(f"hll_sketch_agg({key_col}, {lgk})").alias("__uu__"),
    )
    return _estimate_overlap(agg, group_cols)


def _estimate_overlap(agg: DataFrame, group_cols: list[str]) -> DataFrame:
    """Shared estimator closing for the HLL overlap forms: three sketch
    columns -> estimates -> floored inclusion-exclusion + jaccard."""
    est_a = F.coalesce(F.expr("hll_sketch_estimate(__ua__)"), F.lit(0))
    est_b = F.coalesce(F.expr("hll_sketch_estimate(__ub__)"), F.lit(0))
    est_u = F.coalesce(F.expr("hll_sketch_estimate(__uu__)"), F.lit(0))
    inter = F.greatest(est_a + est_b - est_u, F.lit(0))
    return agg.select(
        *group_cols,
        est_a.alias("n_a"),
        est_b.alias("n_b"),
        est_u.alias("n_union"),
        inter.alias("n_inter"),
        F.round(
            F.when(est_u > 0, inter / est_u).otherwise(F.lit(0.0)), 9
        ).alias("jaccard"),
    )


def hll_overlap_from_sketches(
    sk_a: DataFrame,
    sk_b: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sk",
) -> DataFrame:
    """The grouped HLL sketch JOIN: two per-group sketch-state tables
    (built by :func:`sketch_distinct`, possibly merged across shards by
    :func:`merge_sketch_tables`) meet on the group key; per group the
    estimates of A, B and the scalar ``hll_union`` give the
    inclusion-exclusion intersection and Jaccard WITHOUT touching either
    raw corpus again.

    This is the 100 TB form of :func:`bitmap_overlap`: the join inputs
    are metadata-sized (one row + one ≤2^lgK-register sketch per
    group), so the overlap of two 100 TB corpora costs one broadcast
    join over their already-maintained sketch tables. Trade: HLL
    estimator error (~0.4-1.6% per term at lgK 12, exact in sparse
    mode) compounds through the subtraction — small intersections of
    large sets drown in it, which is why ``n_inter`` is floored at 0
    and the exact bitmap path exists for when zero error is required.

    A group present on one side only reports the other side as 0 and
    ``n_inter = 0`` (outer semantics WITHOUT a join: the two sketch
    tables union with a side tag and reduce in ONE metadata-sized
    ``hll_union_agg`` exchange — a full-outer join here would compile
    to a SortMergeJoin, since Spark cannot broadcast full outer; the
    tagged-union form keeps the plan join-free like the bitmap twin).
    """
    gl = list(group_cols)
    a = sk_a.select(
        *gl, F.col(sketch_col).alias("__sk__"), F.lit(0).alias("__side__")
    )
    b = sk_b.select(
        *gl, F.col(sketch_col).alias("__sk__"), F.lit(1).alias("__side__")
    )
    agg = a.unionByName(b).groupBy(*gl).agg(
        F.expr("hll_union_agg(__sk__) FILTER (WHERE __side__ = 0)").alias(
            "__ua__"
        ),
        F.expr("hll_union_agg(__sk__) FILTER (WHERE __side__ = 1)").alias(
            "__ub__"
        ),
        F.expr("hll_union_agg(__sk__)").alias("__uu__"),
    )
    return _estimate_overlap(agg, gl)


def hll_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    group_cols: list[str],
    key_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Approximate per-group set overlap of two corpora via HLL: build
    each side's per-group sketch (one exchange per side, map-side
    partial sketches) and delegate to :func:`hll_overlap_from_sketches`.
    Same output shape as :func:`bitmap_overlap`; see there for the
    exact alternative and here for when to prefer this one (non-integer
    keys, pre-existing sketch tables, or corpora too large to bitmap)."""
    _require_identifiers("hll_overlap", key_col=key_col)
    sa = sketch_distinct(df_a, group_cols, key_col, "sk", lgk)
    sb = sketch_distinct(df_b, group_cols, key_col, "sk", lgk)
    return hll_overlap_from_sketches(sa, sb, group_cols, "sk")


# ---------------------------------------------------------------------------
# Windowed grouped sketch state (round-14 staged family): the overlap
# machinery above, keyed by (group, event-time window) — the state shape
# a WATERMARKED streaming aggregation keeps and evicts. The batch forms
# here and the streaming builder (streaming.events.
# streaming_windowed_sketch_audience) share one contract: per-window
# cells are built by ONE corpus-sized exchange into a metadata-sized
# state table (bitmap cells / HLL registers), and every downstream
# question — here window-over-window audience retention — is algebra on
# that state table, never a second corpus pass.
# ---------------------------------------------------------------------------


def windowed_bitmap_cells(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    key_col: str,
    window: str = "1 day",
) -> DataFrame:
    """Per-(group, tumbling event-time window) EXACT distinct-key state
    as bitmap cells: ``(*group_cols, window_start, __bkt__, __bmp__,
    __cnt__)`` — the :func:`bitmap_distinct_state` discipline with the
    window in the key. ONE corpus exchange on (group, window, bucket)
    with map-side partial bitmap combine; output is metadata-sized
    (≤4 KB per populated cell). Cells from shards/epochs merge with
    ``bitmap_or_agg`` per cell (the shard-merge law, property-tested),
    which is exactly why the same per-window state survives as a
    watermark-evicted streaming aggregation buffer. Requires an
    integral ``key_col`` like :func:`bitmap_distinct`."""
    _require_identifiers("windowed_bitmap_cells", key_col=key_col)
    _require_duration("windowed_bitmap_cells", window)
    addressed = df.select(
        *group_cols,
        F.window(ts_col, window).start.alias("window_start"),
        F.expr(f"bitmap_bucket_number({key_col})").alias("__bkt__"),
        F.expr(f"bitmap_bit_position({key_col})").alias("__pos__"),
    )
    return addressed.groupBy(*group_cols, "window_start", "__bkt__").agg(
        F.expr("bitmap_construct_agg(__pos__)").alias("__bmp__"),
        F.expr("bitmap_count(bitmap_construct_agg(__pos__))").alias("__cnt__"),
    )


def _retention_close(
    counts: DataFrame, group_cols: list[str], n_prev, n_cur, n_union
) -> DataFrame:
    """Shared closing for the windowed retention forms: side counts +
    union -> floored inclusion-exclusion intersection + round-9
    retention (share of the PREVIOUS window's audience seen again).
    Emits only windows where both sides are populated — the first
    window of a series has no predecessor and a last+1 phantom window
    has no current side (the prev-shift creates it)."""
    inter = F.greatest(n_prev + n_cur - n_union, F.lit(0))
    return (
        counts.filter((n_prev > 0) & (n_cur > 0))
        .select(
            *group_cols,
            "window_start",
            n_prev.alias("n_prev"),
            n_cur.alias("n_cur"),
            n_union.alias("n_union"),
            inter.alias("n_inter"),
            F.round(inter / n_prev, 9).alias("retention"),
        )
    )


def windowed_set_retention(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    key_col: str,
    window: str = "1 day",
) -> DataFrame:
    """EXACT window-over-window audience retention per group: for every
    tumbling event-time window w with a populated predecessor, the
    distinct-key counts of w-1 (``n_prev``), w (``n_cur``), their union
    and intersection (inclusion-exclusion over exact bitmap counts) and
    ``retention = n_inter / n_prev`` — who came back, per group, per
    window, with zero estimator error.

    100 TB shape (the SCALE.md single-pass lesson applied):

    1. ONE corpus-sized exchange builds the per-(group, window, bucket)
       bitmap cells (:func:`windowed_bitmap_cells`), then the cell
       table is eagerly localCheckpoint-ed: it is consumed twice below
       (as itself and shifted one window forward), and without the cut
       the union would plan the corpus aggregation subtree twice (the
       round-13 double-scan lesson). The checkpoint is metadata-sized —
       cells, not rows.
    2. The stacked (current + one-window-shifted previous) cells flow
       through ONE metadata-sized exchange on (group, window, bucket):
       ``bitmap_or_agg`` merges the pair into the union popcount while
       FILTER-ed sums carry the per-side counts — no scalar bitmap-OR
       needed, no join node anywhere.
    3. A per-(group, window) closing sum + inclusion-exclusion. Group
       skew dilutes into the bucket dimension exactly as in
       :func:`bitmap_overlap`.

    The window-shift trick makes window-over-window comparison a PURE
    PROJECTION of the state table — the same algebra runs over the
    sketch table a watermarked streaming aggregation emits
    (streaming.events.streaming_windowed_sketch_audience), which is the
    point of the family: retention/churn over an unbounded feed from
    bounded per-window state."""
    cells = windowed_bitmap_cells(
        df, ts_col, group_cols, key_col, window
    ).localCheckpoint(eager=True)
    shift = F.col("window_start") + F.expr(f"INTERVAL {window}")
    stacked = cells.select(
        *group_cols, "window_start", "__bkt__", "__bmp__", "__cnt__",
        F.lit(1).alias("__cur__"),
    ).unionByName(
        cells.select(
            *group_cols, shift.alias("window_start"), "__bkt__", "__bmp__",
            "__cnt__", F.lit(0).alias("__cur__"),
        )
    )
    per_bucket = stacked.groupBy(*group_cols, "window_start", "__bkt__").agg(
        F.expr("bitmap_count(bitmap_or_agg(__bmp__))").alias("__cu__"),
        F.expr("sum(__cnt__) FILTER (WHERE __cur__ = 0)").alias("__cp__"),
        F.expr("sum(__cnt__) FILTER (WHERE __cur__ = 1)").alias("__cc__"),
    )
    counts = per_bucket.groupBy(*group_cols, "window_start").agg(
        F.sum(F.coalesce("__cp__", F.lit(0))).alias("__np__"),
        F.sum(F.coalesce("__cc__", F.lit(0))).alias("__nc__"),
        F.sum("__cu__").alias("__nu__"),
    )
    return _retention_close(
        counts, group_cols, F.col("__np__"), F.col("__nc__"), F.col("__nu__")
    )


def windowed_sketch_retention(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    key_col: str,
    window: str = "1 day",
    lgk: int = 12,
) -> DataFrame:
    """The HLL twin of :func:`windowed_set_retention` — same output
    shape with estimated counts: per-(group, window) HLL register
    state (ONE corpus exchange, map-side partial sketches,
    localCheckpoint for the same double-consumption reason), then the
    window-shift stack closes with FILTER-ed ``hll_union_agg`` per
    side + pair — one metadata-sized exchange, zero joins, zero
    Python. For non-integral keys or when the per-window key space is
    too wide to bitmap; estimator error ~0.4-1.6% per term at lgK 12
    (exact in sparse mode), floored inclusion-exclusion like
    :func:`hll_overlap_from_sketches`. The per-(group, window) sketch
    table it builds is EXACTLY what the watermarked streaming builder
    emits, so a live feed composes with this close unchanged."""
    _require_identifiers("windowed_sketch_retention", key_col=key_col)
    _require_duration("windowed_sketch_retention", window)
    # ADVICE r14: lgk is f-string-spliced into SQL — coerce so a non-int
    # argument cannot become expression text.
    lgk = int(lgk)
    cells = (
        df.select(
            *group_cols,
            F.window(ts_col, window).start.alias("window_start"),
            F.col(key_col).alias("__k__"),
        )
        .groupBy(*group_cols, "window_start")
        .agg(F.expr(f"hll_sketch_agg(__k__, {lgk})").alias("__wsk__"))
        .localCheckpoint(eager=True)
    )
    return sketch_window_retention_close(
        cells, group_cols, window, sketch_col="__wsk__"
    )


def sketch_window_retention_close(
    cells: DataFrame,
    group_cols: list[str],
    window: str = "1 day",
    sketch_col: str = "audience_sketch",
) -> DataFrame:
    """Window-over-window retention close over an already-built
    per-(group, window) HLL sketch table — the batch
    :func:`windowed_sketch_retention` after its corpus pass, or the
    accumulated output of a watermarked streaming builder
    (streaming.events.streaming_windowed_sketch_audience), or any
    stored sketch state partitioned by window. Pure metadata-sized
    algebra: the window-shift stack + FILTER-ed ``hll_union_agg`` —
    no raw corpus, no join nodes, no Python."""
    _require_identifiers(
        "sketch_window_retention_close", sketch_col=sketch_col
    )
    _require_duration("sketch_window_retention_close", window)
    shift = F.col("window_start") + F.expr(f"INTERVAL {window}")
    stacked = cells.select(
        *group_cols, "window_start", F.col(sketch_col).alias("__sk__"),
        F.lit(1).alias("__cur__"),
    ).unionByName(
        cells.select(
            *group_cols, shift.alias("window_start"),
            F.col(sketch_col).alias("__sk__"), F.lit(0).alias("__cur__"),
        )
    )
    agg = stacked.groupBy(*group_cols, "window_start").agg(
        F.expr("hll_union_agg(__sk__) FILTER (WHERE __cur__ = 0)").alias("__sp__"),
        F.expr("hll_union_agg(__sk__) FILTER (WHERE __cur__ = 1)").alias("__sc__"),
        F.expr("hll_union_agg(__sk__)").alias("__su__"),
    )
    est_p = F.coalesce(F.expr("hll_sketch_estimate(__sp__)"), F.lit(0))
    est_c = F.coalesce(F.expr("hll_sketch_estimate(__sc__)"), F.lit(0))
    est_u = F.coalesce(F.expr("hll_sketch_estimate(__su__)"), F.lit(0))
    return _retention_close(agg, group_cols, est_p, est_c, est_u)


def _cms_bucket(col: F.Column, row: int, width: int) -> F.Column:
    """Row-``row``'s CMS bucket for a value: engine-portable md5 bucket
    of the salted value (DuckDB: ``('0x' || substr(md5(row || ':' ||
    x), 1, 8))::BIGINT % width``)."""
    salted = F.concat_ws(":", F.lit(str(row)), col.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % F.lit(width)


def count_min_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a plain
    ``(row, bucket, cnt)`` table — ``depth × width`` cells, one
    partial-aggregated groupBy regardless of input size.

    Why a table and not a blob: CMS cells are ADDITIVE, so the sketch
    of a union is the per-cell SUM of the sketches — plain
    ``union → groupBy(row, bucket).sum`` merges sketches of any number
    of shards/datasets without re-scanning facts, the same
    mergeable-statistics convention as the HLL/bitmap state tables
    above. The estimate of any item is ``min over rows of
    cell(row, h_row(item))`` — an over-approximation with error
    ≤ 2N/width at probability ≥ 1 - 2^-depth.

    Scale: the explode is ×depth (a constant), the shuffle carries at
    most depth×width cells after map-side combine — metadata-sized
    output for any corpus."""
    c = F.col(col)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"), _cms_bucket(c, j, width).alias("bucket")
                )
                for j in range(depth)
            ]
        )
    ).alias("__rb__")
    return (
        df.select(rows, w.alias("__w__"))
        .groupBy(F.col("__rb__.row").alias("row"), F.col("__rb__.bucket").alias("bucket"))
        .agg(F.sum("__w__").alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS tables built with the same (depth, width): per-cell sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    cms: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a CMS table for each probe value: min over the
    depth rows of the addressed cells. The probe side is human-scale
    and broadcasts; absent cells count 0 (the min with any present
    row is then 0 — handled by coalescing missed lookups)."""
    p = probes.select(F.col(probe_col).alias("probe"))
    lookups = p.select(
        "probe",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_bucket(F.col("probe"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__rb__"),
    ).select("probe", F.col("__rb__.row").alias("row"), F.col("__rb__.bucket").alias("bucket"))
    joined = lookups.join(F.broadcast(cms), ["row", "bucket"], "left").select(
        "probe", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cell")
    )
    return joined.groupBy("probe").agg(F.min("cell").alias("est"))


def binned_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 1000,
) -> DataFrame:
    """Fixed-width binned histogram — the MERGEABLE quantile sketch.

    Emits one row per (group, bin) with the bin's row count; values are
    clamped into ``[lo, hi)`` (bin 0 / bin n_bins-1 absorb the tails).
    Because the cell table is a plain additive aggregate it enjoys
    map-side partial aggregation, merges across shards/streams by
    summing counts (like ``count_min_merge``), and bounds quantile error
    by one bin width — the deterministic, engine-portable alternative to
    ``approx_percentile`` (whose GK sketch is not reproducible across
    engines, so it can never be oracle-checked)."""
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def binned_quantiles(
    hist: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 1000,
) -> DataFrame:
    """Quantile estimates from a ``binned_histogram`` cell table: for each
    requested ``q`` the estimate is the UPPER edge of the first bin whose
    cumulative count reaches ``q * total`` (conservative: exact value is
    within one bin width below). One window over the (small) cell table +
    a literal-array explode for the q grid — the raw data is never
    touched again, so quantiles over 100 TB cost one histogram pass."""
    width = (hi - lo) / n_bins
    gc = list(group_cols)
    w = (
        Window.partitionBy(*gc).orderBy("bin")
        if gc
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    cum = hist.withColumn("__cum__", F.sum("cnt").over(w)).withColumn(
        "__tot__", F.sum("cnt").over(Window.partitionBy(*gc) if gc else Window.partitionBy(F.lit(1)))
    )
    qlit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hit = cum.select(*gc, "bin", "__cum__", "__tot__", qlit).filter(
        F.col("__cum__") >= F.col("q") * F.col("__tot__")
    )
    return hit.groupBy(*gc, "q").agg(
        F.round(F.min(F.col("bin") + 1) * width + lo, 9).alias("est")
    )


def winsorize_by_quantile(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 1000,
    out_col: str | None = None,
) -> DataFrame:
    """Quantile winsorization composed from the histogram sketch: clamp
    ``value_col`` into the per-group ``[q_lo, q_hi]`` estimates from
    ``binned_quantiles`` — the robust-scaling sibling of
    occlude_outliers (which clamps by mean±k·std and so is itself
    skew-sensitive; quantile clamps are not).

    Scale design: pass 1 builds the mergeable cell table (tiny), the
    per-group bounds pivot to ONE row per group and return to the fact
    table as a BROADCAST join, pass 2 is a map-side clamp — two scans,
    zero fact-table shuffles, same contract as normalization's
    metadata join.

    Null semantics: a NULL ``value_col`` stays NULL (Spark's
    greatest/least skip nulls, so an unguarded clamp would silently
    rewrite NULL to the lower bound — data corruption for MEDS-style
    data where numeric_value is frequently null), and groups with no
    non-null values (hence no histogram cells / bounds) pass through
    unclamped via the LEFT join rather than being dropped."""
    gc = list(group_cols)
    hist = binned_histogram(df, value_col, gc, lo=lo, hi=hi, n_bins=n_bins)
    qs = binned_quantiles(hist, [q_lo, q_hi], gc, lo=lo, hi=hi, n_bins=n_bins)
    bounds = qs.groupBy(*gc).agg(
        F.min(F.when(F.col("q") == q_lo, F.col("est"))).alias("__lo__"),
        F.min(F.when(F.col("q") == q_hi, F.col("est"))).alias("__hi__"),
    )
    if gc:
        joined = df.join(F.broadcast(bounds), gc, "left")
    else:
        # constant-key LEFT join (not crossJoin): an all-null input has no
        # bounds row, and crossJoin against an empty broadcast would
        # silently drop every input row.
        joined = (
            df.withColumn("__wq_k__", F.lit(1))
            .join(
                F.broadcast(bounds.withColumn("__wq_k__", F.lit(1))),
                "__wq_k__",
                "left",
            )
            .drop("__wq_k__")
        )
    clamped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("__lo__")), F.col("__hi__")),
    )
    return joined.withColumn(out_col or value_col, clamped).drop("__lo__", "__hi__")


def binned_drift_metrics(
    hist_a: DataFrame,
    hist_b: DataFrame,
    group_cols: Sequence[str] = (),
    smoothing: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Distribution-drift metrics between two ``binned_histogram`` cell
    tables (same lo/hi/n_bins): per group,

    - ``ks``:  max over bins of |CDF_a − CDF_b| (the binned
      Kolmogorov–Smirnov statistic, exact up to bin resolution), and
    - ``psi``: Σ (p_a − p_b)·ln(p_a/p_b) with additive ``smoothing``
      counts so empty cells stay finite (the population-stability index
      of model-monitoring practice; > 0.2 is the conventional
      "significant shift" alarm).

    This is THE train/serve drift check at 100 TB: both sides reduce to
    their fixed-size cell tables independently (one scan each, map-side
    partials — or incrementally via ``binned_histogram`` state you
    already persisted), and the comparison itself touches only cells.
    Neither raw dataset is ever co-shuffled."""
    gc = list(group_cols)
    a = hist_a.groupBy(*gc, "bin").agg(F.sum("cnt").alias("ca"))
    b = hist_b.groupBy(*gc, "bin").agg(F.sum("cnt").alias("cb"))
    cells = a.join(b, [*gc, "bin"], "full_outer").select(
        *gc,
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.partitionBy(*gc) if gc else Window.partitionBy(F.lit(1))
    wo = w.orderBy("bin")
    # A group present in only one histogram has a zero total on the absent
    # side: guard the CDF denominators (ANSI sessions would otherwise raise
    # DIVIDE_BY_ZERO and crash the whole drift job on one absent group) and
    # define KS := 1.0 for such one-sided groups below (the max possible
    # divergence — an absent distribution IS maximally shifted). PSI needs
    # no guard: its smoothed denominators are strictly positive.
    tot_a = F.sum("ca").over(w)
    tot_b = F.sum("cb").over(w)
    with_p = cells.select(
        *gc,
        "bin",
        F.when(tot_a > 0, F.sum("ca").over(wo) / tot_a).alias("cdf_a"),
        F.when(tot_b > 0, F.sum("cb").over(wo) / tot_b).alias("cdf_b"),
        (
            (F.col("ca") + F.lit(smoothing))
            / (F.sum("ca").over(w) + F.lit(smoothing) * F.count(F.lit(1)).over(w))
        ).alias("pa"),
        (
            (F.col("cb") + F.lit(smoothing))
            / (F.sum("cb").over(w) + F.lit(smoothing) * F.count(F.lit(1)).over(w))
        ).alias("pb"),
    )
    return with_p.groupBy(*gc).agg(
        # cdf_a - cdf_b is NULL on every row of a one-sided group, so the
        # max is NULL there → coalesce to the defined KS=1.0.
        F.round(
            F.coalesce(
                F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), F.lit(1.0)
            ),
            round_to,
        ).alias("ks"),
        F.round(
            F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))),
            round_to,
        ).alias("psi"),
    )
