"""Temporal joins: as-of join, bounded time-range (interval) join, and a
bloom-filter join prefilter.

Beyond-reference operators (the reference has only equi-joins —
SURVEY.md §2.3 / reference filters/filter_measurements.py:114-137 etc.),
but core primitives for event-sequence work: "attach the most recent
prior reading", "find event pairs within an hour", "prune a huge probe
side before a shuffle join".

Scale design — none of these ever degenerate into the plans Spark picks
for naive inequality joins (BroadcastNestedLoopJoin / cartesian, which
are O(n·m) and fatal at 100 TB):

- ``asof_join``: union both sides tagged, ONE hash exchange on the key,
  per-partition sort, and a running ``last(..., ignorenulls)`` window.
  O(n log n/partition) with no pair expansion at all — the classic
  union-merge as-of algorithm expressed in native window functions.
- ``range_join``: time-bucket equi-join. Each left row explodes to the
  tiny set of buckets its window can overlap (span/bucket + 1 ≈ 2), the
  right side maps to its one bucket, and the join is a plain hash
  equi-join on (key, bucket) with an exact residual filter. Shuffle
  fanout is bounded and chosen, never data-dependent.
- ``bloom_prefilter``: a bloom filter built and probed entirely with
  native expressions (``xxhash64`` bit positions, ``bit_or`` word
  aggregation, one broadcast single-row word-map, unrolled bit tests in
  whole-stage codegen — Spark's internal ``BloomFilterAggregate`` is not
  SQL-registered, so this is the public-API equivalent). The build side
  collapses to ONE broadcast map; the probe side filters map-side BEFORE
  its shuffle, so a large-large semi join ships only rows that can
  match. No false negatives: prefilter + exact join ≡ exact join.
"""

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expr import epoch_micros

__all__ = [
    "asof_join",
    "bitemporal_asof_join",
    "range_join",
    "bloom_prefilter",
    "locf_impute",
    "resample_last",
    "streaks",
]


def resample_last(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    every_us: int,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Downsample to a regular time grid: one row per (key, bucket) —
    the LAST row in each ``every_us``-microsecond bucket (deterministic
    via ``tie_cols``). Output adds ``bucket_start`` (timestamp).

    One hash exchange on (key, bucket) + per-partition sort; the grid is
    computed map-side, so Catalyst treats it like any groupBy key — no
    windows over the whole key history, state bounded by bucket size.
    Pair with ``locf_impute`` afterwards to fill empty buckets
    carried-forward style.
    """
    bucket = F.floor(epoch_micros(F.col(time_col)) / F.lit(every_us))
    out = df.withColumn("__bucket__", bucket)
    w = Window.partitionBy(*key_cols, "__bucket__").orderBy(
        F.col(time_col).desc(),
        *[F.col(c).desc() for c in (tie_cols or [])],
    )
    return (
        out.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .withColumn(
            "bucket_start",
            F.timestamp_micros(F.col("__bucket__") * F.lit(every_us)),
        )
        .drop("__rn__", "__bucket__")
    )


def locf_impute(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    tie_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward: fill null ``value_col`` with the
    most recent non-null value for the same key, ordered by time (the
    standard EHR imputation the MEDS model implies but the reference
    leaves to downstream — a degenerate self as-of join, so it gets the
    same one-exchange running-window plan, not a join).

    ``tie_cols`` break equal-time ordering deterministically (MEDS
    convention: event_id or the canonical tiebreak). Rows with null
    ``time_col`` (static measurements) sort first and only inherit from
    other static rows of the same key.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col(time_col).asc_nulls_first(),
            *[F.col(c).asc() for c in (tie_cols or [])],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(F.col(value_col), ignorenulls=True).over(w)
    return df.withColumn(out_col or value_col, filled)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str],
    direction: str = "backward",
    strict: bool = False,
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row per key.

    ``direction="backward"`` (default): nearest right row at-or-before
    the left time (DuckDB ``ASOF JOIN`` / pandas ``merge_asof``
    semantics); ``"forward"``: at-or-after. ``strict=True`` excludes
    ties (strictly before/after). ``tolerance_us`` drops matches farther
    than that many microseconds away (match columns become null — the
    join stays left-outer).

    Returns all left columns plus ``<right_time><suffix>`` and each of
    ``right_cols`` as ``<col><suffix>``.

    Algorithm: tag rows (right=0, left=1), align schemas, union, then a
    running ``last(struct(right payload), ignorenulls=True)`` over
    ``Window.partitionBy(on).orderBy(time, tie)`` carries the latest
    right payload onto every left row in one pass. Tie ordering decides
    whether an equal-time right row is visible (non-strict) or not
    (strict). Forward direction mirrors with ``first`` over the
    following frame.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        F.col(right_time).alias("__t__"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__time__"),
        F.lit(0).alias("__side__"),
        payload.alias("__payload__"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_time).alias("__time__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(r.schema["__payload__"].dataType).alias("__payload__"),
    )
    # Schema-align: right side gets nulls for left payload columns.
    r = r.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        "__time__",
        "__side__",
        "__payload__",
    )
    unioned = l.unionByName(r)

    # Tie visibility: for backward non-strict the right row must sort
    # BEFORE the same-time left row (side 0 < 1, ascending); strict
    # flips the tie so the equal-time right row falls outside the frame.
    if direction == "backward":
        tie = F.col("__side__").asc() if not strict else F.col("__side__").desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__time__").asc(), tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__payload__", ignorenulls=True).over(w)
    else:
        tie = F.col("__side__").desc() if not strict else F.col("__side__").asc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__time__").asc(), tie)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("__payload__", ignorenulls=True).over(w)

    out = unioned.withColumn("__match__", matched).filter(F.col("__side__") == 1)
    if tolerance_us is not None:
        delta = F.abs(
            epoch_micros(F.col("__match__.__t__")) - epoch_micros(F.col(left_time))
        )
        out = out.withColumn(
            "__match__", F.when(delta <= F.lit(tolerance_us), F.col("__match__"))
        )
    return out.select(
        *left_cols,
        F.col("__match__.__t__").alias(f"{right_time}{suffix}"),
        *[F.col(f"__match__.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def bitemporal_asof_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_time: str,
    valid_from: str,
    recorded_at: str,
    as_of,
    value_cols: Sequence[str],
    dim_tie_cols: Sequence[str] = (),
    suffix: str = "_dim",
) -> DataFrame:
    """Bitemporal point-in-time lookup (the audit as-of join): for each
    fact row at business time ``t``, attach the dimension version that
    was VALID at ``t`` (``valid_from <= t``, latest wins) *as it was
    KNOWN at audit time* ``as_of`` (``recorded_at <= as_of``) — the
    "what did we believe on date K about the state at time t" join that
    makes training-set generation reproducible against late-arriving
    and corrected dimension data (Kimball late-arriving SCDs /
    feature-store time travel).

    Version pick, definitionally: among ``{valid_from <= t,
    recorded_at <= as_of}`` the row with the greatest
    ``(valid_from, recorded_at, *dim_tie_cols)``. Ordering corrections
    AFTER originals inside one business instant means a correction
    recorded before ``as_of`` silently supersedes its original — no
    correction-collapse pre-pass is needed, the merge order subsumes
    it. ``(on..., valid_from, recorded_at, *dim_tie_cols)`` should be
    unique for a deterministic result.

    Left-outer: facts with no visible version get nulls. Returns all
    fact columns plus ``<valid_from><suffix>``, ``<recorded_at><suffix>``
    and each of ``value_cols`` as ``<col><suffix>``.

    NULL contract (matches the SQL equality-join + ``vf <= t`` form the
    oracle encodes): dimension rows with a NULL join key or NULL
    ``valid_from`` are dropped up front — an equality join never
    matches a NULL key, and ``vf <= t`` is never true for NULL ``vf``.
    Without the filter, ``Window.partitionBy`` would group NULL keys
    together (null facts matching null-key versions) and a NULL
    ``valid_from`` would sort first ascending, turning a malformed
    version row into a universal fallback. NULL-keyed fact rows pass
    through with null attachments, like the SQL left join.

    Raises ``ValueError`` if a reserved temp column (``__time__``,
    ``__side__``, ``__rec__``, ``__tie<i>__``, ``__payload__``,
    ``__match__``) is already present in ``facts``, if a value column
    is named ``__vf__``/``__ra__`` (payload struct fields), or if a
    suffixed output name collides with an existing fact column or
    another output — those would otherwise produce duplicate/ambiguous
    columns silently.

    100 TB design — the same union-merge as :func:`asof_join`, never a
    pair expansion:

    - The knowledge cut ``recorded_at <= as_of`` is a plain map-side
      predicate on the dimension scan (pushed to parquet when
      ``recorded_at`` is a stored column — the audit-log layout
      typically partitions by recording date, so this also
      partition-prunes).
    - Both sides union into ONE hash exchange on ``on`` + one
      per-partition sort; a running ``last(payload, ignorenulls)``
      carries the winning version onto every fact row. O(n log n /
      partition), zero Join nodes, zero Python.
    - Skew: a hot key is one partition's ordered run, O(1) state per
      row (the running last) — same bound as every window here.
    """
    keys = list(on)
    vals = list(value_cols)
    ties = list(dim_tie_cols)
    as_of_col = as_of if isinstance(as_of, Column) else F.lit(as_of)

    fact_col_set = set(facts.columns)
    reserved = {"__time__", "__side__", "__rec__", "__payload__", "__match__"}
    reserved |= {f"__tie{i}__" for i in range(len(ties))}
    clash = sorted(reserved & fact_col_set)
    if clash:
        raise ValueError(
            f"bitemporal_asof_join: facts already contain reserved temp "
            f"column(s) {clash}; rename them before joining"
        )
    payload_clash = sorted({"__vf__", "__ra__"} & set(vals))
    if payload_clash:
        raise ValueError(
            f"bitemporal_asof_join: value_cols {payload_clash} collide with "
            f"the reserved payload struct fields __vf__/__ra__"
        )
    out_names = [f"{valid_from}{suffix}", f"{recorded_at}{suffix}"] + [
        f"{c}{suffix}" for c in vals
    ]
    dup_out = sorted({n for n in out_names if out_names.count(n) > 1})
    out_clash = sorted(set(out_names) & fact_col_set)
    if dup_out or out_clash:
        raise ValueError(
            f"bitemporal_asof_join: suffixed output name collision "
            f"(duplicates={dup_out}, vs fact columns={out_clash}); pick a "
            f"different suffix or rename the colliding columns"
        )

    # NULL contract (see docstring): a null-keyed or null-valid_from
    # version can never win under the SQL equality-join / vf<=t
    # semantics — drop them before the union-merge.
    snap = dim.filter(F.col(recorded_at) <= as_of_col)
    snap = snap.filter(F.col(valid_from).isNotNull())
    for k in keys:
        snap = snap.filter(F.col(k).isNotNull())
    payload = F.struct(
        F.col(valid_from).alias("__vf__"),
        F.col(recorded_at).alias("__ra__"),
        *[F.col(c) for c in vals],
    )
    r = snap.select(
        *[F.col(c) for c in keys],
        F.col(valid_from).alias("__time__"),
        F.lit(0).alias("__side__"),
        F.col(recorded_at).alias("__rec__"),
        *[F.col(c).alias(f"__tie{i}__") for i, c in enumerate(ties)],
        payload.alias("__payload__"),
    )
    fact_cols = facts.columns
    l = facts.select(
        *fact_cols,
        F.col(fact_time).alias("__time__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(dict(r.dtypes)["__rec__"]).alias("__rec__"),
        *[
            F.lit(None).cast(dict(r.dtypes)[f"__tie{i}__"]).alias(f"__tie{i}__")
            for i in range(len(ties))
        ],
        F.lit(None).cast(r.schema["__payload__"].dataType).alias("__payload__"),
    )
    r = r.select(
        *[
            F.col(c)
            if c in keys
            else F.lit(None).cast(facts.schema[c].dataType).alias(c)
            for c in fact_cols
        ],
        "__time__",
        "__side__",
        "__rec__",
        *[f"__tie{i}__" for i in range(len(ties))],
        "__payload__",
    )
    unioned = l.unionByName(r)

    # Within one business instant: versions (side 0) sort before the
    # fact rows (side 1, so an equal-time version is visible), ordered
    # by recording time then ties — the last one is the winning
    # correction; ``last(..., ignorenulls)`` picks it in one pass.
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__time__").asc(),
            F.col("__side__").asc(),
            F.col("__rec__").asc(),
            *[F.col(f"__tie{i}__").asc() for i in range(len(ties))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn(
        "__match__", F.last("__payload__", ignorenulls=True).over(w)
    ).filter(F.col("__side__") == 1)
    return out.select(
        *fact_cols,
        F.col("__match__.__vf__").alias(f"{valid_from}{suffix}"),
        F.col("__match__.__ra__").alias(f"{recorded_at}{suffix}"),
        *[F.col(f"__match__.{c}").alias(f"{c}{suffix}") for c in vals],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    suffix: str = "_right",
) -> DataFrame:
    """Inner-join pairs where ``right_time - left_time ∈ [lower_us,
    upper_us]`` (microseconds) and the key columns match.

    Expressed as a hash equi-join on (key, time-bucket): the left row
    explodes to every bucket its window ``[t+lower, t+upper]`` can
    touch, the right row lands in exactly one bucket, and an exact
    residual filter keeps true pairs. Bucket width = window span, so the
    per-row fanout is ≤ 2 regardless of data — Catalyst sees an ordinary
    equi-join and never falls back to a nested-loop plan.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us must be >= lower_us")
    span = max(upper_us - lower_us, 1)
    lt = epoch_micros(F.col(left_time))
    rt = epoch_micros(F.col(right_time))

    lhs = left.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.floor((lt + F.lit(lower_us)) / F.lit(span)),
                F.floor((lt + F.lit(upper_us)) / F.lit(span)),
            )
        ),
    )
    rename = {c: f"{c}{suffix}" for c in right.columns if c not in on}
    rhs = right.withColumnsRenamed(rename).withColumn(
        "__bucket__", F.floor(epoch_micros(F.col(f"{right_time}{suffix}")) / F.lit(span))
    )
    delta = epoch_micros(F.col(f"{right_time}{suffix}")) - epoch_micros(F.col(left_time))
    return (
        lhs.join(rhs, on=[*on, "__bucket__"], how="inner")
        .filter((delta >= F.lit(lower_us)) & (delta <= F.lit(upper_us)))
        .drop("__bucket__")
    )


def _bloom_positions(col: str, num_bits: int, num_hashes: int) -> list[F.Column]:
    """k independent bit positions: xxhash64 of (value, hash-index)."""
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def _bit_mask(bit_in_word: F.Column) -> F.Column:
    """2^b as a long for a COLUMN b ∈ [0,64) — ``shiftleft`` only takes a
    literal shift, so index a constant-folded 64-entry mask array
    (top bit expressed as the signed-long value)."""
    masks = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    return F.element_at(masks, bit_in_word.cast("int") + 1)


def bloom_prefilter(
    probe: DataFrame,
    probe_col: str,
    build: DataFrame,
    build_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``probe`` to rows whose ``probe_col`` *might* appear in
    ``build[build_col]`` — no false negatives, small false-positive rate
    (~0.01 at n=500k with the defaults; size ``num_bits`` ≈ 10-15 bits
    per distinct build key).

    Build: each build key sets ``num_hashes`` bits; bits pack into
    64-bit words via ``bit_or`` partial+final aggregation; the words are
    scattered into a DENSE single-row ``array<long>`` (zero-filled via a
    range outer join) that is broadcast (``num_bits/8`` bytes). Probe:
    ``num_hashes`` unrolled native bit tests (xxhash64 → element_at →
    bitwiseAND), all inside whole-stage codegen, drop rows map-side
    BEFORE any exchange. Follow with the exact join — results are
    identical, but the shuffle only carries survivors. This is the
    manual form of Spark's runtime row-group filtering, usable where the
    optimizer can't inject it (across a UDF boundary, a pre-staged probe
    table, or a build side too big to broadcast as a hash relation but
    fine as ``num_bits/8`` bytes).

    Round 16 (guide §1/§4.1): the bitmap was previously a sparse
    ``map<word, bits>`` — but ``element_at`` on a MapType is a LINEAR
    SCAN of the map's key array, so every probe row paid
    ``num_hashes × |set words|`` comparisons (measured 62 s for a 600k ×
    5 × ~70k-entry probe at sf0.1). ``element_at`` on an ArrayType is an
    O(1) indexed load; the dense form is the same bits with constant-time
    probes (interleaved A/B 70.2 → 2.1 s, −97%; results identical — the
    bit positions and the exact follow-up join are unchanged).
    """
    nwords = -(-num_bits // 64)
    bits = build.select(
        F.explode(F.array(*_bloom_positions(build_col, num_bits, num_hashes))).alias(
            "__bit__"
        )
    )
    words = bits.select(
        F.floor(F.col("__bit__") / F.lit(64)).alias("__word__"),
        _bit_mask(F.col("__bit__") % 64).alias("__mask__"),
    )
    wordagg = words.groupBy("__word__").agg(F.bit_or("__mask__").alias("__bits__"))
    # dense scatter: every word index 0..nwords-1 gets its bits (or 0L),
    # ordered by word via one sort_array over a single collected row;
    # GetArrayStructFields extracts the bits array natively.
    rng = build.sparkSession.range(nwords).select(F.col("id").alias("__word__"))
    bitmap = (
        rng.join(wordagg, "__word__", "left")
        .select(
            "__word__",
            F.coalesce("__bits__", F.lit(0).cast("long")).alias("__bits__"),
        )
        .agg(
            F.sort_array(F.collect_list(F.struct("__word__", "__bits__"))).alias(
                "__wb__"
            )
        )
        .select(F.col("__wb__").getField("__bits__").alias("__bloom__"))
    )
    out = probe.join(F.broadcast(bitmap))
    cond = F.lit(True)
    for pos in _bloom_positions(probe_col, num_bits, num_hashes):
        # element_at is 1-based; pos < num_bits ⇒ word+1 ∈ [1, nwords]
        word = F.floor(pos / F.lit(64))
        mask = _bit_mask(pos % 64)
        hit = (
            F.element_at(F.col("__bloom__"), (word + 1).cast("int"))
            .bitwiseAND(mask)
            != 0
        )
        cond = cond & hit
    return out.filter(cond).drop("__bloom__")


def streaks(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active time buckets
    per key. Classic sessionization-by-calendar (login streaks, daily
    actives): distinct (key, bucket) first — the frame every later step
    sees is bounded by keys × buckets, not raw events — then the
    row_number trick (bucket_ordinal - rank is constant within a run) and
    one count per island. All three steps share the single exchange on
    ``key_cols`` (distinct, window, and group reuse the partitioning).

    Returns one row per island: key cols, ``streak_start`` (bucket
    timestamp), ``streak_len`` (number of consecutive buckets).
    """
    keys = list(key_cols)
    seconds = {"day": 86400, "hour": 3600, "week": 604800}[bucket]
    b = F.date_trunc(bucket, F.col(time_col))
    days = df.select(*keys, b.alias("__b__")).distinct()
    w = Window.partitionBy(*keys).orderBy("__b__")
    isl = days.withColumn(
        "__g__",
        (F.unix_timestamp("__b__") / seconds).cast("long")
        - F.row_number().over(w),
    )
    return (
        isl.groupBy(*keys, "__g__")
        .agg(
            F.min("__b__").alias("streak_start"),
            F.count(F.lit(1)).alias("streak_len"),
        )
        .drop("__g__")
    )


def resample_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    step_seconds: int,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Linear interpolation onto a regular time grid (the TimescaleDB
    ``interpolate`` / pandas ``resample().interpolate()`` primitive,
    companion to ``resample_last`` and ``locf_impute``).

    Per key, a grid point every ``step_seconds`` spans the key's
    observed range; each grid value interpolates linearly between the
    nearest observation at-or-before and at-or-after. Grid points before
    the first / after the last observation yield NULL.

    Scale design: observations and grid rows UNION into one frame, ONE
    exchange on ``key_cols``, and both neighbours come from running
    windows over that frame (``last ignorenulls`` looking back,
    ``first ignorenulls`` looking forward) — no self-join, no per-grid-
    point probe, state bounded by the partition sort. The grid itself is
    generated from a per-key (min, max) aggregate — |keys| small rows
    exploded map-side, never a driver loop.
    """
    keys = list(key_cols)
    step_us = F.lit(int(step_seconds) * 1_000_000)
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    obs = df.select(
        *keys,
        t_us.alias("__t_us__"),
        F.col(value_col).cast("double").alias("__obs_v__"),
        F.lit(0).alias("__is_grid__"),
        *[F.col(c) for c in tie_cols],
    )
    spans = df.groupBy(*keys).agg(
        F.min(t_us).alias("__lo__"), F.max(t_us).alias("__hi__")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(
                # integer floor-to-step: epoch-µs magnitudes sit near
                # double's 2^53 edge, so never divide as double here
                (F.col("__lo__") - F.col("__lo__") % step_us).cast("long"),
                F.col("__hi__"),
                step_us,
            )
        ).alias("__t_us__"),
    ).select(
        *keys,
        "__t_us__",
        F.lit(None).cast("double").alias("__obs_v__"),
        F.lit(1).alias("__is_grid__"),
        *[F.lit(None).cast(dict(df.dtypes)[c]).alias(c) for c in tie_cols],
    )
    unioned = obs.unionByName(grid)
    # observations sort BEFORE the grid row at the same instant, so an
    # exact hit interpolates to itself with factor 0
    order = [F.col("__t_us__"), F.col("__is_grid__")] + [
        F.col(c) for c in tie_cols
    ]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("__is_grid__") == 0, F.col("__t_us__"))
    enriched = unioned.select(
        *keys,
        "__t_us__",
        "__is_grid__",
        F.last("__obs_v__", ignorenulls=True).over(w_back).alias("__pv__"),
        F.last(obs_t, ignorenulls=True).over(w_back).alias("__pt__"),
        F.first("__obs_v__", ignorenulls=True).over(w_fwd).alias("__nv__"),
        F.first(obs_t, ignorenulls=True).over(w_fwd).alias("__nt__"),
    )
    frac = (F.col("__t_us__") - F.col("__pt__")) / (
        F.col("__nt__") - F.col("__pt__")
    )
    interp = (
        F.when(F.col("__pt__").isNull(), F.lit(None))
        # exact hit: an observation sits on this grid instant (it sorts
        # before the grid row, so the forward window may be empty)
        .when(F.col("__pt__") == F.col("__t_us__"), F.col("__pv__"))
        .when(F.col("__nt__").isNull(), F.lit(None))
        .otherwise(F.col("__pv__") + (F.col("__nv__") - F.col("__pv__")) * frac)
    )
    return (
        enriched.filter(F.col("__is_grid__") == 1)
        .select(
            *keys,
            F.timestamp_micros(F.col("__t_us__")).alias("grid_time"),
            interp.alias("interp_value"),
        )
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: collapse a keyed event
    stream into validity intervals — one row per (key, value-version)
    with ``valid_from`` / ``valid_to`` (null = still current).

    Consecutive rows with identical ``value_cols`` merge into one
    interval (null-safe comparison, so null→null is "no change").
    Everything runs in ONE exchange on ``key_cols``: change detection is
    a lag window, version ids a running sum, intervals a groupBy on
    (key, version), and ``valid_to`` a lead window over the per-version
    frame — the standard warehouse snapshot build with no self-join.
    """
    keys = list(key_cols)
    vals = list(value_cols)
    order = [F.col(time_col).asc(), *[F.col(c).asc() for c in tie_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in vals:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first_row = F.row_number().over(w) == 1
    marked = df.withColumn(
        "__chg__", F.when(first_row, F.lit(1)).otherwise(changed.cast("int"))
    ).withColumn(
        "__ver__",
        F.sum("__chg__").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = marked.groupBy(*keys, "__ver__", *vals).agg(
        F.min(time_col).alias("valid_from")
    )
    w_ver = Window.partitionBy(*keys).orderBy("__ver__")
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w_ver))
        .drop("__ver__")
    )
