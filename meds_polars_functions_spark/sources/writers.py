"""Sinks (SURVEY §2.1 S6-S9).

S6/S7 are plain Spark parquet writes (finalize casts live in ``schema``).
S8 is a driver-side JSON dump. S9 — the ragged-tensor (NRT) sink the
reference feeds to PyTorch (reference transforms/tensorization.py:16-106) —
is a per-partition Python writer over ``foreachPartition``: each Spark
partition becomes one ``.nrt.npz`` file of flattened values + offset
arrays, the same information content as ``JointNestedRaggedTensorDict``
without the (absent) nested_ragged_tensors dependency.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink (reference utils.py:55-59 write_lazyframe).

    ``partition_by`` replaces the reference's directory-of-shards layout
    (``data/{split}/{shard}.parquet``) with native partitioned parquet."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed parquet table: pre-shuffled on ``bucket_by`` at write
    time so later joins/aggregations on that key read co-located buckets
    and skip the exchange entirely (`SortMergeJoin` with zero `Exchange`
    nodes — asserted in test_bucketed_join_has_no_exchange).

    This is the at-scale answer for a fact table that is repeatedly
    joined or grouped on one key (patient_id for MEDS, doc/user ids for
    training pipelines): pay the shuffle once at ingest, never again.
    Bucketing requires the table catalog (``saveAsTable``) — plain
    ``.parquet(path)`` writes drop the bucket spec. ``sort_by`` adds
    within-bucket sort (the canonical MEDS (patient_id, time) layout for
    free on read)."""
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def write_json(obj: dict | list, path: str) -> None:
    """Tiny driver-side JSON sink (splits.json / dataset.json,
    reference split_and_shard_patients.py:252-255)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=str)


def _ragged_to_arrays(values: Iterable[list]) -> tuple["object", "object"]:
    import numpy as np

    flat: list = []
    offsets = [0]
    for row in values:
        row = row or []
        flat.extend(row)
        offsets.append(len(flat))
    return np.asarray(flat), np.asarray(offsets, dtype="int64")


def write_nrt(
    df: DataFrame, path: str, list_columns: list[str], container: str = "npz"
) -> int:
    """Ragged-tensor sink: one file per Spark partition.

    ``container="npz"`` (default, no extra dependencies): each listed
    column is stored as ``{col}__values`` (flattened; one extra nesting
    level flattened for list-of-list columns, with a second
    ``{col}__inner_offsets``) plus ``{col}__offsets`` in a
    ``part-{pid}.nrt.npz`` file — equivalent information to the
    reference's ``JointNestedRaggedTensorDict`` files
    (tensorization.py:16-106).

    ``container="jnrt"``: writes the actual on-disk
    ``JointNestedRaggedTensorDict`` container (``part-{pid}.nrt``) so
    existing reference readers consume the output as-is — via the public
    ``nested_ragged_tensors`` package when installed, else via the
    vendored pure-numpy writer of the same public layout
    (``sources/_jnrt_numpy.py``: safetensors container + JNRT
    ``dim{n}/{key}`` / ``dim{n}/bounds`` tensor schema).

    Returns the number of partition files written. Scale note: this is an
    embarrassingly-parallel per-partition write — no shuffle, no driver
    collect; repartition upstream to control file sizes.
    """
    from pyspark.sql import types as T

    if container == "jnrt":
        # probe on the driver, not inside executors mid-write
        import importlib

        use_library = importlib.util.find_spec("nested_ragged_tensors") is not None
        return _write_nrt_jnrt(df, path, list_columns, use_library=use_library)
    if container != "npz":
        raise ValueError(f"unknown NRT container: {container!r}")

    os.makedirs(path, exist_ok=True)
    other_cols = [c for c in df.columns if c not in list_columns]
    # Decide singly- vs doubly-ragged from the SCHEMA, not the data —
    # per-partition data sniffing would let partitions of one column write
    # incompatible npz layouts (e.g. a partition whose outer lists are all
    # empty), which merge into corrupt offsets on read.
    doubly_ragged = {
        c
        for c in list_columns
        if isinstance(df.schema[c].dataType, T.ArrayType)
        and isinstance(df.schema[c].dataType.elementType, T.ArrayType)
    }

    def write_partition(pid: int, rows) -> Iterable[int]:
        import numpy as np

        rows = list(rows)
        if not rows:
            return iter(())
        out: dict = {}
        for c in other_cols:
            out[c] = np.asarray([r[c] for r in rows])
        for c in list_columns:
            col_vals = [r[c] for r in rows]
            if c in doubly_ragged:
                # doubly-ragged: flatten twice, keep both offset arrays
                inner_flat: list = []
                inner_offsets = [0]
                outer_offsets = [0]
                for row in col_vals:
                    for sub in row or []:
                        inner_flat.extend(sub or [])
                        inner_offsets.append(len(inner_flat))
                    outer_offsets.append(len(inner_offsets) - 1)
                out[f"{c}__values"] = np.asarray(inner_flat)
                out[f"{c}__inner_offsets"] = np.asarray(inner_offsets, dtype="int64")
                out[f"{c}__offsets"] = np.asarray(outer_offsets, dtype="int64")
            else:
                vals, offs = _ragged_to_arrays(col_vals)
                out[f"{c}__values"] = vals
                out[f"{c}__offsets"] = offs
        np.savez(os.path.join(path, f"part-{pid:05d}.nrt.npz"), **out)
        return iter((1,))

    n = (
        df.rdd.mapPartitionsWithIndex(write_partition)
        .sum()
    )
    return int(n)


def _write_nrt_jnrt(
    df: DataFrame, path: str, list_columns: list[str], use_library: bool = True
) -> int:
    """Write the reference's ``JointNestedRaggedTensorDict`` container
    (one ``part-{pid}.nrt`` per partition, reference tensorization.py:90-106:
    the ragged columns go into the JNRT file; scalar columns — typically
    the patient/shard index — ride in a ``part-{pid}.index.npz`` sidecar,
    mirroring how the reference keeps ids in the schema parquet rather
    than inside the tensor container). With ``use_library=False`` the
    vendored pure-numpy writer (``_jnrt_numpy.save_jnrt``) emits the same
    public safetensors + dim-keyed layout without the dependency."""
    os.makedirs(path, exist_ok=True)
    other_cols = [c for c in df.columns if c not in list_columns]

    def write_partition(pid: int, rows) -> Iterable[int]:
        import numpy as np

        rows = list(rows)
        if not rows:
            return iter(())
        tensors = {c: [r[c] or [] for r in rows] for c in list_columns}
        fp = os.path.join(path, f"part-{pid:05d}.nrt")
        if use_library:
            from nested_ragged_tensors.ragged_numpy import (
                JointNestedRaggedTensorDict,
            )

            JointNestedRaggedTensorDict(tensors).save(fp)
        else:
            from meds_polars_functions_spark.sources._jnrt_numpy import save_jnrt

            save_jnrt(tensors, fp)
        if other_cols:
            np.savez(
                os.path.join(path, f"part-{pid:05d}.index.npz"),
                **{c: np.asarray([r[c] for r in rows]) for c in other_cols},
            )
        return iter((1,))

    return int(df.rdd.mapPartitionsWithIndex(write_partition).sum())


def read_nrt(path: str) -> dict[str, "object"]:
    """Load all partition files of a ``write_nrt`` directory into one
    ragged dict of numpy arrays (values + per-column offsets), re-basing
    offsets across files. Driver-side — intended for validation and for
    feeding single-node PyTorch dataloaders; at scale consume the
    ``.nrt.npz`` files per-partition instead."""
    import glob

    import numpy as np

    files = sorted(glob.glob(os.path.join(path, "*.nrt.npz")))
    if not files:
        raise FileNotFoundError(f"no .nrt.npz files under {path}")
    parts = [dict(np.load(f, allow_pickle=True)) for f in files]
    out: dict = {}
    for key in parts[0]:
        if key.endswith("__offsets") or key.endswith("__inner_offsets"):
            merged = [parts[0][key]]
            base = merged[0][-1]
            for p in parts[1:]:
                merged.append(p[key][1:] + base)
                base = merged[-1][-1]
            out[key] = np.concatenate(merged)
        else:
            out[key] = np.concatenate([p[key] for p in parts])
    return out


def write_sorted_ranges(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_files: int | None = None,
    sort_within: list[str] | None = None,
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on
    ``range_cols`` (sampled range boundaries → files hold DISJOINT key
    ranges) + ``sortWithinPartitions`` so each file is internally ordered.

    Why this is the 100 TB layout move: parquet footers carry per-file /
    per-row-group min-max on the clustered columns, so any later
    range/equality predicate on them prunes whole files at planning time
    and whole row groups at scan time — the poor-engine's zone map. A
    hash-partitioned write scatters every key range across every file
    and no scan can skip anything.
    """
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(parts, *range_cols).sortWithinPartitions(
        *(sort_within or range_cols)
    )
    out.write.mode("overwrite").parquet(path)


def zorder_value(cols: list[str], bits: int = 16) -> "F.Column":
    """Morton (Z-order) interleave of the given numeric columns as one
    BIGINT, built entirely from native expressions.

    Each column is min-max scaled to ``bits`` bits via window-free global
    aggregates? No — scaling needs per-column bounds, so ``write_zordered``
    computes them in one tiny agg and passes literals; this function does
    the pure bit-interleave given pre-scaled integer columns (values must
    already be in [0, 2^bits)). Bit i of column j lands at position
    i * n_cols + j, the classic Morton layout: close points in ANY of the
    interleaved dimensions stay close in z-value order.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds the 62-bit budget")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int | None = None,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet layout: multi-dimensional generalization
    of ``write_sorted_ranges``. Every z-ordered column is min-max scaled
    to ``bits`` bits (bounds from ONE metadata-scale aggregate, folded in
    as literals), bit-interleaved into a Morton value, then
    ``repartitionByRange`` + ``sortWithinPartitions`` on it.

    Why at 100 TB: single-column range clustering gives perfect pruning on
    that column and none on the others; Morton interleaving gives every
    interleaved column *partial* locality, so parquet min-max footers
    prune files for predicates on ANY of them — the same trick behind
    Delta/Iceberg Z-ORDER table maintenance, here as a plain write.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__min_{c}") for c in zorder_cols],
        *[F.max(c).cast("double").alias(f"__max_{c}") for c in zorder_cols],
    ).first()
    scale = (1 << bits) - 1
    scaled = df
    tmp_cols = []
    for c in zorder_cols:
        lo, hi = bounds[f"__min_{c}"], bounds[f"__max_{c}"]
        span = (hi - lo) or 1.0
        tc = f"__z_{c}"
        tmp_cols.append(tc)
        scaled = scaled.withColumn(
            tc,
            F.least(
                F.lit(scale),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * scale),
            ).cast("long"),
        )
    z = zorder_value(tmp_cols, bits).alias("__zval__")
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    out = (
        scaled.withColumn("__zval__", z)
        .repartitionByRange(parts, "__zval__")
        .sortWithinPartitions("__zval__")
        .drop("__zval__", *tmp_cols)
    )
    out.write.mode("overwrite").parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    shard_key: str | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSON-Lines dataset sink (one object per line, one file per
    shard) — the export format downstream tokenizer/training jobs
    consume. Beyond-reference sink.

    Sharding: with ``shard_key``, rows are repartitioned by the
    engine-portable md5 bucket of that key (same mechanism as
    split_patients.hash_split_expr) so the SAME row lands in the SAME
    shard on every run/engine — deterministic, resumable exports.
    Plain ``n_shards`` round-robins for size balance. Gzip per file
    keeps shards independently decompressible (splittability is
    already lost to gzip; shard count is the parallelism knob)."""
    out = df
    if shard_key is not None and n_shards:
        bucket = (
            F.conv(
                F.substring(F.md5(F.col(shard_key).cast("string")), 1, 8), 16, 10
            ).cast("long")
            % n_shards
        )
        out = df.repartition(n_shards, bucket)
    elif n_shards:
        out = df.repartition(n_shards)
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
