"""Patient split + shard assignment (SURVEY §2.8 X2, §2.4 A6).

Reference: src/MEDS_transforms/extract/split_and_shard_patients.py:16-153 —
a seeded NumPy permutation of the distinct patient ids assigns
train/tuning/held_out fractions, optionally honoring externally-provided
splits, then chunks each split into <= n_patients_per_shard shards.

Spark mapping: the distinct-id harvest is distributed
(``select(pid).distinct()``); the permutation itself runs driver-side with
NumPy — identical algorithm + seed ⇒ identical splits to the reference —
because the id list is patient-count-scale (millions), not row-scale. The
result returns as a (patient_id, split) DataFrame that downstream stages
**broadcast-join** against the fact table. Shard assignment dissolves into
partitioning, but is still computable for parity.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: Driver-side cap on the harvested distinct-id list. Patient-id
#: cardinality is metadata-scale on every real EHR (millions, not the
#: row count), but the repo's guard policy — query collects capped r6,
#: training collects capped r7 — applies to this collect too: at 1e9
#: patients a sorted Python int list is multi-GB on the driver. 10M ids
#: (~0.6 GB as a Python list) is far past any published EHR cohort;
#: past it, the seeded-permutation split itself is the wrong tool and
#: the failure redirects to the map-side ``hash_split_expr``.
MAX_HARVESTED_PATIENT_IDS = 10_000_000


def harvest_patient_ids(frames: Sequence[DataFrame], patient_id_col: str = "patient_id") -> list[int]:
    """Distinct non-null patient ids across inputs
    (reference split_and_shard_patients.py:201-225).

    Bounded collect: raises past ``MAX_HARVESTED_PATIENT_IDS`` with a
    redirect to ``hash_split_expr`` (the fully-distributed split that
    needs no driver-side id list) instead of OOMing the driver. Under
    the cap the collected row set is identical to the uncapped collect
    (``limit(n+1)`` on fewer than n+1 rows passes everything through),
    so seeded-NumPy split parity with the reference is bit-preserved
    for every in-contract call."""
    dfs = [f.select(F.col(patient_id_col).cast("long").alias("patient_id")) for f in frames]
    unioned = reduce(lambda a, b: a.unionByName(b), dfs)
    rows = unioned.na.drop().distinct().limit(MAX_HARVESTED_PATIENT_IDS + 1).collect()
    if len(rows) > MAX_HARVESTED_PATIENT_IDS:
        raise ValueError(
            f"distinct patient ids exceed MAX_HARVESTED_PATIENT_IDS="
            f"{MAX_HARVESTED_PATIENT_IDS}; the seeded-permutation split "
            "needs every id on the driver and does not scale there — "
            "use hash_split_expr, a pure map-side split assignment that "
            "never collects ids"
        )
    return sorted(r.patient_id for r in rows)


def shard_patients(
    patient_ids: Sequence[int],
    n_patients_per_shard: int = 50_000,
    external_splits: dict[str, Sequence[int]] | None = None,
    split_fracs_dict: dict[str, float] | None = None,
    seed: int = 1,
) -> dict[str, list[int]]:
    """Seeded split+shard, same algorithm as the reference
    (split_and_shard_patients.py:16-153): external splits are honored
    first; remaining ids get a seeded permutation partitioned by the
    cumulative fractions; each split is chunked into
    ``ceil(n/shard_size)`` equal shards named ``{split}/{i}``."""
    import numpy as np

    split_fracs_dict = split_fracs_dict or {"train": 0.8, "tuning": 0.1, "held_out": 0.1}
    if abs(sum(split_fracs_dict.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")

    external_splits = {k: list(v) for k, v in (external_splits or {}).items()}
    external_ids = {pid for ids in external_splits.values() for pid in ids}
    remaining = np.array([p for p in patient_ids if p not in external_ids])

    rng = np.random.default_rng(seed)
    if len(remaining):
        remaining = rng.permutation(remaining)
        fracs = np.array(list(split_fracs_dict.values()))
        cuts = np.round(np.cumsum(fracs) * len(remaining)).astype(int)[:-1]
        chunks = np.array_split(remaining, cuts)
        splits = {
            name: [*external_splits.get(name, []), *chunk.tolist()]
            for name, chunk in zip(split_fracs_dict, chunks)
        }
    else:
        splits = external_splits
    for name, ids in external_splits.items():
        splits.setdefault(name, ids)

    shards: dict[str, list[int]] = {}
    for split, ids in splits.items():
        if not ids:
            continue
        n_shards = max(1, -(-len(ids) // n_patients_per_shard))
        for i, chunk in enumerate(np.array_split(np.array(ids), n_shards)):
            shards[f"{split}/{i}"] = [int(x) for x in chunk]
    return shards


def splits_to_dataframe(spark: SparkSession, shards: dict[str, list[int]]) -> DataFrame:
    """Shard map -> (patient_id, split) dimension table for broadcast joins
    (the finalize-stage patient_splits.parquet,
    reference finalize_MEDS_metadata.py:196-217)."""
    rows = [
        (pid, shard_name.split("/")[0])
        for shard_name, ids in shards.items()
        for pid in ids
    ]
    from meds_polars_functions_spark.functions.expr import arrow_literal_frame

    # Arrow literal (round 15): JVM LocalTableScan, no pickle worker.
    return arrow_literal_frame(spark, rows, "patient_id long, split string")


def filter_to_split(df: DataFrame, splits_df: DataFrame, split: str) -> DataFrame:
    """Patient-subset filter via broadcast semi-join (SURVEY §2.2 P3;
    reference mapper.py:141-146 does isin against a collected list)."""
    ids = splits_df.filter(F.col("split") == split).select("patient_id")
    return df.join(F.broadcast(ids), on="patient_id", how="left_semi")


def hash_split_expr(
    id_col: str, fractions: dict[str, float], salt: str = ""
) -> F.Column:
    """Deterministic, engine-portable split assignment (train/val/test).

    md5 of the id (+salt) → uniform bucket in [0,1) → cumulative-fraction
    ranges → split name. Pure map-side column expression: the same row
    lands in the same split on any engine, any run, any partitioning —
    no RNG state, no driver-side id collection, no shuffle. This is the
    at-scale alternative to the reference's seeded-NumPy permutation
    split (split_and_shard_patients.py:16-153), which needs every id on
    the driver; changing ``salt`` draws an independent assignment.
    Fractions must sum to 1 (the last range absorbs rounding).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
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
    names = list(fractions)
    expr = F.lit(names[-1])
    acc = 0.0
    conds = []
    for name, frac in list(fractions.items())[:-1]:
        acc += frac
        conds.append((acc, name))
    for acc, name in reversed(conds):
        expr = F.when(bucket < acc, F.lit(name)).otherwise(expr)
    return expr
