"""Raw-tables -> MEDS extraction CLI — the Spark equivalent of the
reference's extract pipeline (shard_events -> split_and_shard_patients ->
convert_to_sharded_events -> merge_to_MEDS_cohort -> finalize,
reference pyproject.toml:31-43 console scripts):

    python -m meds_polars_functions_spark.plans.extract_cli \
        --event-config events.yaml \
        --table subjects=raw/subjects.csv --table vitals=raw/vitals.parquet \
        --output out/ [--split-seed 1] [--n-patients-per-shard 50000]

events.yaml (reference event-conversion config shape,
convert_to_sharded_events.py):

    subjects:
      patient_id_col: MRN
      eye_color:
        code: [EYE_COLOR, "col(eye_color)"]
        time: null
      dob:
        code: DOB
        time: "col(dob)"
        time_format: "%m/%d/%Y"
    vitals:
      hr:
        code: HR
        time: "col(vitals_date)"
        time_format: "%m/%d/%Y, %H:%M:%S"
        numeric_value: "col(HR)"

Output layout mirrors the reference cohort: ``data/`` (split-partitioned
MEDS parquet), ``metadata/patient_splits.parquet``,
``metadata/codes.parquet``, ``metadata/splits.json``.

The whole extraction is ONE Spark job: sub-sharding, file locks, and the
worker polling barrier of the reference dissolve into the shuffle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--event-config", required=True)
    p.add_argument(
        "--table",
        action="append",
        required=True,
        help="name=path (path extension picks the reader; bare prefix uses "
        "format priority parquet > csv.gz > csv)",
    )
    p.add_argument("--output", required=True)
    p.add_argument("--split-seed", type=int, default=1)
    p.add_argument("--n-patients-per-shard", type=int, default=50_000)
    p.add_argument("--train-frac", type=float, default=0.8)
    p.add_argument("--tuning-frac", type=float, default=0.1)
    p.add_argument("--held-out-frac", type=float, default=0.1)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    import yaml
    from pyspark.sql import functions as F

    from ..operators.aggregate_code_metadata import aggregate_code_metadata
    from ..operators.extract_events import convert_to_events
    from ..operators.merge_sort import merge_and_sort
    from ..operators.split_patients import (
        harvest_patient_ids,
        shard_patients,
        splits_to_dataframe,
    )
    from ..schema import finalize_data
    from ..session import get_spark
    from ..sources.readers import read_table
    from ..sources.writers import write_json, write_parquet

    with open(args.event_config) as f:
        event_cfg = yaml.safe_load(f)

    spark = get_spark("meds_extract", master=args.master)

    tables = {}
    for spec in args.table:
        name, _, path = spec.partition("=")
        tables[name] = read_table(spark, path)

    frames = []
    for name, table_cfg in event_cfg.items():
        if name not in tables:
            raise KeyError(f"event config references unknown table {name!r}; "
                           f"provided: {sorted(tables)}")
        cfg = dict(table_cfg)
        pid_col = cfg.pop("patient_id_col", "patient_id")
        frames.append(convert_to_events(tables[name], cfg, patient_id_col=pid_col))

    # persist: the cohort feeds four actions (id harvest, data write,
    # codes aggregation, summary count) — without this the whole
    # scan+convert+dedup+sort DAG re-executes per action
    cohort = finalize_data(merge_and_sort(frames)).persist()

    ids = harvest_patient_ids([cohort])
    shards = shard_patients(
        ids,
        n_patients_per_shard=args.n_patients_per_shard,
        split_fracs_dict={
            "train": args.train_frac,
            "tuning": args.tuning_frac,
            "held_out": args.held_out_frac,
        },
        seed=args.split_seed,
    )
    splits_df = splits_to_dataframe(spark, shards)

    out = args.output
    write_parquet(
        cohort.join(F.broadcast(splits_df), "patient_id"),
        os.path.join(out, "data"),
        partition_by=["split"],
    )
    write_parquet(splits_df, os.path.join(out, "metadata", "patient_splits"))
    write_parquet(
        aggregate_code_metadata(cohort, do_summarize_over_all_codes=True),
        os.path.join(out, "metadata", "codes"),
    )
    write_json(shards, os.path.join(out, "metadata", "splits.json"))

    summary = {
        "tables": sorted(tables),
        "rows": cohort.count(),
        "patients": len(ids),
        "shards": {k: len(v) for k, v in shards.items()},
    }
    cohort.unpersist()
    with open(os.path.join(out, "extract_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
