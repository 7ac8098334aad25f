"""YAML-driven pipeline CLI — the Spark equivalent of running the
reference's per-stage console scripts in sequence
(reference README.md:94-101, joint_script.sh):

    python -m meds_polars_functions_spark.plans.cli \
        --config pipeline.yaml --input data/ --output out/

pipeline.yaml:

    stages:
      - filter_patients
      - aggregate_code_metadata
      - fit_vocabulary_indices
      - normalization
    stage_configs:
      filter_patients:
        min_measurements_per_patient: 5

One Spark job replaces the reference's N worker processes + file locks;
per-stage parquet checkpoints (``--checkpoint-dir``) restore its
resume-and-inspect-intermediates property.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="pipeline YAML")
    p.add_argument("--input", required=True, help="input parquet path (MEDS data)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--metadata-input", help="optional code metadata parquet")
    p.add_argument("--checkpoint-dir", help="per-stage parquet checkpoints")
    p.add_argument("--master", default=None, help="spark master override")
    args = p.parse_args(argv)

    import yaml

    from ..session import get_spark
    from .pipeline import Pipeline
    from .registry import build_stages

    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    spark = get_spark("meds_pipeline", master=args.master)
    data = spark.read.parquet(args.input)
    metadata = (
        spark.read.parquet(args.metadata_input) if args.metadata_input else None
    )
    stages = build_stages(cfg)
    pipe = Pipeline(stages, checkpoint_dir=args.checkpoint_dir)
    data, metadata = pipe.run(spark, data, metadata)

    os.makedirs(args.output, exist_ok=True)
    data.write.mode("overwrite").parquet(os.path.join(args.output, "data"))
    if metadata is not None:
        metadata.write.mode("overwrite").parquet(
            os.path.join(args.output, "metadata")
        )
    # count what was written, not the lineage — counting the DataFrame
    # would re-execute the whole pipeline a second time
    rows_out = spark.read.parquet(os.path.join(args.output, "data")).count()
    meta_rows = (
        spark.read.parquet(os.path.join(args.output, "metadata")).count()
        if metadata is not None
        else None
    )
    summary = {
        "stages": cfg["stages"],
        "rows_out": rows_out,
        "metadata_rows_out": meta_rows,
    }
    with open(os.path.join(args.output, "pipeline_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
