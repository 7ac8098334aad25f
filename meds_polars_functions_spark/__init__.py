"""PySpark-native analytics engine with the capabilities of
``mmcdermott/MEDS_polars_functions`` (MEDS_transforms).

The reference is a Polars-based, sharded, file-in/file-out ETL +
preprocessing engine for MEDS (Medical Event Data Standard) datasets.
This package re-expresses every operator Spark-first: declarative
DataFrame plans optimized by Catalyst, shuffle/broadcast-aware joins,
and Pandas-UDF escape hatches only where built-ins genuinely cannot
express the semantics.

Layout
------
- ``schema``      canonical MEDS StructTypes + validation/finalize
- ``session``     tuned SparkSession builder
- ``sources``     readers (parquet / csv / csv.gz, format priority) + sinks
- ``functions``   column-expression layer: code builder, multi-format time
                  parse, typed coercion, the extract-config DSL compiler
- ``operators``   one module per reference stage (filter/normalize/agg/
                  tokenize/...) plus scale-path extras (dedup, similarity
                  search, text analysis, multimodal plumbing)
- ``plans``       YAML pipeline runner (the reference's Hydra dataflow
                  wiring, without the file locks)
- ``streaming``   Structured Streaming variants of the event aggregations
"""

__version__ = "0.1.0"
