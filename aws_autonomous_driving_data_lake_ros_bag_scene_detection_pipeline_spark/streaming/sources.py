"""Streaming file sources.

Replaces the reference's S3-event → Lambda prefix/suffix filter
(lambda_function.py:24-39, config.json:10-15) with Spark's checkpointed
file source: discovery, filtering, and exactly-once bookkeeping are the
engine's job, not a hand-rolled DynamoDB ledger (trigger.py:110-147).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def file_stream(spark: SparkSession, path: str, schema: T.StructType,
                fmt: str = "parquet", glob: str | None = None,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded DataFrame over files appearing under ``path``.

    ``glob`` maps to ``pathGlobFilter`` (the Lambda's prefix/suffix
    filter); ``max_files_per_trigger`` bounds micro-batch size the way
    the reference's batch rotation bounded EMR run size
    (trigger.py:150-165). Schema must be explicit — streaming reads
    don't infer, which is also the right call at 100 TB.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
