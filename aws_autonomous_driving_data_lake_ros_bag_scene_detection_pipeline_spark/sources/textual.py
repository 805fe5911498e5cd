"""Text-format document sources (JSONL / CSV) with corrupt-record
quarantine.

LLM-pipeline corpora overwhelmingly arrive as JSON-Lines (one document
object per line) or CSV before they ever become parquet; the reference
has no text ingestion at all. The 100 TB concern these helpers encode:

- **Schema is DECLARED, never inferred.** Inference reads the data
  twice and silently unifies drifting types; at corpus scale both are
  bugs. Callers pass a DDL string or StructType.
- **Malformed lines are DATA, not errors.** Spark's default
  ``PERMISSIVE`` mode nulls out broken rows; ``FAILFAST`` kills a
  day-long job on line 80 billion. The right shape is the quarantine
  split the streaming layer already uses (`ingest.quarantine_batch`):
  parse with a corrupt-record column, route clean rows one way and
  raw broken lines (preserved verbatim for repair/audit) the other.
- Spark refuses to filter on the corrupt-record column over a lazy
  scan (it would have to re-parse; see SPARK-21610), so the split
  materializes the parsed batch once via ``persist`` — the returned
  handle's ``unpersist()`` releases it, same caller-owned-cache
  contract as the dedup operators.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _with_corrupt_col(declared: StructType) -> StructType:
    """Reader schema = declared + corrupt-record column, built as a
    FRESH StructType: ``declared.add(...)`` mutates (and returns) the
    caller's object, which would leak ``_corrupt_record`` into the
    ``good`` frame and poison schema reuse across reads."""
    return StructType(list(declared.fields)
                      + [StructField(_CORRUPT, StringType())])


@dataclass(frozen=True)
class QuarantinedRead:
    """Result of a quarantine read: ``good`` rows parsed to the
    declared schema; ``bad`` rows as ``(raw_line)`` preserved verbatim.
    Call :meth:`unpersist` when both frames are consumed."""
    good: DataFrame
    bad: DataFrame
    _cached: DataFrame

    def unpersist(self) -> None:
        self._cached.unpersist()


def _as_struct(spark: SparkSession, schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string
    return _parse_datatype_string(schema)


def _quarantine_split(parsed: DataFrame, declared: StructType) -> QuarantinedRead:
    cached = parsed.persist()
    good = (cached.where(F.col(_CORRUPT).isNull())
            .select(*[f.name for f in declared.fields]))
    bad = (cached.where(F.col(_CORRUPT).isNotNull())
           .select(F.col(_CORRUPT).alias("raw_line")))
    return QuarantinedRead(good=good, bad=bad, _cached=cached)


def read_jsonl(spark: SparkSession, path: str, schema, *,
               multiline: bool = False,
               options: dict | None = None) -> QuarantinedRead:
    """Read JSON-Lines documents against a DECLARED schema, splitting
    malformed lines into a quarantine frame (raw line preserved for
    repair) instead of nulling or crashing.

    A field present in the line but absent from the schema is simply
    not parsed (forward-compatible reads); a line that is not valid
    JSON, or whose types contradict the schema, lands in ``bad``.
    One scan, one persisted materialization (see module docstring)."""
    declared = _as_struct(spark, schema)
    if _CORRUPT in [f.name for f in declared.fields]:
        raise ValueError(f"declared schema must not contain {_CORRUPT}")
    full = _with_corrupt_col(declared)
    reader = (spark.read.schema(full)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", _CORRUPT)
              .option("multiLine", str(multiline).lower()))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return _quarantine_split(reader.json(path), declared)


def read_csv(spark: SparkSession, path: str, schema, *,
             header: bool = True, sep: str = ",",
             options: dict | None = None) -> QuarantinedRead:
    """CSV twin of :func:`read_jsonl`: declared schema, malformed rows
    quarantined with the raw line preserved."""
    declared = _as_struct(spark, schema)
    if _CORRUPT in [f.name for f in declared.fields]:
        raise ValueError(f"declared schema must not contain {_CORRUPT}")
    full = _with_corrupt_col(declared)
    reader = (spark.read.schema(full)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", _CORRUPT)
              .option("header", str(header).lower())
              .option("sep", sep))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return _quarantine_split(reader.csv(path), declared)
