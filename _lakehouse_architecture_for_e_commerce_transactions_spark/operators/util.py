"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def literal_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """A small literal DataFrame as a pure JVM expression plan
    (``inline(array(struct(...)))`` over ``range(1)``) instead of
    ``spark.createDataFrame``'s pickled-RDD path.

    A parallelize-backed literal embedded in an executed plan schedules a
    Python-deserialization stage EVERY time the plan runs — measured
    ~0.5 s per execution on a warm local session for a 1-row marker
    unioned into a commit write, vs ~0 for the expression form, which
    constant-folds into a LocalRelation (TUNING.md r14). Marker rows ride
    inside every streaming state commit, so they pay that cost per
    micro-batch; single-row result frames pay it on every collect.

    Intended for BOUNDED literal sets (watermark markers, stat rows,
    centroid seeds): the expression tree is linear in ``len(rows)``, so
    keep it under a few hundred rows — for larger literal sets use the
    Arrow path (``spark.createDataFrame(pandas.DataFrame(...), schema)``).
    ``rows`` are tuples of plain Python scalars/lists matching ``schema``
    (a ``StructType`` or DDL string); ``None`` becomes a typed NULL.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not rows:
        return spark.createDataFrame([], schema)
    structs = [
        F.struct(
            *[
                (F.lit(None) if v is None else F.lit(v))
                .cast(f.dataType)
                .alias(f.name)
                for f, v in zip(schema.fields, row)
            ]
        )
        for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    before a fan-out-heavy stage (explode, cross join, wide per-row compute).

    A small parquet file arrives as 1-2 input splits; an explode that
    multiplies rows 100× would then run on 2 cores while 30 idle. At real
    scale inputs already have many splits and this is a no-op — the check is
    on the *current* partition count, so no gratuitous shuffle is added.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
