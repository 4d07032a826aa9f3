"""Table profiling (ANALYZE-style column statistics) in ONE pass.

Every column's null count, exact distinct count, min/max, numeric
mean, and mean string length are computed in a single ``agg()`` over
the table: Spark plans the multiple COUNT(DISTINCT)s as one Expand +
two-stage aggregate, so the input is scanned exactly once no matter
how many columns are profiled — the property that matters when the
table is 100 TB (a per-column loop would scan it N times). The
single aggregated row is then exploded into one row per column,
driver-free.

Exact distinct counts are used (not HLL approx_count_distinct) so the
result is engine-independent and the DuckDB oracle can hash-check it;
at true corpus scale swap in approx_count_distinct(col, rsd) per call
site — the plan shape is identical minus the Expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: list[str] | None = None
                  ) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_s, max_s, mean_num, mean_len). min/max are cast to string so
    heterogeneous columns share one schema; mean_num is null for
    non-numeric columns, mean_len null for non-strings."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__nn"),
            F.countDistinct(col).alias(f"{c}__nd"),
            F.min(col).cast("string").alias(f"{c}__mn"),
            F.max(col).cast("string").alias(f"{c}__mx"),
        ]
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.round(F.avg(col), 4).alias(f"{c}__avg"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__avg"))
        if types[c] == "string":
            aggs.append(F.round(F.avg(F.length(col)), 4)
                        .alias(f"{c}__len"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__len"))
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_s"),
            F.col(f"{c}__mx").alias("max_s"),
            F.col(f"{c}__avg").alias("mean_num"),
            F.col(f"{c}__len").alias("mean_len"),
        ) for c in cols])
    return one.select(F.explode(rows).alias("p")).select("p.*")
