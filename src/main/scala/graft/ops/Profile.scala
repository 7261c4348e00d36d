package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the statistics side of the reference's post-load
  * `ANALYZE` (reference: pandas_to_postgres/_base_copy.py:119-124): one
  * row per profiled column with null count, exact distinct count, and
  * min/max rendered as strings.
  *
  * Each column profile is an independent single-pass aggregate over a
  * one-column pruned scan; the per-column frames union into one result.
  * (For very wide tables, a single multi-aggregate pass + unpivot trades
  * scan count against shuffle width — at columnar-parquet scan cost the
  * per-column form usually wins because each agg reads one column.)
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols
      .map { c =>
        df.agg(
          count(lit(1)).as("__total"),
          count(col(c)).as("__nonnull"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
          .select(
            lit(c).as("col_name"),
            (col("__total") - col("__nonnull")).as("n_nulls"),
            col("n_distinct"), col("min_val"), col("max_val"))
      }
      .reduce(_.unionByName(_))
}
