package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics — the pre-flight check for every shuffle
  * join/agg decision this engine makes (salting, bucket caps, AQE skew
  * hints all start from "how hot is the hottest key?").
  *
  * `keySkew(df, keys)` audits N key columns in ONE scan + ONE shuffle:
  * rows explode to (key_col, value) pairs map-side, a single
  * two-phase count aggregates them (partial combine bounds hot keys),
  * and the per-column rollup reduces each column to one report row:
  * `(key_col, n_rows, n_keys, max_cnt, hot_key, skew_x1000)` where
  * skew_x1000 = max_cnt / (n_rows/n_keys) in exact integer permille —
  * 1000 = perfectly uniform, 50000 = hottest key is 50× the mean.
  *
  * The hottest key itself is picked windowless via
  * min(struct(-count, key)) — partially aggregatable, so the audit
  * never concentrates a viral key's rows on one task (the exact
  * failure mode it exists to detect).
  */
object Skew {

  def keySkew(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val pairs = df.select(explode(array(keys.map(k =>
      struct(lit(k).as("key_col"), col(k).cast("string").as("k"))): _*)).as("p"))
      .select(col("p.key_col").as("key_col"), col("p.k").as("k"))
    pairs
      .groupBy("key_col", "k").agg(count(lit(1)).as("c"))
      .groupBy("key_col")
      .agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_cnt"),
        min(struct((-col("c")).as("nc"), col("k").as("k"))).as("w"))
      .select(
        col("key_col"), col("n_rows"), col("n_keys"), col("max_cnt"),
        col("w.k").as("hot_key"),
        expr("max_cnt * n_keys * 1000L div n_rows").as("skew_x1000"))
  }
}
