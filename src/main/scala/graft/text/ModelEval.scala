package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation for quality-model calibration: confusion
  * matrix + precision/recall at K score thresholds, the standard
  * pre-deployment check before a scoring head gates a corpus.
  *
  * Scale shape (ops.Expect discipline): ALL thresholds evaluate in ONE
  * aggregate pass — each cell is a conditional sum sharing the single
  * scan, so K thresholds cost one reduction of 4K longs, not K passes.
  * The unpivot to per-threshold rows happens on the 1-row aggregate
  * result (driver-sized, not data-sized). Precision/recall are exact
  * integer permille → oracle-reproducible bit-for-bit.
  */
object ModelEval {

  /** `scored` must carry a long score column and a boolean label
    * column. Prediction at threshold t is `score > t`. Returns one row
    * per threshold: (threshold, tp, fp, fn, tn, precision_x1000,
    * recall_x1000), zero-guarded.
    */
  def confusion(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold")
    val s = col(scoreCol)
    val l = col(labelCol)
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(s > t && l, 1L).otherwise(0L)).as(s"tp_$i"),
        sum(when(s > t && !l, 1L).otherwise(0L)).as(s"fp_$i"),
        sum(when(s <= t && l, 1L).otherwise(0L)).as(s"fn_$i"),
        sum(when(s <= t && !l, 1L).otherwise(0L)).as(s"tn_$i"))
    }
    val one = scored.agg(aggs.head, aggs.drop(1): _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(
        lit(t).as("threshold"),
        coalesce(col(s"tp_$i"), lit(0L)).as("tp"),
        coalesce(col(s"fp_$i"), lit(0L)).as("fp"),
        coalesce(col(s"fn_$i"), lit(0L)).as("fn"),
        coalesce(col(s"tn_$i"), lit(0L)).as("tn"))
    }
    one
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .withColumn(
        "precision_x1000",
        when(col("tp") + col("fp") === 0L, lit(0L))
          .otherwise(expr("tp * 1000 div (tp + fp)")))
      .withColumn(
        "recall_x1000",
        when(col("tp") + col("fn") === 0L, lit(0L))
          .otherwise(expr("tp * 1000 div (tp + fn)")))
  }
}
