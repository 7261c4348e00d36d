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

  /** ROC/AUC from the same one-pass threshold sweep, in EXACT integer
    * arithmetic: the ROC points ((fp_t/N, tp_t/P) per threshold, plus
    * the (0,0) / (1,1) endpoints) fold into a trapezoid area by
    * cross-multiplication — auc_num2 = Σ Δfp·(tp_k + tp_{k+1}) over
    * consecutive points, auc_den = 2·P·N — so the operating-point
    * choice the sweep informs is backed by a bit-reproducible area.
    * One data pass (the shared confusion aggregate); the fold runs on
    * the ≤K+2-row threshold frame, never on data. Exact while
    * P·N ≤ 2⁶³/2e6 (long cross-products; petabyte corpora gate AUC on
    * sampled eval sets long before that bound).
    *
    * Returns one row: (p, n, auc_num2, auc_den, auc_x1e6) where
    * auc_x1e6 = auc_num2·1e6 div auc_den (truncating integer division,
    * both engines).
    */
  def rocAuc(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cm = confusion(scored, scoreCol, labelCol, thresholds)
    // class totals are identical on every sweep row; max() folds them
    val tot = cm.agg(
      max(col("tp") + col("fn")).as("p"),
      max(col("fp") + col("tn")).as("n"))
    val pts = cm.select(col("threshold"), col("tp"), col("fp"))
      .unionByName(tot.select(
        lit(Long.MaxValue).as("threshold"), lit(0L).as("tp"), lit(0L).as("fp")))
      .unionByName(tot.select(
        lit(Long.MinValue).as("threshold"), col("p").as("tp"), col("n").as("fp")))
    // single-partition window over the K+2-row sweep frame — bounded by
    // the threshold count, never by the corpus
    val byThr = Window.orderBy(desc("threshold"))
    val seg = pts
      .withColumn("tp_prev", lag("tp", 1).over(byThr))
      .withColumn("fp_prev", lag("fp", 1).over(byThr))
      .where(col("tp_prev").isNotNull)
      .agg(sum((col("fp") - col("fp_prev")) * (col("tp") + col("tp_prev"))).as("auc_num2"))
    seg.crossJoin(tot).select(
      col("p"), col("n"), col("auc_num2"),
      (lit(2L) * col("p") * col("n")).as("auc_den"),
      when(col("p") * col("n") === 0L, lit(0L))
        .otherwise(expr("auc_num2 * 1000000 div (2 * p * n)")).as("auc_x1e6"))
  }
}
