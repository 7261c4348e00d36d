package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks — the validation half of the
  * reference's post-load ANALYZE habit (`_base_copy.py:119-124` runs
  * ANALYZE after every load; production loaders pair that with
  * constraint verification). Produces one report row per declared
  * check: `(check_name, total, violations, passed)`.
  *
  * Scale contract: ALL row-level and uniqueness checks over one table
  * evaluate in a SINGLE aggregate pass (conditional sums share the one
  * scan; never one scan per check), and each referential check is ONE
  * pruned left join — two columns shuffle, nothing else. At 100 TB the
  * cost of a ten-check suite is one table scan plus one key join per
  * foreign key, identical to the cost of the cheapest possible audit.
  */
object Expect {

  /** A row-level expectation: `violation` is a boolean Column that is
    * true on rows BREAKING the rule (e.g. `col("price") < 0`).
    */
  final case class RowRule(name: String, violation: Column)

  /** A uniqueness expectation over `cols`. Violations = total rows
    * minus distinct non-null key tuples, so duplicate keys AND rows
    * with a NULL key component both count as violations (a NULL key
    * cannot satisfy a PRIMARY KEY-style contract).
    */
  final case class UniqueRule(name: String, cols: Seq[String])

  private val reportCols =
    Seq(col("check_name"), col("total"), col("violations"), (col("violations") === 0L).as("passed"))

  /** Evaluate all row + uniqueness rules over `df` in one aggregate
    * pass; returns the `(check_name, total, violations, passed)` report.
    *
    * NOTE each [[UniqueRule]] adds a distinct aggregate; Spark plans
    * >1 distinct aggregate via an Expand (one duplicated pass per
    * distinct set), so keep uniqueness rules per call to the few that
    * matter — row rules are free.
    */
  def table(df: DataFrame, rows: Seq[RowRule], uniques: Seq[UniqueRule] = Nil): DataFrame = {
    require(rows.nonEmpty || uniques.nonEmpty, "at least one rule")
    val aggs =
      rows.map(r => sum(when(r.violation, 1L).otherwise(0L)).as(s"__v_${r.name}")) ++
        uniques.map(u =>
          (count(lit(1)) - count_distinct(col(u.cols.head), u.cols.tail.map(col): _*))
            .as(s"__v_${u.name}"))
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val entries = (rows.map(_.name) ++ uniques.map(_.name)).map(n =>
      struct(lit(n).as("check_name"), col("__total").as("total"), col(s"__v_$n").as("violations")))
    one
      .select(explode(array(entries: _*)).as("c"))
      .select(col("c.check_name").as("check_name"), col("c.total").as("total"),
        col("c.violations").as("violations"))
      .select(reportCols: _*)
  }

  /** Referential-integrity expectation: every non-null `fk` value in
    * `fact` must exist as `pk` in `dim`. One pruned left join computes
    * total and orphan count in the same pass; `dim` is key-deduped
    * first so a (buggy) duplicated dimension key can never inflate the
    * fact row count and mask orphans.
    */
  def references(name: String, fact: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame = {
    val keys = dim.select(col(pk)).where(col(pk).isNotNull).dropDuplicates(pk)
    fact
      .select(col(fk))
      .join(keys, col(fk) === col(pk), "left")
      .agg(
        count(lit(1)).as("total"),
        sum(when(col(fk).isNotNull && col(pk).isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("check_name") +: reportCols.tail: _*)
  }

  /** Union per-table and referential reports into one ordered suite. */
  def suite(reports: DataFrame*): DataFrame =
    reports.reduce(_ unionByName _).orderBy("check_name")
}
