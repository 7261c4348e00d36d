package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII *audit* for training-data compliance: per-source incidence counts
  * of detected PII types — the report a curation run records BEFORE
  * scrubbing (redaction itself is [[Text.scrubPii]]; this measures what
  * it would remove and what it would miss). Three detectors:
  *
  *  - emails ([[Text.emailPattern]] — the scrub pipeline's own pattern)
  *  - word-bounded 555-prefixed test-range phones (a shape
  *    [[Text.scrubPii]]'s long-digit rule does NOT catch: only 7 digits
  *    with a separator)
  *  - dotted-quad IPv4 literals
  *
  * All three patterns use only constructs with identical semantics in
  * java.util.regex and RE2 (character classes, bounded repetition,
  * ASCII `\b`), so the DuckDB oracle runs the same strings.
  *
  * Scale: per-row match counts are map-side codegen'd regexp_extract_all
  * (no UDF, no shuffle); the audit is ONE groupBy(source) over bounded
  * integer columns — output is |sources| rows.
  */
object Pii {

  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private def nMatches(textCol: Column, re: String): Column =
    size(regexp_extract_all(textCol, lit(re), lit(0))).cast("long")

  /** Per-row detection columns: n_emails / n_phones / n_ips. */
  def detect(df: DataFrame, textCol: Column): DataFrame =
    df.withColumn("n_emails", nMatches(textCol, Text.emailPattern))
      .withColumn("n_phones", nMatches(textCol, PhoneRe))
      .withColumn("n_ips", nMatches(textCol, Ipv4Re))

  /** The per-source audit frame: doc and occurrence counts per PII type,
    * all exact BIGINTs.
    */
  def audit(df: DataFrame, textCol: Column, srcCol: Column): DataFrame =
    detect(df, textCol)
      .groupBy(srcCol.as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") > 0L, 1L).otherwise(0L)).as("docs_email"),
        sum("n_emails").as("n_emails"),
        sum(when(col("n_phones") > 0L, 1L).otherwise(0L)).as("docs_phone"),
        sum("n_phones").as("n_phones"),
        sum(when(col("n_ips") > 0L, 1L).otherwise(0L)).as("docs_ip"),
        sum("n_ips").as("n_ips"))
}
