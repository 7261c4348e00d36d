package graft
import java.nio.file.{Files, Paths}

/** Dev tool: write `oracle_sql.json` (same escaping as [[Verify]]) into an
  * existing dump directory WITHOUT re-running the Spark dumps. The parquet
  * results only depend on the Spark-side query code, so an oracle-SQL-only
  * edit (the common case when tuning the DuckDB mirrors' cost) can be
  * re-checked against the standing dumps in seconds instead of a full
  * multi-minute Verify pass.
  */
object DumpOracles {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20). */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def json: String =
    SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val out = Paths.get(args(0)).resolve("oracle_sql.json")
    Files.writeString(out, json)
    println(s"[dump-oracles] wrote ${SparkEntry.oracleSql.size} oracles to $out")
  }
}
