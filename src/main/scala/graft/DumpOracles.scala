package graft
import java.nio.file.{Files, Paths}

/** Dev tool: write `oracle_sql.json` (same escaping as [[Verify]]) into an
  * existing dump directory WITHOUT re-running the Spark dumps. The parquet
  * results only depend on the Spark-side query code, so an oracle-SQL-only
  * edit (the common case when tuning the DuckDB mirrors' cost) can be
  * re-checked against the standing dumps in seconds instead of a full
  * multi-minute Verify pass. Also feeds `tools/check_oracles.py --types`
  * (the DESCRIBE-based HUGEINT-hygiene sweep) when run standalone.
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args(0))
    // 2nd arg: the data dir the standing dump was produced from — feeds
    // the __SF_DIR__ substitution for filesystem-reading oracles.
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("oracle_sql.json"), Verify.oracleJson(None, sfDir))
    println(s"[dump-oracles] wrote ${SparkEntry.oracleSql.size} oracles to $dir (sfDir=$sfDir)")
  }
}
