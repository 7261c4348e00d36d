package graft

import java.nio.file.{Files, Paths}

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/inc_out"
    val keys = if (args.length > 2) args(2).split(",").toSeq else Seq("dedup_incremental")
    val spark = GraftSession.local(8, 8)
    new java.io.File(out).mkdirs()
    val explainOnly = sys.env.get("SCRATCH_EXPLAIN").contains("1")
    keys.foreach { k =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(k)(spark, dir)
      if (explainOnly) {
        println(s"==== $k ====")
        df.explain("formatted")
      } else {
        df.coalesce(1).write.mode("overwrite").parquet(s"$out/$k")
      }
      println(f"[scratch] $k: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      TmpDirs.sweepRecorded()
    }
    if (explainOnly) { spark.stop(); return }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = keys.map(k => s"${q(k)}: ${q(SparkEntry.oracleSql(k))}").mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
