package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The oracle_sql.json payload, optionally key-filtered. `__SF_DIR__`
    * tokens (filesystem-reading oracles like `src_binaryfile_scan`'s
    * read_blob mirror) are substituted with the run's data directory —
    * the one moment the path is known — so the same static SQL is exact
    * at every scale factor.
    */
  def oracleJson(only: Option[Set[String]], sfDir: String): String =
    SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__SF_DIR__", sfDir))}" }
      .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev-only: optional 3rd arg = comma-separated query-key filter.
    // A filtered run writes a SUBSET oracle_sql.json, so it REFUSES to run
    // into an outDir that already holds a manifest: overwriting a full dump
    // with a subset would make a later compare silently validate only the
    // filtered keys.
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    only.foreach { keys =>
      // A typo'd/unregistered key must not silently shrink a filtered run
      // to an empty (vacuously green) manifest — fail it by name.
      val unknown = keys -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        throw new IllegalArgumentException(
          s"[verify] filter names unknown query keys: ${unknown.toSeq.sorted.mkString(", ")}")
      if (Files.exists(Paths.get(s"$outDir/oracle_sql.json")))
        throw new IllegalArgumentException(
          s"[verify] refusing FILTERED run into $outDir: it already holds an " +
            "oracle_sql.json whose keys a subset manifest would silently shadow — use a fresh outDir")
      System.err.println(
        s"[verify] FILTERED run (${keys.size} keys) — oracle_sql.json will cover only these; fresh outDir enforced")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    TmpDirs.sweepStale() // reclaim scratch dirs from earlier/crashed runs
    // Registry/oracle key-set discipline: an oracle with no query is drift
    // and fails immediately; a query with no oracle is the documented
    // weaker rows-only contract and is only reported.
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    if (orphanOracles.nonEmpty)
      throw new IllegalStateException(
        s"[verify] oracleSql keys with no matching queries entry: ${orphanOracles.toSeq.sorted.mkString(", ")}")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    if (rowsOnly.nonEmpty)
      System.err.println(s"[verify] rows-only keys (no oracle): ${rowsOnly.toSeq.sorted.mkString(", ")}")
    // Totality: a key whose DataFrame cannot even be constructed must leave
    // a loud, machine-readable trace — r7's events break silently shrank
    // the correctness dump from 142 to 120 keys and every gate stayed
    // green. Failures are collected, dumped to verify_errors.json, and the
    // run exits nonzero.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-key manifest: ran/err/secs/oracle — one artifact answering both
    // "did it run" and (joined with the DuckDB compare) "did it match"
    val manifest = scala.collection.mutable.LinkedHashMap[String, (Boolean, Double, String)]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        manifest(name) = (true, (System.nanoTime() - t0) / 1e9, null)
      } catch { case e: Throwable =>
        failures(name) = e.toString.take(500)
        manifest(name) = (false, (System.nanoTime() - t0) / 1e9, e.toString.take(500))
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      }
      // several library functions hand back caller-owned persisted
      // results; release them so 70+ queries don't accumulate caches
      spark.catalog.clearCache()
      TmpDirs.sweepRecorded()
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson(only, sfDir))
    // Always written (empty object when clean) so compare tooling can
    // assert dump totality: dumped dirs + verify_errors keys == registry.
    val errJson = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // verify_manifest.json (SURVEY §6): every attempted key, in registry
    // order — {"key": {"ran": bool, "secs": s, "oracle": bool, "err":
    // str|null}}. `ran`=false rows repeat verify_errors.json so one file
    // answers "ran"; the DuckDB compare over oracle_sql.json answers
    // "matched" for the `oracle`=true subset.
    val manJson = manifest.map { case (k, (ok, secs, err)) =>
      val errV = if (err == null) "null" else q(err)
      s"${q(k)}: {\"ran\": $ok, \"secs\": ${f"$secs%.3f"}, " +
        s"\"oracle\": ${SparkEntry.oracleSql.contains(k)}, \"err\": $errV}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"), manJson)
    // verify_observability.json: per-key plan-shape records (values are
    // already JSON arrays — e.g. khop's per-round broadcast/shuffle
    // decisions) so the artifact shows WHICH plan ran. Always written.
    val obsJson = SparkEntry.planObservations.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_observability.json"), obsJson)
    spark.stop()
    if (failures.nonEmpty) {
      println(s"[verify] ${failures.size}/${SparkEntry.queries.size} queries FAILED: ${failures.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
