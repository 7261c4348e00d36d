package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** CSV sink — the write side of the reference's wire format
  * (reference: pandas_to_postgres/utilities.py:78-93 `create_file_object`,
  * pandas `to_csv(index=False)` semantics: header, empty field = NULL).
  * Distributed: one part file per partition; pair with `Chunk.byRows`
  * to bound part sizes the way csv_chunksize bounds StringIO.
  */
object CsvSink {
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("header", "true")
      .option("nullValue", "")
      .option("emptyValue", "\"\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)
}

/** JSON-lines sink, pairing sources.Json. */
object JsonSink {
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .json(path)
}

/** ORC sink, pairing sources.Orc — the second columnar wire format of
  * the load surface (Spark-native: splits, predicate pushdown, and
  * column pruning behave as for parquet).
  */
object OrcSink {
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .orc(path)
}

/** Target-file-size parquet writes — the small-files guard. At corpus
  * scale a shuffle-heavy job can end with thousands of tiny output
  * partitions; writing them 1:1 produces a file-per-partition swamp that
  * slows every later scan (listing, footer reads, row-group overhead).
  * `write` sizes the output to ceil(estimatedBytes / targetBytes) files
  * via a REPARTITION (an extra narrow shuffle of only the final rows):
  * coalesce would be shuffle-free but collapses the parallelism of the
  * whole upstream stage — the same one-partition compute trap the bench
  * measured with AQE-under-cache coalescing.
  */
object SizedSink {

  /** Catalyst's maintained logical-plan size estimate (sizeInBytes),
    * scaled by a parquet compression factor. Honest limitation: the
    * size visitor does NOT model aggregation/join cardinality reduction,
    * so a heavily-reducing plan over-estimates — erring toward more,
    * smaller files (never a few huge ones). Callers that know their
    * output cardinality can size explicitly via `writeFiles`.
    */
  def estimateBytes(df: DataFrame, compressionFactor: Double = 4.0): Long = {
    val planBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    (BigDecimal(planBytes) / compressionFactor).toLong
  }

  /** Write exactly `nFiles` files. */
  def writeFiles(df: DataFrame, path: String, nFiles: Int, overwrite: Boolean = true): Unit = {
    require(nFiles > 0)
    df.repartition(nFiles)
      .write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path)
  }

  def write(
      df: DataFrame,
      path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      overwrite: Boolean = true): Int = {
    require(targetBytes > 0)
    val nFiles = math.max(1, math.ceil(estimateBytes(df).toDouble / targetBytes).toInt)
    writeFiles(df, path, nFiles, overwrite)
    nFiles
  }
}

/** Small-files compaction — the OPTIMIZE pass every long-lived table
  * needs: streaming micro-batches and over-parallel writers leave
  * directories of tiny parquet files whose per-file open/footer cost
  * dominates scans at scale. `compact` rewrites a directory into
  * ⌈actual on-disk bytes / targetBytes⌉ files — sized from the REAL
  * file lengths (the compaction case knows them exactly; no plan
  * estimate needed) — leaving content bit-identical.
  */
object Compaction {

  /** Bytes of the parquet data files under `path` via the Hadoop FS
    * (driver-side listing of one directory — the same listing any scan
    * pays; no data is read).
    */
  def dataBytes(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Recurse: a partitioned layout keeps its .parquet files one level
    // down — a top-level-only listing would size the rewrite at 0 bytes
    // and silently collapse everything to one file.
    val it = fs.listFiles(p, /*recursive=*/ true)
    var total = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) total += st.getLen
    }
    total
  }

  /** Count of parquet data files under `path` (spec/observability). */
  def dataFileCount(spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite `src` into `dst` with files of ~`targetBytes`; returns the
    * file count written. One read + one round-robin repartition — no
    * ordering is promised (compaction preserves CONTENT, the clustered/
    * z-order writers own layout).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      src: String, dst: String, targetBytes: Long): Int = {
    require(targetBytes > 0)
    val bytes = dataBytes(spark, src)
    require(bytes > 0, s"compact: no parquet data files found under $src")
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(src).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(dst)
    n
  }
}

/** Clustered layout writes: range-partition by the cluster key and sort
  * within partitions before writing parquet. Files then hold disjoint,
  * internally-sorted key ranges, so parquet row-group min/max statistics
  * prune reads on the cluster key — the write-time complement to
  * predicate pushdown (classic data-layout optimization; same idea
  * single-dimension as Z-ordering). Pair with `Bucketed` (hash
  * co-location for joins) — clustering serves range scans.
  */
object Clustered {
  def write(
      df: DataFrame,
      path: String,
      clusterBy: Seq[String],
      numFiles: Int,
      overwrite: Boolean = true): Unit = {
    require(clusterBy.nonEmpty && numFiles > 0)
    val keys = clusterBy.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path)
  }

  /** Z-order (Morton curve) TWO-dimensional clustered write: both
    * dimensions are min/max-normalized to 32-bit ranks, bit-interleaved
    * into one sort key (`InterleaveBits32`, map-side codegen'd), and the
    * frame is range-partitioned + sorted by that key. Every file then
    * covers a small tile of the 2-D space, so parquet row-group min/max
    * statistics prune scans filtered on EITHER dimension — where 1-D
    * clustering (`write`) serves only its leading column. This is the
    * standard multi-dimensional data-skipping layout at 100 TB scale.
    *
    * The min/max pass is one aggregate producing four scalars (index
    * metadata, not a data collect). Linear normalization assumes
    * roughly continuous dimensions; heavy skew concentrates tiles but
    * never breaks correctness.
    */
  def zorderWrite(
      df: DataFrame,
      path: String,
      dimA: String,
      dimB: String,
      numFiles: Int,
      overwrite: Boolean = true): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    require(numFiles > 0)
    // timestamps/dates have no direct double cast in Spark 4; take their
    // epoch scale (ordering-preserving, which is all Z-order needs)
    def asDouble(name: String): org.apache.spark.sql.Column = df.schema(name).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(name).cast(TimestampType)).cast("double")
      case DateType => unix_date(col(name)).cast("double")
      case _        => col(name).cast("double")
    }
    val r = df.agg(
      min(asDouble(dimA)), max(asDouble(dimA)),
      min(asDouble(dimB)), max(asDouble(dimB))).collect()(0)
    def norm(c: String, lo: Double, hi: Double) =
      if (!(hi > lo)) lit(0L)
      else least(
        lit(4294967295L),
        greatest(
          lit(0L),
          ((asDouble(c) - lit(lo)) / lit(hi - lo) * lit(4294967295.0)).cast("long")))
    val z = graft.functions.exprs.zorder_key(
      norm(dimA, r.getDouble(0), r.getDouble(1)),
      norm(dimB, r.getDouble(2), r.getDouble(3)))
    df.withColumn("__zorder", z)
      .repartitionByRange(numFiles, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")
      .write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path)
  }
}

/** Parquet sink with full-refresh semantics — the reference's
  * TRUNCATE-then-reload (`_base_copy.py:102-113`) maps to Spark's
  * atomic `Overwrite` mode; partitioned refresh uses dynamic partition
  * overwrite so only touched partitions are replaced at 100 TB.
  */
object Refresh {
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    // partitionOverwriteMode is honored as a per-write DataFrameWriter
    // option (Spark 3.0+), so dynamic overwrite is scoped to THIS write
    // and never leaks into the session's other writers.
    val base = df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionBy.nonEmpty) base.partitionBy(partitionBy: _*) else base).parquet(path)
  }
}

/** Idempotent marker-guarded append — exactly-once batch loading
  * without a transaction log: each batch writes under a run-id
  * partition directory, then commits a marker file; a replayed run-id
  * that finds its marker skips entirely. The marker is written AFTER
  * the data, so the crash window is write-completed-but-marker-missing
  * — a replay then re-appends and the run-id partition holds two
  * copies, which the DOWNSTREAM read deduplicates by (run_id, key) if
  * the feed requires crash-exactness (the documented trade: marker
  * idempotence is at-least-once under a crash in the commit gap,
  * exactly-once everywhere else; a rename-based commit or a log closes
  * the gap at the cost of a transactional store).
  *
  * The marker is checked and created through the table path's Hadoop
  * `FileSystem` (not `java.io.File`), so the guard works on HDFS/S3A
  * as well as local paths, and creation uses the atomic
  * `create(overwrite=false)` claim-or-skip primitive: of two racing
  * runs with the same run-id, exactly one wins the marker. NOTE the
  * single-writer-per-run-id assumption for the DATA: the loser of the
  * marker race skips its write, but a loser that already STARTED
  * writing before losing would still have appended — callers must not
  * run the same run-id concurrently with itself (the marker closes the
  * replay/retry race, not a concurrent-duplicate-submission race,
  * which needs the lock a transaction log provides).
  */
object IdempotentAppend {
  /** @return true if this call performed the write, false if skipped */
  def append(df: DataFrame, table: String, runId: String): Boolean = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val tablePath = new org.apache.hadoop.fs.Path(table)
    val fs = tablePath.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(tablePath, s"_committed_$runId")
    if (fs.exists(marker)) false
    else {
      df.write.mode(SaveMode.Append).parquet(s"$table/run_id=$runId")
      fs.mkdirs(tablePath)
      try {
        // atomic claim: create(overwrite=false) throws if the marker
        // appeared since the exists() check (a racing replay committed)
        fs.create(marker, false).close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException if e.getMessage != null &&
            e.getMessage.contains("already exists") => false
      }
    }
  }
}

/** Snapshot-logged table — a minimal transaction-log table format
  * (the Iceberg/Delta mechanism at its core): every commit writes its
  * data under an immutable `data/v<N>/` directory plus a manifest
  * `_manifests/v<N>.json` listing EVERY data directory visible at that
  * version. Readers never list the table root; they read a manifest
  * and load exactly its member directories, so writers and readers
  * never race (the manifest write is the atomic commit point) and any
  * historical version stays readable forever — time travel is "pick an
  * older manifest". At 100 TB this is the pattern that makes appends
  * safe under concurrent readers without a lock: data files are
  * immutable, commits are one tiny manifest file.
  */
object SnapshotLog {
  private def fs(df: DataFrame, table: String) = {
    val p = new org.apache.hadoop.fs.Path(table)
    (p.getFileSystem(df.sparkSession.sessionState.newHadoopConf()), p)
  }

  /** Commit `df` as version `v`, visible dirs = all prior ones + v. */
  def commit(df: DataFrame, table: String, v: Int): Unit = {
    require(v >= 1, s"versions start at 1, got $v")
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$table/data/v$v")
    val (hfs, _) = fs(df, table)
    val manifest = (1 to v).map(i => s"data/v$i").mkString("[\"", "\",\"", "\"]")
    val out = hfs.create(new org.apache.hadoop.fs.Path(s"$table/_manifests/v$v.json"), false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Read the table as of version `v` — exactly the dirs its manifest
    * names, immune to any later commit.
    */
  def readAsOf(spark: org.apache.spark.sql.SparkSession, table: String, v: Int): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val mp = new org.apache.hadoop.fs.Path(s"$table/_manifests/v$v.json")
    val hfs = mp.getFileSystem(conf)
    val in = hfs.open(mp)
    val raw = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val dirs = raw.stripPrefix("[").stripSuffix("]").split(",")
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    spark.read.parquet(dirs.map(d => s"$table/$d").toIndexedSeq: _*)
  }
}
