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
