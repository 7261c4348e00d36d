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
  * `write` estimates the data's serialized size from a bounded sample of
  * output partitions and coalesces to ceil(bytes / targetBytes) files.
  */
object SizedSink {

  /** Estimate serialized bytes cheaply: average parquet-ish row width
    * from a sample write is overkill — the logical-plan stats give a
    * Catalyst estimate (sizeInBytes) that is already maintained for join
    * planning; it over-estimates raw row width vs parquet encoding, so
    * divide by `compressionFactor` (parquet+snappy on tabular data
    * typically 3-10x smaller than in-memory).
    */
  def estimateBytes(df: DataFrame, compressionFactor: Double = 4.0): Long = {
    val planBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    (BigDecimal(planBytes) / compressionFactor).toLong
  }

  def write(
      df: DataFrame,
      path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      overwrite: Boolean = true): Int = {
    require(targetBytes > 0)
    val nFiles = math.max(1, math.ceil(estimateBytes(df).toDouble / targetBytes).toInt)
    df.coalesce(nFiles)
      .write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path)
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
