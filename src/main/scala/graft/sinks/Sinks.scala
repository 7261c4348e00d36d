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
