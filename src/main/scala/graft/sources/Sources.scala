package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet source (reference: pandas_to_postgres/copy_parquet.py).
  *
  * The reference reads row-group batches of 10^7 rows on one machine;
  * Spark's parquet scan already splits by row group across executors, so
  * "chunked read" is the default execution model. `maxPartitionBytes`
  * plays the role of `parquet_chunksize`.
  */
object Parquet {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Plain path read. Split sizing (the chunk-size analog) is a session
    * conf consulted at action time — scope it with
    * `ops.Chunk.withMaxSplitBytes(spark, bytes) { ... }` around the read
    * AND its actions rather than mutating session state here.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

/** ORC source/side — same columnar contract as parquet, for pipelines
  * whose upstream emits ORC (Spark's built-in `orc` datasource: splits,
  * pushdown, and column pruning work exactly as for parquet).
  */
object Orc {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

/** CSV source with explicit schema — the read side of the reference's CSV
  * wire format (header row, empty string = NULL), kept pandas-compatible
  * so a graft CSV sink round-trips losslessly.
  */
object Csv {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      .option("emptyValue", "\"\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema)
      .csv(path)
}

/** JSON-lines source/side of the wire-format family (schema-explicit,
  * like the CSV pair: loaders in the reference's world frequently pass
  * through line-delimited exports).
  */
object Json {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}

/** JDBC source for completeness of the load/extract surface. Partitioned
  * reads (`partitionColumn/lowerBound/upperBound/numPartitions`) are the
  * scale path — one connection per partition.
  */
object Jdbc {
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8,
      props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    val withPart = (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        base
          .option("partitionColumn", c)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
          .option("numPartitions", numPartitions.toString)
      case _ => base
    }
    props.foldLeft(withPart) { case (r, (k, v)) => r.option(k, v) }.load()
  }
}

/** Table-group source: the reference's HDF many-tables→one-SQL-table
  * mapping with per-key constant metadata columns (reference:
  * pandas_to_postgres/utilities.py:17-75 `hdf_metadata`,
  * copy_hdf.py HDFTableCopy). Spark-first: a union of scans, each with
  * `lit()` constants — the union parallelizes across all member scans at
  * once instead of looping table-by-table.
  */
object TableGroup {

  /** `members` = (sourceName, constantColumns, selectExprs). Each member
    * maps its own columns onto the shared destination schema (the
    * reference's hdf_table -> sql_table mapping); constants are injected
    * as `lit()` columns; `unionByName` keeps the union robust to column
    * order drift.
    */
  def load(
      spark: SparkSession,
      dir: String,
      members: Seq[(String, Map[String, String], Seq[String])]): DataFrame =
    members
      .map { case (name, consts, select) =>
        val base = consts.foldLeft(Parquet.table(spark, dir, name)) {
          case (df, (k, v)) => df.withColumn(k, lit(v))
        }
        if (select.nonEmpty) base.selectExpr(select: _*) else base
      }
      .reduce(_.unionByName(_))
}
