package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type normalization: the Spark-first re-expression of the reference's
  * `cast_pandas` (reference: pandas_to_postgres/utilities.py:120-167).
  *
  * The reference fights pandas' NaN-in-int-column limitation by casting
  * float columns with integer SQL targets to nullable objects. Spark's
  * columnar model is null-safe for every type, so normalization reduces
  * to a declarative cast-to-target-schema that Catalyst folds into the
  * scan (no extra pass, and pruned columns are never read).
  */
object Normalize {

  /** Cast every column present in `target` to its target type, preserving
    * column order of `target`; missing columns are skipped with a warning
    * collected in the second return value (mirrors cast_pandas' KeyError
    * branch, utilities.py:160-165).
    */
  def toSchema(df: DataFrame, target: StructType): (DataFrame, Seq[String]) = {
    val present = df.columns.toSet
    val missing = target.fields.iterator.map(_.name).filterNot(present).toSeq
    val cols = target.fields.filter(f => present(f.name)).map { f =>
      col(f.name).cast(f.dataType).as(f.name)
    }
    (df.select(cols.toIndexedSeq: _*), missing)
  }

  /** Convenience: cast by (name -> typeName) pairs, keeping other columns. */
  def cast(df: DataFrame, casts: (String, String)*): DataFrame =
    casts.foldLeft(df) { case (d, (name, tpe)) => d.withColumn(name, col(name).cast(tpe)) }
}

/** Hook pipeline: re-expression of `BaseCopy.data_formatting`
  * (reference: pandas_to_postgres/_base_copy.py:146-166). Hooks are plain
  * `DataFrame => DataFrame` transforms, applied in order; because each
  * hook builds on the logical plan, Catalyst optimizes across hook
  * boundaries (e.g. a filter hook still pushes down to the scan).
  */
object Hooks {
  type Hook = DataFrame => DataFrame
  def pipeline(hooks: Seq[Hook])(df: DataFrame): DataFrame =
    hooks.foldLeft(df)((d, h) => h(d))
}

/** Chunking: re-expression of `df_generator` (reference:
  * pandas_to_postgres/utilities.py:96-117). The reference iterates row
  * ranges on one machine; the Spark-native equivalent is partition
  * sizing — a distributed property, not a driver loop.
  */
object Chunk {

  /** Repartition so each partition holds ~`rowsPerChunk` rows (computed
    * from a cheap count). Use before per-partition sinks (JDBC batch,
    * CSV part files) to bound memory per connection exactly like the
    * reference's csv_chunksize bounds StringIO size.
    */
  def byRows(df: DataFrame, rowsPerChunk: Long): DataFrame = {
    val n = df.count()
    val parts = math.max(1, math.ceil(n.toDouble / rowsPerChunk).toInt)
    df.repartition(parts)
  }

  /** Declarative variant for file sources: bound each chunk at the scan
    * by bytes instead of rows — zero extra passes; per-file-split
    * partitioning is the 100 TB-friendly version of chunking.
    *
    * Split sizing is a session conf consulted at *action* planning time,
    * so it is scoped as a bracket: the conf is set for the duration of
    * `body` (run your reads AND actions inside) and restored after, never
    * leaking into unrelated scans on the same session.
    */
  def withMaxSplitBytes[T](spark: org.apache.spark.sql.SparkSession, bytes: Long)(body: => T): T = {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, bytes.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
