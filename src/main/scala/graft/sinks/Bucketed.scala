package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed persistent tables: pre-shuffled storage so equi-joins and
  * aggregations on the bucket key plan with NO exchange — the write-time
  * amortization of the shuffle that the reference cannot express at all
  * (Postgres-side indexes are its only post-load acceleration).
  *
  * At 100 TB this is the canonical co-located join strategy: bucket the
  * fact tables by join key once at ingest; every subsequent fact-fact
  * join is exchange-free. See BucketedSpec for the plan-level proof.
  */
object Bucketed {

  def write(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    // A fresh session's in-memory catalog doesn't know tables written by a
    // previous one, but their warehouse directories survive — Overwrite
    // then fails with LOCATION_ALREADY_EXISTS. Drop and clean first.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }
}
