package graft.sinks

import java.sql.Connection
import org.apache.spark.sql.{DataFrame, SaveMode}

/** DDL statement plan for the bulk-load lifecycle — the Spark-first
  * re-expression of the reference's constraint management
  * (reference: pandas_to_postgres/_base_copy.py:76-144): drop FKs and PK
  * (cascade), TRUNCATE, bulk load, recreate PK and FKs, ANALYZE, with
  * optional `maintenance_work_mem` for index rebuild speed
  * (hdf_to_postgres.py:88-91).
  *
  * Statement generation is pure (unit-testable with no database); the
  * `execute` helpers run against any `java.sql.Connection`.
  */
final case class TableConstraints(
    table: String,
    primaryKey: Option[(String, Seq[String])] = None, // (constraint name, cols)
    foreignKeys: Seq[(String, String)] = Nil // (constraint name, REFERENCES clause)
)

object SqlLifecycle {

  def dropFks(t: TableConstraints): Seq[String] =
    t.foreignKeys.map { case (name, _) =>
      s"ALTER TABLE ${t.table} DROP CONSTRAINT IF EXISTS $name"
    }

  def dropPk(t: TableConstraints): Seq[String] =
    t.primaryKey.toSeq.map { case (name, _) =>
      s"ALTER TABLE ${t.table} DROP CONSTRAINT IF EXISTS $name CASCADE"
    }

  def truncate(t: TableConstraints): Seq[String] =
    Seq(s"TRUNCATE TABLE ${t.table}")

  def createPk(t: TableConstraints): Seq[String] =
    t.primaryKey.toSeq.map { case (name, cols) =>
      s"ALTER TABLE ${t.table} ADD CONSTRAINT $name PRIMARY KEY (${cols.mkString(", ")})"
    }

  def createFks(t: TableConstraints): Seq[String] =
    t.foreignKeys.map { case (name, refs) =>
      s"ALTER TABLE ${t.table} ADD CONSTRAINT $name FOREIGN KEY $refs"
    }

  def analyze(t: TableConstraints): Seq[String] =
    Seq(s"ANALYZE ${t.table}")

  def maintenanceWorkMem(mem: String): Seq[String] =
    Seq(s"SET maintenance_work_mem TO '$mem'")

  /** The full pre-load and post-load statement plans, in lifecycle order. */
  def preLoad(t: TableConstraints, workMem: Option[String] = None): Seq[String] =
    workMem.toSeq.flatMap(maintenanceWorkMem) ++ dropFks(t) ++ dropPk(t) ++ truncate(t)

  def postLoad(t: TableConstraints): Seq[String] =
    createPk(t) ++ createFks(t) ++ analyze(t)

  def execute(conn: Connection, statements: Seq[String]): Unit = {
    val st = conn.createStatement()
    try statements.foreach(st.execute)
    finally st.close()
  }
}

/** Bulk JDBC sink — the COPY-analog. The reference streams CSV through a
  * single Postgres COPY on one connection; the Spark-native design opens
  * one connection *per partition* and writes batched inserts in parallel
  * (`numPartitions` bounds DB-side concurrency; `batchsize` bounds
  * round-trips; `rewriteBatchedInserts` turns batches into multi-row
  * inserts — the closest JDBC gets to COPY throughput, times N partitions).
  */
object JdbcBulkSink {
  def write(
      df: DataFrame,
      url: String,
      table: String,
      numPartitions: Int = 8,
      batchSize: Int = 10000,
      truncate: Boolean = true,
      props: Map[String, String] = Map.empty,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val writer = df
      .repartition(numPartitions)
      .write
      .mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("truncate", truncate.toString) // TRUNCATE instead of DROP on overwrite
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "READ_COMMITTED")
    props.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }.save()
  }

  /** Full lifecycle load: pre-load DDL → parallel bulk write → post-load
    * DDL, mirroring BaseCopy.copy()'s sequence (drop keys → truncate →
    * COPY → recreate keys → ANALYZE).
    */
  def loadWithLifecycle(
      df: DataFrame,
      url: String,
      constraints: TableConstraints,
      connFactory: () => Connection,
      numPartitions: Int = 8,
      workMem: Option[String] = None): Unit = {
    val conn = connFactory()
    try {
      SqlLifecycle.execute(conn, SqlLifecycle.preLoad(constraints, workMem))
      // preLoad already issued TRUNCATE into the existing table, so the bulk
      // write must APPEND: Overwrite would DROP and recreate the table,
      // destroying the DB-side DDL (types, indexes, defaults, grants) this
      // lifecycle exists to preserve (reference TRUNCATEs then COPYs into
      // the existing table, _base_copy.py:102-144).
      write(df, url, constraints.table, numPartitions, mode = SaveMode.Append)
      SqlLifecycle.execute(conn, SqlLifecycle.postLoad(constraints))
    } finally conn.close()
  }
}
