package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    // PROBE 1: degenerate documents through text + dedup expressions
    val weird = Seq(
      (1L, ""),
      (2L, "   "),
      (3L, "!!! ??? ..."),
      (4L, "word"),
      (5L, "two words"),
      (6L, "ünïcödé tëxt ünïcödé tëxt"),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    import graft.text.Text
    weird
      .select(
        col("doc_id"),
        Text.wordCount(col("text")).as("wc"),
        Text.langId(col("text")).as("lang"),
        Text.punctCount(col("text")).as("punct"),
        Text.bpeTokenCount(col("text")).as("bpe"),
        Text.fingerprintMd5(col("text")).as("fp"),
        graft.functions.exprs.simhash64(Text.hashedArray(Text.words(col("text")))).as("sh"),
        graft.functions.exprs.minhash_sig(Text.hashedArray(Text.shingles(col("text"))), 4).as("mh"))
      .show(10, 32)

    // PROBE 2: dedup modules on degenerate corpus (must not crash)
    println("dedup exact on weird: " + graft.dedup.Dedup.exact(weird).count())
    println("minhash cands on weird: " + graft.dedup.Dedup.minhashCandidates(weird).count())
    println("simhash pairs on weird: " + graft.dedup.Dedup.simhashPairs(weird).count())

    // PROBE 3: ANN with nonexistent query id -> empty, no crash
    val emb = Tables.embeddings(spark, dir)
    println("ann missing qid rows: " +
      graft.ann.Ann.bruteForceTopK(emb, Seq(999999L), 5).count())
    println("ann lsh rows: " + graft.ann.Ann.lshTopK(emb, Seq(0L, 1L), 5).count())

    // PROBE 4: CSV sink -> source round trip preserves rows + nulls
    val part = Tables.part(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graftcsv").toString
    graft.sinks.CsvSink.write(part, s"$tmp/part")
    val back = graft.sources.Csv.read(spark, s"$tmp/part", part.schema)
    println(s"csv roundtrip: wrote ${part.count()} read ${back.count()} " +
      s"diff ${back.exceptAll(part).count()}")

    // PROBE 5: Normalize + ParallelLoad + LoadReport
    val (normed, missing) = graft.ops.Normalize.toSchema(
      part,
      StructType(Seq(
        StructField("p_partkey", LongType),
        StructField("p_retailprice", DecimalType(12, 2)),
        StructField("ghost_col", StringType))))
    println("normalize missing: " + missing + " schema: " + normed.schema.simpleString)
    val loads = Seq("region", "nation", "supplier").map { t =>
      t -> (() => Tables.load(spark, dir, t).count())
    }
    println("parallel load: " + graft.pipeline.ParallelLoad.run(spark, loads))
    val (obsDf, obs) = graft.pipeline.LoadReport.observed(Tables.nation(spark, dir), "nation")
    obsDf.write.mode("overwrite").parquet(s"$tmp/nation")
    println("load report: " + obs.get)

    // PROBE 6: multimodal plumbing
    val feats = graft.mm.Multimodal.extractFeatures(
      spark, graft.mm.Multimodal.mediaFrame(Tables.documents(spark, dir)))
    feats.show(3, 40)

    // PROBE 7: SqlLifecycle DDL plan (pure)
    val tc = graft.sinks.TableConstraints(
      "public.orders",
      Some(("orders_pk", Seq("o_orderkey"))),
      Seq(("orders_cust_fk", "(o_custkey) REFERENCES customer (c_custkey)")))
    graft.sinks.SqlLifecycle.preLoad(tc, Some("1GB")).foreach(println)
    graft.sinks.SqlLifecycle.postLoad(tc).foreach(println)

    spark.stop()
    println("ALL PROBES DONE")
  }
}
