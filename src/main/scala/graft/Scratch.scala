package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/mh_debug"
    val spark = GraftSession.local(8, 8)
    val docs = Tables.documents(spark, dir)

    // minhash signatures (pre-banding)
    dedup.Dedup.signatures(docs).where(col("sig").isNotNull)
      .write.mode("overwrite").parquet(s"$out/sigs")

    // banded frame: (doc_id, band, bh) exactly as minhashCandidates builds it
    val k = 128; val bands = 16; val rows = k / bands
    dedup.Dedup.signatures(docs).where(col("sig").isNotNull)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            j => struct(j.as("band"), xxhash64(j, slice(col("sig"), j * rows + 1, lit(rows))).as("bh"))))
          .as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .write.mode("overwrite").parquet(s"$out/banded")

    // simhash sketches + the per-word xxhash64 token arrays feeding them
    docs.select(col("doc_id"), text.Text.words(col("text")).as("words"))
      .select(col("doc_id"), col("words"), text.Text.hashedArray(col("words")).as("wh"))
      .write.mode("overwrite").parquet(s"$out/wordhashes")
    docs.select(col("doc_id"), graft.functions.exprs.simhash64(
        text.Text.hashedArray(text.Text.words(col("text")))).as("sh"))
      .where(col("sh").isNotNull)
      .write.mode("overwrite").parquet(s"$out/sims")

    println("DUMPED to " + out)
    spark.stop()
  }
}
