package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    import spark.implicits._

    // Degenerate inputs through the fused TextShingleMinHash
    val weird = Seq(
      (1L, ""), (2L, "   "), (3L, "!!!"), (4L, "word"),
      (5L, "two words"), (6L, "a b c d e"), (7L, null.asInstanceOf[String]),
      (8L, "A B C D E"), // case-folding: must equal doc 6's sig
      (9L, "a-b-c-d-e")  // separators: must equal doc 6's sig
    ).toDF("doc_id", "text")
    val sigs = weird.select(col("doc_id"),
      graft.functions.exprs.text_minhash_sig(col("text"), 8).as("sig")).collect()
    sigs.foreach(r => println(s"doc ${r.getLong(0)}: " +
      (if (r.isNullAt(1)) "NULL" else r.getSeq[Long](1).take(2).mkString(","))))
    val bySig = sigs.filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    println("6==8 (case): " + (bySig(6L) == bySig(8L)))
    println("6==9 (seps): " + (bySig(6L) == bySig(9L)))

    // dedup pipeline on tiny corpus still behaves
    println("minhash cands on weird: " + graft.dedup.Dedup.minhashCandidates(weird).count())
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "something else entirely different here")
    ).toDF("doc_id", "text")
    graft.dedup.Dedup.minhashCandidates(corpus, minEstJaccard = 0.3).show()
    spark.stop()
  }
}
