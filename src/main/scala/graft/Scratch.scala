package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, 4)
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    // ShingleBlock on degenerate + unicode inputs: empty, punctuation-only,
    // null, short (<k words), exact-dup pair, unicode separators.
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, ""),
      (4L, "?!., --"),
      (5L, null.asInstanceOf[String]),
      (6L, "two words"),
      (7L, "héllo wörld héllo wörld naïve café")
    ).toDF("doc_id", "text")
    val blocked = probe
      .select(col("doc_id"), functions.exprs.shingle_block(col("text"), 3, 3).as("b"))
    blocked.show(10, truncate = false)
    // Parity probe: identical docs => identical (pfx, sh); empty/punct/null => null
    val rows = blocked.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
    assert(rows(1L) != null && rows(1L).toString == rows(2L).toString, "exact dups must match")
    assert(rows(3L) == null && rows(4L) == null && rows(5L) == null, "no-word docs must be null")
    assert(rows(6L) != null && rows(6L).getSeq[Long](1).length == 1, "short doc = one whole-text shingle")
    // Unicode: separators split on non-ASCII letters exactly like Text.canon
    val sparkWords = probe.where(col("doc_id") === 7L)
      .select(text.Text.words(col("text"))).collect()(0).getSeq[String](0)
    println(s"canon words of unicode doc: $sparkWords")
    assert(rows(7L).getSeq[Long](1).nonEmpty)

    // Plan of the rewritten ngram-jaccard query: expect a single parquet
    // scan of (doc_id, text), shingle_block inside project, one exchange
    // on pfx for the self-join.
    SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).explain("formatted")
    spark.stop()
  }
}
