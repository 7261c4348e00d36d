package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    import spark.implicits._

    // entry() as the driver will call it
    val e = SparkEntry.entry(spark)
    println(s"entry rows: ${e.count()}")
    e.show(5, 40)

    // degenerate corpus through CorpusPrep: dups, empties, nulls, low-quality
    val weird = Seq(
      (1L, "good unique document with enough distinct words here", "en", "s", 50L),
      (2L, "good unique document with enough distinct words here", "en", "s", 50L), // exact dup
      (3L, "good unique document with enough distinct words here plus tail dup", "en", "s", 60L), // near dup
      (4L, "", "en", "s", 0L),
      (5L, null.asInstanceOf[String], "en", "s", 0L),
      (6L, "word word word word word word word word word word", "en", "s", 40L), // low uniq ratio
      (7L, "tiny", "en", "s", 4L) // below min words
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val cleaned = pipeline.CorpusPrep.clean(weird, minWords = 5, minEstJaccard = 0.5)
    println("cleaned degenerate corpus:")
    cleaned.orderBy("doc_id").show(10, 40)
    spark.stop()
  }
}
