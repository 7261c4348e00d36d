package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{MinHashSig, ShingleBlock, SimHash64, TextShingleMinHash}
import graft.plans.TopKStrategy

/** Session extensions: the graft custom operator strategy plus SQL
  * registration of the custom expressions, so `spark.sql("SELECT
  * text_minhash_sig(text)...")` works and TopKPerKey plans without the
  * lazy experimental-strategy hook.
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions)...
  * or config "spark.sql.extensions" = "graft.GraftExtensions".
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, default: Int): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case _ => default
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)

    e.injectFunction((
      FunctionIdentifier("text_minhash_sig"),
      new ExpressionInfo(classOf[TextShingleMinHash].getName, "text_minhash_sig"),
      (args: Seq[Expression]) =>
        TextShingleMinHash(
          args.head,
          if (args.length > 1) intArg(args(1), 128) else 128,
          if (args.length > 2) intArg(args(2), 3) else 3,
          42L)))

    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args.head, if (args.length > 1) intArg(args(1), 128) else 128, 42L)))

    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    e.injectFunction((
      FunctionIdentifier("shingle_block"),
      new ExpressionInfo(classOf[ShingleBlock].getName, "shingle_block"),
      (args: Seq[Expression]) =>
        ShingleBlock(
          args.head,
          if (args.length > 1) intArg(args(1), 3) else 3,
          if (args.length > 2) intArg(args(2), 3) else 3)))
  }
}
