package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injection point: registers the engine's
  * native expressions as SQL functions, so `spark.sql("SELECT
  * simhash_text(text) ...")` works next to the Column API. Activate
  * with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * Scalar int/long arguments come in as literal expressions and are
  * extracted at registration (fold-ready literals only — consistent
  * with how Spark's own parameterized functions bind).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import SketchExprs._

  private def intArg(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be a literal, got $other")
  }

  private def longArg(e: Expression, name: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toLong
    case other => throw new IllegalArgumentException(
      s"$name must be a literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[SketchExprs.type].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash_text"),
      info("simhash_text", "simhash_text(text) - 64-bit SimHash of a document"),
      (args: Seq[Expression]) => SimHashText(args.head,
        SketchOps.xxFamily())))

    ext.injectFunction((FunctionIdentifier("minhash_text"),
      info("minhash_text",
        "minhash_text(text[, shingleSize, k, seed]) - MinHash signature"),
      (args: Seq[Expression]) => MinHashText(args.head,
        if (args.length > 1) intArg(args(1), "shingleSize") else 3,
        if (args.length > 2) intArg(args(2), "k") else 64,
        if (args.length > 3) longArg(args(3), "seed") else 42L,
        SketchOps.xxFamily())))

    ext.injectFunction((FunctionIdentifier("fingerprint_text"),
      info("fingerprint_text",
        "fingerprint_text(text[, shingleSize]) - winnowing fingerprint"),
      (args: Seq[Expression]) => FingerprintText(args.head,
        if (args.length > 1) intArg(args(1), "shingleSize") else 4,
        SketchOps.xxFamily())))

    ext.injectFunction((FunctionIdentifier("band_hashes"),
      info("band_hashes", "band_hashes(sig, bands) - LSH band hashes"),
      (args: Seq[Expression]) =>
        BandHashes(args.head, intArg(args(1), "bands"))))

    ext.injectFunction((FunctionIdentifier("sig_sim"),
      info("sig_sim", "sig_sim(a, b) - fraction of agreeing positions"),
      (args: Seq[Expression]) => SigSim(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product in double"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity in double"),
      (args: Seq[Expression]) => VecCosine(args(0), args(1))))

    // opt-in cardinality swap: count(DISTINCT x) -> HyperLogLog++
    // under spark.graft.approx.countDistinct (see the rule's scaladoc
    // for the semantics contract — default off, plans untouched)
    ext.injectOptimizerRule(_ => new graft.plans.ApproxDistinctRewrite)

    // opt-in quantile swap: percentile(x, p) -> approx_percentile
    // under spark.graft.approx.percentile (default off, plans
    // untouched; weighted/DISTINCT/disc forms stay exact)
    ext.injectOptimizerRule(_ => new graft.plans.ApproxPercentileRewrite)
  }
}
