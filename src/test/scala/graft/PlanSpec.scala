package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: the properties that make these
  * operators survive a 100x scale-up are asserted on the actual plans,
  * not just claimed — filter pushdown to the parquet scan, column
  * pruning, broadcast for small dimensions, and shuffle-freedom of the
  * sketch signature stages. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter + projection reach the parquet scan (pushdown, pruning)") {
    val q = graft.queries.Relational.queries("q02_project_filter")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("PushedFilters: ["), "filters must push to scan")
    assert(plan.contains("GreaterThan(l_quantity"), plan)
    // projection pruning: the scan reads only the needed columns, not
    // the 16-column lineitem schema
    val readSchema = plan.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan must prune unused columns: $readSchema")
  }

  test("small-dimension join broadcasts (no shuffle of the fact side)") {
    val q = graft.queries.Relational.queries("q04_join_broadcast")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("minhash/simhash signature stages are shuffle-free narrow maps") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sigPlan = planOf(Dedup.minHashSignatures(docs))
    assert(!sigPlan.contains("Exchange"),
      s"signature stage must not shuffle:\n${sigPlan.take(1500)}")
    val shPlan = planOf(Dedup.simHash(docs))
    assert(!shPlan.contains("Exchange"),
      s"simhash stage must not shuffle:\n${shPlan.take(1500)}")
  }

  test("native sketch expressions stay inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = planOf(Dedup.simHash(docs))
    // formatted mode marks codegen'd operators with '*': the project
    // containing simhash_text AND the token-count filter must both be
    // inside whole-stage codegen (no CodegenFallback interpretation)
    assert(plan.contains("* Project"), plan.take(1500))
    assert(plan.contains("* Filter"), plan.take(1500))
    assert(plan.contains("simhash_text"), plan.take(1500))
  }

  test("IVF cell assignment is a narrow projection over the corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = graft.llm.Similarity.collectCentroids(emb, 8)
    val plan = planOf(graft.llm.Similarity.assignCells(emb, cents))
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
