package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import graft.harness.Queries

/** Plan-shape audits: the properties that make these queries survive a
  * 100x scale-up are asserted on the optimized plans themselves, not just
  * timed — no cartesian products in any execution-path query, and no
  * partitionless (one-task) window anywhere in the hot path. */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def optimized(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan

  private def hasCartesian(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("CartesianProduct")

  /** Window operators whose partitionSpec is empty = global one-task sort. */
  private def partitionlessWindows(plan: LogicalPlan): Seq[LWindow] =
    plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }

  test("a13 bootstrap: no cross join, no partitionless window") {
    val df = Queries.a13Bootstrap(spark, sf)
    assert(!hasCartesian(df), "Poisson bootstrap must not cross-join")
    assert(partitionlessWindows(optimized(df)).isEmpty,
      "no global-order window (the old dense-index plan funneled one task)")
  }

  test("sparse scoring path: no cross join") {
    val df = Queries.p10SparseScores(spark, sf)
    assert(!hasCartesian(df))
  }

  test("pipeline scored pairs: no cross join, windows all partitioned") {
    val r = Queries.pipeline(spark, sf)
    assert(!hasCartesian(r.scored))
    assert(partitionlessWindows(optimized(r.scored)).isEmpty)
    assert(!hasCartesian(r.clusters))
  }

  test("band pair join is an equi-join on conv_id (no broadcast NL)") {
    val plan = Queries.pipeline(spark, sf).scored.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the conversation band must join on keys, never nested-loop")
  }
}
