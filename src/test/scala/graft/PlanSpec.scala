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

  test("fast sparse band scoring is a pure projection: no aggregate, no weight join") {
    import org.apache.spark.sql.functions.col
    // pin the inputs (mentions + F5 counts) so the asserted plan is the
    // SCORING stage alone, not the upstream extraction/count aggregates
    val m = graft.pipeline.Mentions.extractIdentifier(
      graft.sources.Transcripts.load(spark, sf)).localCheckpoint(true)
    val counts = graft.pipeline.SparseFeatures.normCounts(m).localCheckpoint(true)
    val pairs = graft.pipeline.Blocking.convBandPairs(m)
    val pairsAttr = graft.pipeline.Scoring.attachAttrs(pairs, m)
    val feats = graft.pipeline.SparseFeatures.featureStrings(pairsAttr, counts)
    val labels = pairsAttr.select(col("ant_id"), col("cur_id"),
      (col("head_key_a") === col("head_key_c")).cast("double").as("label"))
    val w = graft.pipeline.SparseFeatures.logOddsWeights(feats, labels)
    val wmap = graft.pipeline.SparseFeatures.collectWeights(w).get
    val fast = graft.pipeline.SparseFeatures.scorePairsSparseFast(pairs, m, counts, wmap)
    val plan = fast.queryExecution.executedPlan.toString
    // the join plan carries explode + HashAggregate x2 (partial+final) + the
    // weight join; the broadcast fast plan must have NONE of them — that IS
    // the optimization, asserted structurally so a regression can't hide
    // behind a warm benchmark
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      "fast sparse scoring must not aggregate")
    assert(!plan.contains("Generate"), "fast sparse scoring must not explode")
    assert(plan.contains("sparseweightsum") || plan.contains("SparseWeightSum"),
      s"fast plan must score via the SparseWeightSum expression")
    assert(!hasCartesian(fast))
    // and the expression must actually CODEGEN — a janino failure would
    // silently fall back to interpreted eval and erase the perf win
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(fast.limit(5).collect().length > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
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
