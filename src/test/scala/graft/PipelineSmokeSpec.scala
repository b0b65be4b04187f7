package graft

import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.Transcripts

/** End-to-end smoke on the sf0.001 harness transcripts: the derived view has
  * one entity per conversation-owner, so clustering should recover ~one
  * cluster per customer and pairwise F1 vs the conv-derived gold should be
  * ~1.0. */
class PipelineSmokeSpec extends SparkSuite {

  lazy val transcripts = Transcripts.load(spark, "/root/testdata/sf0.001").cache()

  test("transcripts view: per-turn invariant shape") {
    val n = transcripts.count()
    assert(n === 1000L)
    val dup = transcripts.groupBy("conv_id", "turn_idx").count().filter(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("end-to-end: mentions -> pairs -> scores -> decode -> clusters -> F1") {
    val res = Pipeline.run(spark, transcripts,
      Pipeline.Config(mentionGenerator = "identifier"))
    val nm = res.mentions.count()
    assert(nm === 1000L, "one mention per turn by construction")

    val gold = res.mentions
      .select(col("mention_id"),
        regexp_extract(col("conv_id"), "^c([0-9]+)-", 1).as("entity_id"))
    val universe = Blocking.candidatePairs(res.mentions,
      graft.harness.Queries.harnessCfg.blocking)
    val f1row = Eval.pairwiseF1(
      universe.select("ant_id", "cur_id"), res.clusters, gold).collect()(0)
    val f1 = f1row.getAs[Double]("f1")
    info(s"pairwise F1 on harness view = $f1 (tp=${f1row.getAs[Long]("tp")}, " +
      s"pred=${f1row.getAs[Long]("pred_pairs")}, gold=${f1row.getAs[Long]("gold_pairs")})")
    assert(f1 >= 0.99, s"expected F1>=0.99, got $f1")

    // cluster count sanity: 15 customers at sf0.001
    val nClusters = res.clusters.select("cluster_id").distinct().count()
    info(s"clusters = $nClusters (entities = 15)")
    assert(nClusters <= 30L)
  }
}
