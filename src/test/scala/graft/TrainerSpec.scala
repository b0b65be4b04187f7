package graft

import org.apache.spark.sql.functions._
import graft.fixtures.ErFixture
import graft.pipeline._
import graft.train.Trainer

/** T1: the Adagrad+L1 logistic trainer learns weights on the fixture that
  * match the hand-set default's cluster quality. */
class TrainerSpec extends SparkSuite {
  import ErFixture._

  test("trained weights reach F1 >= 0.99 on the fixture; loss decreases") {
    val g = generate(entities = 20, convs = 60, seed = 42L)
    val transcripts = transcriptsDF(spark, g).cache()
    val base = Pipeline.run(spark, transcripts, Pipeline.Config(mentionGenerator = "all"))
    val mentions = base.mentions.cache()
    val gold = mentions
      .join(goldDF(spark, g), Seq("conv_id", "turn_idx", "start", "end"))
      .select(col("mention_id"), col("entity_id").cast("string").as("entity_id")).cache()

    val labeled = Trainer.labeledPairs(Blocking.candidatePairs(mentions), mentions, gold)
    val (learned, trace) = Trainer.trainRanking(labeled, epochs = 40, eta = 2.0)
    info(s"loss: first=${trace.head.loss} last=${trace.last.loss}")
    info(s"weights: ${Scoring.FeatureNames.zip(learned.values).mkString(", ")}")
    assert(trace.last.loss < trace.head.loss * 0.5, "loss must decrease substantially")

    // decode + cluster with the learned weights
    val res = Pipeline.run(spark, transcripts,
      Pipeline.Config(mentionGenerator = "all", weights = learned))
    val f1 = Eval.pairwiseF1(
      Blocking.candidatePairs(res.mentions).select("ant_id", "cur_id"), res.clusters, gold)
      .collect()(0)
    info(s"trained-weights pairwise F1: $f1")
    assert(f1.getAs[Double]("f1") >= 0.99, s"trained model must hit the F1 gate: $f1")
  }
}
