package graft

import org.apache.spark.sql.functions._
import graft.fixtures.ErFixture
import graft.pipeline._
import graft.train.Trainer

/** B3/T3: k-fold pruning models — fold assignment partitions conversations,
  * each model is trained out-of-fold, and the resulting coarse scores prune
  * aggressively while keeping gold antecedents (the reference's
  * MAKE_MASK_MODELS purpose, `CorefPruner.scala:100-153`). */
class KFoldSpec extends SparkSuite {
  import ErFixture._

  test("k-fold models: partition, out-of-fold coverage, pruning recall") {
    val g = generate(entities = 20, convs = 60, seed = 42L)
    val transcripts = transcriptsDF(spark, g).cache()
    val base = Pipeline.run(spark, transcripts, Pipeline.Config(mentionGenerator = "all"))
    val mentions = base.mentions.cache()
    val gold = mentions
      .join(goldDF(spark, g), Seq("conv_id", "turn_idx", "start", "end"))
      .select(col("mention_id"), col("entity_id").cast("string").as("entity_id")).cache()
    val labeled = Trainer.labeledPairs(
      Blocking.candidatePairs(mentions), mentions, gold).cache()

    val k = 3
    // fold is a function of the conversation: every conv lands in one fold
    val folds = labeled
      .withColumn("fold", pmod(xxhash64(col("conv_id_c")), lit(k)).cast("int"))
      .groupBy(col("conv_id_c")).agg(countDistinct(col("fold")).as("nf"))
    assert(folds.filter(col("nf") =!= 1).count() === 0L)

    val models = Trainer.kFoldModels(labeled, k = k, epochs = 15, eta = 2.0)
    assert(models.size === k)
    assert(models.map(_._2.values.toSeq).distinct.size === k,
      "fold models trained on different data must differ")

    val oof = Trainer.scoreOutOfFold(labeled, models).cache()
    assert(oof.count() === labeled.count(), "out-of-fold union must cover every pair")

    // the coarse-model purpose: prune hard, keep gold antecedents
    val pruned = Decode.prune(
      oof.select(col("ant_id"), col("cur_id"), col("score"), col("label")),
      logThreshold = -2.0).cache()
    val keptFrac = pruned.count().toDouble / labeled.count()
    // the reference's pruning stat (DocumentGraph.scala:117-142): an
    // anaphoric mention must RETAIN >=1 gold antecedent — not every gold
    // pair (distant same-entity antecedents are exactly what pruning drops)
    val anaphoric = labeled.filter(col("label") === 1.0)
      .select(col("cur_id")).distinct().count().toDouble
    val retained = pruned.filter(col("label") === 1.0)
      .select(col("cur_id")).distinct().count().toDouble
    info(f"pruning kept ${keptFrac * 100}%.1f%% of pairs; antecedent recall ${retained / anaphoric * 100}%.2f%%")
    assert(keptFrac <= 0.9, "the coarse model must actually prune")
    assert(retained / anaphoric >= 0.98,
      "pruning must retain a gold antecedent for nearly every anaphoric mention")
  }
}
