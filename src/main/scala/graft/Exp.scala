package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.ErFixture
import graft.pipeline._
import graft.train.Trainer

/** Dev-only experiment main: fixture F1 for trainer/sparse variants (used to
  * set the spec gates honestly). Not part of the driver contract. */
object Exp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-exp")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.register(spark)
    import ErFixture._

    val g = generate(entities = 20, convs = 60, seed = 42L)
    val transcripts = transcriptsDF(spark, g).cache()
    val base = Pipeline.run(spark, transcripts, Pipeline.Config(mentionGenerator = "all"))
    val mentions = base.mentions.cache()
    val gold = mentions
      .join(goldDF(spark, g), Seq("conv_id", "turn_idx", "start", "end"))
      .select(col("mention_id"), col("entity_id").cast("string").as("entity_id")).cache()
    val universe = Blocking.candidatePairs(mentions).cache()

    def f1Row(clusters: org.apache.spark.sql.DataFrame): String = {
      val r = Eval.pairwiseF1(universe.select("ant_id", "cur_id"), clusters, gold).collect()(0)
      f"P=${r.getAs[Double]("precision")}%.5f R=${r.getAs[Double]("recall")}%.5f F1=${r.getAs[Double]("f1")}%.5f"
    }

    println(s"default      : ${f1Row(base.clusters)}")

    val pairsAttr = Scoring.attachAttrs(universe, mentions)
    val feats = SparseFeatures.featureStrings(pairsAttr,
      SparseFeatures.normCounts(mentions)).localCheckpoint(true)
    val labels = universe.select(col("ant_id"), col("cur_id"))
      .join(gold.select(col("mention_id").as("ant_id"), col("entity_id").as("e_a")), "ant_id")
      .join(gold.select(col("mention_id").as("cur_id"), col("entity_id").as("e_c")), "cur_id")
      .select(col("ant_id"), col("cur_id"), (col("e_a") === col("e_c")).cast("double").as("label"))
      .localCheckpoint(true)
    val dict = SparseFeatures.dictionary(feats)
    val nbScored = SparseFeatures.scoreSparse(feats,
      SparseFeatures.logOddsWeights(feats, labels))
    println(s"sparse NB    : ${f1Row(Clustering.cluster(spark, mentions,
      Decode.backpointers(nbScored, 0.0)))}  nFeats=${dict.count()}")

    val (sw, st) = Trainer.trainSparseRanking(feats, labels, epochs = 30, eta = 1.0)
    val cl = Clustering.cluster(spark, mentions,
      Decode.backpointers(Trainer.scoreSparseWith(feats, sw), 0.0))
    println(f"sparseRank   : ${f1Row(cl)}  loss=${st.last._2}%.4f nW=${sw.size}")

    // G4 on the harder seed-7 fixture: does longer training close the gap?
    {
      val g7 = generate(entities = 20, convs = 60, seed = 7L)
      val t7 = transcriptsDF(spark, g7).cache()
      val b7 = Pipeline.run(spark, t7, Pipeline.Config(mentionGenerator = "all"))
      val m7 = b7.mentions.cache()
      val gold7 = m7.join(goldDF(spark, g7), Seq("conv_id", "turn_idx", "start", "end"))
        .select(col("mention_id"), col("entity_id").cast("string").as("entity_id")).cache()
      val u7 = Blocking.candidatePairs(m7).cache()
      def row7(w: Scoring.Weights): String = {
        val res = Pipeline.run(spark, t7, Pipeline.Config(mentionGenerator = "all", weights = w))
        val r = Eval.pairwiseF1(u7.select("ant_id", "cur_id"), res.clusters, gold7).collect()(0)
        f"P=${r.getAs[Double]("precision")}%.5f R=${r.getAs[Double]("recall")}%.5f F1=${r.getAs[Double]("f1")}%.5f"
      }
      val lab7 = Trainer.labeledPairs(u7, m7, gold7).localCheckpoint(true)
      for ((ep, eta) <- Seq((40, 2.0), (120, 2.0), (120, 4.0))) {
        val (aug, at) = Trainer.trainRanking(lab7, epochs = ep, eta = eta,
          lossFn = Trainer.LossFn.Custom)
        println(f"s7 aug($ep,$eta) : ${row7(aug)}  loss=${at.last.loss}%.4f")
      }
      val (pl, pt) = Trainer.trainRanking(lab7, epochs = 40, eta = 2.0)
      println(f"s7 plain(40,2.0): ${row7(pl)}  loss=${pt.last.loss}%.4f")
    }
    spark.stop()
  }
}
