package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.Transcripts

/** Dev-only measurement main for the r06 optimization round (guide §1:
  * measure first; §1.4 noop-sink isolation; §1.5 labeled jobs). NOT part of
  * the driver contract — `Bench.scala` is the frozen artifact-of-record
  * harness; numbers from here are cited in OPTIMIZATION_r06.md only.
  *
  * Modes (args(0)): trainer | fold | sparse | ops | plans
  */
object BenchExtra {

  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    System.err.println(f"[extra] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    a
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.register(s)
    s
  }

  /** Pinned inputs mirroring Bench.sparseTrainInputs (frozen there). */
  private def trainInputs(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val cfg = Pipeline.Config(mentionGenerator = "identifier")
    val transcripts = Transcripts.load(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism, col("conv_id"))
    val mentions = Mentions.extractIdentifier(transcripts).localCheckpoint(true)
    val pairsAttr = Scoring.attachAttrs(
      Blocking.convBandPairs(mentions, cfg.blocking), mentions)
    val feats = SparseFeatures.featureStrings(pairsAttr,
      SparseFeatures.normCounts(mentions))
    val g = mentions.select(col("mention_id"),
      regexp_extract(col("conv_id"), "^c([0-9]+)-", 1).as("entity_id"))
    val labels = pairsAttr.select(col("ant_id"), col("cur_id"))
      .join(g.select(col("mention_id").as("ant_id"), col("entity_id").as("e_a")), "ant_id")
      .join(g.select(col("mention_id").as("cur_id"), col("entity_id").as("e_c")), "cur_id")
      .select(col("ant_id"), col("cur_id"),
        (col("e_a") === col("e_c")).cast("double").as("label"))
    (mentions, feats, labels)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mode = if (args.nonEmpty) args(0) else "all"
    val spark = session(cpus)
    val sc = spark.sparkContext

    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    def pinned(): Set[Int] = sc.getPersistentRDDs.keySet.toSet

    if (mode == "trainer" || mode == "all") {
      val (m, feats, labels) = trainInputs(spark, sfDir)
      val lab = labels.localCheckpoint(true)
      sc.setJobDescription("trainer: 3-epoch run")
      val epSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val before = pinned()
      t("trainer epochs=3 total") {
        graft.train.Trainer.trainSparseRankingDistributed(
          feats, lab, epochs = 3, epochSecondsOut = Some(epSecs))._1.count()
      }
      epSecs.zipWithIndex.foreach { case (s, i) =>
        System.err.println(f"[extra] trainer epoch $i: $s%.3f s") }
      release(pinned() -- before)
    }

    if (mode == "fold" || mode == "all") {
      // mirror the bench's st_cluster_fold: 4 conversation-sliced waves
      val cfg = Pipeline.Config(mentionGenerator = "identifier")
      val transcripts = Transcripts.load(spark, sfDir)
        .repartition(sc.defaultParallelism, col("conv_id")).cache()
      transcripts.count()
      val mentions = Mentions.extractIdentifier(transcripts).cache(); mentions.count()
      val surfaces = Blocking.surfaceTable(mentions).cache()
      val sPairs = Blocking.surfacePairs(surfaces, cfg.blocking).cache(); sPairs.count()
      val sScored = Scoring.scoreSurfacePairs(sPairs, surfaces, cfg.weights).cache()
      sScored.count()
      val bandAttr = Blocking.convBandPairsAttr(mentions, cfg.blocking)
      val band = Scoring.scorePairsAttr(bandAttr, cfg.weights)
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score"))
      val linked = sScored.filter(col("score") > cfg.linkThreshold)
        .select(col("norm_a"), col("norm_b"), col("block_key"), col("score"))
      val bridge = Blocking.bridgePairs(linked, mentions, cfg.blocking,
        extraCols = Seq("score"))
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score"))
      val chains = Blocking.sameSurfaceChainPairs(mentions, cfg.blocking, Some(surfaces))
        .join(Scoring.selfScores(surfaces, cfg.weights).hint("shuffle_hash"), "norm")
        .select(col("ant_id"), col("cur_id"), lit("x:chain").as("block_key"), col("score"))
      val scoredAll = band.unionByName(bridge).unionByName(chains).cache()
      scoredAll.count()
      val backptrs = Decode.backpointers(scoredAll, cfg.linkThreshold).cache()
      backptrs.count()
      for (rep <- 1 to 2) {
        t(s"st_cluster_fold rep$rep (4 waves)") {
          var st = graft.streaming.StreamingClusters.empty(spark)
          for (w <- 0 until 4) {
            sc.setJobDescription(s"fold wave $w")
            st = t(s"  wave $w") {
              graft.streaming.StreamingClusters.update(spark, st,
                backptrs.filter(
                  pmod(xxhash64(graft.functions.convOfMentionId(col("cur_id"))), lit(4)) === w)
                  .select(col("cur_id"), col("ant_id"), col("score")))
            }
          }
          st.pins.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        }
      }
      // clustering isolation
      for (rep <- 1 to 2)
        t(s"er_clustering rep$rep")(Clustering.cluster(spark, mentions, backptrs).count())
      // decode isolation
      for (rep <- 1 to 2)
        t(s"er_decode rep$rep")(Decode.backpointers(scoredAll, cfg.linkThreshold).count())
      Seq(transcripts, mentions, surfaces, sPairs, sScored, scoredAll, backptrs)
        .foreach(_.unpersist())
    }

    if (mode == "sparse" || mode == "all") {
      val cfg = Pipeline.Config(mentionGenerator = "identifier")
      val transcripts = Transcripts.load(spark, sfDir)
        .repartition(sc.defaultParallelism, col("conv_id")).cache()
      transcripts.count()
      val mentions = Mentions.extractIdentifier(transcripts).cache(); mentions.count()
      val surfaces = Blocking.surfaceTable(mentions).cache()
      val sPairs = Blocking.surfacePairs(surfaces, cfg.blocking).cache(); sPairs.count()
      // weights as the bench builds them
      val (m2, feats2, labels2) = trainInputs(spark, sfDir)
      val w = SparseFeatures.logOddsWeights(feats2, labels2).localCheckpoint(true)
      t("sparse weights count")(w.count())
      lazy val counts = SparseFeatures.normCounts(mentions)
      val wmap = t("collectWeights")(SparseFeatures.collectWeights(w)).get
      for (rep <- 1 to 2) {
        t(s"surface scores fast rep$rep")(noop(
          SparseFeatures.scoreSurfacePairsSparseFast(sPairs, surfaces, counts, wmap)))
      }
      val bandAttr = Blocking.convBandPairsAttr(mentions, cfg.blocking)
      for (rep <- 1 to 2) {
        t(s"band scores fast rep$rep")(noop(
          SparseFeatures.scoreAttachedSparseFast(bandAttr, counts, wmap)))
      }
      t("self scores fast")(noop(
        SparseFeatures.selfScoresSparseFast(surfaces, counts, wmap)))
      t("chains (keepInBand)")(noop(
        Blocking.sameSurfaceChainPairs(mentions, cfg.blocking, Some(surfaces),
          keepInBand = true)))
      // dense legs for comparison
      for (rep <- 1 to 2) {
        t(s"band scores dense rep$rep")(noop(
          Scoring.scorePairsAttr(bandAttr, cfg.weights)))
      }
      for (rep <- 1 to 2) {
        t(s"surface scores dense rep$rep")(noop(
          Scoring.scoreSurfacePairs(sPairs, surfaces, cfg.weights)))
      }
      t("mentions (noop)")(noop(Mentions.extractIdentifier(transcripts)))
      for (rep <- 1 to 2) {
        t(s"blocking surfacePairs rep$rep")(
          Blocking.surfacePairs(surfaces, cfg.blocking).count())
      }
      Seq(transcripts, mentions, surfaces, sPairs).foreach(_.unpersist())
    }

    if (mode == "ops" || mode == "all") {
      Transcripts.registerBase(spark, sfDir)
      val docs = spark.table("documents").repartition(sc.defaultParallelism).cache()
      docs.count()
      val corpus = graft.ops.Dedup.corpus(docs)
      for (rep <- 1 to 2) {
        t(s"dd_minhash_lsh rep$rep")(graft.ops.Dedup.minhashLsh(corpus).count())
      }
      // sub-stages
      val withSh = corpus.select(col("doc_id"),
        graft.ops.Dedup.wordShingles(col("text")).as("sh"))
      t("minhash: shingles only")(noop(withSh))
      val keyed = withSh.select(col("doc_id"),
        explode(graft.functions.lshBandKeysDirect(col("sh"), 6, 2, "xxhash64")).as("bk"))
      t("minhash: band keys")(noop(keyed))
      val cands = keyed.select(col("bk"), col("doc_id").as("doc_a"))
        .join(keyed.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      t("minhash: candidates")(cands.count())
      for (rep <- 1 to 2)
        t(s"dd_simhash rep$rep")(graft.ops.Dedup.simhash(corpus).count())
      for (rep <- 1 to 2)
        t(s"dd_ngram_jaccard rep$rep")(graft.ops.Dedup.ngramJaccard(corpus).count())
      for (rep <- 1 to 2)
        t(s"dd_exact rep$rep")(graft.ops.Dedup.exact(corpus).count())
      for (rep <- 1 to 2)
        t(s"dd_canonical rep$rep")(graft.ops.Dedup.canonicalize(
          graft.ops.Dedup.minhashLsh(corpus).select(col("doc_a"), col("doc_b"))).count())
      val embs = spark.table("embeddings")
      val ecorp = graft.ops.Similarity.corpus(embs)
      for (rep <- 1 to 2)
        t(s"sim_topk_brute rep$rep")(graft.ops.Similarity.bruteTopK(ecorp).count())
      for (rep <- 1 to 2)
        t(s"sim_ann_lsh rep$rep")(graft.ops.Similarity.annLsh(ecorp).count())
      for (rep <- 1 to 2)
        t(s"sim_ann_ivf rep$rep")(graft.ops.Similarity.annIvf(ecorp).count())
      for (rep <- 1 to 2)
        t(s"dd_embedding rep$rep")(graft.ops.Similarity.embeddingNearDup(ecorp).count())
      docs.unpersist()
    }

    if (mode == "opsdeep") {
      Transcripts.registerBase(spark, sfDir)
      val embs = spark.table("embeddings")
      val ecorp = graft.ops.Similarity.corpus(embs)
      for (rep <- 1 to 2) {
        val keyed = t(s"lshKeys pin rep$rep")(
          graft.ops.Similarity.lshKeys(ecorp, 8, 4, 42L).localCheckpoint(true))
        val cands = keyed.select(col("bucket"), col("vec_id").as("vec_a"))
          .join(keyed.select(col("bucket"), col("vec_id").as("vec_b")), Seq("bucket"))
          .filter(col("vec_a") < col("vec_b"))
          .select("vec_a", "vec_b").distinct()
        val n = t(s"cands count rep$rep")(cands.count())
        System.err.println(s"[extra] n_cands=$n")
        t(s"embeddingNearDup full rep$rep")(
          graft.ops.Similarity.embeddingNearDup(ecorp).count())
        // plan-only cost: analysis + optimization, no execution
        t(s"plan-only rep$rep") {
          graft.ops.Similarity.embeddingNearDup(ecorp).queryExecution.executedPlan
        }
      }
      val docs = spark.table("documents").repartition(sc.defaultParallelism).cache()
      docs.count()
      val corpus = graft.ops.Dedup.corpus(docs)
      for (rep <- 1 to 2) {
        t(s"minhash plan-only rep$rep") {
          graft.ops.Dedup.minhashLsh(corpus).queryExecution.executedPlan
        }
        t(s"minhash full rep$rep")(graft.ops.Dedup.minhashLsh(corpus).count())
      }
    }

    if (mode == "plans") {
      // args(1) = output tag ("before"/"after"), args(2..) = query names
      // (default: the r06-touched set). Writes plans/r06/<q>_<tag>.txt with
      // the .explain("formatted") output of the DECLARED query's DataFrame.
      val tag = if (args.length > 1) args(1) else "after"
      val qs = if (args.length > 2) args.drop(2).toSeq else Seq(
        "b1_candidate_pairs", "p_surface_pairs", "p2_surface_scores_all",
        "p11b_sparse_fast", "c1_clusters", "c2_incremental_edit",
        "c2b_stream_fold", "dd_embedding", "sim_topk_brute", "sim_ann_lsh",
        "sim_ann_ivf")
      val dir = java.nio.file.Paths.get("plans/r06")
      java.nio.file.Files.createDirectories(dir)
      val queryMap = graft.SparkEntry.queries
      val planSf = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
      qs.foreach { q =>
        val df = queryMap(q)(spark, planSf)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${q}_$tag.txt"), txt)
        System.err.println(s"[extra] wrote plan ${q}_$tag (${txt.length} chars)")
      }
      graft.harness.Queries.clearCache()
    }

    if (mode == "plansurf") {
      // The surfacePairs result is localCheckpoint-pinned, so the declared
      // queries' explain output hides the gate's plan change behind a
      // LogicalRDD leaf. Dump the PRE-checkpoint plan of both shapes
      // (reconstructed from the public pieces) so the exchange-count claim
      // is auditable: old = keys cache + blockStats aggregate + join-back +
      // hinted self-join; new = window gate + partitioning-aligned self-join.
      import org.apache.spark.sql.expressions.Window
      val cfg = Pipeline.Config(mentionGenerator = "identifier").blocking
      val transcripts = Transcripts.load(spark, sys.env.getOrElse(
        "SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001"))
      val mentions = Mentions.extractIdentifier(transcripts)
      val surfaces = Blocking.surfaceTable(mentions)
      val dir = java.nio.file.Paths.get("plans/r06")
      java.nio.file.Files.createDirectories(dir)
      def dump(name: String, df: DataFrame): Unit = {
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(name), txt)
        System.err.println(s"[extra] wrote $name (${txt.length} chars)")
      }
      // old shape (pre-r06), reconstructed
      val keys = Blocking.blockKeys(surfaces, cfg)
      val sizedOld = keys.join(
        Blocking.blockStats(keys, surfaces, cfg)
          .filter(!col("oversize")).select(col("block_key")), Seq("block_key"))
      val oldPairs = sizedOld.select(col("block_key"), col("norm").as("norm_a"))
        .join(sizedOld.select(col("block_key"), col("norm").as("norm_b"))
          .hint("shuffle_hash"), Seq("block_key"))
        .filter(col("norm_a") < col("norm_b"))
        .groupBy(col("norm_a"), col("norm_b"))
        .agg(min(col("block_key")).as("block_key"))
      dump("surface_pairs_gate_before.txt", oldPairs)
      // new shape (the surfacePairs body, sans checkpoint)
      val keysN = Blocking.blockKeys(surfaces, cfg)
        .join(surfaces.select(col("norm"), col("n_mentions")), "norm")
      val w = Window.partitionBy(col("block_key"))
      val sizedN = keysN
        .withColumn("n_surfaces", count(lit(1)).over(w))
        .withColumn("mention_mass", sum(col("n_mentions")).over(w))
        .filter(!(col("n_surfaces") > cfg.maxBlockSize ||
          col("mention_mass") > cfg.maxBlockMass))
        .select(col("block_key"), col("norm"))
      val newPairs = sizedN.select(col("block_key"), col("norm").as("norm_a"))
        .join(sizedN.select(col("block_key"), col("norm").as("norm_b")), Seq("block_key"))
        .filter(col("norm_a") < col("norm_b"))
        .groupBy(col("norm_a"), col("norm_b"))
        .agg(min(col("block_key")).as("block_key"))
      dump("surface_pairs_gate_after.txt", newPairs)
    }

    if (mode == "ccdist") {
      // VERDICT r05 item 4: run the full sf clustering through the
      // DISTRIBUTED checkpointed CC loop (both driver fast paths disabled)
      // and record its wall time beside the hybrid number — plus the
      // persistent-RDD census across the loop to show the new per-iteration
      // pin release holds in anger.
      val cfg = Pipeline.Config(mentionGenerator = "identifier")
      val transcripts = Transcripts.load(spark, sfDir)
        .repartition(sc.defaultParallelism, col("conv_id")).cache()
      transcripts.count()
      val mentions = Mentions.extractIdentifier(transcripts).cache(); mentions.count()
      val surfaces = Blocking.surfaceTable(mentions).cache()
      val sPairs = Blocking.surfacePairs(surfaces, cfg.blocking).cache(); sPairs.count()
      val sScored = Scoring.scoreSurfacePairs(sPairs, surfaces, cfg.weights).cache()
      sScored.count()
      val bandAttr = Blocking.convBandPairsAttr(mentions, cfg.blocking)
      val band = Scoring.scorePairsAttr(bandAttr, cfg.weights)
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score"))
      val linked = sScored.filter(col("score") > cfg.linkThreshold)
        .select(col("norm_a"), col("norm_b"), col("block_key"), col("score"))
      val bridge = Blocking.bridgePairs(linked, mentions, cfg.blocking,
        extraCols = Seq("score"))
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score"))
      val chains = Blocking.sameSurfaceChainPairs(mentions, cfg.blocking, Some(surfaces))
        .join(Scoring.selfScores(surfaces, cfg.weights).hint("shuffle_hash"), "norm")
        .select(col("ant_id"), col("cur_id"), lit("x:chain").as("block_key"), col("score"))
      val scoredAll = band.unionByName(bridge).unionByName(chains).cache()
      scoredAll.count()
      val backptrs = Decode.backpointers(scoredAll, cfg.linkThreshold).cache()
      backptrs.count()
      for (rep <- 1 to 2)
        t(s"er_clustering hybrid rep$rep")(
          Clustering.cluster(spark, mentions, backptrs).count())
      val savedC = Clustering.maxDriverContractedEdges
      val savedD = Clustering.maxDriverEdges
      try {
        Clustering.maxDriverContractedEdges = 0
        Clustering.maxDriverEdges = 0
        for (rep <- 1 to 2) {
          val pinsBefore = sc.getPersistentRDDs.size
          t(s"er_clustering DISTRIBUTED rep$rep")(
            Clustering.cluster(spark, mentions, backptrs).count())
          System.err.println(s"[extra] persistent RDDs before=$pinsBefore " +
            s"after=${sc.getPersistentRDDs.size}")
        }
        // equality evidence: distributed labels == hybrid labels
        Clustering.maxDriverContractedEdges = savedC
        Clustering.maxDriverEdges = savedD
        val hybrid = Clustering.cluster(spark, mentions, backptrs)
        Clustering.maxDriverContractedEdges = 0
        Clustering.maxDriverEdges = 0
        val dist = Clustering.cluster(spark, mentions, backptrs)
        val diff = hybrid.unionByName(dist).groupBy(col("mention_id"))
          .agg(countDistinct(col("cluster_id")).as("n"))
          .filter(col("n") > 1).count()
        System.err.println(s"[extra] distributed-vs-hybrid label diffs: $diff")
      } finally {
        Clustering.maxDriverContractedEdges = savedC
        Clustering.maxDriverEdges = savedD
      }
    }

    if (mode == "joint" || mode == "all") {
      val cfgX = Pipeline.Config(mentionGenerator = "identifier")
      val (mX, _, _) = trainInputs(spark, sfDir)
      val priorsX = graft.joint.JointInference.typePriors(mX).localCheckpoint(true)
      val arcsX = Scoring.scorePairsAttr(
          Blocking.convBandPairsAttr(mX, cfgX.blocking), cfgX.weights)
        .select(col("ant_id"), col("cur_id"), col("score")).localCheckpoint(true)
      for (rep <- 1 to 2) {
        t(s"er_joint_decode rep$rep")(
          graft.joint.JointInference.infer(spark, priorsX, arcsX,
            coupling = 1.0, iters = 6, algorithm = "bp").count())
      }
    }

    spark.stop()
  }
}
