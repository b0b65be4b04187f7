package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling main: times sub-stages of the operators the round-2
  * bench flagged (dd_minhash_lsh, dd_exact, clustering) to localize the
  * regression before touching code. Not part of the driver contract. */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.register(spark)
    graft.sources.Transcripts.registerBase(spark, sfDir)

    val docs = spark.table("documents").repartition(32).cache()
    t("docs count")(docs.count())

    val corpus = graft.ops.Dedup.corpus(docs)
    t("corpus count")(corpus.count())
    t("dd_exact 1")(graft.ops.Dedup.exact(corpus).count())
    t("dd_exact 2")(graft.ops.Dedup.exact(corpus).count())

    // minhash sub-stages (engine xxhash64 path, mirrors Dedup.minhashLsh)
    val withSh = corpus.select(col("doc_id"), graft.ops.Dedup.wordShingles(col("text")).as("sh"))
    t("withSh count")(withSh.count())
    val sig = graft.functions.minhashSignature(col("sh"), 12)
    val sigDf = withSh.select(col("doc_id"), sig.as("sig"))
    t("sig count")(sigDf.count())
    val keyed = sigDf.select(col("doc_id"),
      explode(graft.functions.lshBandKeys(col("sig"), 6, 2)).as("bk"))
    t("keyed count (old)")(keyed.count())
    val keyedDirect = withSh.select(col("doc_id"),
      explode(graft.functions.lshBandKeysDirect(col("sh"), 6, 2, "xxhash64")).as("bk"))
    t("keyed count (direct)")(keyedDirect.count())
    val cands = keyed.select(col("bk"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    t("cands count")(cands.count())
    t("minhashLsh full 1")(graft.ops.Dedup.minhashLsh(corpus).count())
    t("minhashLsh full 2")(graft.ops.Dedup.minhashLsh(corpus).count())
    t("minhashLsh md5 1")(graft.ops.Dedup.minhashLsh(corpus, impl = "md5").count())

    // ER pipeline front end for clustering profiling
    val transcripts = graft.sources.Transcripts.load(spark, sfDir)
      .repartition(32, col("conv_id")).cache()
    t("transcripts count")(transcripts.count())
    val mentions = t("mentions") {
      val m = graft.pipeline.Mentions.extractIdentifier(transcripts).cache(); m.count(); m
    }
    val cfg = graft.pipeline.Pipeline.Config(mentionGenerator = "identifier")
    val surfaces = graft.pipeline.Blocking.surfaceTable(mentions).cache()
    t("surfaces count")(surfaces.count())
    // no-cache lazy variant (keys computed twice, zero checkpoint machinery)
    // vs the production cache+checkpoint shape — localizes the blocking
    // stage's fixed overhead
    t("surfacePairs nocache") {
      val bcfg = cfg.blocking
      val keys = graft.pipeline.Blocking.blockKeys(surfaces, bcfg)
      val sized = keys.join(
        graft.pipeline.Blocking.blockStats(keys, surfaces, bcfg)
          .filter(!col("oversize")).select(col("block_key")), Seq("block_key"))
      val left = sized.select(col("block_key"), col("norm").as("norm_a"))
      val right = sized.select(col("block_key"), col("norm").as("norm_b"))
      left.join(right.hint("shuffle_hash"), Seq("block_key"))
        .filter(col("norm_a") < col("norm_b"))
        .groupBy(col("norm_a"), col("norm_b"))
        .agg(min(col("block_key")).as("block_key")).count()
    }
    t("surfacePairs 2nd") {
      graft.pipeline.Blocking.surfacePairs(surfaces, cfg.blocking).count()
    }
    val sPairs = t("surfacePairs") {
      val p = graft.pipeline.Blocking.surfacePairs(surfaces, cfg.blocking).cache(); p.count(); p
    }
    val sScored = t("leg: surfaceScores") {
      val s = graft.pipeline.Scoring.scoreSurfacePairs(sPairs, surfaces, cfg.weights).cache()
      s.count(); s
    }
    val band = t("leg: band") {
      val b = graft.pipeline.Scoring.scorePairs(
        graft.pipeline.Blocking.convBandPairs(mentions, cfg.blocking), mentions, cfg.weights)
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score")).cache()
      b.count(); b
    }
    val linked = sScored.filter(col("score") > cfg.linkThreshold)
      .select(col("norm_a"), col("norm_b"), col("block_key"), col("score"))
    val bridge = t("leg: bridge") {
      val b = graft.pipeline.Blocking.bridgePairs(linked, mentions, cfg.blocking,
        extraCols = Seq("score"))
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score")).cache()
      b.count(); b
    }
    val chains = t("leg: chains") {
      val c = graft.pipeline.Blocking.sameSurfaceChainPairs(mentions, cfg.blocking, Some(surfaces))
        .join(graft.pipeline.Scoring.selfScores(surfaces, cfg.weights).hint("shuffle_hash"), "norm")
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score")).cache()
      c.count(); c
    }
    val scored = t("scoring union") {
      val sc = band.unionByName(bridge).unionByName(chains).cache(); sc.count(); sc
    }
    val backptrs = t("decode 1") {
      val b = graft.pipeline.Decode.backpointers(scored, cfg.linkThreshold).cache(); b.count(); b
    }
    t("decode 2")(graft.pipeline.Decode.backpointers(scored, cfg.linkThreshold).count())
    System.err.println(s"[prof] backptrs rows=${backptrs.count()}")
    // clustering sub-stages
    val nodes = mentions.select(col("mention_id").as("id"))
    val edges = backptrs.select(col("ant_id").as("src"), col("cur_id").as("dst"))
    val local = t("localRoots")(
      graft.pipeline.Clustering.localRoots(spark, nodes, edges).localCheckpoint(true))
    val cross = edges.filter(
      graft.functions.convOfMentionId(col("src")) =!= graft.functions.convOfMentionId(col("dst")))
    val crossRoots = cross
      .join(local.withColumnRenamed("id", "src").withColumnRenamed("local_root", "src_root"), "src")
      .join(local.withColumnRenamed("id", "dst").withColumnRenamed("local_root", "dst_root"), "dst")
      .select(col("src_root").as("src"), col("dst_root").as("dst"))
    t("crossRoots limit-count")(
      crossRoots.limit(graft.pipeline.Clustering.maxDriverEdges + 1).count())
    t("crossRoots collect")(crossRoots.collect().length)
    t("cluster full 1")(graft.pipeline.Clustering.cluster(spark, mentions, backptrs).count())
    t("cluster full 2")(graft.pipeline.Clustering.cluster(spark, mentions, backptrs).count())
    spark.stop()
  }
}
