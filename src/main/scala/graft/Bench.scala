package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline._
import graft.sources.Transcripts

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Headline metric: candidate-pairs-scored/sec through the full featurize +
  * logistic-score stage (north rule). Also reports per-stage seconds for the
  * ER pipeline and the training-data ops, plus the N→4N scaling evidence the
  * north rule demands: the same end-to-end job at `local[8]` and `local[32]`
  * on identical input, efficiency = (T8/T32)/4 (sandbox stand-in for N vs 4N
  * executors — no real cluster here, see BASELINE.md).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
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

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private def log(msg: String): Unit = System.err.println(s"[bench] $msg")

  /** Full ER pipeline, stage-timed. Returns (stage->sec, pairsScored). */
  private def benchPipeline(spark: SparkSession, sfDir: String): (Map[String, Double], Long) = {
    val cfg = Pipeline.Config(mentionGenerator = "identifier")
    val transcripts = Transcripts.load(spark, sfDir).cache()
    transcripts.count()
    log("stage: mentions")
    val (mentions, tM) = time {
      val m = (if (cfg.mentionGenerator == "identifier") Mentions.extractIdentifier(transcripts)
        else Mentions.extractAll(transcripts)).cache()
      m.count(); m
    }
    log(s"mentions done")
    val (sPairs, tB) = time {
      val p = Blocking.surfacePairs(Blocking.surfaceTable(mentions), cfg.blocking).cache()
      p.count(); p
    }
    log(s"blocking (surface pairs) done")
    val (scoredN, tS) = time {
      val sScored = Scoring.scoreSurfacePairs(sPairs, Blocking.surfaceTable(mentions),
        cfg.weights).cache()
      val nSurf = sScored.count()
      val band = Scoring.scorePairs(Blocking.convBandPairs(mentions, cfg.blocking),
        mentions, cfg.weights)
        .select(org.apache.spark.sql.functions.col("ant_id"),
          org.apache.spark.sql.functions.col("cur_id"),
          org.apache.spark.sql.functions.col("block_key"),
          org.apache.spark.sql.functions.col("score"))
      val linked = sScored.filter(org.apache.spark.sql.functions.col("score") > cfg.linkThreshold)
      val global = Blocking.expandToMentionPairs(linked, mentions, cfg.blocking,
        extraCols = Seq("score"))
      val sc = band.unionByName(global.select(
        org.apache.spark.sql.functions.col("ant_id"),
        org.apache.spark.sql.functions.col("cur_id"),
        org.apache.spark.sql.functions.col("block_key"),
        org.apache.spark.sql.functions.col("score"))).cache()
      val n = sc.count() + nSurf
      (sc, n)
    }
    log(s"scoring done")
    val (backptrs, tD) = time {
      val b = Decode.backpointers(scoredN._1, cfg.linkThreshold).cache(); b.count(); b
    }
    log(s"decode done")
    val (_, tC) = time {
      Clustering.cluster(spark, mentions, backptrs).count()
    }
    transcripts.unpersist(); mentions.unpersist(); sPairs.unpersist()
    scoredN._1.unpersist(); backptrs.unpersist()
    (Map("mentions" -> tM, "blocking" -> tB, "scoring" -> tS,
      "decode" -> tD, "clustering" -> tC), scoredN._2)
  }

  private def benchOps(spark: SparkSession, sfDir: String): Map[String, Double] = {
    Transcripts.registerBase(spark, sfDir)
    val docs = spark.table("documents").cache(); docs.count()
    val embs = spark.table("embeddings")
    val r = Map(
      "dd_exact" -> time(graft.ops.Dedup.exact(graft.ops.Dedup.corpus(docs)).count())._2,
      "dd_minhash_lsh" -> time(graft.ops.Dedup.minhashLsh(graft.ops.Dedup.corpus(docs)).count())._2,
      "dd_simhash" -> time(graft.ops.Dedup.simhash(graft.ops.Dedup.corpus(docs)).count())._2,
      "sim_topk_brute" -> time(graft.ops.Similarity.bruteTopK(
        graft.ops.Similarity.corpus(embs)).count())._2,
      "ta_quality" -> time(graft.ops.TextAnalysis.quality(docs).count())._2)
    docs.unpersist()
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // primary measurement at the driver-provided parallelism
    var spark = session(cpus)
    val ((stages, pairsScored), tTotal) = time(benchPipeline(spark, sfDir))
    val ops = benchOps(spark, sfDir)
    spark.stop()
    graft.harness.Queries.clearCache()

    // scaling evidence: same end-to-end job at local[8] then local[32]
    def e2e(n: Int): Double = {
      val s = session(n)
      log(s"scaling run local[$n]")
      val t = time(benchPipeline(s, sfDir))._2
      s.stop(); graft.harness.Queries.clearCache()
      t
    }
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
    val (t8, t32) = if (doScaling) { val a = e2e(8); log(s"local[8] done: $a"); val b = e2e(32); (a, b) }
      else (0.0, 0.0)
    val eff = if (doScaling) (t8 / t32) / 4.0 else 0.0

    val pairsPerSec = pairsScored / stages("scoring")
    val allQ = (stages.map { case (k, v) => s"er_$k" -> v } ++ ops)
      .map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"candidate_pairs_scored_per_sec","value":${f"$pairsPerSec%.1f"},"unit":"pairs/sec",""" +
      s""""queries":$allQ,"sf":"$sfDir","total_sec":${f"$tTotal%.3f"},""" +
      s""""pairs_scored":$pairsScored,"cpus":$cpus,""" +
      s""""scaling":{"t_local8_sec":${f"$t8%.3f"},"t_local32_sec":${f"$t32%.3f"},""" +
      s""""efficiency_n_to_4n":${f"$eff%.3f"}}}""")
  }
}
