package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** North-rule skew gate ("salted, skew-aware shuffle-hash self-join"): one
  * surface repeated far beyond `saltThreshold` (1500 mentions), always inside
  * 5-turn conversations (so a positional salt would collapse to 5 buckets),
  * plus a light linkable alias. Asserts:
  *   - the salted full expansion ([[Blocking.expandToMentionPairs]]) equals a
  *     brute-force unsalted reference pair set;
  *   - the deterministic salt actually spreads the heavy surface across all
  *     `expansionSalt` buckets with bounded bucket size (the per-task input
  *     bound that makes the join skew-proof);
  *   - the execution path (same-surface chains + one bridge per linked
  *     surface pair) stays LINEAR in mentions — no clique ever materializes —
  *     yet clusters all aliases of the entity into one cluster.
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  val nConvs = 300 // heavy surface: 300 convs x 5 turns = 1500 mentions >> 64
  val cfg = Blocking.Config()

  lazy val transcripts = {
    val heavy = (0 until nConvs).flatMap { c =>
      (0 until 5).map { t =>
        (s"hv-$c", t, "user", "update for 777000111 noted", null: String,
          new java.sql.Timestamp(1700000000000L + c * 100000L + t * 1000L))
      }
    }
    val light = (0 until 40).map { c =>
      (s"lt-$c", 0, "user", "Agent assigned to Cust-777000111 today", null: String,
        new java.sql.Timestamp(1700900000000L + c * 100000L))
    }
    (heavy ++ light).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }
  lazy val mentions = Mentions.extractIdentifier(
    transcripts.repartition(8, col("conv_id"))).cache()

  test("salted expansion == brute-force expansion on a heavy surface") {
    val sp = Blocking.surfacePairs(Blocking.surfaceTable(mentions), cfg)
      .unionByName(Blocking.selfSurfacePairs(mentions, cfg))
      .cache()
    val salted = Blocking.expandToMentionPairs(sp, mentions, cfg)
      .select("ant_id", "cur_id").distinct()
    // brute-force reference: plain unsalted joins
    val m = mentions.filter(!col("closed_class"))
      .select(col("norm"), col("mention_id"), col("conv_id"), col("m_seq"))
    val a = m.toDF("norm_a", "id_a", "conv_a", "seq_a")
    val b = m.toDF("norm_b", "id_b", "conv_b", "seq_b")
    val brute = sp.join(a, "norm_a").join(b, "norm_b")
      .filter(col("id_a") =!= col("id_b"))
      .filter(!(col("conv_a") === col("conv_b") &&
        abs(col("seq_a") - col("seq_b")) <= cfg.maxConvDist))
      .select(least(col("id_a"), col("id_b")).as("ant_id"),
        greatest(col("id_a"), col("id_b")).as("cur_id"))
      .distinct()
    assert(salted.exceptAll(brute).isEmpty && brute.exceptAll(salted).isEmpty)
    val n = salted.count()
    info(s"expanded pairs: $n")
    assert(n > 1000000L, "fixture must actually be quadratic in the eval universe")
  }

  test("deterministic salt spreads a positionally-degenerate heavy surface") {
    val counts = Blocking.mentionCounts(mentions)
    val salted = mentions.filter(!col("closed_class")).join(counts, "norm")
      .filter(col("n_mentions") > cfg.saltThreshold)
      .withColumn("salt",
        pmod(call_function("instr", lit("0123456789abcdef"),
          substring(md5(col("mention_id").cast("binary")), 1, 1)) - 1,
          lit(cfg.expansionSalt)))
    val byBucket = salted.groupBy(col("norm"), col("salt"))
      .agg(count(lit(1)).as("n")).collect()
    val buckets = byBucket.map(_.getAs[Int]("salt")).toSet
    val maxBucket = byBucket.map(_.getAs[Long]("n")).max
    info(s"buckets=$buckets maxBucket=$maxBucket of 1500")
    assert(buckets.size == cfg.expansionSalt, "heavy surface must use every salt bucket")
    assert(maxBucket <= 1500 / cfg.expansionSalt * 2,
      s"bucket imbalance: $maxBucket")
  }

  test("execution path is linear (no clique) yet clusters the entity correctly") {
    val res = Pipeline.run(spark, transcripts,
      Pipeline.Config(blocking = cfg, mentionGenerator = "identifier"))
    val scoredN = res.scored.count()
    info(s"scored pairs: $scoredN")
    // band: 300 convs x C(5,2)=10 = 3000; chains ~1540; bridges: a handful.
    // The clique would be ~1.1M.
    assert(scoredN < 10000L, s"execution path must stay linear, got $scoredN")
    val clusters = res.clusters.cache()
    val nClusters = clusters.select("cluster_id").distinct().count()
    assert(nClusters == 1L, s"all aliases of the entity must merge, got $nClusters")
    assert(clusters.count() === mentions.count())
  }
}
