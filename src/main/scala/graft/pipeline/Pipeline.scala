package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.TableIO

/** End-to-end record-linkage pipeline (north rule):
  * transcripts → mentions → blocking → pairwise scoring → antecedent decode →
  * transitive clustering. Each stage optionally commits a snapshot through
  * [[TableIO]] (lineage token = upstream stage snapshot + config hash), so a
  * re-run resumes from the last committed stage instead of recomputing
  * (`OrderedClustering`-equivalent final output; SURVEY.md §3.1 for the
  * reference's lifecycle this mirrors).
  */
object Pipeline {

  case class Config(
      blocking: Blocking.Config = Blocking.Config(),
      weights: Scoring.Weights = Scoring.DefaultWeights,
      linkThreshold: Double = 0.0,
      mentionGenerator: String = "all", // "identifier" | "all"
      checkpointDir: Option[String] = None,
      /** "dense" = the 16-feature codegen'd vector; "sparse" = the
        * lexicalized string-feature model (P1/A6/P8 at full strength) over
        * ALL THREE scoring legs — band pairs with the full conjunction axes,
        * bridges/chains via surface-pure bare templates scored once per
        * surface pair. Requires [[sparseWeights]]. */
      scoringMode: String = "dense", // "dense" | "sparse"
      /** Sparse weight table `(f, w_i)` (integer-scaled;
        * [[SparseFeatures.weightsTable]] converts a trained map). */
      sparseWeights: Option[DataFrame] = None,
      /** Caller-supplied stable tag identifying [[sparseWeights]] for the
        * resume-lineage token (a DataFrame can't be hashed into it). */
      sparseTag: String = "",
      /** Caller-supplied stable identity of the INPUT data (source path /
        * table + snapshot id), folded into [[token]]: two runs over
        * different inputs against the same `checkpointDir` must not share
        * snapshots, or the second silently returns the first's clusters.
        * Empty ("") keeps the config-only token — only safe when the caller
        * dedicates a checkpoint dir per input (the test-suite convention). */
      inputTag: String = "",
      /** Sparse models at or under this many features are collected and
        * scored by in-projection hash lookup
        * ([[SparseFeatures.collectWeights]]); larger models stay on the
        * shuffle-hash weight-join plan. Excluded from [[token]] — both plans
        * produce bit-identical scores (integer-exact sums), so snapshots
        * remain valid across the cutoff. */
      sparseBroadcastMax: Int = SparseFeatures.BroadcastMaxFeatures) {
    /** Deterministic config token for lineage. */
    def token: String = {
      val s = s"$blocking|${weights.values.mkString(",")}|$linkThreshold|" +
        s"$mentionGenerator|$scoringMode|$sparseTag|$inputTag"
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s).toLong & 0xffffffffL)
    }
  }

  case class Result(
      mentions: DataFrame,
      surfacePairs: DataFrame,
      surfaceScores: DataFrame,
      scored: DataFrame,
      backptrs: DataFrame,
      clusters: DataFrame,
      surfaces: DataFrame) {
    /** Release the pipeline's internal caches (mentions + surfaces). Call
      * once the outputs you need are materialized or persisted elsewhere —
      * otherwise back-to-back `run`s in a long-lived session accumulate
      * cacheManager entries (CacheSpec pins this). */
    def unpersist(): Unit = { mentions.unpersist(); surfaces.unpersist() }
  }

  def run(spark: SparkSession, transcripts: DataFrame, cfg: Config = Config()): Result = {
    graft.functions.register(spark)
    val io = cfg.checkpointDir.map(new TableIO(_))

    def stage(name: String, lineage: String)(compute: => DataFrame): DataFrame =
      io match {
        case Some(t) =>
          t.readIfCurrent(spark, name, lineage).getOrElse {
            val df = compute
            val snap = t.commit(name, df, lineage)
            t.readIfCurrent(spark, name, lineage, Some(snap)).get
          }
        case None => compute
      }

    val tok = cfg.token
    // explicit repartition (north rule): file scans often arrive with too few
    // partitions; hash-spread conversations across the cluster before the
    // narrow mention-extraction stage so every downstream broadcast-join leg
    // inherits real parallelism.
    val par = spark.sparkContext.defaultParallelism
    val spread = transcripts.repartition(par, col("conv_id"))
    // mentions and surfaces fan out into many downstream legs (5 block-key
    // families + stats + scoring attach); cache them or each leg re-derives
    // the whole extraction chain
    val mentions = stage("mentions", tok) {
      if (cfg.mentionGenerator == "identifier") Mentions.extractIdentifier(spread)
      else Mentions.extractAll(spread)
    }.cache()
    val surfaces = Blocking.surfaceTable(mentions).cache()
    val sparse = cfg.scoringMode == "sparse"
    require(!sparse || cfg.sparseWeights.nonEmpty,
      "scoringMode=sparse requires Config.sparseWeights")
    // F5 backoff counts — one cheap aggregation over the cached mentions
    lazy val counts = SparseFeatures.normCounts(mentions)
    // broadcast-size sparse models are collected ONCE and scored by
    // in-projection lookup in all three legs; over-cutoff models stay on the
    // weight-join plans (bit-identical scores either way)
    lazy val wmap = if (sparse)
      SparseFeatures.collectWeights(cfg.sparseWeights.get, cfg.sparseBroadcastMax)
    else None
    val surfacePairs = stage("surface_pairs", tok)(
      Blocking.surfacePairs(surfaces, cfg.blocking))
    val surfaceScores = stage("surface_scores", tok)(
      if (sparse) wmap match {
        case Some(m) =>
          SparseFeatures.scoreSurfacePairsSparseFast(surfacePairs, surfaces, counts, m)
        case None =>
          SparseFeatures.scoreSurfacePairsSparse(surfacePairs, surfaces, counts,
            cfg.sparseWeights.get)
      }
      else Scoring.scoreSurfacePairs(surfacePairs, surfaces, cfg.weights))
    // mention-level scored pairs, three legs (all linear in mentions +
    // linked surface pairs — no quadratic expansion anywhere):
    //  - conversation band with full conversational features;
    //  - same-surface chains (spanning tree per repeated surface, bucketed
    //    for heavy surfaces) carrying the surface self-score;
    //  - ONE bridge edge per *linked* surface pair (coarse-to-fine:
    //    sub-threshold surface pairs never materialize at mention
    //    granularity; a single bridge yields the same connected components
    //    as the full clique because every clique edge would carry the
    //    identical surface-level score).
    val scored = stage("scores", tok) {
      // the band leg carries both mentions' attrs through the ONE conv_id
      // self-join (convBandPairsAttr) — the ids-only + attachAttrs shape
      // shuffled the ~10×-larger pair table against mentions twice more
      val bandAttr = Blocking.convBandPairsAttr(mentions, cfg.blocking)
      val band =
        if (sparse)
          (wmap match {
            case Some(m) =>
              SparseFeatures.scoreAttachedSparseFast(bandAttr, counts, m)
            case None =>
              SparseFeatures.scoreWithWeights(
                SparseFeatures.featureStrings(bandAttr, counts),
                cfg.sparseWeights.get, Seq("ant_id", "cur_id"))
          }).select(col("ant_id"), col("cur_id"),
            lit("conv").as("block_key"), col("score"))
        else Scoring.scorePairsAttr(bandAttr, cfg.weights)
          .select(col("ant_id"), col("cur_id"), col("block_key"), col("score"))
      val linked = surfaceScores.filter(col("score") > cfg.linkThreshold)
        .select(col("norm_a"), col("norm_b"), col("block_key"), col("score"))
      // sparse mode keeps in-band bridges for the same reason as the chain
      // guard below: the coarse pass linked the two surface groups, and that
      // connectivity must not depend on the sign of trained band weights
      val bridge = Blocking.bridgePairs(linked, mentions, cfg.blocking,
        extraCols = Seq("score"), keepInBand = sparse)
      // surfaces (cached) already carries n_mentions — share it instead of
      // re-aggregating the counts inside the chain leg
      val selfSc =
        if (sparse) wmap match {
          case Some(m) => SparseFeatures.selfScoresSparseFast(surfaces, counts, m)
          case None =>
            SparseFeatures.selfScoresSparse(surfaces, counts, cfg.sparseWeights.get)
        }
        else Scoring.selfScores(surfaces, cfg.weights)
      // sparse mode keeps in-band chain edges: the dense "band scores them
      // strictly higher" argument doesn't survive trained conjunction
      // weights, so the chain edge rides along at the surface self-score and
      // the decode argmax picks greatest(band, self) per pair
      val chains = Blocking.sameSurfaceChainPairs(mentions, cfg.blocking, Some(surfaces),
          keepInBand = sparse)
        .join(selfSc.hint("shuffle_hash"), "norm")
        .select(col("ant_id"), col("cur_id"), col("block_key"), col("score"))
      band
        .unionByName(bridge.select(col("ant_id"), col("cur_id"),
          col("block_key"), col("score")))
        .unionByName(chains)
    }
    val backptrs = stage("backptrs", tok)(Decode.backpointers(scored, cfg.linkThreshold))
    val clusters = stage("clusters", tok) {
      val ccCheckpoint: (Int, DataFrame) => DataFrame = io match {
        case Some(t) => (i, df) => {
          // one stage per iteration, PROBED before computing: a re-run that
          // crashed mid-loop reuses every committed iteration (the loop is
          // deterministic in backptrs + config, both in the lineage) instead
          // of recomputing all of them and appending duplicate snapshots
          t.readIfCurrent(spark, s"cc-iter-$i", s"$tok-iter$i").getOrElse {
            val snap = t.commit(s"cc-iter-$i", df, s"$tok-iter$i")
            t.readIfCurrent(spark, s"cc-iter-$i", s"$tok-iter$i", Some(snap)).get
          }
        }
        case None => (_, df) => df.localCheckpoint(true)
      }
      Clustering.cluster(spark, mentions, backptrs, ccCheckpoint)
    }
    Result(mentions, surfacePairs, surfaceScores, scored, backptrs, clusters, surfaces)
  }
}
