package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Blocking ≡ candidate-pair generation (SURVEY.md §2.4). The reference
  * materializes the full per-document triangular pair space and masks it
  * (`DocumentGraph.scala:91-115`); at 10^12-turn scale we generate only
  * surviving pairs:
  *
  *  - B1 conversation band: all (ant, cur) with `0 < cur.m_seq - ant.m_seq ≤
  *    maxConvDist` within one conversation (distance pruning,
  *    `DocumentGraph.scala:91-102`). Conversations are bounded, so this join
  *    is skew-free by construction.
  *  - B5 sorted-neighborhood key: normalized-surface prefix.
  *  - head-key block: exact canonical-head equality (the workhorse analog of
  *    the reference's head-match feature gating).
  *  - B4 MinHash-LSH: banded minhash over character 3-shingles of the
  *    normalized surface (catches typo'd surfaces that share no exact key).
  *
  * Closed-class mentions (pronouns/nominals) are excluded from all global
  * blocks — they would each form one quadratic mega-block — and pair only
  * inside their conversation band, mirroring the reference's closed-class
  * feature gating (`PairwiseIndexingFeaturizerJoint.scala:69-129`).
  *
  * Skew control: global block keys are capped at `maxBlockSize` mentions; the
  * overflow count is observable via [[blockStats]] (manifest counters). The
  * pair join itself is executed with AQE skew-join splitting enabled and an
  * explicit repartition on the block key (north rule).
  */
object Blocking {

  case class Config(
      maxConvDist: Int = 30,
      snkPrefixLen: Int = 6,
      shingleK: Int = 3,
      minhashes: Int = 12,
      bands: Int = 6, // 6 bands x 2 rows: catches 2-edit typos w.p. ~0.93
      maxBlockSize: Int = 1000,
      enableLsh: Boolean = true,
      /** "xxhash64" (fast engine path) | "md5" (portable, DuckDB-reproducible
        * — used by the oracle-checked harness queries). */
      minhashImpl: String = "xxhash64")

  /** (block_key, mention_id, m_ord) rows for all global (cross-conversation)
    * blocking keys of open-class mentions. `m_ord = mention_id` (string) is
    * the canonical pair orientation key. */
  def blockKeys(mentions: DataFrame, cfg: Config = Config()): DataFrame = {
    val open = mentions.filter(!col("closed_class"))
    val base = open.select(col("mention_id"), col("norm"), col("head_key"))

    val headKeyed = base.select(concat(lit("h:"), col("head_key")).as("block_key"), col("mention_id"))

    val snk = base.select(
      concat(lit("s:"),
        substring(regexp_replace(col("norm"), "[^a-z0-9]", ""), 1, cfg.snkPrefixLen))
        .as("block_key"),
      col("mention_id"))

    // first-token key: blocks truncated surfaces ("Acme" vs "Acme Data
    // Systems") that share neither head nor prefix window
    val firstTok = base.select(
      concat(lit("f:"), element_at(split(col("norm"), " "), 1)).as("block_key"),
      col("mention_id"))

    // acronym key: initials of multi-token surfaces; short single tokens are
    // candidate acronyms of themselves ("ADS" ↔ "Acme Data Systems") — the
    // blocking-side analog of the reference's abbreviation feature
    // (`sem/AbbreviationHandler.scala:7-66`)
    val initials = array_join(
      transform(split(col("norm"), " "), t => substring(t, 1, 1)), "")
    val acronym = base
      .withColumn("acro",
        when(size(split(col("norm"), " ")) > 1, initials)
          .when(length(col("norm")) <= 5, col("norm")))
      .filter(col("acro").isNotNull && length(col("acro")) > 1)
      .select(concat(lit("a:"), col("acro")).as("block_key"), col("mention_id"))

    val exact = headKeyed.unionByName(snk).unionByName(firstTok).unionByName(acronym)
    if (!cfg.enableLsh) exact
    else {
      val mh =
        if (cfg.minhashImpl == "md5")
          minhashSignatureMd5(charShingles(col("norm"), cfg.shingleK), cfg.minhashes)
        else
          minhashSignature(charShingles(col("norm"), cfg.shingleK), cfg.minhashes)
      val lsh = base
        .withColumn("sig", mh)
        .select(explode(lshBandKeys(col("sig"), cfg.bands, cfg.minhashes / cfg.bands))
          .as("block_key"), col("mention_id"))
        .withColumn("block_key", concat(lit("l:"), col("block_key")))
      exact.unionByName(lsh)
    }
  }

  /** Per-key sizes + overflow flags — the pruning-stats audit (B7 analog,
    * `DocumentGraph.scala:117-142`) and the skew monitor. */
  def blockStats(keys: DataFrame, cfg: Config = Config()): DataFrame =
    keys.groupBy(col("block_key"))
      .agg(count(lit(1)).as("n_mentions"))
      .withColumn("oversize", col("n_mentions") > cfg.maxBlockSize)

  /** Candidate pairs `(ant_id, cur_id, block_key)` with `ant_id < cur_id`
    * (canonical orientation = reference's triangular j ≤ i,
    * `DocumentGraph.scala:15-55`), deduped across blocks. */
  def candidatePairs(mentions: DataFrame, cfg: Config = Config()): DataFrame = {
    // B1: conversation band (both closed- and open-class).
    val m = mentions.select(col("conv_id"), col("mention_id"), col("m_seq"))
    val a = m.select(col("conv_id"), col("mention_id").as("ant_id"), col("m_seq").as("ant_seq"))
    val c = m.select(col("conv_id"), col("mention_id").as("cur_id"), col("m_seq").as("cur_seq"))
    val band = a.join(c, Seq("conv_id"))
      .filter(col("cur_seq") > col("ant_seq") &&
        col("cur_seq") - col("ant_seq") <= cfg.maxConvDist)
      .select(col("ant_id"), col("cur_id"), lit("conv").as("block_key"))

    // Global blocks: self-join on block key, capped for skew control.
    val keys = blockKeys(mentions, cfg)
    val sized = keys.join(
      blockStats(keys, cfg).filter(!col("oversize")).select(col("block_key")),
      Seq("block_key"))
    val left = sized.select(col("block_key"), col("mention_id").as("ant_id"))
    val right = sized.select(col("block_key"), col("mention_id").as("cur_id"))
    val global = left.join(right.hint("shuffle_hash"), Seq("block_key"))
      .filter(col("ant_id") < col("cur_id"))
      .select(col("ant_id"), col("cur_id"), col("block_key"))

    band.unionByName(global)
      .groupBy(col("ant_id"), col("cur_id"))
      .agg(min(col("block_key")).as("block_key"))
  }
}
