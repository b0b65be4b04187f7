package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Blocking ≡ candidate generation (SURVEY.md §2.4), two-level:
  *
  * **Surface level (global / cross-conversation).** Transcript mentions repeat
  * the same surface massively (10^12 turns ↦ ~10^6 distinct surfaces), so all
  * global blocking and string-similarity work happens once per *distinct
  * normalized surface*: [[surfaceTable]] aggregates mentions to surfaces;
  * [[surfacePairs]] self-joins surface block keys (head / sorted-neighborhood
  * prefix / first-token / acronym / MinHash-LSH bands). Downstream, only
  * surface pairs that *score* above the link threshold are expanded back to
  * mention pairs (Pipeline) — the reference's coarse-to-fine pruning
  * (`CorefPruner.scala:36-47`) as an aggregation pushdown: cost is quadratic
  * in surfaces, linear in mentions.
  *
  * **Mention level (conversation band, B1).** All (ant, cur) with
  * `0 < cur.m_seq − ant.m_seq ≤ maxConvDist` within a conversation
  * (`DocumentGraph.scala:91-102`) — bounded per conversation, skew-free.
  * Closed-class mentions (pronouns/nominals) pair only here.
  *
  * Skew control: per-key surface counts are capped (`maxBlockSize`); the
  * oversize audit is [[blockStats]] (manifest counters / B7). The band join
  * runs under AQE skew-join handling.
  */
object Blocking {

  case class Config(
      maxConvDist: Int = 30,
      snkPrefixLen: Int = 6,
      shingleK: Int = 3,
      minhashes: Int = 12,
      bands: Int = 6, // 6 bands x 2 rows: catches 2-edit typos w.p. ~0.93
      maxBlockSize: Int = 300, // max surfaces per block key
      maxBlockMass: Int = 2000, // max Σ mentions per block key (expansion cap)
      enableLsh: Boolean = true,
      /** "xxhash64" (fast engine path) | "md5" (portable, DuckDB-reproducible
        * — used by the oracle-checked harness queries). */
      minhashImpl: String = "xxhash64")

  /** Distinct open-class surfaces: `(norm, head_key, toks, n_mentions)`.
    * head_key/toks are functions of norm, so `first` is deterministic. */
  def surfaceTable(mentions: DataFrame): DataFrame =
    mentions.filter(!col("closed_class"))
      .groupBy(col("norm"))
      .agg(count(lit(1)).as("n_mentions"))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("head_key", headKey(element_at(col("toks"), -1)))

  /** (block_key, norm) for every global blocking key of a surface. */
  def blockKeys(surfaces: DataFrame, cfg: Config = Config()): DataFrame = {
    val base = surfaces.select(col("norm"), col("head_key"))

    val headKeyed = base.select(concat(lit("h:"), col("head_key")).as("block_key"), col("norm"))

    val snk = base.select(
      concat(lit("s:"),
        substring(regexp_replace(col("norm"), "[^a-z0-9]", ""), 1, cfg.snkPrefixLen))
        .as("block_key"),
      col("norm"))

    // first-token key: blocks truncated surfaces ("Acme" vs "Acme Data
    // Systems") that share neither head nor prefix window
    val firstTok = base.select(
      concat(lit("f:"), element_at(split(col("norm"), " "), 1)).as("block_key"),
      col("norm"))

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
      .select(concat(lit("a:"), col("acro")).as("block_key"), col("norm"))

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
          .as("block_key"), col("norm"))
        .withColumn("block_key", concat(lit("l:"), col("block_key")))
      exact.unionByName(lsh)
    }
  }

  /** Per-key surface counts + mention mass + oversize (skew-cap) flags — the
    * pruning-stats audit (B7 analog, `DocumentGraph.scala:117-142`) and the
    * skew monitor. A key is oversize when it has too many surfaces (quadratic
    * surface-pair work) OR too much mention mass (quadratic expansion). */
  def blockStats(keys: DataFrame, surfaces: DataFrame,
      cfg: Config = Config()): DataFrame =
    keys.join(surfaces.select(col("norm"), col("n_mentions")), "norm")
      .groupBy(col("block_key"))
      .agg(count(lit(1)).as("n_surfaces"), sum(col("n_mentions")).as("mention_mass"))
      .withColumn("oversize",
        col("n_surfaces") > cfg.maxBlockSize || col("mention_mass") > cfg.maxBlockMass)

  /** Candidate *surface* pairs `(norm_a, norm_b, block_key)`, `norm_a <
    * norm_b`, deduped across keys, oversize keys dropped (audited). */
  def surfacePairs(surfaces: DataFrame, cfg: Config = Config()): DataFrame = {
    val keys = blockKeys(surfaces, cfg)
    val sized = keys.join(
      blockStats(keys, surfaces, cfg).filter(!col("oversize")).select(col("block_key")),
      Seq("block_key"))
    val left = sized.select(col("block_key"), col("norm").as("norm_a"))
    val right = sized.select(col("block_key"), col("norm").as("norm_b"))
    left.join(right.hint("shuffle_hash"), Seq("block_key"))
      .filter(col("norm_a") < col("norm_b"))
      .groupBy(col("norm_a"), col("norm_b"))
      .agg(min(col("block_key")).as("block_key"))
  }

  /** B1 conversation-band mention pairs `(ant_id, cur_id)` (closed- and
    * open-class). */
  def convBandPairs(mentions: DataFrame, cfg: Config = Config()): DataFrame = {
    val m = mentions.select(col("conv_id"), col("mention_id"), col("m_seq"))
    val a = m.select(col("conv_id"), col("mention_id").as("ant_id"), col("m_seq").as("ant_seq"))
    val c = m.select(col("conv_id"), col("mention_id").as("cur_id"), col("m_seq").as("cur_seq"))
    a.join(c, Seq("conv_id"))
      .filter(col("cur_seq") > col("ant_seq") &&
        col("cur_seq") - col("ant_seq") <= cfg.maxConvDist)
      .select(col("ant_id"), col("cur_id"), lit("conv").as("block_key"))
  }

  /** Expand surface pairs to mention pairs (canonical `ant_id < cur_id`),
    * excluding pairs already covered by the conversation band (those carry
    * conversational features there). Used by the Pipeline on *linked*
    * surface pairs, and by the B7 audits on all of them. */
  def expandToMentionPairs(surfacePairs: DataFrame, mentions: DataFrame,
      cfg: Config = Config(), extraCols: Seq[String] = Nil): DataFrame = {
    val m = mentions.filter(!col("closed_class"))
      .select(col("norm"), col("mention_id"), col("conv_id"), col("m_seq"))
    val a = m.toDF("norm_a", "id_a", "conv_a", "seq_a")
    val b = m.toDF("norm_b", "id_b", "conv_b", "seq_b")
    surfacePairs.join(a, "norm_a").join(b, "norm_b")
      .filter(!(col("conv_a") === col("conv_b") &&
        abs(col("seq_a") - col("seq_b")) <= cfg.maxConvDist))
      .select(Seq(least(col("id_a"), col("id_b")).as("ant_id"),
        greatest(col("id_a"), col("id_b")).as("cur_id"),
        col("block_key")) ++ extraCols.map(col): _*)
  }

  /** Full candidate mention-pair universe (band ∪ expanded surface blocks) —
    * the evaluation/B7 universe; the execution path never materializes the
    * unlinked global expansion. */
  def candidatePairs(mentions: DataFrame, cfg: Config = Config()): DataFrame = {
    val global = expandToMentionPairs(surfacePairs(surfaceTable(mentions), cfg), mentions, cfg)
    convBandPairs(mentions, cfg).unionByName(global)
      .groupBy(col("ant_id"), col("cur_id"))
      .agg(min(col("block_key")).as("block_key"))
  }
}
