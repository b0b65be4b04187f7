package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{headKey, mentionId, normSurface}

/** Mention extraction: transcript turns → mention rows (the row-generator of
  * SURVEY.md §2.2). Three candidate generators, union'd + deduped like the
  * reference's three span sources (`CorefDocAssembler.scala:66-132`):
  *
  *  - `identifier`: tokens carrying account-like identifiers
  *    (`Customer#000000007`, `000000007`, `Cust-7`) — pattern-based, fully
  *    SQL-expressible (used by the DuckDB-oracle harness queries).
  *  - `caprun`: maximal runs of capitalized tokens mid-sentence (the NNP-run
  *    generator, `CorefDocAssembler.scala:191-207`).
  *  - `pronoun` + `nominal`: closed-class mentions from small dictionaries
  *    (`PronounDictionary.scala:4-21`; nominal descriptors after a
  *    determiner).
  *
  * Mention identity is positional and deterministic: `mention_id =
  * conv_id#<turn,6><start,6>` sorts lexicographically in the reference's
  * canonical mention order within a conversation
  * (`CorefDocAssembler.scala:473-475`); `m_seq` is the dense per-conversation
  * index assigned by a window, never `monotonically_increasing_id`
  * (SURVEY.md §1.2).
  */
object Mentions {

  /** Third-person anaphoric pronouns (the closed class that links to an
    * in-conversation antecedent; deictic we/you/I are not anaphora in this
    * engine — the reference handles those via speaker features instead,
    * `PairwiseIndexingFeaturizerJoint.scala:220-234`). */
  val Pronouns: Seq[String] =
    Seq("they", "it", "he", "she", "them", "him", "her")
  val NominalHeads: Seq[String] =
    Seq("vendor", "company", "client", "supplier", "firm", "organization")
  val IdentifierRe = "^(?:[A-Za-z]+[#-])?[0-9]+$"

  /** Tokens with positions for each turn. */
  private def toks(transcripts: DataFrame): DataFrame =
    transcripts
      .select(col("conv_id"), col("turn_idx"), col("role"), col("ts"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))

  /** Identifier + pronoun mentions (single-token; harness path). */
  def extractIdentifier(transcripts: DataFrame): DataFrame = {
    val t = toks(transcripts)
    val cands = t.filter(
      col("tok").rlike(IdentifierRe) ||
        lower(col("tok")).isin(Pronouns: _*))
      .select(col("conv_id"), col("turn_idx"), col("pos").as("start"),
        col("pos").as("end"), col("tok").as("surface"),
        when(lower(col("tok")).isin(Pronouns: _*), "PRONOMINAL")
          .otherwise("PROPER").as("mtype"),
        col("role"), col("ts"))
    finish(cands)
  }

  /** All three generators union'd (fixture/ER path): capitalized runs,
    * pronouns, determiner+nominal. Sentence-initial capitalized tokens are
    * only kept if they look like identifiers or pronouns (avoids treating
    * every sentence opener as a name). */
  def extractAll(transcripts: DataFrame): DataFrame = {
    val t = toks(transcripts)
    val wTurn = Window.partitionBy(col("conv_id"), col("turn_idx")).orderBy(col("pos"))

    val isCap = col("tok").rlike("^[A-Z0-9][A-Za-z0-9#-]*$") &&
      !lower(col("tok")).isin(Pronouns: _*) &&
      (col("pos") > 0 || col("tok").rlike(IdentifierRe))
    val capToks = t.withColumn("is_cap", isCap)
      .filter(col("is_cap"))
      .withColumn("grp", col("pos") - row_number().over(wTurn))
    val capRuns = capToks
      .groupBy(col("conv_id"), col("turn_idx"), col("grp"))
      .agg(
        min(col("pos")).as("start"), max(col("pos")).as("end"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("surface"),
        first(col("role")).as("role"), first(col("ts")).as("ts"))
      .withColumn("mtype", lit("PROPER"))
      .drop("grp")

    val prons = t.filter(lower(col("tok")).isin(Pronouns: _*))
      .select(col("conv_id"), col("turn_idx"), col("pos").as("start"),
        col("pos").as("end"), col("tok").as("surface"), lit("PRONOMINAL").as("mtype"),
        col("role"), col("ts"))

    val prevTok = lag(lower(col("tok")), 1).over(wTurn)
    val noms = t.withColumn("prev", prevTok)
      .filter(lower(col("tok")).isin(NominalHeads: _*) &&
        col("prev").isin("the", "that", "this"))
      .select(col("conv_id"), col("turn_idx"), (col("pos") - 1).as("start"),
        col("pos").as("end"),
        concat(col("prev"), lit(" "), col("tok")).as("surface"),
        lit("NOMINAL").as("mtype"), col("role"), col("ts"))

    val all = capRuns.select(prons.columns.map(col): _*)
      .unionByName(prons).unionByName(noms)
      // A15 dedup: one mention per extent (mtype-ascending tie-break)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("conv_id"), col("turn_idx"), col("start"), col("end"))
          .orderBy(col("mtype"))))
      .filter(col("rk") === 1).drop("rk")
    // M2 non-maximal filter (`CorefDocAssembler.scala:157-189`): the parse-free
    // head is the last token (position = end), so per head position keep only
    // the largest span — nested spans sharing a head never double-emit.
    val m2 = all
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("conv_id"), col("turn_idx"), col("end"))
          .orderBy(col("start").asc, col("mtype"))))
      .filter(col("rk") === 1).drop("rk")
    // id-safety: mention_id is (turn, start)-derived, so keep one mention per
    // start (longest span wins) — guarantees id uniqueness across generators
    val uniq = m2
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("conv_id"), col("turn_idx"), col("start"))
          .orderBy(col("end").desc, col("mtype"))))
      .filter(col("rk") === 1).drop("rk")
    finish(uniq)
  }

  /** Shared property computation + canonical ids (M3/M5/W1). */
  private def finish(cands: DataFrame): DataFrame = {
    val wConv = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx"), col("start"), col("end"))
    properties(cands)
      .withColumn("m_seq", (row_number().over(wConv) - 1).cast("int"))
      .withColumn("mention_id",
        mentionId(col("conv_id"), col("turn_idx"), col("start")))
  }

  /** The M5 property columns alone (no window, no ids) — shared verbatim by
    * the batch [[finish]] and the streaming mention enrichment
    * ([[graft.streaming.StreamingAssembly.enrichMentions]]) so the two
    * paths cannot drift. Stateless: safe on a streaming DataFrame. */
  private[graft] def properties(cands: DataFrame): DataFrame = {
    cands
      .withColumn("norm", normSurface(col("surface")))
      .withColumn("head_tok",
        element_at(split(col("norm"), " "), -1))
      .withColumn("head_key", headKey(col("head_tok")))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("closed_class", col("mtype").isin("PRONOMINAL", "NOMINAL"))
      // M5 number/gender (UNKNOWN-safe, `NumberGenderComputer.scala:27-78`,
      // `Mention.scala:288-305`): pronouns by dictionary, nominals by plural
      // morphology; PROPER identifiers reveal neither → unknown (agreement
      // features never fire against unknown, mirroring the reference's
      // UNKNOWN semantics)
      .withColumn("number",
        when(col("mtype") === "PRONOMINAL",
          when(col("norm").isin("they", "them"), "plural").otherwise("singular"))
          .when(col("mtype") === "NOMINAL",
            when(col("norm").endsWith("s"), "plural").otherwise("singular"))
          .otherwise("unknown"))
      .withColumn("gender",
        when(col("norm").isin("he", "him"), "male")
          .when(col("norm").isin("she", "her"), "female")
          .when(col("mtype") === "PRONOMINAL", "neutral")
          .otherwise("unknown"))
      // F6 person sets — always "third" for this engine's anaphoric closed
      // class (deictic 1st/2nd person are excluded by design, see Pronouns)
      .withColumn("person",
        when(col("mtype") === "PRONOMINAL",
          graft.functions.pronounPerson(col("norm"))).otherwise("unknown"))
  }
}
