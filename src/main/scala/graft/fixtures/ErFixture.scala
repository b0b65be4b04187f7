package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic cluster-labeled ER fixture (FIXTURES.md §2, seed fixed).
  *
  * An inventory of E entities with multi-token canonical surfaces; each
  * conversation scripts turns mentioning its entities through the surface
  * perturbation typology of the reference
  * (`/root/reference/.../coref/MentionType.java:4-17`,
  * `Mention.scala:276-315`): exact PROPER, bounded-Levenshtein typo,
  * truncation, abbreviation (initials), NOMINAL descriptor, PRONOMINAL —
  * closed-class forms only after a prior mention of the same entity in the
  * conversation (mirroring `DocumentGraph.scala:91-102`'s distance
  * assumption), and they always corefer with the *immediately preceding*
  * mention's entity. Distractor entities share non-head tokens
  * (misleading-match slice, `CorefEvaluator.scala:251-268`); every entity has
  * a unique head token.
  */
object ErFixture {

  case class Turn(conv_id: String, turn_idx: Int, role: String, text: String,
      tool: String, ts: Timestamp)
  case class GoldMention(conv_id: String, turn_idx: Int, start: Int, end: Int,
      entity_id: Int, form: String)

  private val firsts = Vector("Acme", "Bolt", "Cirrus", "Dyna", "Ember", "Flux",
    "Gale", "Helio", "Iris", "Juno", "Kilo", "Lumen", "Mira", "Nova", "Onyx",
    "Pico", "Quark", "Rune", "Sol", "Tara")
  private val mids = Vector("Data", "Cloud", "Logic", "Retail", "Energy", "Media")
  private val lasts = Vector("Systems", "Labs", "Holdings", "Partners", "Group",
    "Works", "Networks", "Industries", "Dynamics", "Solutions", "Ventures",
    "Corp", "Collective", "Alliance", "Union", "Consortium", "Guild", "Forge",
    "Studio", "Foundry")

  private val nominalForms = Vector("the vendor", "the company", "the client",
    "the supplier", "the firm")
  private val pronounForms = Vector("they", "it")

  // templates: lowercase filler with no pronoun/nominal dictionary words and
  // no capitalized tokens; mention is never sentence-initial.
  private val pre = Vector("we reached out to", "ticket opened for",
    "follow up with", "note from", "billing update for", "call scheduled with",
    "contract renewal for", "support case about", "escalation raised by",
    "invoice sent to")
  private val post = Vector("about the rollout", "regarding onboarding",
    "for the audit", "on the migration", "after the outage",
    "before the renewal", "per the agreement", "during the review")

  /** Entity canonical surface tokens; heads (last tokens) are unique. */
  def entitySurface(e: Int, rng: Random): Vector[String] = {
    val f = firsts(e % firsts.size)
    val l = lasts(e % lasts.size)
    if (e % 2 == 0) Vector(f, mids(e % mids.size), l) else Vector(f, l)
  }

  private def typo(tok: String, rng: Random): String = {
    // swap or drop one char, never the first (keeps capitalization)
    if (tok.length < 4) tok
    else if (rng.nextBoolean()) {
      val i = 1 + rng.nextInt(tok.length - 2)
      val a = tok.toCharArray; val t = a(i); a(i) = a(i + 1); a(i + 1) = t
      new String(a)
    } else {
      val i = 1 + rng.nextInt(tok.length - 1)
      tok.substring(0, i) + tok.substring(i + 1)
    }
  }

  case class Generated(turns: Seq[Turn], gold: Seq[GoldMention])

  def generate(entities: Int = 20, convs: Int = 60, seed: Long = 42L): Generated = {
    val rng = new Random(seed)
    val surfaces = (0 until entities).map(e => entitySurface(e, rng)).toVector
    val turns = ArrayBuffer.empty[Turn]
    val gold = ArrayBuffer.empty[GoldMention]
    var tsBase = 1700000000000L

    for (c <- 0 until convs) {
      val convId = s"v$c-0"
      val nTurns = 6 + rng.nextInt(7) // 6..12
      val convEntities = Vector.fill(1 + rng.nextInt(2))(rng.nextInt(entities)).distinct
      // track prior mentions per entity in this conversation
      val seen = scala.collection.mutable.Set.empty[Int]
      var prevEntity = -1
      for (t <- 0 until nTurns) {
        val role = Vector("user", "assistant", "tool")(rng.nextInt(3))
        val draw = rng.nextDouble()
        val (entity, mentionToks, form) =
          if (draw < 0.30 || prevEntity < 0 || seen.isEmpty) {
            val e = convEntities(rng.nextInt(convEntities.size))
            (e, surfaces(e), "exact")
          } else if (draw < 0.45) {
            val e = convEntities(rng.nextInt(convEntities.size))
            val s = surfaces(e)
            val i = rng.nextInt(s.size)
            (e, s.updated(i, typo(s(i), rng)), "typo")
          } else if (draw < 0.55 && seen.nonEmpty) {
            val e = seen.toVector.sorted.apply(rng.nextInt(seen.size))
            (e, Vector(surfaces(e).head), "truncation")
          } else if (draw < 0.65 && seen.nonEmpty) {
            val e = seen.toVector.sorted.apply(rng.nextInt(seen.size))
            (e, Vector(surfaces(e).map(_.charAt(0)).mkString.toUpperCase), "abbrev")
          } else if (draw < 0.82) {
            (prevEntity, nominalForms(rng.nextInt(nominalForms.size)).split(" ").toVector, "nominal")
          } else {
            (prevEntity, Vector(pronounForms(rng.nextInt(pronounForms.size))), "pronoun")
          }
        val p = pre(rng.nextInt(pre.size))
        val q = post(rng.nextInt(post.size))
        val text = s"$p ${mentionToks.mkString(" ")} $q"
        val start = p.split(" ").length
        val end = start + mentionToks.size - 1
        tsBase += 60000 + rng.nextInt(120000)
        turns += Turn(convId, t, role,
          text, if (role == "tool") "lookup" else null, new Timestamp(tsBase))
        gold += GoldMention(convId, t, start, end, entity, form)
        if (form == "exact" || form == "typo") { seen += entity }
        prevEntity = entity
      }
    }
    Generated(turns.toSeq, gold.toSeq)
  }

  def transcriptsDF(spark: SparkSession, g: Generated): DataFrame = {
    import spark.implicits._
    spark.createDataset(g.turns).toDF()
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  def goldDF(spark: SparkSession, g: Generated): DataFrame = {
    import spark.implicits._
    spark.createDataset(g.gold).toDF()
  }
}
