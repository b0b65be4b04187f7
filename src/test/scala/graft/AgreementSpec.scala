package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** P5 agreement + M5 number/gender are load-bearing in decode: a pronoun must
  * prefer an agreement-compatible antecedent over a closer clashing one
  * (mirrors ref `PairwiseIndexingFeaturizerJoint.scala:220-234` +
  * `NumberGenderComputer.scala:27-78` UNKNOWN-safe semantics). */
class AgreementSpec extends SparkSuite {
  import spark.implicits._

  // one conversation: named entity, then it / they / he / she. Every pronoun
  // is gold-coreferent with the named mention. Without agreement features,
  // decode links each pronoun to the CLOSEST prior mention (dist_decay);
  // with them, clashing pronouns must skip to the named antecedent.
  lazy val transcripts = Seq(
    ("ag-0", 0, "user", "ticket opened for Acme Systems today", null: String),
    ("ag-0", 1, "user", "note from it today", null: String),
    ("ag-0", 2, "user", "they followed up quickly", null: String),
    ("ag-0", 3, "user", "call with he later", null: String),
    ("ag-0", 4, "user", "she called back after", null: String))
    .zipWithIndex.map { case ((c, t, r, x, tl), i) =>
      (c, t, r, x, tl, new java.sql.Timestamp(1700000000000L + i * 60000L))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  def idOf(m: org.apache.spark.sql.DataFrame, surface: String): String =
    m.filter(col("surface") === surface).select("mention_id").collect()(0).getString(0)

  test("number/gender properties computed UNKNOWN-safe") {
    val m = Mentions.extractAll(transcripts).cache()
    val props = m.select("surface", "number", "gender").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(props("Acme Systems") === ("unknown", "unknown"))
    assert(props("it") === ("singular", "neutral"))
    assert(props("they") === ("plural", "neutral"))
    assert(props("he") === ("singular", "male"))
    assert(props("she") === ("singular", "female"))
  }

  test("agreement features steer decode away from clashing antecedents") {
    val res = Pipeline.run(spark, transcripts, Pipeline.Config(mentionGenerator = "all"))
    val m = res.mentions.cache()
    val named = idOf(m, "Acme Systems")
    val bp = res.backptrs.select("cur_id", "ant_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // every pronoun must pick the named (agreement-unknown) antecedent, not
    // the nearer clashing pronoun
    assert(bp(idOf(m, "they")) === named, "plural 'they' must skip singular 'it'")
    assert(bp(idOf(m, "she")) === named, "female 'she' must skip male 'he' and neutral pronouns")
    assert(bp(idOf(m, "he")) === named, "male 'he' must skip neutral 'it'/'they'")
    // single cluster overall
    assert(res.clusters.select("cluster_id").distinct().count() === 1L)
  }

  test("without agreement weights the clashing antecedent wins (load-bearing)") {
    val w0 = Scoring.DefaultWeights.values.clone()
    Seq("same_role", "number_match", "number_clash", "gender_match", "gender_clash")
      .foreach(n => w0(Scoring.FeatureNames.indexOf(n)) = 0.0)
    val res = Pipeline.run(spark, transcripts,
      Pipeline.Config(weights = Scoring.Weights(w0), mentionGenerator = "all"))
    val m = res.mentions.cache()
    val bp = res.backptrs.select("cur_id", "ant_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(bp(idOf(m, "they")) === idOf(m, "it"),
      "with agreement zeroed, dist_decay must prefer the nearest antecedent")
  }
}
