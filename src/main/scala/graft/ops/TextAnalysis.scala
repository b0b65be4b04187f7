package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.charShingles

/** Text-analysis operators for the training-data pipeline: language-ID
  * (stopword n-gram heuristic), quality scoring, token counting, document
  * fingerprinting. All pure column expressions — one scan, no shuffle.
  */
object TextAnalysis {

  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopEs = Seq("el", "la", "de", "y", "en", "es", "que")
  val StopFr = Seq("le", "les", "des", "et", "une", "est", "que")
  val StopDe = Seq("der", "die", "das", "und", "ist", "zu", "nicht")

  private def hits(toks: Column, dict: Seq[String]): Column =
    size(filter(toks, t => t.isin(dict: _*)))

  /** Language-ID heuristic: stopword-dictionary hit counts, first maximum in
    * fixed order (en, es, fr, de), `und` when nothing hits. */
  def langId(documents: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    documents.select(col("doc_id"),
        hits(toks, StopEn).as("h_en"), hits(toks, StopEs).as("h_es"),
        hits(toks, StopFr).as("h_fr"), hits(toks, StopDe).as("h_de"))
      .withColumn("lang_pred",
        when(col("h_en") >= col("h_es") && col("h_en") >= col("h_fr") &&
          col("h_en") >= col("h_de") && col("h_en") > 0, "en")
          .when(col("h_es") >= col("h_fr") && col("h_es") >= col("h_de") &&
            col("h_es") > 0, "es")
          .when(col("h_fr") >= col("h_de") && col("h_fr") > 0, "fr")
          .when(col("h_de") > 0, "de")
          .otherwise("und"))
  }

  /** Quality scoring: length/punctuation/stopword/digit ratios + a logistic
    * composite — the heuristic-filter stage of a pretraining pipeline. */
  def quality(documents: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val nToks = size(toks).cast("double")
    val textLen = length(col("text")).cast("double")
    val alnumLen = length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).cast("double")
    val digitLen = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
    val punctRatio = (textLen - alnumLen - (nToks - 1)) / textLen
    val stopRatio = hits(toks, StopEn).cast("double") / nToks
    val meanTokLen = alnumLen / nToks
    val raw = lit(-1.0) + stopRatio * 4.0 + least(nToks / 100.0, lit(1.0)) * 2.0 -
      punctRatio * 3.0 - (digitLen / textLen) * 2.0 +
      when(meanTokLen >= 3.0 && meanTokLen <= 8.0, 0.5).otherwise(-0.5)
    documents.select(col("doc_id"),
      size(toks).as("n_tokens"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(lit(1.0) / (lit(1.0) + exp(-raw)), 6).as("quality"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
        .as("bpeish_tokens"),
      length(col("text")).as("n_chars"))

  /** Document fingerprinting: winnowing-style min-hash over char 5-gram
    * windows (md5, portable) + distinct-shingle cardinality. */
  def fingerprint(documents: DataFrame): DataFrame = {
    val sh = charShingles(lower(col("text")), 5)
    documents.select(col("doc_id"),
      array_min(transform(sh, s => md5(s))).as("fp_min"),
      md5(array_join(array_sort(array_distinct(sh)), "")).as("fp_set"),
      size(array_distinct(sh)).as("n_distinct_shingles"))
  }
}
