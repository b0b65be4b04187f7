package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{wordClass, wordShapePortable}

/** A5: the full lexical-counts bundle — the reference's
  * `LexicalCountsBundle` (`LexicalCountsBundle.scala:12-44`) builds 14
  * `Counter[String]` tables of mention-context words (cutoff-pruned, default
  * 20) used for lexical-feature backoff. Parse-free Spark analog: one long
  * `(table, key, n)` relation from twelve groupBy aggregations over the
  * mention extents and their turn contexts (the two governor tables need
  * parses — out of scope by design, SURVEY.md §2.6 A5). Each table is a
  * map-side-combinable hash aggregation; the union is cutoff-filtered once.
  */
object LexicalCounts {

  /** @param mentions mention rows (conv_id, turn_idx, start, end, norm, toks)
    * @param transcripts turn rows (for preceding/following context words)
    * @return (table:string, key:string, n:long), n >= cutoff */
  def bundle(mentions: DataFrame, transcripts: DataFrame, cutoff: Int = 20): DataFrame = {
    val toks = transcripts.select(col("conv_id"), col("turn_idx"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))

    // lc word tables key on the normalized (lowered) tokens; shape/class key
    // on the RAW head (case is the signal), like the reference's bundle
    val m = mentions.select(col("conv_id"), col("turn_idx"), col("start"),
      col("end"), col("toks"), element_at(col("toks"), -1).as("head_tok"),
      element_at(split(col("surface"), " "), -1).as("raw_head"))

    def table(name: String, key: org.apache.spark.sql.Column, src: DataFrame): DataFrame =
      src.select(key.as("key")).filter(col("key").isNotNull && col("key") =!= "")
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
        .select(lit(name).as("table"), col("key"), col("n"))

    // context words: join the token at a relative offset from the extent
    def contextWord(name: String, posCol: org.apache.spark.sql.Column): DataFrame =
      table(name, col("tok"),
        m.select(col("conv_id"), col("turn_idx"), posCol.as("pos"))
          .join(toks, Seq("conv_id", "turn_idx", "pos")))

    val tables = Seq(
      table("head", col("head_tok"), m),
      table("first", element_at(col("toks"), 1), m),
      table("last", element_at(col("toks"), -1), m),
      contextWord("preceding", col("start") - 1),
      contextWord("following", col("end") + 1),
      contextWord("preceding_by2", col("start") - 2),
      contextWord("following_by2", col("end") + 2),
      table("head_prefix", substring(col("head_tok"), 1, 3), m),
      table("head_suffix", // positive-index arithmetic: identical short-string
        // semantics in Spark and DuckDB (negative-start substr differs)
        call_function("substring", col("head_tok"),
          greatest(length(col("head_tok")) - 2, lit(1)), lit(3)), m),
      table("head_shape", wordShapePortable(col("raw_head")), m),
      table("head_class", wordClass(col("raw_head")), m),
      table("all_tokens", explode(col("toks")), m))

    tables.reduce(_ unionByName _).filter(col("n") >= cutoff)
  }
}
