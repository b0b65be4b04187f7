package graft.ner

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained NER emissions (the corpus-statistics path of
  * `ner/NerFeaturizer.scala:139-166` + `NerSystemLabeled.scala:52-128`,
  * scoped to this engine's 3-label chain): a multinomial logistic emission
  * model over per-token surface features, trained with the same Adagrad+L1
  * regime as the coref trainer — supervision comes from PROPER mention
  * extents (B/I/O projection), i.e. the tagger distills the span generators
  * into a sequence model whose Viterbi/FB inference then runs without them.
  *
  * Also carries the L7 surface-match feature
  * (`ner/NerFeaturizer.scala:98-125`): token membership in the entity-link
  * dictionary's surface token set, attached via broadcast join — the NER ↔
  * linking coupling the reference wires through its wiki DB.
  *
  * Per-epoch cost: ONE aggregation over tokens (3·F gradient sums + loss),
  * map-side combined; weights re-enter the next plan as literals. Scales
  * like the coref trainer: no collect of data, only of the 3×F gradient row.
  */
object NerTrainer {

  /** Feature names; the `dict*` pair only fires when a dictionary is
    * supplied. `dict` = token appears in the dictionary's surface token set;
    * `dict_cont` = this AND the previous token do (the match-start vs
    * match-continuation split of the reference's surface-match features —
    * it is what lets the model separate B from I inside a dictionary hit). */
  val FeatureNames: Seq[String] =
    Seq("bias", "ident", "cap_mid", "digits", "cont", "dict", "dict_cont")
  val Dim: Int = FeatureNames.size

  /** Per-token features `(conv_id, turn_idx, pos, tok, x_*)`. `dictToks` =
    * single column `dtok` of lowercased dictionary surface tokens (L7),
    * broadcast-joined. */
  def tokenFeatures(transcripts: DataFrame, dictToks: Option[DataFrame] = None): DataFrame = {
    val toks = transcripts.select(col("conv_id"), col("turn_idx"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val withDict = dictToks match {
      case Some(d) =>
        toks.join(broadcast(d.select(lower(col("dtok")).as("__dt")).distinct()),
            lower(col("tok")) === col("__dt"), "left")
          .withColumn("in_dict", col("__dt").isNotNull).drop("__dt")
      case None => toks.withColumn("in_dict", lit(false))
    }
    val w = Window.partitionBy(col("conv_id"), col("turn_idx")).orderBy(col("pos"))
    val selfEnt = col("tok").rlike("^[A-Z0-9][A-Za-z0-9#-]*$")
    withDict
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .withColumn("prev_in_dict", coalesce(lag(col("in_dict"), 1).over(w), lit(false)))
      .select(col("conv_id"), col("turn_idx"), col("pos"), col("tok"),
        lit(1.0).as("x_bias"),
        col("tok").rlike("^(?:[A-Za-z]+[#-])?[0-9]+$").cast("double").as("x_ident"),
        (col("pos") > 0 && col("tok").rlike("^[A-Z][A-Za-z0-9#-]*$")).cast("double").as("x_cap_mid"),
        col("tok").rlike("^[0-9]+$").cast("double").as("x_digits"),
        (coalesce(col("prev").rlike("^[A-Z][A-Za-z0-9#-]*$"), lit(false)) && selfEnt)
          .cast("double").as("x_cont"),
        col("in_dict").cast("double").as("x_dict"),
        (col("in_dict") && col("prev_in_dict")).cast("double").as("x_dict_cont"))
  }

  /** L7 dictionary token set from a link dictionary `(surface, …)`: every
    * token of every surface (surfaces are short — ≤5 tokens — so the explode
    * is bounded; the result is broadcast at join time). */
  def dictTokens(dict: DataFrame): DataFrame =
    dict.select(explode(split(lower(col("surface")), " ")).as("dtok")).distinct()

  /** Token-level gold labels from PROPER mention extents: B at start, I
    * inside, O elsewhere (left join at consumption time). */
  def goldTokenLabels(properExtents: DataFrame): DataFrame =
    properExtents
      .select(col("conv_id"), col("turn_idx"), col("start"), col("end"))
      .select(col("conv_id"), col("turn_idx"),
        explode(sequence(col("start"), col("end"))).as("pos"), col("start"))
      .groupBy(col("conv_id"), col("turn_idx"), col("pos"))
      .agg(min(when(col("pos") === col("start"), 1).otherwise(2)).as("y"))

  /** Train the 3×F multinomial logistic emission model (Adagrad + L1).
    * `features` = [[tokenFeatures]]; `labels` = [[goldTokenLabels]] (absent
    * rows = O). Returns weights `W(label)(feature)`. */
  def train(features: DataFrame, labels: DataFrame, epochs: Int = 30,
      eta: Double = 0.5, lambda: Double = 0.0001): Array[Array[Double]] = {
    val xCols = FeatureNames.map(n => col(s"x_$n"))
    val data = features
      .join(labels, Seq("conv_id", "turn_idx", "pos"), "left")
      .withColumn("y", coalesce(col("y"), lit(0)))
      .select((xCols :+ col("y")): _*)
      .localCheckpoint(true)
    val n = data.count().toDouble
    // empty input would otherwise surface as an opaque NPE (null aggregate
    // sums → row.getDouble throws) and a 0/0 gradient
    require(n > 0, "NerTrainer.train: empty feature DataFrame")
    val w = Array.fill(3, Dim)(0.0)
    val sq = Array.fill(3, Dim)(0.0)
    for (_ <- 0 until epochs) {
      val s = (0 until 3).map(l =>
        xCols.zipWithIndex.map { case (c, j) => c * w(l)(j) }.reduce(_ + _))
      val mx = greatest(s(0), s(1), s(2))
      val es = s.map(si => exp(si - mx))
      val z = es.reduce(_ + _)
      val p = es.map(_ / z)
      val aggs = (for (l <- 0 until 3; j <- 0 until Dim) yield
        sum((p(l) - (col("y") === l).cast("double")) * xCols(j)).as(s"g_${l}_$j")).toSeq
      val row = data.agg(aggs.head, aggs.tail: _*).collect()(0)
      var k = 0
      for (l <- 0 until 3; j <- 0 until Dim) {
        val g = row.getDouble(k) / n; k += 1
        sq(l)(j) += g * g
        val h = 1.0 + math.sqrt(sq(l)(j))
        val wi = w(l)(j) - eta * g / h
        val shrink = eta * lambda / h
        w(l)(j) = math.signum(wi) * math.max(0.0, math.abs(wi) - shrink)
      }
    }
    w
  }

  /** Emission table `(conv_id, turn_idx, pos, tok, e_o, e_b, e_i)` from
    * trained weights — drop-in for [[Ner.emissions]] in Viterbi/FB. */
  def emissions(features: DataFrame, w: Array[Array[Double]]): DataFrame = {
    def lin(l: Int): Column =
      FeatureNames.zipWithIndex.map { case (name, j) => col(s"x_$name") * w(l)(j) }
        .reduce(_ + _)
    features.select(col("conv_id"), col("turn_idx"), col("pos"), col("tok"),
      lin(0).as("e_o"), lin(1).as("e_b"), lin(2).as("e_i"))
  }
}
