package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Antecedent decoding (SURVEY.md §2.6 A1/A2).
  *
  * Per-mention argmax over scored candidate antecedents, reproducing the
  * reference's `decodeMax` semantics
  * (`DocumentInferencerBasic.scala:112-128`): the best antecedent wins; ties
  * go to the *lowest* antecedent id (the reference keeps the first
  * strictly-greater candidate scanning j ascending); a mention with no
  * candidate scoring above the link threshold starts a new entity
  * (backpointer = self).
  */
object Decode {

  /** Backpointers `(cur_id, ant_id)`; only linked mentions appear (self-links
    * are implicit — absent rows mean "new entity", like the reference's
    * absent pruned cells, `DocumentGraph.scala:20,98`).
    *
    * Implemented as a hash aggregation (`min_by` on `(-score, ant_id)`), not
    * a sort-based row_number window: same argmax + tie-break (best score,
    * ties to the lowest antecedent id) with map-side partial aggregation and
    * no per-group sort — cheaper at 10^12-pair scale. */
  def backpointers(scored: DataFrame, threshold: Double = 0.0): DataFrame = {
    scored
      .filter(col("score") > threshold)
      .groupBy(col("cur_id"))
      .agg(min_by(struct(col("ant_id"), col("score")),
        struct(negate(col("score")), col("ant_id"))).as("b"))
      .select(col("cur_id"), col("b.ant_id").as("ant_id"), col("b.score").as("score"))
  }

  /** Per-mention softmax marginals over candidate antecedents (A1,
    * `DocumentInferencerBasic.scala:24-50`) — used by the coarse-to-fine
    * pruning pass (B2) and by the trainer's gradient. Two-pass max-shifted
    * log-sum-exp via window aggregation.
    *
    * Expects `scored` to carry ONE row per (ant_id, cur_id): duplicate arcs
    * (the sparse pipeline's band + in-band chain/bridge rows for one pair)
    * would each claim a softmax state, inflating Z and that antecedent's
    * marginal — dedup to max-score per pair first ([[backpointers]] and the
    * joint kernel do this internally; the dense pipeline is unique by
    * construction). */
  def marginals(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cur_id"))
    scored
      .withColumn("mx", max(col("score")).over(w))
      .withColumn("e", exp(col("score") - col("mx")))
      .withColumn("z", sum(col("e")).over(w))
      .withColumn("marginal", col("e") / col("z"))
      .drop("mx", "e", "z")
  }

  /** Coarse-to-fine pruning (B2, `CorefPruner.scala:36-47`): keep candidates
    * within `logThreshold` of the per-mention best score. */
  def prune(scored: DataFrame, logThreshold: Double = -5.0): DataFrame = {
    val w = Window.partitionBy(col("cur_id"))
    scored
      .withColumn("mx", max(col("score")).over(w))
      .filter(col("score") >= col("mx") + logThreshold)
      .drop("mx")
  }
}
