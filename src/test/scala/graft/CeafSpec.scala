package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Eval

/** CEAFe (Luo 2005 φ4) gates.
  *
  * The reference outsources CEAFe to the external CoNLL `scorer.pl`
  * (`CorefEvaluator.scala:463-484`); [[Eval.ceafe]] computes it natively
  * with an exact per-conversation Hungarian matching. These specs pin:
  *  1. the assignment kernel against a matrix where greedy
  *     (best-pair-first) matching is provably suboptimal;
  *  2. end-to-end CEAFe on a hand-computed multi-entity fixture — the case
  *     the degenerate one-entity-per-conversation oracle corpus never
  *     exercises;
  *  3. the perfect-clustering identity (P = R = F1 = 1).
  */
class CeafSpec extends SparkSuite {

  test("maxAssignment beats greedy on an adversarial matrix") {
    // greedy picks 0.9 first, forcing 0.9 + 0.1 = 1.0;
    // the optimal assignment is 0.8 + 0.85 = 1.65
    val w = Array(Array(0.9, 0.8), Array(0.85, 0.1))
    assert(math.abs(Eval.maxAssignment(w) - 1.65) < 1e-12)
  }

  test("maxAssignment on rectangular matrices matches brute force") {
    // 2x4: exhaustive over ordered column pairs
    val a = Array(Array(0.2, 0.7, 0.1, 0.4), Array(0.6, 0.9, 0.3, 0.05))
    val brute = (for {
      j0 <- a(0).indices; j1 <- a(0).indices if j1 != j0
    } yield a(0)(j0) + a(1)(j1)).max
    assert(math.abs(Eval.maxAssignment(a) - brute) < 1e-12)
    // 1-row: the max entry
    assert(Eval.maxAssignment(Array(Array(0.3, 0.8, 0.5))) == 0.8)
    // empty: zero
    assert(Eval.maxAssignment(Array.empty[Array[Double]]) == 0.0)
  }

  test("CEAFe on a multi-entity conversation matches the hand computation") {
    import spark.implicits._
    // one conversation, two gold entities, two pred clusters:
    //   K1 = {m1, m2, m3}  K2 = {m4, m5}
    //   R1 = {m1, m2, m4, m5}  R2 = {m3}
    // φ4:  K1R1 = 2*2/(3+4) = 4/7   K1R2 = 2*1/(3+1) = 1/2
    //      K2R1 = 2*2/(2+4) = 2/3   K2R2 = 0
    // optimal matching = K1R2 + K2R1 = 1/2 + 2/3 = 7/6
    //   (greedy-by-best-pair picks K2R1 first, then K1R2 — same here; the
    //    adversarial-kernel spec above covers the case where greedy loses)
    // P = (7/6)/2, R = (7/6)/2, F1 = 7/12
    def mid(i: Int) = f"conv#${0}%06d${i}%06d"
    val pred = Seq(
      (mid(1), "k1"), (mid(2), "k1"), (mid(3), "k1"),
      (mid(4), "k2"), (mid(5), "k2")).toDF("mention_id", "cluster_id")
    val gold = Seq(
      (mid(1), "r1"), (mid(2), "r1"), (mid(4), "r1"), (mid(5), "r1"),
      (mid(3), "r2")).toDF("mention_id", "entity_id")
    val r = Eval.ceafe(pred, gold).collect()(0)
    assert(r.getAs[Long]("n_pred_clusters") == 2L)
    assert(r.getAs[Long]("n_gold_entities") == 2L)
    assert(math.abs(r.getAs[Double]("precision") - 7.0 / 12.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - 7.0 / 12.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("f1") - 7.0 / 12.0) < 1e-12)
  }

  test("CEAFe penalizes spurious and missed mentions via FULL cluster sizes") {
    import spark.implicits._
    // pred K1 = {m1, m2, m3(spurious)}, K2 = {m4} all-spurious;
    // gold R1 = {m1, m2}, R2 = {m5} entirely missed.
    // Luo φ4 on FULL sizes: K1R1 = 2*2/(3+2) = 0.8, all other cells 0;
    // optimal matching Φ = 0.8 with |K| = 2 (K2 still counts) and |R| = 2
    // (R2 still counts) → P = 0.4, R = 0.4, F1 = 0.4.
    // The pre-fix inner join dropped m3/m4/m5: K1R1 = 2*2/(2+2) = 1.0,
    // K2 and R2 vanished → P = R = F1 = 1.0 — spuriously perfect.
    def mid(i: Int) = f"conv#${0}%06d${i}%06d"
    val pred = Seq(
      (mid(1), "k1"), (mid(2), "k1"), (mid(3), "k1"),
      (mid(4), "k2")).toDF("mention_id", "cluster_id")
    val gold = Seq(
      (mid(1), "r1"), (mid(2), "r1"),
      (mid(5), "r2")).toDF("mention_id", "entity_id")
    val r = Eval.ceafe(pred, gold).collect()(0)
    assert(r.getAs[Long]("n_pred_clusters") == 2L,
      "an all-spurious cluster still counts in |K|")
    assert(r.getAs[Long]("n_gold_entities") == 2L,
      "an entirely-missed entity still counts in |R|")
    assert(math.abs(r.getAs[Double]("precision") - 0.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - 0.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("f1") - 0.4) < 1e-12)
  }

  test("MUC and B³ penalize spurious and missed mentions (twinless semantics)") {
    import spark.implicits._
    // same misaligned fixture as the CEAFe case above:
    //   pred K1 = {m1, m2, m3(spurious)}, K2 = {m4} all-spurious
    //   gold R1 = {m1, m2}, R2 = {m5} entirely missed
    def mid(i: Int) = f"conv#${0}%06d${i}%06d"
    val pred = Seq(
      (mid(1), "k1"), (mid(2), "k1"), (mid(3), "k1"),
      (mid(4), "k2")).toDF("mention_id", "cluster_id")
    val gold = Seq(
      (mid(1), "r1"), (mid(2), "r1"),
      (mid(5), "r2")).toDF("mention_id", "entity_id")
    // MUC: R1 partitions = {K1} → recall 1/1; R2 has sz 1 (no links).
    //   K1 partitions = {R1} + twinless m3 → (3-2)/(3-1) = 1/2; K2 sz 1.
    //   Old inner-join code said precision 1.0 (m3/m4 vanished).
    val m = Eval.muc(pred, gold).collect()(0)
    assert(math.abs(m.getAs[Double]("muc_recall") - 1.0) < 1e-12)
    assert(math.abs(m.getAs[Double]("muc_precision") - 0.5) < 1e-12)
    assert(math.abs(m.getAs[Double]("muc_f1") - 2.0 / 3.0) < 1e-12)
    // B³ v8: P = (2/3 + 2/3 + 0 + 0)/4 = 1/3; R = (1 + 1 + 0)/3 = 2/3.
    //   Old code said P = R = 1.0.
    val b = Eval.bcub(pred, gold).collect()(0)
    assert(math.abs(b.getAs[Double]("bcub_precision") - 1.0 / 3.0) < 1e-12)
    assert(math.abs(b.getAs[Double]("bcub_recall") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(b.getAs[Double]("bcub_f1") - 4.0 / 9.0) < 1e-12)
  }

  test("fully disjoint pred/gold mention sets score F1 = 0, never NaN") {
    import spark.implicits._
    def mid(i: Int) = f"conv#${0}%06d${i}%06d"
    val pred = Seq((mid(1), "k1"), (mid(2), "k1")).toDF("mention_id", "cluster_id")
    val gold = Seq((mid(3), "r1"), (mid(4), "r1")).toDF("mention_id", "entity_id")
    val b = Eval.bcub(pred, gold).collect()(0)
    assert(b.getAs[Double]("bcub_precision") === 0.0)
    assert(b.getAs[Double]("bcub_recall") === 0.0)
    assert(b.getAs[Double]("bcub_f1") === 0.0, "0/0 must collapse to 0, not NaN")
    val c = Eval.ceafe(pred, gold).collect()(0)
    assert(c.getAs[Double]("f1") === 0.0)
    val m = Eval.muc(pred, gold).collect()(0)
    assert(m.getAs[Double]("muc_f1") === 0.0)
  }

  test("empty pred table and all-singleton gold leave 0 denominators → 0, not NaN") {
    import spark.implicits._
    def mid(i: Int) = f"conv#${0}%06d${i}%06d"
    val noPred = Seq.empty[(String, String)].toDF("mention_id", "cluster_id")
    val gold = Seq((mid(1), "r1"), (mid(2), "r1")).toDF("mention_id", "entity_id")
    val b = Eval.bcub(noPred, gold).collect()(0)
    assert(b.getAs[Double]("bcub_precision") === 0.0) // was 0/0 = NaN
    val c = Eval.ceafe(noPred, gold).collect()(0)
    assert(c.getAs[Double]("precision") === 0.0)
    // all-singleton gold: MUC recall denominator Σ(|g|-1) = 0
    val singletons = Seq((mid(1), "a"), (mid(2), "b")).toDF("mention_id", "entity_id")
    val m = Eval.muc(singletons.toDF("mention_id", "cluster_id"), singletons).collect()(0)
    assert(m.getAs[Double]("muc_recall") === 0.0 &&
      m.getAs[Double]("muc_precision") === 0.0 && m.getAs[Double]("muc_f1") === 0.0)
  }

  test("pairwiseF1 0/0 collapses to 0, never NaN (Run --evaluate serializes it)") {
    import spark.implicits._
    // tp = 0 with pred_pairs > 0 and gold_pairs > 0: P = R = 0, F1 was 0/0
    val universe = Seq(("m1", "m2"), ("m3", "m4")).toDF("ant_id", "cur_id")
    val pred = Seq(("m1", "k"), ("m2", "k"), ("m3", "a"), ("m4", "b"))
      .toDF("mention_id", "cluster_id")
    val gold = Seq(("m1", "x"), ("m2", "y"), ("m3", "r"), ("m4", "r"))
      .toDF("mention_id", "entity_id")
    val r = Eval.pairwiseF1(universe, pred, gold).collect()(0)
    assert(r.getAs[Double]("precision") === 0.0)
    assert(r.getAs[Double]("recall") === 0.0)
    assert(r.getAs[Double]("f1") === 0.0, "0/0 must collapse to 0, not NaN")
    // no same-cluster pairs at all on either side: every ratio is 0/0
    val pred2 = Seq(("m1", "k1"), ("m2", "k2")).toDF("mention_id", "cluster_id")
    val gold2 = Seq(("m1", "x"), ("m2", "y")).toDF("mention_id", "entity_id")
    val r2 = Eval.pairwiseF1(universe.limit(1), pred2, gold2).collect()(0)
    assert(r2.getAs[Double]("precision") === 0.0)
    assert(r2.getAs[Double]("recall") === 0.0)
    assert(r2.getAs[Double]("f1") === 0.0)
  }

  test("CEAFe of a perfect clustering is exactly 1.0 across conversations") {
    import spark.implicits._
    def mid(c: String, i: Int) = f"$c#${0}%06d${i}%06d"
    val rows = for {
      c <- Seq("a", "b", "c"); e <- 0 until 3; i <- 0 until (e + 1)
    } yield (mid(c, e * 10 + i), s"$c-e$e")
    val pred = rows.toDF("mention_id", "cluster_id")
    val gold = pred.withColumnRenamed("cluster_id", "entity_id")
    val r = Eval.ceafe(pred, gold).collect()(0)
    assert(r.getAs[Double]("precision") == 1.0 && r.getAs[Double]("recall") == 1.0
      && r.getAs[Double]("f1") == 1.0)
  }
}
