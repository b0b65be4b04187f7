package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-quality evaluation, computed natively as aggregations — the
  * reference's in-process evaluator family (SURVEY.md §2.6 A7-A10,
  * `CorefEvaluator.scala`), replacing its forked perl scorer.
  */
object Eval {

  /** Pairwise link P/R/F1 (A8, the north-star metric;
    * `CorefEvaluator.scala:365-395`) over labeled pairs sharing a blocking
    * key (per BASELINE.json: at 10^12 scale the all-pairs universe is
    * unmaterializable — the evaluation universe is the blocked pair set).
    *
    * @param pairs (ant_id, cur_id) — the evaluation pair universe
    * @param pred  (mention_id, cluster_id)
    * @param gold  (mention_id, entity_id)
    */
  def pairwiseF1(pairs: DataFrame, pred: DataFrame, gold: DataFrame): DataFrame = {
    val withPred = pairs
      .join(pred.select(col("mention_id").as("ant_id"), col("cluster_id").as("pc_a")), "ant_id")
      .join(pred.select(col("mention_id").as("cur_id"), col("cluster_id").as("pc_c")), "cur_id")
      .join(gold.select(col("mention_id").as("ant_id"), col("entity_id").as("g_a")), "ant_id")
      .join(gold.select(col("mention_id").as("cur_id"), col("entity_id").as("g_c")), "cur_id")
      .withColumn("pred_same", col("pc_a") === col("pc_c"))
      .withColumn("gold_same", col("g_a") === col("g_c"))
    withPred.agg(
      sum(when(col("pred_same") && col("gold_same"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred_same"), 1L).otherwise(0L)).as("pred_pairs"),
      sum(when(col("gold_same"), 1L).otherwise(0L)).as("gold_pairs"))
      .withColumn("precision", when(col("pred_pairs") > 0,
        col("tp").cast("double") / col("pred_pairs")).otherwise(lit(0.0)))
      .withColumn("recall", when(col("gold_pairs") > 0,
        col("tp").cast("double") / col("gold_pairs")).otherwise(lit(0.0)))
      // 0/0 collapses to 0.0, not NaN (the muc/bcub/ceafe guard, applied
      // here too): a fully-disjoint prediction must serialize as a number
      .withColumn("f1", when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** Blocking recall audit (B7, `DocumentGraph.scala:117-142`): fraction of
    * gold same-entity pairs that survive blocking. `goldPairs` are canonical
    * (ant_id < cur_id). */
  def blockingRecall(candidatePairs: DataFrame, goldPairs: DataFrame): DataFrame = {
    val hit = goldPairs.join(candidatePairs.select("ant_id", "cur_id"),
      Seq("ant_id", "cur_id"), "left_semi")
    goldPairs.agg(count(lit(1)).as("gold_pairs"))
      .crossJoin(hit.agg(count(lit(1)).as("recalled")))
      // 0/0 (no gold pairs) collapses to 0.0, not SQL null — the same
      // serialize-as-a-number guard every other metric in this module applies
      .withColumn("recall", when(col("gold_pairs") > 0,
        col("recalled").cast("double") / col("gold_pairs")).otherwise(lit(0.0)))
  }

  /** B7a — within-conversation antecedent recall (the reference's pruning
    * stat, `DocumentGraph.scala:117-142`): of mentions having >=1 prior
    * same-entity mention in their conversation, the fraction that retain >=1
    * such candidate antecedent after blocking. */
  def antecedentRecall(candidatePairs: DataFrame, mentions: DataFrame,
      gold: DataFrame): DataFrame = {
    val m = mentions.join(gold, "mention_id")
      .select(col("mention_id"), col("conv_id"), col("m_seq"), col("entity_id"))
    val a = m.toDF(m.columns.map(_ + "_a"): _*)
    val c = m.toDF(m.columns.map(_ + "_c"): _*)
    val goldAnte = a.join(c,
      col("conv_id_a") === col("conv_id_c") &&
        col("entity_id_a") === col("entity_id_c") &&
        col("m_seq_a") < col("m_seq_c"))
      .select(col("mention_id_a").as("ant_id"), col("mention_id_c").as("cur_id"))
    val anaphoric = goldAnte.select(col("cur_id")).distinct()
    val retained = goldAnte
      .join(candidatePairs.select("ant_id", "cur_id"), Seq("ant_id", "cur_id"), "left_semi")
      .select(col("cur_id")).distinct()
    anaphoric.agg(count(lit(1)).as("anaphoric"))
      .crossJoin(retained.agg(count(lit(1)).as("retained")))
      .withColumn("recall", when(col("anaphoric") > 0,
        col("retained").cast("double") / col("anaphoric")).otherwise(lit(0.0)))
  }

  /** B7b — entity connectivity recall: what transitive clustering actually
    * needs from blocking is that each gold entity's mentions stay *connected*
    * through same-entity candidate pairs (short forms may reach each other
    * via the full-form pivot rather than a direct block). MUC-style link
    * recall of the blocking graph: sum(|e| - components(e)) / sum(|e| - 1). */
  def connectivityRecall(candidatePairs: DataFrame, gold: DataFrame): DataFrame = {
    val sameEntity = candidatePairs
      .join(gold.select(col("mention_id").as("ant_id"), col("entity_id").as("e_a")), "ant_id")
      .join(gold.select(col("mention_id").as("cur_id"), col("entity_id").as("e_c")), "cur_id")
      .filter(col("e_a") === col("e_c"))
      .select(col("ant_id").as("src"), col("cur_id").as("dst"))
    val nodes = gold.select(col("mention_id").as("id"))
    val comps = Clustering.connectedComponents(nodes, sameEntity)
    comps.join(gold, "mention_id")
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("cluster_id")).as("parts"))
      .agg(sum(col("sz") - col("parts")).as("num"), sum(col("sz") - 1).as("den"))
      .withColumn("recall", when(col("den") > 0,
        col("num").cast("double") / col("den")).otherwise(lit(0.0)))
  }

  /** MUC (A10, `CorefEvaluator.scala:491-503`): link-based metric from the
    * pred×gold contingency table.
    * MUC-R = Σ_gold (|g| - p(g)) / Σ_gold (|g| - 1) where p(g) = #pred
    * clusters intersecting g PLUS one partition per gold mention no pred
    * cluster contains (twinless-as-singleton, CoNLL scorer v8); precision
    * is symmetric over pred clusters with spurious mentions kept. */
  def muc(pred: DataFrame, gold: DataFrame): DataFrame = {
    // FULL outer join (CoNLL scorer v8 twinless semantics): a gold cluster
    // keeps its unrecalled mentions — each counts as its own partition — and
    // a pred cluster keeps its spurious mentions symmetrically. An inner
    // join shrank both sides to the aligned mentions, so a pred cluster
    // padded with spurious mentions scored perfect precision.
    val joined = pred.select(col("mention_id"), col("cluster_id"))
      .join(gold.select(col("mention_id"), col("entity_id")),
        Seq("mention_id"), "full_outer")
    val goldSide = joined.filter(col("entity_id").isNotNull)
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("sz"),
        (countDistinct(col("cluster_id")) +
          count(when(col("cluster_id").isNull, 1))).as("parts"))
      .agg(sum(col("sz") - col("parts")).as("num_r"), sum(col("sz") - 1).as("den_r"))
    val predSide = joined.filter(col("cluster_id").isNotNull)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"),
        (countDistinct(col("entity_id")) +
          count(when(col("entity_id").isNull, 1))).as("parts"))
      .agg(sum(col("sz") - col("parts")).as("num_p"), sum(col("sz") - 1).as("den_p"))
    goldSide.crossJoin(predSide)
      // all-singleton sides leave a 0 denominator (scorer.pl reports 0)
      .withColumn("muc_recall", when(col("den_r") > 0,
        col("num_r").cast("double") / col("den_r")).otherwise(lit(0.0)))
      .withColumn("muc_precision", when(col("den_p") > 0,
        col("num_p").cast("double") / col("den_p")).otherwise(lit(0.0)))
      .withColumn("muc_f1",
        when(col("muc_precision") + col("muc_recall") > 0.0,
          lit(2.0) * col("muc_precision") * col("muc_recall") /
            (col("muc_precision") + col("muc_recall")))
          .otherwise(lit(0.0))) // P = R = 0 (fully misaligned) → F1 0, not NaN
  }

  /** B³ (A10): per-mention precision/recall averaged over mentions.
    * For mention m: p(m) = |C(m) ∩ G(m)| / |C(m)|, r(m) = |C(m) ∩ G(m)| / |G(m)|. */
  def bcub(pred: DataFrame, gold: DataFrame): DataFrame = {
    // Full sizes and full mention counts (CoNLL scorer v8 twinless
    // semantics): cluster/entity sizes come from their OWN tables and the
    // averages run over ALL pred mentions (precision) / ALL gold mentions
    // (recall) — a twinless mention contributes 0 to the sum but still
    // counts in the denominator. The old intersection-only shape let
    // spurious and missed mentions vanish from both.
    val joined = pred.join(gold, "mention_id") // overlaps exist only where aligned
    val cell = joined.groupBy(col("cluster_id"), col("entity_id"))
      .agg(count(lit(1)).as("ovl"))
    val cSize = pred.groupBy(col("cluster_id")).agg(count(lit(1)).as("csz"))
    val gSize = gold.groupBy(col("entity_id")).agg(count(lit(1)).as("gsz"))
    // mention-count denominators as aggregate legs of the SAME plan, not
    // eager driver-side count() actions — the eager counts re-ran the
    // pred/gold upstream lineage as separate jobs before the metric job
    // scanned them again (3× scan cost on the Run --evaluate path)
    val denoms = pred.agg(count(lit(1)).as("n_pred"))
      .crossJoin(gold.agg(count(lit(1)).as("n_gold")))
    cell.join(cSize, "cluster_id").join(gSize, "entity_id")
      .agg(
        sum(col("ovl") * col("ovl") / col("csz")).as("sum_p"),
        sum(col("ovl") * col("ovl") / col("gsz")).as("sum_r"))
      .crossJoin(denoms)
      .withColumn("bcub_precision", // empty pred table → 0, not 0/0 NaN
        when(col("n_pred") > 0,
          coalesce(col("sum_p"), lit(0.0)) / col("n_pred")).otherwise(lit(0.0)))
      .withColumn("bcub_recall",
        when(col("n_gold") > 0,
          coalesce(col("sum_r"), lit(0.0)) / col("n_gold")).otherwise(lit(0.0)))
      .withColumn("bcub_f1",
        when(col("bcub_precision") + col("bcub_recall") > 0.0,
          lit(2.0) * col("bcub_precision") * col("bcub_recall") /
            (col("bcub_precision") + col("bcub_recall")))
          .otherwise(lit(0.0))) // zero-overlap slice → F1 0, not 0/0 NaN
  }

  /** C5 oracle predicted clustering (`CorefDoc.scala:41-101`): each
    * predicted mention inherits the gold entity of its extent-aligned gold
    * mention; unaligned predictions become singletons (own id as cluster) —
    * the upper bound a perfect linker could reach on these mentions.
    *
    * Divergence repair (the reference's duplicate-gold-mention sanitizing,
    * `CorefDoc.scala:69-82`): gold extents are deduplicated BEFORE the
    * alignment join — a gold table carrying the same extent twice (the
    * reference's wsj_0990 case) assigns the lexicographically-least entity
    * deterministically instead of fanning the join out into duplicate,
    * possibly conflicting, cluster rows. */
  def oraclePredClustering(predMentions: DataFrame, goldMentions: DataFrame): DataFrame = {
    val key = Seq("conv_id", "turn_idx", "start", "end")
    val goldDedup = goldMentions
      .groupBy(key.map(col): _*)
      .agg(min(col("entity_id").cast("string")).as("entity_id"))
    predMentions.select((key.map(col) :+ col("mention_id")): _*)
      .join(goldDedup, key, "left")
      .select(col("mention_id"),
        coalesce(concat(lit("g:"), col("entity_id")), col("mention_id")).as("cluster_id"))
  }

  /** CEAFe (Luo 2005, φ4): entity-based CEAF — optimal one-to-one matching
    * between predicted clusters and gold entities per conversation, summed
    * corpus-wide. The reference delegates this metric to the external CoNLL
    * `scorer.pl` (`CorefConllScorer`, `CorefEvaluator.scala:463-484` — "Our
    * MUC and BCUB agree with those from the CoNLL scorer"); here it is
    * computed natively: per-conversation overlap matrices are tiny (tens of
    * clusters), so an exact O(n³) Hungarian assignment inside `mapGroups`
    * distributes over conversations with no driver-side work.
    *
    * φ4(K,R) = 2·|K∩R| / (|K|+|R|); Φ = Σ_conv max-matching Σφ4;
    * P = Φ/|K_total|, R = Φ/|R_total|, F1 = 2PR/(P+R).
    */
  def ceafe(predClusters: DataFrame, goldClusters: DataFrame): DataFrame = {
    val spark = predClusters.sparkSession
    import spark.implicits._
    // FULL outer join: Luo-2005 φ4 uses FULL cluster sizes — a predicted
    // cluster keeps its spurious (non-gold) mentions in the denominator and
    // an all-spurious cluster still counts in |K| (precision), symmetrically
    // for gold entities with missed mentions (recall). An inner join would
    // shrink both and inflate CEAFe exactly when pred and gold mention sets
    // differ (reference: scorer.pl ceafe / CorefEvaluator).
    val joined = predClusters.select(col("mention_id"), col("cluster_id").cast("string"))
      .join(goldClusters.select(col("mention_id"), col("entity_id").cast("string")),
        Seq("mention_id"), "full_outer")
      .select(graft.functions.convOfMentionId(col("mention_id")).as("conv_id"),
        col("cluster_id"), col("entity_id"))
      .as[(String, String, String)]
    val per = joined.groupByKey(_._1).mapGroups { (conv, it) =>
      val rows = it.toArray
      val pIdx = rows.iterator.map(_._2).filter(_ != null)
        .toArray.distinct.sorted.zipWithIndex.toMap
      val gIdx = rows.iterator.map(_._3).filter(_ != null)
        .toArray.distinct.sorted.zipWithIndex.toMap
      val np = pIdx.size; val ng = gIdx.size
      val pSize = new Array[Int](np); val gSize = new Array[Int](ng)
      val ovl = Array.ofDim[Int](np, ng)
      rows.foreach { case (_, c, e) =>
        if (c != null) pSize(pIdx(c)) += 1
        if (e != null) gSize(gIdx(e)) += 1
        if (c != null && e != null) ovl(pIdx(c))(gIdx(e)) += 1
      }
      // φ4 weight matrix, smaller side as rows (the assignment matches every
      // row; weights are ≥ 0 so a full row assignment is an optimal matching)
      val w =
        if (np <= ng) Array.tabulate(np, ng)((i, j) => 2.0 * ovl(i)(j) / (pSize(i) + gSize(j)))
        else Array.tabulate(ng, np)((j, i) => 2.0 * ovl(i)(j) / (pSize(i) + gSize(j)))
      (conv, maxAssignment(w), np.toLong, ng.toLong)
    }.toDF("conv_id", "phi", "np", "ng")
    per.agg(
        sum(col("phi")).as("phi_sum"),
        sum(col("np")).as("n_pred_clusters"),
        sum(col("ng")).as("n_gold_entities"))
      .withColumn("precision", when(col("n_pred_clusters") > 0, // empty side → 0, not NaN
        col("phi_sum") / col("n_pred_clusters")).otherwise(lit(0.0)))
      .withColumn("recall", when(col("n_gold_entities") > 0,
        col("phi_sum") / col("n_gold_entities")).otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")))
          .otherwise(lit(0.0))) // zero-overlap corpus → F1 0, not NaN
      .select(col("n_pred_clusters"), col("n_gold_entities"),
        col("precision"), col("recall"), col("f1"))
  }

  /** Exact max-weight assignment of every row of `a` (n×m, n ≤ m) to a
    * distinct column: the classic O(n²m) Hungarian algorithm with potentials,
    * run on negated weights (min-cost form). Returns the matched weight sum
    * read directly off `a`, so per-entry values reach the caller bit-exact. */
  private[graft] def maxAssignment(a: Array[Array[Double]]): Double = {
    val n = a.length
    if (n == 0) return 0.0
    val m = a(0).length
    require(n <= m, s"maxAssignment needs rows <= cols, got ${n}x$m")
    val u = new Array[Double](n + 1); val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1); val way = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(Double.MaxValue)
      val used = new Array[Boolean](m + 1)
      var found = false
      while (!found) {
        used(j0) = true
        val i0 = p(j0); var delta = Double.MaxValue; var j1 = -1
        var j = 1
        while (j <= m) {
          if (!used(j)) {
            val cur = -a(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= m) {
          if (used(j)) { u(p(j)) += delta; v(j) += delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        if (p(j0) == 0) found = true
      }
      var done = false
      while (!done) {
        val j1 = way(j0); p(j0) = p(j1); j0 = j1
        if (j0 == 0) done = true
      }
      i += 1
    }
    var s = 0.0
    var j = 1
    while (j <= m) { if (p(j) != 0) s += a(p(j) - 1)(j - 1); j += 1 }
    s
  }

  /** Mention-detection P/R/F1 (A7, `CorefDoc.scala:104-109`): pred vs gold
    * mention extents keyed by (conv_id, turn_idx, start, end). */
  def mentionPRF(predMentions: DataFrame, goldMentions: DataFrame): DataFrame =
    extentPRF(predMentions, goldMentions)

  /** Shared extent-set P/R/F1 as ONE aggregation (no separate count()
    * actions): full-outer join the two extent sets with membership flags,
    * then a single agg computing tp / n_pred / n_gold, with P/R/F1 derived
    * as columns. Extents are unique on the key in both inputs (mention
    * dedup / chunk grouping guarantee it), so the join is 1:1. */
  private[graft] def extentPRF(pred: DataFrame, gold: DataFrame): DataFrame = {
    val key = Seq("conv_id", "turn_idx", "start", "end")
    val p = pred.select(key.map(col): _*).withColumn("in_p", lit(1L))
    val g = gold.select(key.map(col): _*).withColumn("in_g", lit(1L))
    p.join(g, key, "full_outer")
      .agg(
        coalesce(sum(col("in_p") * col("in_g")), lit(0L)).as("tp"),
        coalesce(sum(col("in_p")), lit(0L)).as("n_pred"),
        coalesce(sum(col("in_g")), lit(0L)).as("n_gold"))
      .withColumn("precision",
        when(col("n_pred") === 0, 0.0)
          .otherwise(col("tp").cast("double") / col("n_pred")))
      .withColumn("recall",
        when(col("n_gold") === 0, 0.0)
          .otherwise(col("tp").cast("double") / col("n_gold")))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
  }
}
