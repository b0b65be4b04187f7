package graft.joint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G1 joint coref+type inference (SURVEY.md §2.10) — the reference's
  * doc-local factor graph (`joint/JointDocFactorGraphOnto.scala:33-99`)
  * scoped to its two load-bearing ideas and run Spark-first:
  *
  *  - variables per conversation: `A_c` (antecedent choice of mention c,
  *    domain = its scored candidates + a "new entity" arc at score 0) and
  *    `T_m` (semantic type of mention m, domain = [[Types]], unary prior
  *    from the mention's surface);
  *  - the cross-task factor family (`BetterPropertyFactor`,
  *    `JointDocFactorGraphOnto.scala:62-65`): choosing antecedent `a` for
  *    `c` multiplies in `exp(coupling·[T_c = T_a])` — coref links pull the
  *    linked mentions' types together, and type (dis)agreement re-ranks
  *    antecedents;
  *  - synchronous variational updates (mean-field-style: each update
  *    marginalizes the equality factor in closed form against the CURRENT
  *    beliefs — the type-belief dot products — rather than cavity messages;
  *    same fixed point family as the reference's damped loopy BP), iterated
  *    to a fixed round count — per-conversation, exactly the
  *    reference's document-at-a-time inference unit: the graph NEVER crosses
  *    conversations, so the distributed shape is a keyed group, not a
  *    distributed graph.
  *
  * Output: per mention, the joint antecedent argmax (or none) and the type
  * posterior argmax with its probability.
  */
object JointInference {

  val Types: Vector[String] = Vector("IDENT", "ORG", "OTHER")

  /** Uniform-ish unary type prior from the mention surface via
    * [[graft.functions.semClass]] — UNKNOWN-safe: OTHER-class surfaces get a
    * flat prior, typed surfaces a peaked one. */
  def typePriors(mentions: DataFrame): DataFrame = {
    val sc = graft.functions.semClass(element_at(split(col("surface"), " "), -1))
    mentions.select(col("mention_id"), col("conv_id"),
      when(sc === "IDENT", array(lit(0.8), lit(0.1), lit(0.1)))
        .when(sc.isin("ORG", "PRON"), array(lit(0.1), lit(0.8), lit(0.1)))
        .otherwise(array(lit(1.0 / 3), lit(1.0 / 3), lit(1.0 / 3)))
        .as("prior"))
  }

  private case class MRow(id: String, prior: Array[Double],
      pEnt: Double, newBias: Double)
  private case class PRow(ant: String, cur: String, score: Double)

  /** @param mentionPriors (mention_id, conv_id, prior: array<double> over Types)
    * @param scored within-conversation scored pairs (ant_id, cur_id, score)
    * @param coupling log-strength of the type-agreement factor
    * @param evidence optional `(mention_id, p_entity, new_bias)` — the two
    *                 further factor families of
    *                 `JointDocFactorGraphOnto.scala:62-99`:
    *                 **NER agreement**: a unary log-linear potential
    *                 `exp(nerCoupling · p_entity · [T ≠ OTHER])` tying the
    *                 mention's type to the NER chain's entity posterior
    *                 (feed `p_entity = m_b + m_i` from
    *                 [[graft.ner.Ner.forwardBackward]] aggregated over the
    *                 span); **anaphoricity**: the "new entity" arc's weight
    *                 becomes `exp(new_bias)` instead of 1 — negative bias on
    *                 discourse-anaphoric mentions (pronouns) pushes them to
    *                 link, the unary the reference puts on the anaphoricity
    *                 node.
    * @param nerCoupling log-strength of the NER-agreement factor
    * @return (mention_id, ant_id nullable, p_ant, type, p_type) */
  def infer(spark: SparkSession, mentionPriors: DataFrame, scored: DataFrame,
      coupling: Double = 1.0, iters: Int = 10,
      evidence: Option[DataFrame] = None, nerCoupling: Double = 0.0): DataFrame = {
    import spark.implicits._
    val k = Types.size
    val withEv = evidence match {
      case Some(ev) => mentionPriors
        .join(ev.select(col("mention_id"), col("p_entity"), col("new_bias")),
          Seq("mention_id"), "left")
        .withColumn("p_entity", coalesce(col("p_entity"), lit(0.0)))
        .withColumn("new_bias", coalesce(col("new_bias"), lit(0.0)))
      case None => mentionPriors
        .withColumn("p_entity", lit(0.0)).withColumn("new_bias", lit(0.0))
    }
    val ments = withEv
      .select(col("conv_id"), col("mention_id"), col("prior"),
        col("p_entity"), col("new_bias"))
      .as[(String, String, Seq[Double], Double, Double)]
      .map { case (c, m, p, pe, nb) => (c, m, p.toArray, pe, nb) }
    val pairs = scored
      .join(mentionPriors.select(col("mention_id").as("cur_id"), col("conv_id")), "cur_id")
      .select(col("conv_id"), col("ant_id"), col("cur_id"), col("score"))
      .as[(String, String, String, Double)]

    val grouped = ments.groupByKey(_._1).cogroup(pairs.groupByKey(_._1)) {
      (conv, ms, ps) =>
        val mentions = ms.map(t => MRow(t._2, t._3, t._4, t._5)).toArray.sortBy(_.id)
        val idx = mentions.iterator.map(_.id).zipWithIndex.toMap
        val cands: Map[Int, Array[(Int, Double)]] = ps
          .collect { case (_, a, c, s) if idx.contains(a) && idx.contains(c) =>
            (idx(c), (idx(a), s)) }
          .toArray.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sortBy(_._1) }
        val n = mentions.length
        val expC = math.exp(coupling)
        // NER-agreement unary folded into an effective prior:
        // eff(t) = prior(t) · exp(nerCoupling · p_entity · [t ≠ OTHER])
        val otherIdx = Types.indexOf("OTHER")
        def effPrior(i: Int): Array[Double] = Array.tabulate(k) { t =>
          val boost = if (t == otherIdx) 1.0
            else math.exp(nerCoupling * mentions(i).pEnt)
          mentions(i).prior(t) * boost
        }

        // beliefs
        val qType = Array.tabulate(n) { i =>
          val p = effPrior(i); val z = p.sum; p.map(_ / z)
        }
        val pAnt = scala.collection.mutable.Map.empty[Int, Array[Double]]

        var it = 0
        while (it < iters) {
          // A_c update: p(a) ∝ exp(score) · E_{T_c,T_a}[exp(coupling·[=])]
          //            = exp(score) · (1 + (expC-1)·(q_c · q_a));
          // the "new entity" arc weighs exp(new_bias) (anaphoricity unary)
          cands.foreach { case (c, as) =>
            val w = as.map { case (a, s) =>
              val dot = (0 until k).map(t => qType(c)(t) * qType(a)(t)).sum
              math.exp(s) * (1.0 + (expC - 1.0) * dot)
            }
            val z = w.sum + math.exp(mentions(c).newBias)
            pAnt(c) = w.map(_ / z)
          }
          // T_m update: prior × messages from every factor touching T_m
          // μ(t) = Σ_a p(a)·(1 + (expC-1)·q_a(t)) + p(new)  (as cur)
          //      × Π over (c with a=m): same with roles swapped (as ant)
          val next = Array.tabulate(n) { m =>
            val eff = effPrior(m)
            val logq = Array.tabulate(k)(t => math.log(math.max(eff(t), 1e-12)))
            cands.get(m).foreach { as =>
              val pa = pAnt(m)
              var t = 0
              while (t < k) {
                var msg = 1.0 - pa.sum // new-entity mass, type-flat
                var j = 0
                while (j < as.length) {
                  msg += pa(j) * (1.0 + (expC - 1.0) * qType(as(j)._1)(t))
                  j += 1
                }
                logq(t) += math.log(math.max(msg, 1e-12)); t += 1
              }
            }
            cands.foreach { case (c, as) =>
              val pa = pAnt(c)
              var j = 0
              while (j < as.length) {
                if (as(j)._1 == m) {
                  var t = 0
                  while (t < k) {
                    val msg = (1.0 - pa(j)) + pa(j) * (1.0 + (expC - 1.0) * qType(c)(t))
                    logq(t) += math.log(math.max(msg, 1e-12)); t += 1
                  }
                }
                j += 1
              }
            }
            val mx = logq.max
            val e = logq.map(v => math.exp(v - mx)); val z = e.sum
            e.map(_ / z)
          }
          var i = 0
          while (i < n) { qType(i) = next(i); i += 1 }
          it += 1
        }

        mentions.indices.iterator.map { m =>
          val (antId, pA) = cands.get(m) match {
            case Some(as) if as.nonEmpty =>
              val pa = pAnt(m)
              val newMass = 1.0 - pa.sum
              // argmax antecedent; ties to the LOWEST antecedent id (decode
              // tie-break convention)
              var bestJ = 0
              var j = 1
              while (j < pa.length) {
                if (pa(j) > pa(bestJ) ||
                  (pa(j) == pa(bestJ) &&
                    mentions(as(j)._1).id < mentions(as(bestJ)._1).id)) bestJ = j
                j += 1
              }
              if (pa(bestJ) > newMass) (mentions(as(bestJ)._1).id, pa(bestJ))
              else (null: String, newMass)
            case _ => (null: String, 1.0)
          }
          val bt = (0 until k).maxBy(t => (qType(m)(t), -t))
          (mentions(m).id, antId, pA, Types(bt), qType(m)(bt))
        }
    }
    grouped.toDF("mention_id", "ant_id", "p_ant", "type", "p_type")
  }
}
