package graft

import org.apache.spark.sql.functions._
import graft.joint.JointInference

/** G1 joint inference: information must flow BOTH ways through the
  * cross-task factor — coref edges type untyped mentions (type flows from
  * the antecedent), and type agreement re-ranks tied antecedents. */
class JointSpec extends SparkSuite {
  import spark.implicits._

  // m0: strongly ORG; m1: strongly IDENT; m2: untyped (flat prior), strongly
  // linked to m0; m3: IDENT-typed, pair scores TIED between m0 and m1.
  val priors = Seq(
    ("c", "m0", Seq(0.1, 0.8, 0.1)),
    ("c", "m1", Seq(0.8, 0.1, 0.1)),
    ("c", "m2", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)),
    ("c", "m3", Seq(0.8, 0.1, 0.1))
  ).toDF("conv_id", "mention_id", "prior")

  val scored = Seq(
    ("m0", "m2", 3.0), // m2 -> m0, strong
    ("m0", "m3", 1.0), // m3: tied between m0 (ORG) ...
    ("m1", "m3", 1.0)  //     ... and m1 (IDENT)
  ).toDF("ant_id", "cur_id", "score")

  lazy val out = JointInference.infer(spark, priors, scored, coupling = 1.5)
    .collect().map(r => r.getString(0) ->
      (Option(r.getString(1)), r.getString(3), r.getDouble(4))).toMap

  test("type flows along a coref edge to an untyped mention") {
    val (ant, tpe, p) = out("m2")
    assert(ant === Some("m0"))
    assert(tpe === "ORG", s"m2 must inherit its antecedent's type, got $tpe")
    assert(p > 0.4, s"posterior must move off the flat prior: $p")
  }

  test("type agreement breaks antecedent ties") {
    val (ant, tpe, _) = out("m3")
    assert(tpe === "IDENT")
    assert(ant === Some("m1"),
      "with equal pair scores the type-compatible antecedent must win")
  }

  test("without coupling the tie falls back to the id tie-break") {
    val flat = JointInference.infer(spark, priors, scored, coupling = 0.0)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(flat("m3") === Some("m0"), "coupling 0 => pure score, ties to lowest id")
  }

  test("neutral evidence reproduces the factor-pair model exactly") {
    val ev = Seq(("m0", 0.0, 0.0), ("m1", 0.0, 0.0), ("m2", 0.0, 0.0), ("m3", 0.0, 0.0))
      .toDF("mention_id", "p_entity", "new_bias")
    val withEv = JointInference.infer(spark, priors, scored, coupling = 1.5,
      evidence = Some(ev), nerCoupling = 2.0)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getString(3), r.getDouble(4))).toMap
    assert(withEv === out, "p_entity=0, new_bias=0 must be a no-op")
  }

  test("NER-agreement factor types an untyped mention off OTHER") {
    val p = Seq(("c", "m0", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)))
      .toDF("conv_id", "mention_id", "prior")
    val noPairs = Seq.empty[(String, String, Double)].toDF("ant_id", "cur_id", "score")
    val ev = Seq(("m0", 0.9, 0.0)).toDF("mention_id", "p_entity", "new_bias")
    val r = JointInference.infer(spark, p, noPairs, coupling = 1.0,
      evidence = Some(ev), nerCoupling = 2.0).collect()(0)
    assert(r.getString(3) !== "OTHER",
      "strong NER entity evidence must pull the type off OTHER")
    assert(r.getDouble(4) > 0.4)
  }

  test("anaphoricity bias flips a weak link from new-entity to anaphoric") {
    val p = Seq(("c", "a0", Seq(0.1, 0.8, 0.1)), ("c", "a1", Seq(0.1, 0.8, 0.1)))
      .toDF("conv_id", "mention_id", "prior")
    val weak = Seq(("a0", "a1", -0.5)).toDF("ant_id", "cur_id", "score")
    def antOf(ev: Option[org.apache.spark.sql.DataFrame]) =
      JointInference.infer(spark, p, weak, coupling = 0.0, evidence = ev)
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap.apply("a1")
    assert(antOf(None) === None,
      "exp(-0.5) < 1: without bias the new-entity arc wins")
    val ev = Seq(("a1", 0.0, -2.0)).toDF("mention_id", "p_entity", "new_bias")
    assert(antOf(Some(ev)) === Some("a0"),
      "an anaphoric mention (new_bias=-2) must link to the weak antecedent")
  }

  test("wiki factor: linking evidence flips an ambiguous antecedent") {
    // flat type priors so the type factor is neutral; w1's raw arc score
    // beats w0's, but w0 shares cur's denotation
    val p = Seq(("c", "w0", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)),
      ("c", "w1", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)),
      ("c", "w2", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)))
      .toDF("conv_id", "mention_id", "prior")
    val sc = Seq(("w0", "w2", 0.8), ("w1", "w2", 1.0)).toDF("ant_id", "cur_id", "score")
    val grid = Seq(("w0", "Title_A", 2.0), ("w1", "Title_B", 2.0), ("w2", "Title_A", 2.0))
      .toDF("mention_id", "title", "dscore")
    def antOf(wc: Double) = JointInference.infer(spark, p, sc, coupling = 0.0,
      wikiScores = Some(grid), wikiCoupling = wc)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap.apply("w2")
    assert(antOf(0.0) === Some("w1"), "coupling 0: higher raw score wins")
    assert(antOf(2.0) === Some("w0"),
      "denotation agreement must flip the antecedent to the co-linked mention")
  }

  test("wiki factor: a strong coref link pulls an ambiguous denotation to the antecedent's") {
    val p = Seq(("c", "w0", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)),
      ("c", "w2", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)))
      .toDF("conv_id", "mention_id", "prior")
    val sc = Seq(("w0", "w2", 3.0)).toDF("ant_id", "cur_id", "score")
    val grid = Seq(("w0", "Title_A", 3.0), // antecedent: peaked at A
      ("w2", "Title_A", 1.0), ("w2", "Title_B", 1.0)) // cur: A/B tied
      .toDF("mention_id", "title", "dscore")
    val r = JointInference.infer(spark, p, sc, coupling = 0.0,
      wikiScores = Some(grid), wikiCoupling = 2.0)
      .collect().map(x => x.getString(0) -> (Option(x.getString(5)), x.getDouble(6))).toMap
    val (t2, p2) = r("w2")
    assert(t2 === Some("Title_A"), "coref link must break the denotation tie")
    assert(p2 > 0.5, s"posterior must move off the tie: $p2")
  }

  test("wiki factor: no grid / zero coupling is a no-op on coref and types") {
    val base = JointInference.infer(spark, priors, scored, coupling = 1.5)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getString(3), r.getDouble(4))).toMap
    val grid = Seq(("m0", "Title_A", 2.0), ("m3", "Title_A", 2.0))
      .toDF("mention_id", "title", "dscore")
    val zeroC = JointInference.infer(spark, priors, scored, coupling = 1.5,
      wikiScores = Some(grid), wikiCoupling = 0.0)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getString(3), r.getDouble(4))).toMap
    assert(zeroC === base, "wikiCoupling=0 must not perturb the factor-pair model")
  }

  // ---- coupling training (the reference learns factor weights by
  // ---- BP-gradient Adagrad, JointComputerShared.scala:47-102) ------------

  private def decodeWith(c: JointInference.Couplings,
      wiki: Option[org.apache.spark.sql.DataFrame] = None,
      p: org.apache.spark.sql.DataFrame = priors,
      sc: org.apache.spark.sql.DataFrame = scored) =
    JointInference.infer(spark, p, sc, coupling = c.coref,
      nerCoupling = c.ner, wikiScores = wiki, wikiCoupling = c.wiki,
      wikiNilScore = c.wikiNil)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getString(3), Option(r.getString(5)))).toMap

  test("trainCouplings: trained type coupling beats the zero-coupling start on decode accuracy") {
    // gold: m2 links to m0 (ORG side), m3 links to m1 (IDENT side) — only a
    // positive type-agreement coupling can rescue m3 from the id tie-break
    val gold = Seq(
      ("m0", null: String, "ORG", null: String),
      ("m1", null: String, "IDENT", null: String),
      ("m2", "m0", "ORG", null: String),
      ("m3", "m1", "IDENT", null: String))
      .toDF("mention_id", "g_ant", "g_type", "g_wiki")
    def acc(c: JointInference.Couplings): Double = {
      val d = decodeWith(c)
      val ok = Seq(
        d("m2")._1 == Some("m0"), d("m3")._1 == Some("m1"),
        d("m0")._2 == "ORG", d("m1")._2 == "IDENT",
        d("m2")._2 == "ORG", d("m3")._2 == "IDENT").count(identity)
      ok.toDouble / 6
    }
    val init = JointInference.Couplings(0, 0, 0, 0)
    val (trained, trace) = JointInference.trainCouplings(spark, priors, scored,
      gold, epochs = 8, eta = 1.0, iters = 6, init = init)
    info(s"trained couplings: $trained  trace: ${trace.map(_._2).map(l => f"$l%.3f")}")
    assert(trained.coref > 0.0, "gold agreement evidence must push the coupling up")
    assert(trace.last._2 < trace.head._2, "joint -loglik must decrease")
    assert(acc(trained) >= acc(init),
      "trained couplings must not decode worse than the hand-set start")
    assert(acc(trained) === 1.0,
      "on this fixture the trained coupling must fix the m3 tie")
    // T2 cadence table for the joint objective
    val t = JointInference.couplingTraceDF(spark, trace)
    assert(t.count() === 8L)
    assert(t.columns.toSeq === Seq("epoch", "loss"))
  }

  test("trainCouplings: wiki coupling learns to flip the co-linked antecedent") {
    val p = Seq(("c", "w0", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)),
      ("c", "w1", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)),
      ("c", "w2", Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)))
      .toDF("conv_id", "mention_id", "prior")
    val sc = Seq(("w0", "w2", 0.8), ("w1", "w2", 1.0)).toDF("ant_id", "cur_id", "score")
    val grid = Seq(("w0", "Title_A", 2.0), ("w1", "Title_B", 2.0), ("w2", "Title_A", 2.0))
      .toDF("mention_id", "title", "dscore")
    val gold = Seq(
      ("w0", null: String, null: String, "Title_A"),
      ("w1", null: String, null: String, "Title_B"),
      ("w2", "w0", null: String, "Title_A"))
      .toDF("mention_id", "g_ant", "g_type", "g_wiki")
    val (trained, trace) = JointInference.trainCouplings(spark, p, sc, gold,
      epochs = 5, eta = 1.0, iters = 6, wikiScores = Some(grid))
    info(s"trained couplings: $trained  trace: ${trace.map(_._2).map(l => f"$l%.3f")}")
    assert(trained.wiki > 0.0, "shared-denotation gold evidence must push wikiCoupling up")
    assert(trace.last._2 < trace.head._2)
    val d = decodeWith(trained, wiki = Some(grid), p = p, sc = sc)
    assert(d("w2")._1 === Some("w0"),
      "trained wiki coupling must flip the antecedent to the co-linked mention")
    assert(d("w2")._3 === Some("Title_A"))
  }

  test("goldLogLik on an empty slice is 0, and trainCouplings survives it") {
    val p0 = Seq.empty[(String, String, Seq[Double])]
      .toDF("conv_id", "mention_id", "prior")
    val sc0 = Seq.empty[(String, String, Double)].toDF("ant_id", "cur_id", "score")
    val g0 = Seq.empty[(String, String, String, String)]
      .toDF("mention_id", "g_ant", "g_type", "g_wiki")
    assert(JointInference.goldLogLik(spark, p0, sc0, g0,
      JointInference.Couplings(1, 0, 0, 0)) === 0.0)
    // an empty fold must yield a finite (zero-gradient) training run, not
    // an UnsupportedOperationException out of Dataset.reduce
    val (c, trace) = JointInference.trainCouplings(spark, p0, sc0, g0,
      epochs = 2, eta = 1.0, iters = 2)
    assert(trace.forall(_._2 === 0.0))
    assert(c === JointInference.Couplings(0, 0, 0, 0))
  }

  test("typePriors derive from surface sem-class") {
    val m = Seq(("x", "c", "Customer#000000007"), ("y", "c", "the vendor"))
      .toDF("mention_id", "conv_id", "surface")
    val p = JointInference.typePriors(m).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
    assert(p("x")(0) === 0.8) // IDENT
    assert(p("y")(1) === 0.8) // ORG (nominal head)
  }
}
