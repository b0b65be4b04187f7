package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Clustering

/** C2 incremental cluster edit
  * (`OrderedClusteringFromBackpointers.changeBackpointerGetClusters`,
  * reference `coref/OrderedClustering.scala:102-143`): the incremental path
  * (recompute touched clusters only) must be bit-identical to a full
  * re-clustering over the edited backpointer table, across all three edit
  * kinds the reference supports — re-point, detach, fresh link.
  */
class ClusterEditSpec extends SparkSuite {
  import spark.implicits._

  private def mid(conv: String, turn: Int, start: Int): String =
    conv + "#" + f"$turn%06d" + f"$start%06d"

  private def toSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("incremental edit == full recompute (re-point, detach, fresh link)") {
    val ids = Seq(
      mid("cA", 0, 0), mid("cA", 0, 5), mid("cA", 1, 2), // chain A
      mid("cB", 0, 0), mid("cB", 0, 7),                  // pair B
      mid("cC", 0, 0), mid("cC", 1, 1), mid("cC", 2, 2), // pair C + singleton
      mid("cD", 0, 0), mid("cD", 0, 9))                  // pair D (untouched)
    val mentions = ids.toDF("mention_id")
    val bp = Seq(
      (mid("cA", 0, 5), mid("cA", 0, 0)),
      (mid("cA", 1, 2), mid("cA", 0, 5)),
      (mid("cB", 0, 7), mid("cB", 0, 0)),
      (mid("cC", 1, 1), mid("cC", 0, 0)),
      (mid("cD", 0, 9), mid("cD", 0, 0))).toDF("cur_id", "ant_id")
    val clusters0 = Clustering.cluster(spark, mentions, bp).localCheckpoint(true)

    val edits = Seq(
      // re-point: splits chain A's tail off and merges it into cluster B
      (mid("cA", 1, 2), mid("cB", 0, 0)),
      // detach: backpointers(i) == i drops the link, splitting cluster B
      (mid("cB", 0, 7), mid("cB", 0, 7)),
      // fresh link: cC#2,2 had no backpointer row at all
      (mid("cC", 2, 2), mid("cC", 0, 0))).toDF("cur_id", "new_ant_id")

    val bpEdited = Seq(
      (mid("cA", 0, 5), mid("cA", 0, 0)),
      (mid("cA", 1, 2), mid("cB", 0, 0)),
      (mid("cC", 1, 1), mid("cC", 0, 0)),
      (mid("cC", 2, 2), mid("cC", 0, 0)),
      (mid("cD", 0, 9), mid("cD", 0, 0))).toDF("cur_id", "ant_id")

    val full = Clustering.cluster(spark, mentions, bpEdited)
    val inc = Clustering.editBackpointers(spark, clusters0, bp, edits)
    assert(toSet(inc) == toSet(full))

    // the untouched cluster D passes through with its id intact
    val dRows = toSet(inc).filter(_._1.startsWith("cD"))
    assert(dRows == Set(
      (mid("cD", 0, 0), mid("cD", 0, 0)),
      (mid("cD", 0, 9), mid("cD", 0, 0))))
  }

  test("over-bound edit batch falls back to the full contraction pipeline, same labels") {
    // force clusterTouched's take() to overflow so the distributed fallback
    // runs on the same fixture; labels must match the driver fast path
    val ids = Seq(
      mid("cA", 0, 0), mid("cA", 0, 5), mid("cA", 1, 2),
      mid("cB", 0, 0), mid("cB", 0, 7),
      mid("cD", 0, 0), mid("cD", 0, 9))
    val mentions = ids.toDF("mention_id")
    val bp = Seq(
      (mid("cA", 0, 5), mid("cA", 0, 0)),
      (mid("cA", 1, 2), mid("cA", 0, 5)),
      (mid("cB", 0, 7), mid("cB", 0, 0)),
      (mid("cD", 0, 9), mid("cD", 0, 0))).toDF("cur_id", "ant_id")
    val clusters0 = Clustering.cluster(spark, mentions, bp).localCheckpoint(true)
    val edits = Seq((mid("cA", 1, 2), mid("cB", 0, 0))).toDF("cur_id", "new_ant_id")
    val fast = Clustering.editBackpointers(spark, clusters0, bp, edits)
    val saved = Clustering.maxDriverEditEdges
    val slow = try {
      Clustering.maxDriverEditEdges = 0
      Clustering.editBackpointers(spark, clusters0, bp, edits)
    } finally Clustering.maxDriverEditEdges = saved
    assert(toSet(slow) == toSet(fast))
    val full = Clustering.cluster(spark, mentions,
      Seq((mid("cA", 0, 5), mid("cA", 0, 0)),
        (mid("cA", 1, 2), mid("cB", 0, 0)),
        (mid("cB", 0, 7), mid("cB", 0, 0)),
        (mid("cD", 0, 9), mid("cD", 0, 0))).toDF("cur_id", "ant_id"))
    assert(toSet(slow) == toSet(full))
  }

  test("empty edit batch is the identity") {
    val mentions = Seq(mid("cA", 0, 0), mid("cA", 0, 5)).toDF("mention_id")
    val bp = Seq((mid("cA", 0, 5), mid("cA", 0, 0))).toDF("cur_id", "ant_id")
    val clusters0 = Clustering.cluster(spark, mentions, bp).localCheckpoint(true)
    val edits = spark.emptyDataset[(String, String)].toDF("cur_id", "new_ant_id")
    val out = Clustering.editBackpointers(spark, clusters0, bp, edits)
    assert(toSet(out) == toSet(clusters0))
  }

  test("distributed CC loop: pins bounded across iterations, labels equal driver path") {
    // a long cross-conversation chain forces a multi-iteration hash-to-min
    // loop; the r06 pin hygiene must release each superseded iteration's
    // checkpoint blocks, so the persistent-RDD count after the run is
    // bounded by a constant (the result + its inputs), not the iteration
    // count. Both driver fast paths disabled to force the loop.
    val n = 40
    val ids = (0 until n).map(i => mid(f"c$i%02d", 0, 0))
    val mentions = ids.toDF("mention_id")
    val bp = (1 until n).map(i => (ids(i), ids(i - 1))).toDF("cur_id", "ant_id")
    val expected = Clustering.cluster(spark, mentions, bp)
    val savedC = Clustering.maxDriverContractedEdges
    val savedD = Clustering.maxDriverEdges
    val sc = spark.sparkContext
    val (dist, pinsAfter) = try {
      Clustering.maxDriverContractedEdges = 0
      Clustering.maxDriverEdges = 0
      val before = sc.getPersistentRDDs.size
      val d = Clustering.cluster(spark, mentions, bp).localCheckpoint(true)
      (d, sc.getPersistentRDDs.size - before)
    } finally {
      Clustering.maxDriverContractedEdges = savedC
      Clustering.maxDriverEdges = savedD
    }
    // chain of 40 conversations -> O(log n) CC iterations; without the
    // release each iteration leaked one labels checkpoint. Allow the
    // result pin + the loop's live labels + a small constant of pinned
    // inputs (local roots, contracted edges, encode table), NOT one per
    // iteration beyond that.
    assert(pinsAfter <= 8, s"persistent RDDs grew by $pinsAfter — superseded " +
      "CC iterations are not being released")
    assert(toSet(dist) == toSet(expected))
  }
}
