package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.annotation.tailrec

/** Transitive clustering (SURVEY.md §2.12).
  *
  * The reference forms clusters by sequential union over backpointers
  * (`OrderedClustering.createFromBackpointers`,
  * `OrderedClustering.scala:83-99`) — i.e. connected components of the
  * backpointer forest. Spark-natively this is:
  *
  *  1. a per-conversation union-find fast path (`mapGroups` — conversations
  *     are bounded, the bulk of the edges never enter a distributed loop);
  *  2. a DataFrame-native hash-to-min connected-components loop (min-label
  *     propagation + pointer jumping, O(log diameter) rounds) over the
  *     *contracted* cross-conversation graph, with per-iteration
  *     checkpointing (north rule).
  *
  * Cluster id = min mention_id (string) in the component — deterministic,
  * content-derived, retry/order-independent.
  */
object Clustering {

  /** One hash-to-min CC over edges `(src, dst)` (string ids). `checkpoint` is
    * invoked with (iteration, labels) after each round — TableIO hooks in
    * there for resumable per-iteration commits. Returns `(id, cluster_id)`
    * for every node appearing in `nodes`. */
  def connectedComponents(
      nodes: DataFrame, // single col "id"
      edges: DataFrame, // cols "src", "dst"
      maxIter: Int = 50,
      checkpoint: (Int, DataFrame) => DataFrame = (_, df) => df.localCheckpoint(true))
    : DataFrame = {

    // pin hygiene (r06): each iteration's superseded labels checkpoint is
    // released as soon as the convergence check has read it — without this,
    // dead label tables accumulate in executor storage for the whole loop
    // (O(nodes × iterations) pinned bytes on a deep graph). Pins are
    // attributed by diffing the persistent-RDD set around each checkpoint
    // call (a TableIO-backed checkpoint pins nothing — the diff is empty
    // and the release a no-op). `sym` is released when the loop ends; the
    // FINAL labels pin is the returned result and stays.
    val sc = nodes.sparkSession.sparkContext
    def pinsNow(): Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(true)))

    val preSym = pinsNow()
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val symPins = pinsNow() -- preSym

    // init: label(v) = min(v, min neighbor)
    val preInit = pinsNow()
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .unionByName(sym.select(col("dst").as("id"), col("src").as("lbl")))
      .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      .localCheckpoint(true)
    var labelPins: Set[Int] = pinsNow() -- preInit

    @tailrec
    def loop(iter: Int): Unit = {
      if (iter >= maxIter) return
      // neighbor-min: candidate label from each neighbor's current label
      val viaNbr = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lbl"))
      // pointer jump: label(label(v))
      val viaJump = labels.join(
        labels.select(col("id").as("lbl"), col("lbl").as("lbl2")), "lbl")
        .select(col("id"), col("lbl2").as("lbl"))
      val next = labels.unionByName(viaNbr).unionByName(viaJump)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      val preChk = pinsNow()
      val nextChk = checkpoint(iter, next)
      val nextPins = pinsNow() -- preChk
      val changed = nextChk.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") =!= col("old")).limit(1).count()
      // the superseded iteration is dead once the convergence check read it
      release(labelPins)
      labels = nextChk
      labelPins = nextPins
      if (changed > 0) loop(iter + 1)
    }
    loop(0)
    release(symPins)
    labels.select(col("id").as("mention_id"), col("lbl").as("cluster_id"))
  }

  /** Union-find with path compression and union-by-MIN root — the single
    * definition of the kernel behind the "cluster id = component minimum"
    * contract, shared by the per-conversation contraction (executor-side,
    * String ids), [[hybridComponents]]'s driver fast path (Long ids), and
    * the C2 touched-subgraph solver (String ids); one place to fix means
    * the three call sites cannot drift. `find` registers unseen keys as
    * their own root. */
  private[pipeline] final class UnionFindMin[K](implicit ord: Ordering[K]) {
    private val parent = scala.collection.mutable.HashMap.empty[K, K]
    def find(x: K): K = {
      var r = parent.getOrElseUpdate(x, x)
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: K, b: K): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
    }
    /** Every registered key with its component-min root. */
    def roots: Iterator[(K, K)] = parent.keysIterator.map(k => (k, find(k)))
  }

  /** Per-conversation union-find fast path (custom Aggregator-shaped kernel
    * via `mapGroups`; SURVEY.md §7.3). Collapses all within-conversation
    * edges in one pass; returns `(id, local_root)`. */
  def localRoots(spark: SparkSession, nodes: DataFrame, edges: DataFrame): DataFrame = {
    import spark.implicits._
    // canonical conv-key extraction: fixed-width positional suffix strip —
    // MUST agree with the column-side graft.functions.convOfMentionId used by
    // `cluster`'s edge classification, or a conv_id containing '#' could pass
    // the within-conversation filter yet group under different local graphs.
    val convOf = (id: String) => id.dropRight(graft.functions.MentionIdSuffixLen)
    val nodeByConv = nodes.select(col("id")).as[String].map(id => (convOf(id), id, id))
    val edgeByConv = edges
      .filter(graft.functions.convOfMentionId(col("src")) ===
        graft.functions.convOfMentionId(col("dst")))
      .as[(String, String)].map { case (s, d) => (convOf(s), s, d) }
    nodeByConv.union(edgeByConv)
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val uf = new UnionFindMin[String]
        it.foreach { case (_, a, b) => if (a == b) uf.find(a) else uf.union(a, b) }
        uf.roots.toSeq
      }
      .toDF("id", "local_root")
  }

  /** Full clustering: union-find contraction within conversations, then
    * distributed CC on the contracted cross-conversation graph, then expand.
    */
  def cluster(
      spark: SparkSession,
      mentions: DataFrame,
      backptrs: DataFrame, // (cur_id, ant_id)
      checkpoint: (Int, DataFrame) => DataFrame = (_, df) => df.localCheckpoint(true))
    : DataFrame = {

    val nodes = mentions.select(col("mention_id").as("id"))
    val edges = backptrs.select(col("ant_id").as("src"), col("cur_id").as("dst"))

    val local = localRoots(spark, nodes, edges).localCheckpoint(true)

    // contract: cross-conversation edges between local roots
    val cross = edges.filter(
      graft.functions.convOfMentionId(col("src")) =!=
        graft.functions.convOfMentionId(col("dst")))
    // materialize the contracted edge set ONCE: the size probe, the driver
    // collect, and the distributed loop's first iteration all consume it —
    // without the checkpoint each recomputes the two root joins (measured
    // ~2x clustering wall-clock at sf0.1). The contracted graph is orders of
    // magnitude smaller than the mention set, so this is cheap by design.
    val crossRoots = cross
      .join(local.withColumnRenamed("id", "src").withColumnRenamed("local_root", "src_root"), "src")
      .join(local.withColumnRenamed("id", "dst").withColumnRenamed("local_root", "dst_root"), "dst")
      .select(col("src_root").as("src"), col("dst_root").as("dst"))
      .localCheckpoint(true)

    // string-id driver fast path (r06): when the contracted graph fits the
    // (tighter, string-id) driver bound, solve it directly with union-by-min
    // and map every local root through ONE broadcast join — the integer
    // encode/decode below exists to shrink the DISTRIBUTED loop's shuffles
    // and the larger long-id driver collect, which a graph this small never
    // reaches. The take doubles as the size probe (clusterTouched
    // discipline); labels are bit-identical (component-min mention-id string
    // either way — denseIdsByKey assigns long ids in string sort order, so
    // the encoded path's min-long decodes to the same min-string).
    val takenCross = graft.functions.fetchBounded(crossRoots, maxDriverContractedEdges + 1)
    if (takenCross.length <= maxDriverContractedEdges) {
      val uf = new UnionFindMin[String]
      takenCross.foreach(r => uf.union(r.getString(0), r.getString(1)))
      val sparkSes = spark
      import sparkSes.implicits._
      val mapped = uf.roots.toSeq.toDF("local_root", "root_cluster")
      return local.join(broadcast(mapped), Seq("local_root"), "left")
        .select(col("id").as("mention_id"),
          coalesce(col("root_cluster"), col("local_root")).as("cluster_id"))
    }

    val rootNodes = local.select(col("local_root").as("id")).distinct()

    // integer-encode the contracted graph (round-3 advice, two rounds
    // running): the CC loop's shuffles and the driver collect then carry
    // 8-byte longs instead of ~25-char mention-id strings — real money at
    // 10^9 mentions. denseIdsByKey assigns dense longs in STRING SORT ORDER,
    // so min-long == min-string and the decoded component minimum is
    // bit-identical to the string loop's cluster ids. The encode/decode
    // joins run at contracted-graph size (orders of magnitude below the
    // mention count), so the encoding cost is negligible by construction.
    val enc = SparseFeatures.denseIdsByKey(rootNodes, "id", "nid")
      .localCheckpoint(true)
    val encEdges = crossRoots
      .join(enc.withColumnRenamed("id", "src").withColumnRenamed("nid", "src_n"), "src")
      .join(enc.withColumnRenamed("id", "dst").withColumnRenamed("nid", "dst_n"), "dst")
      .select(col("src_n").as("src"), col("dst_n").as("dst"))
      .localCheckpoint(true)
    val encNodes = enc.select(col("nid").as("id"))

    val rootClustersN = hybridComponents(spark, encNodes, encEdges, checkpoint)

    // decode nid → mention-id string for both the member and its label
    val dec = enc.select(col("nid"), col("id"))
    val rootClusters = rootClustersN
      .join(dec.withColumnRenamed("nid", "mention_id").withColumnRenamed("id", "mid"),
        "mention_id")
      .join(dec.withColumnRenamed("nid", "cluster_id").withColumnRenamed("id", "cid"),
        "cluster_id")
      .select(col("mid").as("mention_id"), col("cid").as("cluster_id"))

    local.join(rootClusters.withColumnRenamed("mention_id", "local_root"), "local_root")
      .select(col("id").as("mention_id"), col("cluster_id"))
  }

  /** Edge-count threshold under which the contracted cross-conversation
    * graph is solved driver-side instead of by the distributed loop. With
    * integer-encoded ids, 500k long edges is ≤ ~30 MB of driver heap
    * (bounded, with the distributed loop as the over-threshold fallback).
    * `private[graft] var` (r06) so the forced-distributed bench evidence
    * and specs can zero it to exercise the checkpointed loop in anger. */
  private[graft] var maxDriverEdges: Int = 500000

  /** Edge-count bound for [[cluster]]'s STRING-id driver fast path (skips
    * the integer encode/decode stages outright). String ids are ~25-40
    * bytes vs 8-byte longs, so the bound is tighter — same memory class as
    * [[maxDriverEditEdges]]. `private[graft] var` so specs can force the
    * encoded/distributed paths on small fixtures. */
  private[graft] var maxDriverContractedEdges: Int = 200000

  /** Hybrid connected components over a LONG-id graph: below
    * [[maxDriverEdges]] the graph is solved driver-side with union-by-min
    * (identical result to the hash-to-min loop: cluster id = component
    * minimum) and the iterative rounds are skipped entirely; above it, the
    * distributed checkpointed loop runs. The size probe is a single
    * `take(max+1)` that doubles as the driver fetch, so an over-threshold
    * graph costs one bounded scan, never a full count, and an
    * under-threshold graph executes its edge plan exactly once.
    * Shared by the ER clustering stage (contracted
    * cross-conversation graph) and near-dup canonicalization
    * ([[graft.ops.Dedup.canonicalize]] — near-dup components are tiny, so
    * the driver path removes ~6-8 s of per-iteration action overhead there).
    * Returns `(mention_id, cluster_id)` like [[connectedComponents]]. */
  def hybridComponents(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      checkpoint: (Int, DataFrame) => DataFrame = (_, df) => df.localCheckpoint(true))
    : DataFrame = {
    // ONE take(max+1) doubles as the size probe and the driver fetch (the
    // clusterTouched shape) — a separate limit().count() probe executed the
    // edge plan twice for every under-threshold graph, the common case
    val es0 = graft.functions.fetchBounded(
      edges.select(col("src"), col("dst")), maxDriverEdges + 1)
    if (es0.length <= maxDriverEdges) {
      val uf = new UnionFindMin[Long]
      es0.foreach(r => uf.union(r.getLong(0), r.getLong(1)))
      val sparkSes = spark
      import sparkSes.implicits._
      val mapped = uf.roots.toSeq.toDF("id", "cluster_id")
      nodes.join(broadcast(mapped), Seq("id"), "left")
        .select(col("id").as("mention_id"),
          coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    } else connectedComponents(nodes, edges, checkpoint = checkpoint)
  }

  /** The backpointer table after applying `edits`: existing rows re-pointed,
    * detaches (`new_ant_id == cur_id`) dropped, brand-new links kept via the
    * outer join. Single definition shared by [[editBackpointers]] and the
    * streaming maintenance fold ([[graft.streaming.StreamingClusters]]) so
    * the merge semantics cannot drift between the clustering kernel and the
    * maintained state. */
  def mergeBackpointers(backptrs: DataFrame, edits: DataFrame): DataFrame =
    backptrs.select(col("cur_id"), col("ant_id"))
      .join(edits.select(col("cur_id"), col("new_ant_id")), Seq("cur_id"), "full_outer")
      .select(col("cur_id"),
        coalesce(col("new_ant_id"), col("ant_id")).as("ant_id"))
      .filter(col("ant_id") =!= col("cur_id"))

  /** C2: incremental cluster edit
    * (`OrderedClusteringFromBackpointers.changeBackpointerGetClusters`,
    * `OrderedClustering.scala:102-143`). The reference re-points one
    * mention's backpointer and recomputes only the two affected clusters by
    * frontier expansion; relationally that is: the touched components are
    * exactly the edited mention's current cluster and the new antecedent's
    * cluster (removal can only split the former; the new edge can only merge
    * into the latter), so re-run connected components on the touched members
    * with the edited edge set and union with the untouched rows. Work is
    * proportional to the touched clusters, never the corpus — the touched-id
    * set is broadcast and untouched rows pass through an anti-join unscanned
    * by the CC loop.
    *
    * `edits` rows are `(cur_id, new_ant_id)`; `new_ant_id == cur_id`
    * detaches the mention (reference: `backpointers(i) == i`). An edit for a
    * mention with no existing backpointer adds a fresh link (outer join).
    * Cluster ids stay the component-min convention, so the result is
    * bit-identical to a full [[cluster]] run over the edited backpointer
    * table — the C2 spec and the `c2_incremental_edit` oracle both pin that.
    */
  def editBackpointers(
      spark: SparkSession,
      clusters: DataFrame, // (mention_id, cluster_id) — current clustering
      backptrs: DataFrame, // (cur_id, ant_id)
      edits: DataFrame,    // (cur_id, new_ant_id)
      editsPinned: Boolean = false, // caller already localCheckpoint'ed edits
      // merged backpointer table the caller already computed (and pinned)
      // via [[mergeBackpointers]] — avoids running the O(state) full_outer
      // merge twice when the caller also keeps the merged table as state
      premerged: Option[DataFrame] = None,
      // touched-cluster ids the caller already probed driver-side (the
      // streaming fold's singleton registration collects them anyway) —
      // skips this kernel's own bounded probe
      knownTouched: Option[Seq[String]] = None)
    : DataFrame = {
    // fresh exprIds on every intermediate that derives FROM `clusters` and
    // joins straight back against it: a pinned LogicalRDD keeps its source
    // plan's attribute ids — when `clusters` is itself a union/projection
    // (StreamingClusters' lazy registered view) the analyzer's conflict
    // dedup cannot rewrite the alias side, failing with "conflicting
    // references". An alias round-trip re-ids the output.
    def refresh(df: DataFrame): DataFrame =
      df.select(df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val e0 = edits.select(col("cur_id"), col("new_ant_id"))
    val e = if (editsPinned) e0 else e0.localCheckpoint(true)
    // Touched-cluster ids, driver-side and bounded: in the steady
    // incremental regime the touched set is a handful of clusters, so the
    // old shape (pin touched, pin members, broadcast the pins) paid three
    // checkpoint jobs per edit where ONE bounded take suffices — the
    // clusterTouched discipline applied one level up. The take doubles as
    // the size probe; an over-bound touched set falls back to the pinned
    // distributed shape below. The ids join streams `clusters` against the
    // broadcast edit ids — no shuffle of the state table.
    val touchedSeq: Option[Seq[String]] = knownTouched.orElse {
      val sparkSes = spark
      import sparkSes.implicits._
      val ids = e.select(col("cur_id").as("mention_id"))
        .unionByName(e.select(col("new_ant_id").as("mention_id")))
        .distinct()
      val probe = graft.functions.fetchBounded(
        clusters.join(broadcast(ids), Seq("mention_id"))
          .select(col("cluster_id")).distinct(), maxDriverEditEdges + 1)
      if (probe.length <= maxDriverEditEdges) Some(probe.map(_.getString(0)).toSeq)
      else None
    }
    touchedSeq match {
      case Some(ts) =>
        val sparkSes = spark
        import sparkSes.implicits._
        // LocalRelation: known-size, statically broadcast — every consumer
        // below is a narrow scan of `clusters`, no pins, no state shuffles
        val touchedDf = ts.toDF("cluster_id")
        val members = refresh(clusters.join(broadcast(touchedDf), Seq("cluster_id"))
          .select(col("mention_id")))
        val edited = premerged.map(refresh).getOrElse(mergeBackpointers(backptrs, e))
        val subEdges = edited.join(
          members.select(col("mention_id").as("cur_id")), "cur_id")
        val recomputed = clusterTouched(spark, members, subEdges)
        clusters.join(broadcast(touchedDf), Seq("cluster_id"), "left_anti")
          .select(col("mention_id"), col("cluster_id"))
          .unionByName(recomputed.select(col("mention_id"), col("cluster_id")))
      case None =>
        // distributed fallback (over-bound touched set): the pinned shape
        val touched = refresh(e.select(col("cur_id").as("mention_id"))
          .unionByName(e.select(col("new_ant_id").as("mention_id")))
          .distinct()
          .join(clusters, "mention_id")
          .select(col("cluster_id")).distinct()
          .localCheckpoint(true))
        val members = refresh(clusters.join(broadcast(touched), Seq("cluster_id"))
          .select(col("mention_id")).localCheckpoint(true))
        // edited backpointers restricted to touched members (refresh a caller-
        // pinned premerged table: pinned LogicalRDDs keep their source exprIds)
        val edited = premerged.map(refresh).getOrElse(mergeBackpointers(backptrs, e))
        // membership filter on the cur side only: an unedited edge's ant shares
        // cur's component, and an edited edge's ant is touched by construction.
        // No forced broadcast — a large edit batch makes `members` large, and
        // AQE picks the broadcast side when it is in fact small.
        val subEdges = edited.join(
          members.select(col("mention_id").as("cur_id")), "cur_id")
        val recomputed = clusterTouched(spark, members, subEdges)
        clusters.join(broadcast(touched), Seq("cluster_id"), "left_anti")
          .select(col("mention_id"), col("cluster_id"))
          .unionByName(recomputed.select(col("mention_id"), col("cluster_id")))
    }
  }

  /** Edge-count bound for solving the TOUCHED subgraph of an incremental
    * edit driver-side. String ids are ~25-40 bytes vs the 8-byte longs of
    * [[maxDriverEdges]], so the bound is tighter; 200k string edges is
    * ≤ ~20 MB of driver heap. `private[graft] var` so the spec can force
    * the over-bound fallback (the full contraction pipeline) on a small
    * fixture. */
  private[graft] var maxDriverEditEdges: Int = 200000

  /** CC over the touched-members subgraph of [[editBackpointers]]. In the
    * steady incremental regime the touched set is a handful of clusters, so
    * the full [[cluster]] machinery (per-conversation union-find →
    * contraction → integer encode → hybrid loop ≈ 6 pinned stages) is pure
    * fixed overhead; a single bounded `take` + driver union-by-min replaces
    * it with ONE job. `take` doubles as the size probe — if the fetch
    * overflows [[maxDriverEditEdges]], fall back to the full contraction
    * pipeline (bit-identical labels either way: cluster id = component-min
    * mention_id string, which union-by-min preserves). */
  private def clusterTouched(spark: SparkSession, members: DataFrame,
      subEdges: DataFrame): DataFrame = {
    val taken = graft.functions.fetchBounded(
      subEdges.select(col("ant_id"), col("cur_id")), maxDriverEditEdges + 1)
    if (taken.length > maxDriverEditEdges) cluster(spark, members, subEdges)
    else {
      val uf = new UnionFindMin[String]
      taken.foreach(row => uf.union(row.getString(0), row.getString(1)))
      val sparkSes = spark
      import sparkSes.implicits._
      val mapped = uf.roots.toSeq.toDF("mention_id", "cluster_id")
      members.join(broadcast(mapped), Seq("mention_id"), "left")
        .select(col("mention_id"),
          coalesce(col("cluster_id"), col("mention_id")).as("cluster_id"))
    }
  }

  /** C3: drop singleton clusters (CoNLL postprocessing,
    * `OrderedClusteringBound.scala:8-11`). */
  def dropSingletons(clusters: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
    clusters.withColumn("sz", count(lit(1)).over(w))
      .filter(col("sz") > 1).drop("sz")
  }

  /** C4: dense relabel (`OrderedClustering.scala:61-67`). Scalable two-pass
    * (NOT a global-order window, which would funnel every row through one
    * partition): range-partition the distinct cluster ids, number locally,
    * then add exclusive per-partition offsets (a num-partitions-sized
    * cumulative sum). */
  def denseRelabel(clusters: DataFrame): DataFrame = {
    val distinctIds = clusters.select(col("cluster_id")).distinct()
      .repartitionByRange(col("cluster_id"))
    // pin ONE materialization of the range-partitioned ids: `offsets` and
    // `indexed` both branch off it, and correctness needs both branches to
    // see the SAME partitioning — without the checkpoint that holds only via
    // Spark's exchange reuse (RangePartitioner sampling is RDD-id-seeded, so
    // a recomputed exchange could draw different bounds and misalign offsets
    // with local indices). The distinct id set is small.
    val withLocal = distinctIds
      .withColumn("part", spark_partition_id())
      .withColumn("local_idx",
        row_number().over(Window.partitionBy(col("part")).orderBy(col("cluster_id"))).cast("long") - 1)
      .localCheckpoint(true)
    val offsets = withLocal.groupBy(col("part")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("part")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("part"), col("offset")) // one row per partition — tiny
    val indexed = withLocal.join(broadcast(offsets), "part")
      .select(col("cluster_id"), (col("offset") + col("local_idx")).as("cluster_idx"))
    clusters.join(indexed, "cluster_id")
  }
}
