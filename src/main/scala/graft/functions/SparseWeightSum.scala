package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A collected sparse weight table `(f, w_i)` held as two parallel arrays —
  * the serialized form shipped inside the task binary (Spark broadcasts the
  * task binary per stage, so every executor deserializes the model once per
  * stage, not once per task). The lookup map is rebuilt lazily per JVM and
  * keyed by [[UTF8String]] so probes from generated code are zero-copy.
  *
  * This is the engine's analog of the reference's packed linear model — a
  * feature-indexed weight array resident in every worker
  * (`/root/reference/.../coref/PairwiseScorer.scala:10-35`) — restricted to
  * models that fit driver/executor memory (documented cutoff in
  * [[graft.pipeline.SparseFeatures.collectWeights]]; beyond it the engine
  * stays on the shuffle-hash weight-join plan, which is the 10^9-feature
  * scale path).
  */
final class SparseWeightMap(names: Array[String], w: Array[Long])
    extends Serializable {
  require(names.length == w.length,
    s"SparseWeightMap: ${names.length} names vs ${w.length} weights")

  import SparseWeightMap._

  /** One probe per BASE string returns the bare weight AND the 12
    * conjunction-slot weights (3 `&t=<tc>` + 9 `&tt=<ta>|<tc>`) at once —
    * the mention-type domain is the fixed M5 enum, so the conjunction axes
    * are slot-indexable and the hot path needs neither string building nor
    * extra probes. `conj` stays null for bases with no conjunction weights
    * (every non-band template, and most band bases), so the extra footprint
    * is one array per conjunction-bearing base only.
    *
    * The built map is memoized JVM-WIDE, keyed by a content fingerprint:
    * every task deserializes its own SparseWeightMap instance out of the
    * task binary, and rebuilding a 10^5-entry (at scale, 10^6+) lookup
    * structure per task is measurable overhead — the first sf0.1 run after
    * the slot-index change recorded a 11 s → 25 s sparse-scoring regression
    * that was almost entirely repeated map builds. One task builds, every
    * later task in the JVM reuses. */
  @transient private lazy val map: java.util.HashMap[UTF8String, ConjEntry] =
    cachedBuild(names, w)

  def size: Int = names.length

  /** Σ w_i over the (non-null) feature strings of `arr`; absent features
    * contribute 0 — integer-exact, order-independent, identical by
    * construction to the LEFT-join + `sum(coalesce(w_i, 0))` relational plan
    * ([[graft.pipeline.SparseFeatures.scoreWithWeights]]). */
  def lookupSum(arr: ArrayData): Long = {
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = map.get(arr.getUTF8String(i))
        if (v != null) sum += v.bare
      }
      i += 1
    }
    sum
  }

  /** Single-feature probe (absent → 0). */
  def lookup(f: UTF8String): Long = {
    val v = map.get(f)
    if (v == null) 0L else v.bare
  }

  /** Mention-type slot of the M5 enum: 0..2, [[SparseWeightMap.NullType]]
    * for null, [[SparseWeightMap.UnknownType]] for a non-null string outside
    * the enum (never produced by the pipeline; kept for strict equivalence). */
  def typeIdx(t: UTF8String): Int = {
    if (t == null) return NullType
    var i = 0
    while (i < MTypesU.length) {
      if (MTypesU(i).equals(t)) return i
      i += 1
    }
    UnknownType
  }

  /** Three-axis probe of one BASE feature under the P1 conjunction scheme:
    * bare + `&t=<tc>` + `&tt=<ta>|<tc>`. A null mention type skips exactly
    * the probes the relational plan's `concat` would have nulled out. */
  def lookupConj(f: UTF8String, ta: UTF8String, tc: UTF8String): Long = {
    var s = lookup(f)
    if (tc != null) {
      s += lookup(UTF8String.concat(f, SufT, tc))
      if (ta != null)
        s += lookup(UTF8String.concat(f, SufTT, ta, Pipe, tc))
    }
    s
  }

  /** [[lookupConj]] with the mention types pre-resolved to enum slots (once
    * per ROW by the caller): ONE map probe, zero string building. Falls back
    * to the concat probes only for a non-null type outside the enum. */
  def lookupConjIdx(f: UTF8String, ta: UTF8String, tc: UTF8String,
      tai: Int, tci: Int): Long = {
    if (tai == UnknownType || tci == UnknownType) return lookupConj(f, ta, tc)
    val e = map.get(f)
    if (e == null) 0L
    else {
      var s = e.bare
      val c = e.conj
      if (c != null && tci >= 0) {
        s += c(tci)
        if (tai >= 0) s += c(3 + tai * 3 + tci)
      }
      s
    }
  }

  override def toString: String = s"SparseWeightMap(${names.length} features)"
}

object SparseWeightMap {
  /** Per-base entry: bare weight (0 when the base string itself carries no
    * weight) + the 12 conjunction slots, null when none exist. */
  final class ConjEntry {
    var bare: Long = 0L
    var conj: Array[Long] = null
  }

  /** The M5 mention-type enum ([[graft.pipeline.Mentions.properties]]) — the
    * only values the `&t=`/`&tt=` conjunction axes can take at runtime. */
  val MTypes: Array[String] = Array("NOMINAL", "PRONOMINAL", "PROPER")

  /** The 12 conjunction suffixes, precomputed once: (suffix string, slot).
    * Slots: 0..2 = `&t=<tc>`; 3 + ta*3 + tc = `&tt=<ta>|<tc>`. */
  private val ConjSuffixes: Array[(String, Int)] = {
    val b = Array.newBuilder[(String, Int)]
    var t = 0
    while (t < MTypes.length) {
      b += (("&t=" + MTypes(t)) -> t)
      var a = 0
      while (a < MTypes.length) {
        b += (("&tt=" + MTypes(a) + "|" + MTypes(t)) -> (3 + a * MTypes.length + t))
        a += 1
      }
      t += 1
    }
    b.result()
  }

  private final case class BuildKey(n: Int, d0: Long, d1: Long)
  /** JVM-wide memo of built lookup maps: the map is read-only after build,
    * so sharing one instance across every task in the executor is safe.
    * Bounded — a long-lived executor that sees many distinct models (e.g.
    * k-fold sweeps) clears rather than grows without limit. */
  private val buildCache =
    new java.util.concurrent.ConcurrentHashMap[BuildKey, java.util.HashMap[UTF8String, ConjEntry]]()

  private[functions] def cachedBuild(names: Array[String], w: Array[Long])
      : java.util.HashMap[UTF8String, ConjEntry] = {
    // 128-bit MD5 content digest, NOT a 64-bit rolling hash: two distinct
    // models colliding here would silently score with the wrong weights, so
    // the key must make that cryptographically impossible, not merely
    // unlikely. One digest per task (cachedBuild runs once per deserialized
    // instance), ~ms at 10^5 names — noise next to the build it memoizes.
    val md = java.security.MessageDigest.getInstance("MD5")
    val wb = java.nio.ByteBuffer.allocate(12)
    var i = 0
    while (i < names.length) {
      val nb = names(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      wb.clear(); wb.putInt(nb.length); wb.putLong(w(i)) // length-prefixed: no concat ambiguity
      md.update(wb.array(), 0, 12)
      md.update(nb)
      i += 1
    }
    val d = java.nio.ByteBuffer.wrap(md.digest())
    if (buildCache.size > 8) buildCache.clear()
    buildCache.computeIfAbsent(BuildKey(names.length, d.getLong, d.getLong),
      _ => build(names, w))
  }

  private def build(names: Array[String], w: Array[Long])
      : java.util.HashMap[UTF8String, ConjEntry] = {
    val m = new java.util.HashMap[UTF8String, ConjEntry](
      math.max(16, names.length * 2))
    def entry(k: UTF8String): ConjEntry = {
      var e = m.get(k)
      if (e == null) { e = new ConjEntry; m.put(k, e) }
      e
    }
    var i = 0
    while (i < names.length) {
      val n = names(i)
      entry(UTF8String.fromString(n)).bare = w(i)
      // Register every decomposition the relational plan's concat could
      // produce: a name of the form X + "&t=" + tc is reachable by the
      // conj probe (X, tc) REGARDLESS of how X itself looks, so a name
      // matching several suffix shapes (text-derived '&t=' inside a base)
      // must be registered under each — exactly mirroring the old
      // concat-probe semantics, name by name.
      var s = 0
      while (s < ConjSuffixes.length) {
        val (suffix, slot) = ConjSuffixes(s)
        if (n.length >= suffix.length && n.endsWith(suffix)) {
          val e = entry(UTF8String.fromString(
            n.substring(0, n.length - suffix.length)))
          if (e.conj == null) e.conj = new Array[Long](12)
          e.conj(slot) = w(i)
        }
        s += 1
      }
      i += 1
    }
    m
  }
  private[functions] val MTypesU: Array[UTF8String] =
    MTypes.map(UTF8String.fromString)
  val NullType: Int = -1
  val UnknownType: Int = -2

  val SufT: UTF8String = UTF8String.fromString("&t=")
  val SufTT: UTF8String = UTF8String.fromString("&tt=")
  val Pipe: UTF8String = UTF8String.fromString("|")
}

/** `sparse_weight_sum(array<string>) -> bigint` — whole-model scoring in one
  * codegen'd projection: the per-pair integer weight sum of the sparse
  * lexicalized model, computed by hash-map lookup against a
  * [[SparseWeightMap]] instead of the explode → weight-join → re-aggregate
  * relational plan. Cuts the scoring stage's ~66-feature-row fan-out per
  * candidate pair (explode + exchange + two aggregates) down to a single
  * narrow map stage; bit-identical output because the sum is exact integer
  * arithmetic either way. */
case class SparseWeightSum(child: Expression, weights: SparseWeightMap)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sparse_weight_sum expects array<string>, got $t")
  }
  override protected def nullSafeEval(input: Any): Any =
    weights.lookupSum(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sparseWeights", weights,
      classOf[SparseWeightMap].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.lookupSum($arr);")
  }
  override protected def withNewChildInternal(newChild: Expression): SparseWeightSum =
    copy(child = newChild)
}

/** The whole three-axis (P1 conjunction scheme) sparse model score in one
  * expression: for each BASE feature string `f` it resolves `f`, `f&t=<tc>`
  * and `f&tt=<ta>|<tc>` against the collected model in ONE probe — the
  * model map is keyed by base string with the 12 conjunction axes
  * slot-indexed by the fixed M5 mention-type enum (resolved once per row),
  * so the hot path per pair is 22 probes with zero string building, down
  * from the original 66-slot `UnsafeArrayData` materialization and the
  * intermediate 66-probe / 44-concat transient variant.
  * Null semantics mirror the relational plan exactly: a null base feature
  * contributes nothing, a null mention type nulls out exactly the
  * conjunction axes whose `concat` would have been null. */
case class SparseWeightSumConj(base: Seq[Expression], mtypeA: Expression,
    mtypeC: Expression, weights: SparseWeightMap) extends Expression {
  override def children: Seq[Expression] = base :+ mtypeA :+ mtypeC
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.filter(_.dataType != StringType)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sparse_weight_sum_conj expects all-string children, got ${bad.map(_.dataType)}")
  }
  override def eval(input: InternalRow): Any = {
    val ta = mtypeA.eval(input).asInstanceOf[UTF8String]
    val tc = mtypeC.eval(input).asInstanceOf[UTF8String]
    val tai = weights.typeIdx(ta)
    val tci = weights.typeIdx(tc)
    var sum = 0L
    var i = 0
    while (i < base.length) {
      val f = base(i).eval(input).asInstanceOf[UTF8String]
      if (f != null) sum += weights.lookupConjIdx(f, ta, tc, tai, tci)
      i += 1
    }
    sum
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("sparseWeights", weights,
      classOf[SparseWeightMap].getName)
    val utf8 = classOf[UTF8String].getName
    val taCode = mtypeA.genCode(ctx)
    val tcCode = mtypeC.genCode(ctx)
    val sum = ctx.freshName("wsum")
    val ta = ctx.freshName("ta")
    val tc = ctx.freshName("tc")
    val tai = ctx.freshName("tai")
    val tci = ctx.freshName("tci")
    val probes = base.map { b =>
      val c = b.genCode(ctx)
      code"""
            |${c.code}
            |if (!${c.isNull}) { $sum += $ref.lookupConjIdx(${c.value}, $ta, $tc, $tai, $tci); }
            |""".stripMargin
    }.reduce(_ + _)
    ev.copy(
      code = code"""
                   |${taCode.code}
                   |${tcCode.code}
                   |$utf8 $ta = ${taCode.isNull} ? null : ${taCode.value};
                   |$utf8 $tc = ${tcCode.isNull} ? null : ${tcCode.value};
                   |int $tai = $ref.typeIdx($ta);
                   |int $tci = $ref.typeIdx($tc);
                   |long $sum = 0L;
                   |$probes
                   |boolean ${ev.isNull} = false;
                   |long ${ev.value} = $sum;
                   |""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SparseWeightSumConj =
    copy(base = newChildren.dropRight(2),
      mtypeA = newChildren(newChildren.length - 2),
      mtypeC = newChildren.last)
}
