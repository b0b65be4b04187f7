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

  @transient private lazy val map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, names.length * 2))
    var i = 0
    while (i < names.length) {
      m.put(UTF8String.fromString(names(i)), java.lang.Long.valueOf(w(i)))
      i += 1
    }
    m
  }

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
        if (v != null) sum += v.longValue()
      }
      i += 1
    }
    sum
  }

  /** Single-feature probe (absent → 0). */
  def lookup(f: UTF8String): Long = {
    val v = map.get(f)
    if (v == null) 0L else v.longValue()
  }

  /** Three-axis probe of one BASE feature under the P1 conjunction scheme:
    * bare + `&t=<tc>` + `&tt=<ta>|<tc>`. A null mention type skips exactly
    * the probes the relational plan's `concat` would have nulled out. */
  def lookupConj(f: UTF8String, ta: UTF8String, tc: UTF8String): Long = {
    var s = lookup(f)
    if (tc != null) {
      s += lookup(UTF8String.concat(f, SparseWeightMap.SufT, tc))
      if (ta != null)
        s += lookup(UTF8String.concat(f, SparseWeightMap.SufTT, ta,
          SparseWeightMap.Pipe, tc))
    }
    s
  }

  override def toString: String = s"SparseWeightMap(${names.length} features)"
}

object SparseWeightMap {
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
  * expression: for each BASE feature string `f` it probes `f`, `f&t=<tc>`
  * and `f&tt=<ta>|<tc>` directly against the collected model — the
  * conjunction strings are built transiently inside the probe and never
  * materialized into a row, so the plan carries 22 base strings instead of
  * a 66-slot array (UnsafeArrayData materialization byte-copies every
  * element; that copy was the dominant remaining cost of the fast path).
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
    var sum = 0L
    var i = 0
    while (i < base.length) {
      val f = base(i).eval(input).asInstanceOf[UTF8String]
      if (f != null) sum += weights.lookupConj(f, ta, tc)
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
    val probes = base.map { b =>
      val c = b.genCode(ctx)
      code"""
            |${c.code}
            |if (!${c.isNull}) { $sum += $ref.lookupConj(${c.value}, $ta, $tc); }
            |""".stripMargin
    }.reduce(_ + _)
    ev.copy(
      code = code"""
                   |${taCode.code}
                   |${tcCode.code}
                   |$utf8 $ta = ${taCode.isNull} ? null : ${taCode.value};
                   |$utf8 $tc = ${tcCode.isNull} ? null : ${tcCode.value};
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
