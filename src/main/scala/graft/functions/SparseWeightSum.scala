package graft.functions

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

  override def toString: String = s"SparseWeightMap(${names.length} features)"
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
