package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels, shared by the Catalyst expressions below and the
  * plain-Scala test oracles. These are the new-engine analogs of the
  * reference's boolean string-match feature family
  * (`/root/reference/.../coref/PairwiseIndexingFeaturizerJoint.scala:236-274`),
  * upgraded to graded similarities per the north star (SURVEY.md §2.3 F15).
  */
object Sim {

  /** Per-thread generation-stamped match scratch: the kernel runs once per
    * candidate pair (10^12-pair scale), and two fresh boolean arrays per
    * call is the dominant allocation in the scoring stage — GC volume is the
    * shared resource that caps single-box thread scaling, so the hot path
    * allocates nothing. A slot is "set" when it equals the current
    * generation, so no clearing pass is needed either. */
  private final class Scratch {
    var amatch = new Array[Int](64)
    var bmatch = new Array[Int](64)
    var gen = 0
    def ready(la: Int, lb: Int): Unit = {
      if (la > amatch.length) amatch = new Array[Int](la * 2)
      if (lb > bmatch.length) bmatch = new Array[Int](lb * 2)
      gen += 1
      if (gen == 0) { // wrapped: stamps may collide, reset
        java.util.Arrays.fill(amatch, 0); java.util.Arrays.fill(bmatch, 0)
        gen = 1
      }
    }
  }
  private val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** Standard Jaro similarity in [0,1] over an indexed char accessor —
    * shared by the String and the (ASCII) UTF8String byte paths. */
  @inline private def jaroImpl(la: Int, lb: Int,
      ca: Int => Int, cb: Int => Int): Double = {
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val s = scratch.get()
    s.ready(la, lb)
    val gen = s.gen
    val amatch = s.amatch
    val bmatch = s.bmatch
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (bmatch(j) != gen && ca(i) == cb(j)) {
          amatch(i) = gen; bmatch(j) = gen; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: mismatched positions among matched chars, halved with
    // integer truncation (matches the common C implementation family that
    // DuckDB's jaro_winkler_similarity uses — verified empirically).
    var h = 0
    var k = 0
    i = 0
    while (i < la) {
      if (amatch(i) == gen) {
        while (bmatch(k) != gen) k += 1
        if (ca(i) != cb(k)) h += 1
        k += 1
      }
      i += 1
    }
    val t = h / 2
    val md = m.toDouble
    (md / la + md / lb + (md - t) / md) / 3.0
  }

  /** Standard Jaro similarity in [0,1]. */
  def jaro(a: String, b: String): Double =
    jaroImpl(a.length, b.length, a.charAt(_).toInt, b.charAt(_).toInt)

  /** Jaro-Winkler with standard p=0.1, prefix cap 4 and the standard boost
    * threshold 0.7 (prefix bonus only applies when jaro ≥ 0.7 — matches the
    * common reference implementation and DuckDB's
    * `jaro_winkler_similarity`). */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j < 0.7) return j
    var prefix = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (prefix < max && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** UTF8String entry: all-ASCII inputs (every byte is one char — the
    * normalized-surface common case) run straight on the bytes with zero
    * copies; anything else falls back to the String path. Values are
    * identical — for ASCII, byte value == code point. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val na = a.numBytes(); val nb = b.numBytes()
    if (na == a.numChars() && nb == b.numChars()) {
      val j = jaroImpl(na, nb, i => a.getByte(i) & 0xff, i => b.getByte(i) & 0xff)
      if (j < 0.7) return j
      var prefix = 0
      val max = math.min(4, math.min(na, nb))
      while (prefix < max && a.getByte(prefix) == b.getByte(prefix)) prefix += 1
      j + prefix * 0.1 * (1.0 - j)
    } else jaroWinkler(a.toString, b.toString)
  }

  /** Jaccard similarity of two string sets (arrays deduped internally).
    * Empty-vs-empty = 1.0, empty-vs-nonempty = 0.0. */
  def tokenJaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.count(sb.contains)
    val union = sa.size + sb.size - inter
    inter.toDouble / union
  }

  def tokenJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na <= 16 && nb <= 16) {
      // token arrays are tiny (surface token lists) — setless quadratic
      // distinct/intersect beats two HashSets + boxing, and allocates nothing
      @inline def isFirst(arr: ArrayData, n: Int, i: Int): Boolean = {
        if (arr.isNullAt(i)) return false
        val v = arr.getUTF8String(i)
        var j = 0
        while (j < i) {
          if (!arr.isNullAt(j) && arr.getUTF8String(j).equals(v)) return false
          j += 1
        }
        true
      }
      @inline def contains(arr: ArrayData, n: Int, v: UTF8String): Boolean = {
        var j = 0
        while (j < n) {
          if (!arr.isNullAt(j) && arr.getUTF8String(j).equals(v)) return true
          j += 1
        }
        false
      }
      var da = 0; var db = 0; var inter = 0
      var i = 0
      while (i < na) {
        if (isFirst(a, na, i)) {
          da += 1
          if (contains(b, nb, a.getUTF8String(i))) inter += 1
        }
        i += 1
      }
      i = 0
      while (i < nb) { if (isFirst(b, nb, i)) db += 1; i += 1 }
      if (da == 0 && db == 0) return 1.0
      if (da == 0 || db == 0) return 0.0
      inter.toDouble / (da + db - inter)
    } else {
      val sa = new java.util.HashSet[UTF8String]()
      val sb = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i < a.numElements()) { if (!a.isNullAt(i)) sa.add(a.getUTF8String(i)); i += 1 }
      i = 0
      while (i < b.numElements()) { if (!b.isNullAt(i)) sb.add(b.getUTF8String(i)); i += 1 }
      if (sa.isEmpty && sb.isEmpty) return 1.0
      if (sa.isEmpty || sb.isEmpty) return 0.0
      var inter = 0
      val it = sa.iterator()
      while (it.hasNext) if (sb.contains(it.next())) inter += 1
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }
}

/** `jaro_winkler(str, str) -> double` — custom Catalyst expression (north-star
  * mandated, SURVEY.md §7.3). Codegen emits a static call to [[Sim]], the same
  * pattern Spark's own `levenshtein` uses (UTF8String.levenshteinDistance), so
  * the expression stays inside whole-stage codegen. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${left.dataType}, ${right.dataType})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sim.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `token_jaccard(array<string>, array<string>) -> double` — custom Catalyst
  * expression (north-star mandated). */
case class TokenJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_jaccard expects (array<string>, array<string>), got (${left.dataType}, ${right.dataType})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sim.tokenJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sim.tokenJaccard($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
