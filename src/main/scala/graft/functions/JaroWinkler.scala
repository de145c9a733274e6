package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `JaroWinklerBp(string, string) → long` — Jaro-Winkler similarity (Jaro
  * 1989; Winkler 1990), the record-linkage classic, in EXACT basis points.
  *
  * The usual implementations return a double; cross-engine, a 1-ulp
  * difference at a threshold boundary silently changes which pairs a
  * linkage join emits. This expression never leaves integers: the greedy
  * match yields (m, t, l, |s1|, |s2|), Jaro is the exact rational
  * (m²·l2 + m²·l1 + (m−t)·l1·l2) / (3·l1·l2·m), the Winkler prefix boost
  * (applied iff jaro > 0.7, i.e. 10·num > 7·den) folds in as
  * (10·num + l·(den−num)) / (10·den), and the result is
  * floor(10000 · num/den) — replayable bit-for-bit by any engine with
  * integer arithmetic (the catalog oracle replays the greedy match itself
  * with a recursive CTE).
  *
  * Matching runs on UTF-16 code units (= characters for the BMP text this
  * engine processes; the SQL oracle's per-character substr agrees there).
  * Both empty → 10000; one empty or zero matches → 0.
  *
  * Convention: transpositions are t = floor(mismatched-positions / 2) —
  * an odd mismatch count floors (e.g. "abc"/"bca" scores t=1 where the
  * half-transposition formulation uses 1.5). The oracle CTE replays the
  * same floor, so parity holds; scores can differ from implementations
  * that keep the half at threshold boundaries.
  *
  * Overflow: the exact rational peaks near 4.2e5·L³ for L-char inputs,
  * which exceeds Long past L ≈ 28k; inputs longer than 20k code units
  * take a BigInt path with the identical formula (same result, slower —
  * fine for a tail that long strings of a linkage key never hit).
  *
  * Codegen emits a single static call — the scoring loop itself is a tight
  * JVM method, so the expression stays inside whole-stage codegen like the
  * built-in `levenshtein` does.
  */
object JaroWinklerBp {

  def score(a: UTF8String, b: UTF8String): Long = scoreStr(a.toString, b.toString)

  def scoreStr(s1: String, s2: String): Long = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 10000L
    if (l1 == 0 || l2 == 0) return 0L
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val used = new Array[Boolean](l2)
    val m1 = new java.lang.StringBuilder(math.min(l1, l2))
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - w)
      val hi = math.min(l2 - 1, i + w)
      var done = false
      while (j <= hi && !done) {
        if (!used(j) && s2.charAt(j) == s1.charAt(i)) {
          used(j) = true; m1.append(s1.charAt(i)); m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    val m2 = new java.lang.StringBuilder(m)
    var j2 = 0
    while (j2 < l2) { if (used(j2)) m2.append(s2.charAt(j2)); j2 += 1 }
    var mism = 0
    var p = 0
    while (p < m) { if (m1.charAt(p) != m2.charAt(p)) mism += 1; p += 1 }
    val t = mism / 2
    var l = 0
    while (l < 4 && l < l1 && l < l2 && s1.charAt(l) == s2.charAt(l)) l += 1
    if (l1 <= 20000 && l2 <= 20000) {
      val num = m.toLong * m * l2 + m.toLong * m * l1 + (m.toLong - t) * l1 * l2
      val den = 3L * l1 * l2 * m
      val (jn, jd) =
        if (num * 10 > den * 7) (num * 10 + l * (den - num), den * 10)
        else (num, den)
      jn * 10000L / jd // both non-negative → truncation IS floor
    } else {
      // same rational in BigInt — Long overflows past ~28k chars
      val mB = BigInt(m)
      val num = mB * m * l2 + mB * m * l1 + (mB - t) * l1 * l2
      val den = BigInt(3) * l1 * l2 * m
      val (jn, jd) =
        if (num * 10 > den * 7) (num * 10 + l * (den - num), den * 10)
        else (num, den)
      (jn * 10000 / jd).toLong
    }
  }

  def column(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinklerBpExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class JaroWinklerBpExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_bp requires two strings, got " +
          s"${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerBp.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerBp.score($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerBpExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler_bp"
}
