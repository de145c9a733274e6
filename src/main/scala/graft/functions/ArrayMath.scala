package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for hot-path array math.
  *
  * Rationale (SURVEY §2.9 X4): a 64-dim dot product via
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` walks two interpreted lambda
  * layers and allocates an intermediate array PER ROW-PAIR. Inside a
  * pairwise similarity join that is the entire runtime. This expression
  * compiles to a tight primitive `double` loop inside whole-stage codegen —
  * no allocation, no virtual calls — with a semantically identical
  * interpreted fallback.
  *
  * Determinism: accumulation is strictly sequential (i = 0..n-1), matching
  * both the higher-order-function fold it replaces and the DuckDB oracle's
  * `list_sum(list_transform(...))`, so results stay bit-identical
  * cross-engine (see `graft.ops.Exact` for why that matters) — for arrays
  * WITHOUT null elements, which is what every embedding column here
  * guarantees. On a null ELEMENT the semantics intentionally diverge: the
  * HOF fold returns NULL for the whole product, this expression skips the
  * element (contributes 0) so one bad slot doesn't null out a similarity
  * score. PropertySpec pins both behaviors.
  */
object ArrayMath {

  /** Sequential dot product of two numeric array columns, accumulated in
    * double. Null if either side is null; null elements contribute 0.
    */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sequential squared-L2 distance of two INTEGRAL array columns,
    * accumulated in long — EXACT (no float anywhere), the distance kernel
    * of the scaled-integer quantization paths where bit-reproducibility
    * against an external engine matters (see `ops/ProductQuantizer`).
    * Null if either side is null; null elements skipped.
    */
  def sqDistLongNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      SqDistL2Long(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `DotProduct(array<numeric>, array<numeric>) → double` over the common
  * prefix of the two arrays, `Σ a(i)*b(i)` accumulated left-to-right.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private val supportedElems: Set[DataType] =
    Set(DoubleType, FloatType, LongType, IntegerType, ShortType, ByteType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // Whitelist exactly what eval/codegen handle — DecimalType is a
    // NumericType too but has no primitive accessor here, and must be
    // rejected at ANALYSIS time, not with a runtime crash.
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(t, _) => supportedElems.contains(t)
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two arrays of primitive numeric type " +
        s"(no decimals), got ${left.dataType} / ${right.dataType}")
  }

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, lb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(la.numElements(), lb.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!la.isNullAt(i) && !lb.isNullAt(i)) sum += get(la, i, ta) * get(lb, i, tb)
      i += 1
    }
    sum
  }

  private def genGet(arr: String, i: String, t: DataType): String = t match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"(double) $arr.getFloat($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val nullCheck =
        if (left.dataType.asInstanceOf[ArrayType].containsNull ||
            right.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) continue;"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $sum += ${genGet(a, i, elemType(left))} * ${genGet(b, i, elemType(right))};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** `SqDistL2Long(array<integral>, array<integral>) → long` over the common
  * prefix of the two arrays, `Σ (a(i)-b(i))²` accumulated left-to-right in
  * long — exact integer arithmetic end-to-end (callers bound element
  * magnitude so the squares fit; scaled micro-unit embeddings are ≤ ~1e7
  * per element → ≤ ~1e14 per term).
  */
case class SqDistL2Long(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private val supportedElems: Set[DataType] =
    Set(LongType, IntegerType, ShortType, ByteType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // integral only: a float/double/decimal input would silently break the
    // exactness contract — reject at analysis time
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(t, _) => supportedElems.contains(t)
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sq_dist_l2_long requires two arrays of integral type, " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  private def get(arr: ArrayData, i: Int, t: DataType): Long = t match {
    case LongType => arr.getLong(i)
    case IntegerType => arr.getInt(i).toLong
    case ShortType => arr.getShort(i).toLong
    case ByteType => arr.getByte(i).toLong
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, lb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(la.numElements(), lb.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!la.isNullAt(i) && !lb.isNullAt(i)) {
        val d = get(la, i, ta) - get(lb, i, tb)
        sum += d * d
      }
      i += 1
    }
    sum
  }

  private def genGet(arr: String, i: String, t: DataType): String = t match {
    case LongType => s"$arr.getLong($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case ByteType => s"(long) $arr.getByte($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      val nullCheck =
        if (left.dataType.asInstanceOf[ArrayType].containsNull ||
            right.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) continue;"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  long $d = ${genGet(a, i, elemType(left))} - ${genGet(b, i, elemType(right))};
         |  $sum += $d * $d;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistL2Long =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_dist_l2_long"
}
