package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct word-n-gram (shingle) set of a token array.
  *
  * Semantically identical to the HOF composition
  * `array_sort(array_distinct(transform(sequence(1, m-n+1),
  * i -> concat_ws(" ", slice(toks, i, n)))))` but built in ONE compiled
  * pass: the interpreted chain walks five lambda layers and allocates a
  * sliced array per window, which made shingling itself the hottest stage
  * of every text-dedup pipeline. Order matches `array_sort`'s binary
  * UTF8 comparison (= DuckDB's default collation on this corpus).
  *
  * The equivalence claim is scoped to token arrays WITHOUT null elements
  * (all tokenizers here guarantee that): on a null token this expression
  * substitutes the empty string, where `concat_ws` would skip the token
  * and produce a shorter shingle.
  */
object ShingleSetHelper {
  private val Sep = UTF8String.fromString(" ")

  def build(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i + n <= m) {
      set.add(shingleAt(tokens, i, n))
      i += 1
    }
    new GenericArrayData(set.toArray[AnyRef](new Array[AnyRef](set.size())))
  }

  /** xxhash64 (seed 42, = Spark's `xxhash64` function seed) digests of the
    * same sorted-distinct shingle set, sorted ascending as SIGNED longs.
    * 8 bytes per shingle instead of the full n-token string — the shuffle
    * payload for every prefix/verify stage of the PPJoin-family dedups.
    * Distinct-ness is computed on the digest, so two distinct shingles
    * colliding under xxhash64 would collapse (probability ~|set|²/2⁶⁴ per
    * document — negligible, and the string-set spec twin pins equality on
    * real data).
    */
  def buildDigests(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= m) {
      set.add(
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(shingleAt(tokens, i, n), 42L))
      i += 1
    }
    val out = new Array[Any](set.size())
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  private def shingleAt(tokens: ArrayData, i: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(i + j)
      parts(2 * j) = if (t == null) UTF8String.EMPTY_UTF8 else t
      if (j < n - 1) parts(2 * j + 1) = Sep
      j += 1
    }
    UTF8String.concat(parts: _*)
  }
}

case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_set requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleSetHelper.build(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleSetHelper.build($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}

object ShingleSet {
  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(tokens), n))
}

/** `ShingleSet`'s 8-byte-digest sibling: sorted distinct xxhash64 digests
  * of the word-n-gram shingles of a token array (see
  * `ShingleSetHelper.buildDigests`). Same single compiled pass; the array
  * it returns is what the PPJoin prefix/verify joins shuffle instead of
  * full shingle strings.
  */
case class ShingleDigests(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_digests requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleSetHelper.buildDigests(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleSetHelper.buildDigests($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleDigests =
    copy(child = newChild)

  override def prettyName: String = "shingle_digests"
}

object ShingleDigests {
  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleDigests(ColumnBridge.expression(tokens), n))
}
