package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash fingerprint of a token array, as a '0'/'1' string.
  *
  * Semantically identical to the HOF composition in use before
  * (`array_join(transform(sequence(1, 32), i -> when(aggregate(
  * transform(tokens, md5), 0, (acc, h) -> acc ± 1 by hex nibble i) > 0,
  * "1", "0")), "")`) but built in ONE compiled pass: the interpreted chain
  * materializes the md5 hex-string array per row and then walks it 32
  * times through two lambda layers — per row that is 32·|tokens| lambda
  * frames plus an allocation per token, which made fingerprinting the
  * dominant per-row cost of the SimHash family. Here each token is md5'd
  * once (digest instance reused per thread) and its 32 nibbles update 32
  * counters in a tight loop.
  *
  * Bit rule (unchanged, oracle-replayed): bit i is 1 iff
  * Σ_tokens (nibble_i(md5(token)) ≥ 8 ? +1 : −1) > 0, where nibble_i is
  * the i-th hex character of the lowercase digest — i.e. the high bit of
  * each 4-bit group. md5 runs over the token's UTF-8 bytes, exactly like
  * `md5(t.cast("binary"))`.
  *
  * The equivalence claim is scoped to token arrays WITHOUT null elements
  * (all tokenizers here guarantee that — same scope as [[ShingleSet]]):
  * a null token is skipped here, where the HOF chain would null the
  * whole fingerprint.
  */
object SimHashBitsHelper {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def bits32(tokens: ArrayData): UTF8String = {
    val counts = new Array[Int](32)
    val digest = md.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        digest.reset()
        val d = digest.digest(tok.getBytes)
        var i = 0
        while (i < 32) {
          val b = d(i >> 1)
          val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
          counts(i) += (if (nib >= 8) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = if (counts(i) > 0) '1' else '0'
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashBitsHelper.bits32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashBitsHelper.bits32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)

  override def prettyName: String = "simhash_bits"
}

object SimHashBits {
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(tokens)))
}
