package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (Z-order) bit-interleave of k quantized LONG cell indexes —
  * the space-filling-curve key behind [[graft.core.Layout]]'s
  * multi-dimensional lake layout. Taking the `bits` low bits of each
  * child, the output packs them round-robin MSB-first (child 0's bit
  * b, child 1's bit b, …, then bit b−1 of each), so sorting by the
  * result clusters rows that are close in EVERY dimension into the
  * same neighborhood — which is what turns parquet row-group min/max
  * stats into effective pruning for predicates over several columns
  * at once. A single-column sort gives perfect pruning on that column
  * and none on the others; the Z-curve trades a little of each for a
  * lot of all — the standard lake-layout move (Morton 1966; the
  * OPTIMIZE ZORDER pattern). `k · bits ≤ 63` keeps the key in one
  * signed non-negative LONG, so range partitioning on it is exact.
  *
  * Pure integer bit arithmetic; the generated code is an inline loop
  * of k shift/or pairs per bit position — no allocation, no virtual
  * calls, stays inside whole-stage codegen. Null-propagating, but
  * [[graft.core.Layout.zValue]] quantizes nulls to cell 0 BEFORE this
  * expression, so layout keys are never null in practice. */
case class InterleaveBits(children: Seq[Expression], bits: Int)
  extends Expression {
  require(children.nonEmpty, "interleaveBits needs at least one column")
  require(bits >= 1 && children.size * bits <= 63,
    s"k·bits must fit a signed LONG: got ${children.size} cols × $bits bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"expected BIGINT quantized cells, got ${c.dataType.catalogString}" +
          " — quantize through Layout.zValue")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val k = children.size
    val vals = new Array[Long](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    var z = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < k) {
        z = (z << 1) | ((vals(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val b = ctx.freshName("b")
    val inner = evals
      .map(e => s"$z = ($z << 1) | ((${e.value} >>> $b) & 1L);")
      .mkString("\n          ")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          long $z = 0L;
          for (int $b = ${bits - 1}; $b >= 0; $b--) {
            $inner
          }
          ${ev.value} = $z;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
  override def prettyName: String = "graft_interleave_bits"
}
