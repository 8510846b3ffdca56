package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.{BloomFilter, IncompatibleMergeException}

/** Bloom filter BUILD aggregate over a LONG key column with geometry
  * honored EXACTLY as requested — the reason this exists instead of
  * Spark's own `BloomFilterAggregate`: that one silently `Math.min`s
  * both `estimatedNumItems` and `numBits` against the session confs
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M)
  * and `...maxNumBits` (default 64 Mbit) — reasonable for its runtime
  * join-filter use, fatal for a membership artifact whose documented
  * contract is "geometry derives deterministically from (expectedKeys,
  * fpp)": at lake-scale parameters the filter would silently saturate
  * (every probe true → [[graft.llm.Dedup.dropSketchMembers]] silently
  * drops everything), and two batches built under different conf values
  * would no longer be union-compatible.
  *
  * Uses the same `org.apache.spark.util.sketch.BloomFilter` binary
  * format (update = `putLong`, the bits Spark's native
  * `BloomFilterMightContain` probes), so built sketches remain
  * compatible with [[BloomUnion]] and the codegen'd probe expression.
  * Null keys are skipped; an all-null/empty group yields null. */
case class BloomBuildAgg(
    child: Expression,
    expectedKeys: Long,
    numBits: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[BloomFilter]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_build expects a BIGINT key (hash the content " +
          s"first), got ${child.dataType.catalogString}")
    else if (expectedKeys <= 0 || numBits <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_build: expectedKeys ($expectedKeys) and numBits " +
          s"($numBits) must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Option[BloomFilter] = None

  override def update(buf: Option[BloomFilter],
                      input: InternalRow): Option[BloomFilter] = {
    val v = child.eval(input)
    if (v == null) return buf
    val f = buf.getOrElse(BloomFilter.create(expectedKeys, numBits))
    f.putLong(v.asInstanceOf[Long])
    Some(f)
  }

  override def merge(a: Option[BloomFilter],
                     b: Option[BloomFilter]): Option[BloomFilter] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(x.mergeInPlace(y))
      case (Some(x), None) => Some(x)
      case (None, other) => other
    }

  override def eval(buf: Option[BloomFilter]): Any =
    buf.map { f =>
      val out = new ByteArrayOutputStream()
      f.writeTo(out)
      out.toByteArray
    }.orNull

  override def serialize(buf: Option[BloomFilter]): Array[Byte] =
    eval(buf) match {
      case null => Array.emptyByteArray
      case bytes: Array[Byte] => bytes
    }

  override def deserialize(bytes: Array[Byte]): Option[BloomFilter] =
    if (bytes.isEmpty) None
    else Some(BloomFilter.readFrom(new ByteArrayInputStream(bytes)))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_bloom_build"
}

/** Union of serialized Bloom filters as an aggregate — the relational
  * merge step of the membership-sketch family
  * ([[graft.llm.Dedup.membershipSketch]] builds per-slice filters with
  * Spark's native `BloomFilterAggregate`; this collapses any set of them
  * into one).
  *
  * Bloom union is exact: inserting a key sets a deterministic bit
  * pattern, so OR-ing the bitsets of per-slice filters is BIT-FOR-BIT
  * the filter a single pass over the union of the slices would have
  * built (asserted in DedupSpec) — which is what makes the sketch a
  * mergeable incremental artifact: per-batch sketches union across
  * ingests without re-reading any corpus bytes, and the no-false-
  * negative guarantee survives arbitrary merge trees.
  *
  * Filters are only union-able when built with identical (numBits,
  * numHashFunctions) geometry — i.e. the same (expectedKeys, fpp)
  * build parameters. A geometry mismatch THROWS with guidance (wrapping
  * the sketch library's terse [[IncompatibleMergeException]]) instead
  * of returning a silently wrong filter.
  *
  * Buffer is the lazily-created filter itself; null inputs are skipped
  * (SQL aggregate convention) and an all-null group yields null.
  */
case class BloomUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[BloomFilter]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_union expects a BINARY serialized Bloom filter, got " +
        child.dataType.catalogString)

  override def createAggregationBuffer(): Option[BloomFilter] = None

  private def read(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  private def union(a: BloomFilter, b: BloomFilter): BloomFilter =
    try a.mergeInPlace(b)
    catch {
      case e: IncompatibleMergeException => throw new IllegalArgumentException(
        "graft_bloom_union: filters have different geometry (numBits / " +
          "numHashFunctions) and cannot be unioned — build every sketch " +
          "in a merge set with the SAME (expectedKeys, fpp) parameters",
        e)
    }

  override def update(buf: Option[BloomFilter],
                      input: InternalRow): Option[BloomFilter] = {
    val v = child.eval(input)
    if (v == null) return buf
    val incoming = read(v.asInstanceOf[Array[Byte]])
    buf match {
      case None => Some(incoming) // readFrom returned a fresh owned copy
      case Some(f) => Some(union(f, incoming))
    }
  }

  override def merge(a: Option[BloomFilter],
                     b: Option[BloomFilter]): Option[BloomFilter] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(union(x, y))
      case (Some(x), None) => Some(x)
      case (None, other) => other
    }

  override def eval(buf: Option[BloomFilter]): Any =
    buf.map(write).orNull

  private def write(f: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f.writeTo(out)
    out.toByteArray
  }

  override def serialize(buf: Option[BloomFilter]): Array[Byte] =
    buf.map(write).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[BloomFilter] =
    if (bytes.isEmpty) None else Some(read(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomUnion =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): BloomUnion =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomUnion =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_bloom_union"
}

/** Static probe helper shared by [[BloomMightContainAny]]'s interpreted
  * and generated paths. */
object BloomProbe {
  def mightContainAny(
      bytes: Array[Byte],
      keys: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    var i = 0
    while (i < keys.numElements()) {
      if (bf.mightContainLong(keys.getLong(i))) return true
      i += 1
    }
    false
  }
}

/** Disjunctive membership probe of a hash LIST against a PER-ROW Bloom
  * binary — the per-file manifest probe Spark's native `might_contain`
  * refuses (it requires a constant sketch, the runtime-join-filter
  * shape; a data-skipping manifest has one sketch per FILE row).
  * `true` when ANY key might be present (fpp-probably wrong — callers
  * re-apply the exact predicate); `false` ⇒ every key definitely
  * absent. Deserializes the blob per row — sound at manifest grain,
  * where input is file-count-bounded, NOT a per-data-row expression.
  * Null sketch (all-null-key file) → null → filtered out, which is
  * sound: a point probe cannot match a null key. Codegen'd. */
case class BloomMightContainAny(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_any expects (sketch BINARY, keys ARRAY<BIGINT>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(sketch: Any, keys: Any): Any =
    java.lang.Boolean.valueOf(BloomProbe.mightContainAny(
      sketch.asInstanceOf[Array[Byte]],
      keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.expressions.BloomProbe.mightContainAny($s, $k);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContainAny = copy(l, r)
  override def prettyName: String = "graft_bloom_any"
}
