package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitter sketch as a bounded aggregate: retains at
  * most `capacity` (item, count) counters and returns them as an
  * `array<struct<item, count_lb>>` sorted (count desc, item asc).
  *
  * Guarantee (Misra & Gries 1982; merge rule per Agarwal et al. 2013,
  * "Mergeable Summaries"): after summarizing a stream of N items, every
  * item with true frequency > N/(capacity+1) is present, and each
  * retained counter is a LOWER bound on the true frequency, short by at
  * most N/(capacity+1). That makes the sketch the pass-1 candidate
  * filter of an EXACT two-pass top-k (see
  * [[graft.llm.Corpus.heavyHitters]]): pass 1 shrinks the candidate set
  * to ≤ capacity items without ever shuffling the token domain, pass 2
  * counts only those candidates exactly.
  *
  * Scale shape: the aggregation buffer is a ≤ capacity-entry map, so a
  * global aggregate's exchange carries one ≤ capacity-entry sketch per
  * map-side partial — O(capacity · partitions) rows of state where a
  * naive `groupBy(token)` shuffles the full token domain. The
  * decrement-all eviction step costs O(capacity) but consumes
  * capacity+1 units of arrived count mass, so update stays amortized
  * O(1) per input row (the same argument Spark's own
  * `stat.freqItems` relies on). Merge adds counts then subtracts the
  * (capacity+1)-th largest total from every counter — the mergeable-
  * summaries rule that preserves the error bound under arbitrary
  * partial/merge trees, which is exactly what a map-side-combining
  * aggregate executes.
  *
  * Null items are skipped (SQL aggregate convention).
  */
object MisraGries {
  /** Types whose EVALUATED values have value-based equals/hashCode —
    * safe as hash-map counter keys. Structs (reference-equal rows),
    * binary (Array[Byte]), arrays/maps (mixed Generic/Unsafe
    * representations) are not. */
  def hashableKey(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }
}

case class MisraGries(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  type Buf = mutable.HashMap[Any, Long]

  @transient private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(item.dataType)

  private lazy val entryStruct = StructType(Seq(
    StructField("item", item.dataType, nullable = false),
    StructField("count_lb", LongType, nullable = false)))
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(entryStruct)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (capacity <= 0) {
      TypeCheckResult.TypeCheckFailure(
        s"capacity must be positive, got $capacity")
    } else if (!MisraGries.hashableKey(item.dataType)) {
      // the buffer is a hash map keyed on evaluated values: these types
      // (UTF8String, boxed numerics, Decimal, …) carry value-based
      // equals/hashCode, but struct rows compare by reference, binary is
      // Array[Byte] (reference equality), and arrays can arrive in mixed
      // Generic/Unsafe representations — any of those would silently
      // split or churn counters instead of counting
      TypeCheckResult.TypeCheckFailure(
        s"item type ${item.dataType.catalogString} is not atomic — " +
          "sketch a single atomic column (e.g. concat struct fields)")
    } else if (!RowOrdering.isOrderable(item.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"item type ${item.dataType.catalogString} is not orderable")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = item.eval(input)
    if (v == null) return buf
    buf.get(v) match {
      case Some(c) => buf(v) = c + 1L
      case None if buf.size < capacity =>
        // copy: eval results may alias the reused input row's buffers
        buf(InternalRow.copyValue(v)) = 1L
      case None =>
        // MG eviction: decrement every counter, drop zeros; the new
        // item's own count would be 0 after the decrement, so it is
        // not inserted
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, c) =>
      a.updateWith(k)(o => Some(o.getOrElse(0L) + c))
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // keep the strictly-positive remainder: ≤ capacity entries stay
      // and the N/(capacity+1) error bound is preserved (Agarwal et al.)
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - (capacity + 1))
      a.mapValuesInPlace((_, c) => c - t)
      a.filterInPlace((_, c) => c > 0L)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else itemOrdering.compare(i1, i2) < 0
    }
    new GenericArrayData(sorted.map { case (i, c) => InternalRow(i, c) })
  }

  override def serialize(buf: Buf): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(
      buf.toArray.map { case (i, c) => InternalRow(i, c) }))).getBytes

  override def deserialize(bytes: Array[Byte]): Buf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      // copy out of the byte-array-backed view so map keys own memory
      buf(InternalRow.copyValue(s.get(0, item.dataType))) = s.getLong(1)
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    ArrayType(entryStruct, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(item = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_misra_gries"
}
