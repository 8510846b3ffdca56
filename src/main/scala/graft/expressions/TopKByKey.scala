package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: keeps the `k` entries with the
  * SMALLEST (`asc = true`) or LARGEST (`asc = false`) `key` seen in the
  * group, each carrying an opaque `payload`, returned as an
  * `array<struct<key, payload>>` sorted best-first.
  *
  * This is the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(key)) <= k` idiom.
  * The window form materializes and SORTS every group in full — one task
  * per group, group size corpus/|groups| at 100 TB — while this aggregate
  * is map-side combining: every partition contributes at most k entries
  * per group, the exchange carries O(k·groups) rows, and no full sort
  * ever happens. Runs under ObjectHashAggregateExec (Spark's execution
  * path for TypedImperativeAggregate, map-side partials included).
  *
  * Null keys are skipped (SQL aggregate convention). Ties at the k-th
  * key keep an arbitrary tied entry — pass a unique (composite) key,
  * e.g. `struct(score, id)`, for deterministic results.
  */
case class TopKByKey(
    key: Expression,
    payload: Expression,
    k: Int,
    asc: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  type Buf = mutable.PriorityQueue[(Any, Any)]

  // "better" = smaller under this ordering; the heap is a max-heap over
  // it, so `head` is always the WORST retained entry (the eviction
  // candidate)
  @transient private lazy val keyOrdering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(key.dataType)
    if (asc) base else base.reverse
  }
  @transient private lazy val heapOrdering: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(keyOrdering)

  private lazy val pairStruct = StructType(Seq(
    StructField("key", key.dataType, nullable = false),
    StructField("payload", payload.dataType, payload.nullable)))
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(pairStruct)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    } else if (!RowOrdering.isOrderable(key.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"key type ${key.dataType.catalogString} is not orderable")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Buf =
    mutable.PriorityQueue.empty(heapOrdering)

  private def offer(buf: Buf, kv: Any, pv: Any, copy: Boolean): Buf = {
    if (buf.size < k) {
      if (copy) buf.enqueue((InternalRow.copyValue(kv), InternalRow.copyValue(pv)))
      else buf.enqueue((kv, pv))
    } else if (keyOrdering.compare(kv, buf.head._1) < 0) {
      buf.dequeue()
      if (copy) buf.enqueue((InternalRow.copyValue(kv), InternalRow.copyValue(pv)))
      else buf.enqueue((kv, pv))
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val kv = key.eval(input)
    // copy: eval results may alias the (reused) input row's buffers
    if (kv != null) offer(buf, kv, payload.eval(input), copy = true) else buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { e => offer(big, e._1, e._2, copy = false) }
    big
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1)(keyOrdering)
      .map { case (kv, pv) => InternalRow(kv, pv) })

  override def serialize(buf: Buf): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(
      buf.toArray.map { case (kv, pv) => InternalRow(kv, pv) }))).getBytes

  override def deserialize(bytes: Array[Byte]): Buf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      // copy out of the byte-array-backed views so heap entries own
      // their memory
      buf.enqueue((InternalRow.copyValue(s.get(0, key.dataType)),
        InternalRow.copyValue(s.get(1, payload.dataType))))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(pairStruct, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, payload)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByKey =
    copy(key = newChildren(0), payload = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): TopKByKey =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByKey =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_top_k_by_key"
}

object TopKByKeyPerGroup {
  /** Aggregation state: the retained entries plus the group's bound.
    * `k = -1` means "not yet learned" (freshly created or empty partial
    * buffer) — the first input row, or the first non-empty merge
    * partner, fixes it. */
  final class Buf(var k: Int,
                  val heap: mutable.PriorityQueue[(Any, Any)])
}

/** Per-group-k variant of [[TopKByKey]]: the bound is an EXPRESSION
  * evaluated per input row (typically a map-literal lookup on the group
  * column), so each group retains its own k while staying map-side
  * combining. The exchange carries O(Σ k_g) rows — the weighted
  * stratified sampler's contract — where aggregating at `max k` and
  * filtering after would carry O(k_max · groups) and let one
  * heavy-weighted stratum inflate every other stratum's partials.
  *
  * `kExpr` MUST be (a) non-null, (b) in [1, maxK], and (c) constant
  * within each group — all three are enforced with a loud exception, not
  * silently repaired, because a varying k inside one group means the
  * caller's weights map is keyed on something other than the grouping
  * column (a real bug, not a data quirk). `maxK` is a sanity ceiling on
  * per-group state (the heap is driver-invisible but executor-resident).
  *
  * Null KEYS are skipped exactly like [[TopKByKey]]; ties at the k-th
  * key keep an arbitrary tied entry — pass a unique composite key for
  * deterministic output. */
case class TopKByKeyPerGroup(
    key: Expression,
    payload: Expression,
    kExpr: Expression,
    asc: Boolean = true,
    maxK: Int = 10000000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByKeyPerGroup.Buf] {

  import TopKByKeyPerGroup.Buf

  @transient private lazy val keyOrdering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(key.dataType)
    if (asc) base else base.reverse
  }
  @transient private lazy val heapOrdering: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(keyOrdering)

  private lazy val pairStruct = StructType(Seq(
    StructField("key", key.dataType, nullable = false),
    StructField("payload", payload.dataType, payload.nullable)))
  @transient private lazy val serProj = UnsafeProjection.create(
    Array[DataType](IntegerType, ArrayType(pairStruct)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (kExpr.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure(
        s"k must be INT, got ${kExpr.dataType.catalogString}")
    } else if (!RowOrdering.isOrderable(key.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"key type ${key.dataType.catalogString} is not orderable")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Buf =
    new Buf(-1, mutable.PriorityQueue.empty(heapOrdering))

  private def offer(buf: Buf, kv: Any, pv: Any, copy: Boolean): Unit = {
    if (buf.heap.size < buf.k) {
      if (copy) buf.heap.enqueue(
        (InternalRow.copyValue(kv), InternalRow.copyValue(pv)))
      else buf.heap.enqueue((kv, pv))
    } else if (keyOrdering.compare(kv, buf.heap.head._1) < 0) {
      buf.heap.dequeue()
      if (copy) buf.heap.enqueue(
        (InternalRow.copyValue(kv), InternalRow.copyValue(pv)))
      else buf.heap.enqueue((kv, pv))
    }
  }

  private def adoptK(buf: Buf, k: Int): Unit = {
    if (k <= 0 || k > maxK) throw new IllegalStateException(
      s"graft_top_k_by_key_per_group: per-group k=$k outside [1, $maxK] " +
        "— filter k<1 groups out before aggregating (they retain " +
        "nothing) and raise maxK deliberately for genuinely huge bounds")
    if (buf.k == -1) buf.k = k
    else if (buf.k != k) throw new IllegalStateException(
      s"graft_top_k_by_key_per_group: k changed within one group " +
        s"(${buf.k} vs $k) — kExpr must be constant per group; a " +
        "varying k means the bound is keyed on a non-grouping column")
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val kRaw = kExpr.eval(input)
    if (kRaw == null) throw new IllegalStateException(
      "graft_top_k_by_key_per_group: NULL k — coalesce the bound " +
        "lookup to an explicit default before aggregating")
    adoptK(buf, kRaw.asInstanceOf[Int])
    val kv = key.eval(input)
    if (kv != null) offer(buf, kv, payload.eval(input), copy = true)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.k != -1) adoptK(a, b.k)
    b.heap.foreach { e => offer(a, e._1, e._2, copy = false) }
    a
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.heap.toArray.sortBy(_._1)(keyOrdering)
      .map { case (kv, pv) => InternalRow(kv, pv) })

  override def serialize(buf: Buf): Array[Byte] =
    serProj(InternalRow(buf.k, new GenericArrayData(
      buf.heap.toArray.map { case (kv, pv) => InternalRow(kv, pv) })))
      .getBytes

  override def deserialize(bytes: Array[Byte]): Buf = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = new Buf(row.getInt(0),
      mutable.PriorityQueue.empty(heapOrdering))
    val arr = row.getArray(1)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      buf.heap.enqueue((InternalRow.copyValue(s.get(0, key.dataType)),
        InternalRow.copyValue(s.get(1, payload.dataType))))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(pairStruct, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, payload, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByKeyPerGroup =
    copy(key = newChildren(0), payload = newChildren(1),
      kExpr = newChildren(2))
  override def withNewMutableAggBufferOffset(offset: Int): TopKByKeyPerGroup =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByKeyPerGroup =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_top_k_by_key_per_group"
}
