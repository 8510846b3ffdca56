package graft.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min frequency sketch (Cormode & Muthukrishnan 2005): a
  * depth×width counter matrix answering POINT-FREQUENCY queries for ANY
  * item — the member of the mergeable-sketch family
  * ([[MisraGries]] heavy hitters, HLL distincts, [[KllSketchAgg]]
  * quantiles, [[BloomUnion]] membership) that estimates per-item counts
  * without ever materializing the item domain. Each occurrence
  * increments one cell per row (row i's cell chosen by hash lane i);
  * the estimate is the MIN over rows — an OVERestimate, never under:
  * est(x) ≥ true(x), and est(x) ≤ true(x) + εN with ε ≈ e/width at
  * probability ≈ 1 − e^−depth. Merge is cellwise addition, exact under
  * arbitrary partial/merge trees — which is precisely what a map-side-
  * combining aggregate or a persisted per-slice sketch pipeline runs.
  *
  * Scale shape: the aggregation buffer is depth·width longs regardless
  * of corpus size, so a global build's exchange carries one fixed-size
  * matrix per map-side partial — where a `groupBy(token)` would shuffle
  * the full token domain. A 4×8192 default is 256 KiB; builds over
  * ~8M cells (64 MiB per partial) THROW with guidance rather than
  * silently bloating the shuffle.
  *
  * Hashing is md5-lane-derived for CROSS-ENGINE determinism: row i's
  * cell is the i-th 32-bit big-endian lane of md5(utf8(item)) mod
  * width — in SQL, `('0x' || substr(md5(item), i*8+1, 8))::BIGINT %
  * width` — so an external system (or the DuckDB oracle twin) can
  * reproduce every cell, estimate included, bit-for-bit. That caps
  * depth at 4 (md5 has four disjoint lanes); the lanes are not the
  * paper's independently-drawn 2-universal family — a documented
  * heuristic trade, standard in practice, and the ε/δ story is
  * unchanged for the adversary-free corpus-stats use.
  *
  * Binary layout (big-endian): int depth | int width | long n |
  * depth·width longs (row-major). `n` is the total summarized count —
  * the N the εN error bound is read against.
  */
object CountMin {
  val MaxDepth = 4
  /** Per-partial serialized ceiling: 8M cells = 64 MiB of longs. */
  val MaxCells = 8L * 1024 * 1024

  def checkGeometry(depth: Int, width: Int): Option[String] =
    if (depth < 1 || depth > MaxDepth)
      Some(s"depth=$depth outside [1, $MaxDepth] (md5 has 4 32-bit lanes)")
    else if (width < 1) Some(s"width=$width must be positive")
    else if (depth.toLong * width > MaxCells)
      Some(s"depth*width=${depth.toLong * width} cells exceeds $MaxCells " +
        "(64 MiB per aggregation partial) — lower width; the estimate " +
        "error is ~e/width*N, so 8M cells already resolves 1-per-2M " +
        "frequencies")
    else None

  /** Per-thread digest for the codegen'd serving path — estimate() runs
    * once per probe row inside whole-stage codegen, where a per-call
    * `MessageDigest.getInstance` would pay a JCA provider lookup and an
    * allocation per row. digest() resets the instance after each call,
    * so sequential per-thread reuse is safe. */
  private val threadMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def laneCell(digest: Array[Byte], i: Int, width: Int): Int =
    (((digest(4 * i) & 0xffL) << 24 | (digest(4 * i + 1) & 0xffL) << 16 |
      (digest(4 * i + 2) & 0xffL) << 8 | (digest(4 * i + 3) & 0xffL))
      % width).toInt

  /** Buffer layout: cells[0 .. d*w-1] row-major, buf(d*w) = n. */
  def newBuffer(depth: Int, width: Int): Array[Long] =
    new Array[Long](depth * width + 1)

  def serialize(depth: Int, width: Int, buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + depth * width * 8)
    bb.putInt(depth).putInt(width).putLong(buf(depth * width))
    var i = 0
    while (i < depth * width) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  /** (depth, width, buffer-with-n-last) from the binary. */
  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt; val n = bb.getLong
    val buf = newBuffer(depth, width)
    var i = 0
    while (i < depth * width) { buf(i) = bb.getLong; i += 1 }
    buf(depth * width) = n
    (depth, width, buf)
  }

  /** Point estimate from a sketch binary: min over rows of the item's
    * cell — used by both the interpreted and codegen'd estimator path. */
  def estimate(bytes: Array[Byte], item: UTF8String): Long = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt
    val digest = threadMd.get().digest(item.getBytes)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = bb.getLong(
        16 + ((i.toLong * width + laneCell(digest, i, width)) * 8).toInt)
      if (c < best) best = c
      i += 1
    }
    best
  }

  def nOf(bytes: Array[Byte]): Long = ByteBuffer.wrap(bytes).getLong(8)
}

/** Build a Count–Min sketch over a STRING column → sketch binary.
  * Nulls are skipped (SQL aggregate convention); an empty group yields
  * an all-zero sketch with n = 0 (estimates are 0 — correct: nothing
  * was counted). */
case class CountMinAgg(
    item: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    CountMin.checkGeometry(depth, width) match {
      case Some(err) => TypeCheckResult.TypeCheckFailure(err)
      case None if item.dataType != StringType =>
        // the cell hash is md5 over the item's UTF-8 bytes — the form an
        // external system can reproduce; cast/serialize other types to
        // string explicitly so the bytes being hashed are in plain sight
        TypeCheckResult.TypeCheckFailure(
          s"item must be STRING (md5-lane hashing is over UTF-8 bytes), " +
            s"got ${item.dataType.catalogString} — cast explicitly")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Long] =
    CountMin.newBuffer(depth, width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val digest = md.digest(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < depth) {
        buf(i * width + CountMin.laneCell(digest, i, width)) += 1L
        i += 1
      }
      buf(depth * width) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    CountMin.serialize(depth, width, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMin.serialize(depth, width, buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMin.deserialize(bytes)._3

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CountMinAgg = copy(item = cs.head)
  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_countmin"
}

/** Union stored Count–Min sketch binaries cellwise — the incremental
  * path: persist per-slice sketches, fold new slices in with no
  * historical rescan. Geometry (depth, width) must match across inputs:
  * cells of differently-shaped sketches don't correspond, so a mismatch
  * THROWS with guidance rather than merging garbage. Null inputs are
  * skipped; an all-null group yields SQL NULL. */
case class CountMinUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[(Int, Int, Array[Long])]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected a sketch BINARY, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Option[(Int, Int, Array[Long])] =
    None

  private def add(a: Option[(Int, Int, Array[Long])], depth: Int,
                  width: Int, cells: Array[Long]) = a match {
    case None => Some((depth, width, cells))
    case Some((d0, w0, acc)) =>
      if (d0 != depth || w0 != width)
        throw new IllegalArgumentException(
          s"graft_countmin_union: geometry mismatch — ${d0}x$w0 vs " +
            s"${depth}x$width. Sketches must be built with identical " +
            "(depth, width) to share cells; rebuild one side.")
      var i = 0
      while (i < acc.length) { acc(i) += cells(i); i += 1 }
      a
  }

  override def update(buf: Option[(Int, Int, Array[Long])],
                      input: InternalRow): Option[(Int, Int, Array[Long])] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val (d, w, cells) = CountMin.deserialize(v.asInstanceOf[Array[Byte]])
      add(buf, d, w, cells)
    }
  }

  override def merge(a: Option[(Int, Int, Array[Long])],
                     b: Option[(Int, Int, Array[Long])]) = b match {
    case None => a
    case Some((d, w, cells)) => add(a, d, w, cells)
  }

  override def eval(buf: Option[(Int, Int, Array[Long])]): Any = buf match {
    case None => null
    case Some((d, w, cells)) => CountMin.serialize(d, w, cells)
  }

  override def serialize(buf: Option[(Int, Int, Array[Long])]): Array[Byte] =
    buf match {
      case None => Array.emptyByteArray
      case Some((d, w, cells)) => CountMin.serialize(d, w, cells)
    }
  override def deserialize(bytes: Array[Byte]): Option[(Int, Int, Array[Long])] =
    if (bytes.isEmpty) None else Some(CountMin.deserialize(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CountMinUnion = copy(child = cs.head)
  override def withNewMutableAggBufferOffset(offset: Int): CountMinUnion =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinUnion =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_countmin_union"
}

/** Point-frequency estimate of a STRING item against a Count–Min sketch
  * binary: min over rows of the item's cell — ≥ the true count, ≤ true
  * + εN. Codegen'd (static helper call per row), so a broadcast-sketch
  * serving scan stays inside whole-stage codegen. */
case class CountMinEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (sketch BINARY, item STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, item: Any): Any =
    java.lang.Long.valueOf(CountMin.estimate(
      sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, it) =>
      s"${ev.value} = graft.expressions.CountMin.estimate($s, $it);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CountMinEstimateExpr = copy(l, r)
  override def prettyName: String = "graft_countmin_est"
}

/** The total count a Count–Min sketch has absorbed (its N — pairs with
  * the estimate for εN error reads). */
case class CountMinTotal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(CountMin.nOf(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CountMin.nOf($c);")
  override protected def withNewChildInternal(c: Expression): CountMinTotal =
    copy(c)
  override def prettyName: String = "graft_countmin_n"
}
