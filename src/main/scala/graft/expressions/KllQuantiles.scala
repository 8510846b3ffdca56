package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregates — the QUANTILE member of the
  * mergeable-sketch trio ([[MisraGries]] heavy hitters, Datasketches HLL
  * distinct counts, and this): bounded-memory distribution summaries per
  * corpus slice, persistable as binary columns and mergeable without
  * rescanning history. Built on the Datasketches KLL implementation
  * already on Spark's classpath (Karnin–Lang–Liberty 2016).
  *
  * Accuracy contract mirrors the HLL family's: the sketch is EXACT
  * while its level-0 buffer holds every arrival (n ≤ k — no compaction
  * has fired), and ~1.65/√k normalized-rank error beyond; approximation
  * past that point is the operator's design. Quantiles are read with
  * INCLUSIVE search semantics: the smallest retained value whose
  * cumulative weight ≥ q·N — in the exact regime that is precisely the
  * discrete percentile, and the oracle SQL reproduces the same
  * definition from cumulative counts.
  */
object KllQuantiles {
  def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Normalized INCLUSIVE rank of `v` against a pre-exploded sorted CDF
    * view — the serving half of [[KllCdfView]]: rightmost retained item
    * ≤ v by binary search, its cumulative weight over n (the identical
    * arithmetic Datasketches' `getRank(v, INCLUSIVE)` performs on the
    * same sorted view, so the two reads are bit-equal). Reads the
    * [[ArrayData]] accessors in place — no per-row copy, no per-row
    * sketch deserialization: O(log retained) per probe. Called from
    * generated code ([[SortedCdfRank]]). */
  def cdfRank(items: ArrayData, cumw: ArrayData, n: Long,
              v: Double): Double = {
    var lo = 0
    var hi = items.numElements() - 1
    var idx = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (items.getDouble(mid) <= v) { idx = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (idx < 0) 0.0 else cumw.getLong(idx).toDouble / n
  }
}

/** Aggregate double values into one KLL sketch binary (`k` controls
  * both the exactness horizon and the compressed error). Nulls skipped;
  * an empty group yields an empty sketch (deserializable, n = 0). */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8 || k > 65535) {
      TypeCheckResult.TypeCheckFailure(s"k=$k outside KLL's [8, 65535]")
    } else if (child.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected DOUBLE input, got ${child.dataType.catalogString} — " +
          "cast the measure column explicitly")
    } else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch,
                     b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllQuantiles.heapify(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_sketch"
}

/** Union stored KLL sketch binaries — the relational merge for
  * slice-sketch frames (the `hll_union_agg` pattern): input is s
  * bounded binaries regardless of the corpus behind them. `k` sizes
  * the result sketch; merging a higher-k part into a lower-k target
  * degrades to the target's accuracy (Datasketches semantics). */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8 || k > 65535) {
      TypeCheckResult.TypeCheckFailure(s"k=$k outside KLL's [8, 65535]")
    } else if (child.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected a KLL sketch BINARY, got ${child.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllQuantiles.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: KllDoublesSketch,
                     b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllQuantiles.heapify(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_merge"
}

/** Read quantiles out of a KLL sketch binary: `array<double>` with one
  * entry per requested rank (INCLUSIVE search — smallest retained value
  * with cumulative weight ≥ q·N). Empty sketch → null (quantiles of
  * nothing are undefined; SQL-null beats an exception inside a scan). */
case class KllQuantileValues(child: Expression, qs: Seq[Double])
  extends UnaryExpression {
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"ranks must lie in [0, 1], got $qs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def read(bytes: Array[Byte]): Any = {
    val sk = KllQuantiles.heapify(bytes)
    if (sk.isEmpty) null
    else new GenericArrayData(qs.map(q =>
      sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)).toArray)
  }

  override def nullSafeEval(input: Any): Any =
    read(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllQuantileValues", this)
    val r = ctx.freshName("r")
    val code = nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $r = $ref.read($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (${classOf[ArrayData].getName}) $r; }
       """.stripMargin
    })
    code
  }
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): KllQuantileValues =
    copy(c)
  override def prettyName: String = "graft_kll_quantiles"
}

/** Normalized INCLUSIVE rank of a value in a KLL sketch binary —
  * `#{x ≤ v} / n` over the sketched population: the CDF read the
  * quantile read inverts, and the serving kernel behind
  * [[graft.core.Stats.rankNormalizeSketch]]'s lake-scale rank
  * normalization. In the sketch's exact regime (no compaction) the
  * result is EXACTLY the inclusive empirical CDF — one IEEE division
  * of the cumulative count by n, the same arithmetic the exact
  * [[graft.core.Stats.rankStats]] path and the SQL twin perform — and
  * ~1.65/√k normalized-rank error beyond (the operator's design).
  * Defined for ANY probe value: below-domain probes rank 0.0,
  * above-domain 1.0 — out-of-reference values get a rank instead of
  * being dropped (the inner-join exact path's documented limitation).
  * Empty sketch → null (rank against nothing is undefined). */
case class KllRankValue(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected a KLL sketch BINARY, got ${left.dataType.catalogString}")
    } else if (right.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected DOUBLE probe, got ${right.dataType.catalogString} — " +
          "cast the measure column explicitly")
    } else TypeCheckResult.TypeCheckSuccess

  def read(bytes: Array[Byte], v: Double): Any = {
    val sk = KllQuantiles.heapify(bytes)
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getRank(v, QuantileSearchCriteria.INCLUSIVE))
  }

  override def nullSafeEval(sketch: Any, v: Any): Any =
    read(sketch.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllRankValue", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"""
         |Object $r = $ref.read($s, $v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin)
  }
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRankValue =
    copy(newLeft, newRight)
  override def prettyName: String = "graft_kll_rank"
}

/** Explode a KLL sketch binary into its sorted CDF view —
  * `struct<items array<double>, cumw array<bigint>, n bigint>`: the
  * retained items ascending, their INCLUSIVE cumulative weights, and
  * the sketched population count, exactly as Datasketches'
  * `getSortedView` reports them. This is the TRAIN→SERVE split for
  * rank serving at scale: [[KllRankValue]] re-heapifies the whole
  * binary for EVERY probe row — O(retained) work and a fresh
  * allocation per row, which turns a 100 TB serve into
  * O(rows · retained) — whereas this view is computed ONCE per group
  * row on the bounded stats frame (O(groups · retained) total) and
  * every probe then binary-searches it in place via [[SortedCdfRank]]
  * (O(log retained)/row, zero per-row deserialization, inside
  * whole-stage codegen). Same numbers, different plan shape: the rank
  * read off this view is bit-equal to `getRank(v, INCLUSIVE)` on the
  * binary (spec'd). Empty sketch → null (rank against nothing is
  * undefined — the [[KllRankValue]] contract). */
case class KllCdfView(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("cumw", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected a KLL sketch BINARY, got ${child.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckSuccess

  def read(bytes: Array[Byte]): Any = {
    val sk = KllQuantiles.heapify(bytes)
    if (sk.isEmpty) null
    else {
      val view = sk.getSortedView
      InternalRow(new GenericArrayData(view.getQuantiles),
        new GenericArrayData(view.getCumulativeWeights), sk.getN)
    }
  }

  override def nullSafeEval(input: Any): Any =
    read(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllCdfView", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object $r = $ref.read($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (${classOf[InternalRow].getName}) $r; }
       """.stripMargin)
  }
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): KllCdfView =
    copy(c)
  override def prettyName: String = "graft_kll_cdf"
}

/** Normalized INCLUSIVE rank of a DOUBLE probe against a [[KllCdfView]]
  * sorted CDF — `#{x ≤ v}/n` by in-place binary search over the array
  * columns: the HOT serving kernel behind
  * [[graft.core.Stats.rankNormalizeSketch]]. Per row: O(log retained)
  * comparisons against [[org.apache.spark.sql.catalyst.util.ArrayData]]
  * accessors — no copy, no allocation, no sketch deserialization — so
  * the serve cost is independent of sketch size for all practical
  * purposes (14 probes into a 16k-item view). Bit-equal to
  * Datasketches' `getRank(v, INCLUSIVE)` on the originating sketch:
  * same rightmost-item-≤-v search, same cumulative-weight-over-n IEEE
  * division (spec'd against [[KllRankValue]] on random data).
  * Below-domain probes rank 0.0, above-domain 1.0 — every probe gets a
  * DEFINED rank. Any null input (a null CDF = empty sketch) → null. */
case class SortedCdfRank(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
  extends QuaternaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != ArrayType(DoubleType, containsNull = false) &&
        first.dataType != ArrayType(DoubleType, containsNull = true)) {
      TypeCheckResult.TypeCheckFailure(
        s"expected ARRAY<DOUBLE> items, got ${first.dataType.catalogString}")
    } else if (!second.dataType.isInstanceOf[ArrayType] ||
        second.dataType.asInstanceOf[ArrayType].elementType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected ARRAY<BIGINT> cumulative weights, got " +
          second.dataType.catalogString)
    } else if (third.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected BIGINT n, got ${third.dataType.catalogString}")
    } else if (fourth.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected DOUBLE probe, got ${fourth.dataType.catalogString} — " +
          "cast the measure column explicitly")
    } else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(items: Any, cumw: Any, n: Any, v: Any): Any =
    KllQuantiles.cdfRank(items.asInstanceOf[ArrayData],
      cumw.asInstanceOf[ArrayData], n.asInstanceOf[Long],
      v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (items, cumw, n, v) =>
      s"graft.expressions.KllQuantiles.cdfRank($items, $cumw, $n, $v)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): SortedCdfRank = copy(f, s, t, q)
  override def prettyName: String = "graft_cdf_rank"
}

/** Discrete inclusive median AND median-absolute-deviation read from
  * ONE KLL sketch binary — `struct<med double, mad double>`: the
  * robust-statistics pair behind
  * [[graft.core.Stats.robustStatsFromSketch]]'s mergeable anomaly
  * baseline. Both statistics use the library's discrete INCLUSIVE
  * definition (smallest value whose doubled cumulative weight ≥ n —
  * `core.Stats.robustStats`'s exact contract), computed over the
  * sketch's retained items: the median walks the sorted view; the
  * deviation distribution is then MATERIALIZED from the same retained
  * (item, weight) pairs (|item − med|, re-sorted, re-cumulated) — the
  * joint information plain quantile reads cannot give. In the exact
  * regime (no compaction — every arrival retained at weight 1) the
  * result is bit-equal to the exact med/MAD; beyond it both carry the
  * family's ~1.65/√k normalized-rank error, approximation by design.
  * O(retained · log retained) per read on ≤ k items — driver- or
  * executor-cheap at any corpus size. Empty sketch → null. */
case class KllRobustStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("med", DoubleType, nullable = false),
    StructField("mad", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected a KLL sketch BINARY, got ${child.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckSuccess

  /** Smallest value whose doubled cumulative weight ≥ n, over sorted
    * (value, weight) pairs — the discrete inclusive median rule. */
  private def inclusiveMedian(sorted: Array[(Double, Long)],
                              n: Long): Double = {
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum * 2 >= n) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def read(bytes: Array[Byte]): Any = {
    val sk = KllQuantiles.heapify(bytes)
    if (sk.isEmpty) return null
    val view = sk.getSortedView
    val items = view.getQuantiles
    val weights = view.getCumulativeWeights // cumulative, INCLUSIVE
    val n = sk.getN
    val pairs = new Array[(Double, Long)](items.length)
    var prev = 0L
    var i = 0
    while (i < items.length) {
      pairs(i) = (items(i), weights(i) - prev)
      prev = weights(i)
      i += 1
    }
    val med = inclusiveMedian(pairs, n)
    val dev = pairs.map { case (v, w) => (math.abs(v - med), w) }
      .sortBy(_._1)
    val mad = inclusiveMedian(dev, n)
    org.apache.spark.sql.catalyst.InternalRow(med, mad)
  }

  override def nullSafeEval(input: Any): Any =
    read(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllRobustStats", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object $r = $ref.read($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (${classOf[InternalRow].getName}) $r; }
       """.stripMargin)
  }
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): KllRobustStats =
    copy(c)
  override def prettyName: String = "graft_kll_robust_stats"
}

/** The sketch's retained-item count horizon: `n` as recorded by the
  * sketch itself — pairs with the quantiles for exact-regime checks. */
case class KllSketchN(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      KllQuantiles.heapify(input.asInstanceOf[Array[Byte]]).getN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.KllQuantiles.heapify($c).getN();")
  override protected def withNewChildInternal(c: Expression): KllSketchN =
    copy(c)
  override def prettyName: String = "graft_kll_n"
}
