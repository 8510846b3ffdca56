package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Dataset statistics / index rollups — SURVEY.md §2.4.
  *
  * A1 total size (ftm_datalake/archive/documents.py:125-127,
  * dataset.py:192-196), A2 per-schema entity counts (dataset.py:180-185,
  * golden oracle tests/fixtures/.../index.json), A7 catalog rollup
  * (archive/base.py:75-83).
  *
  * All are single-pass partial+final aggregations; at 100 TB they are one
  * shuffle of pre-aggregated per-partition rows (bytes, not data).
  */
object Stats {

  /** Sum of file sizes (A1). */
  def totalFileSize(documents: DataFrame): Long = {
    val r = documents.agg(sum("size").as("total")).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** ANALYZE-style per-column table profile — the lake-ops data card:
    * one row per column with row/null/distinct counts and typed min/max
    * (numerics in `min_num`/`max_num` rounded to 6 dp; strings,
    * booleans, dates and timestamps string-cast into
    * `min_str`/`max_str` — doubles are deliberately NOT string-cast,
    * engines format them differently). Non-atomic columns (arrays,
    * structs, maps, binary) profile null counts only — their distinct
    * and ordering semantics are representation-dependent.
    *
    * ONE scan, one aggregate row, stacked to per-column rows driver-free
    * (the explode works on a 1-row frame). Exact `count(DISTINCT)` per
    * column makes Spark plan an Expand (one shuffled pass per distinct
    * column) — correct but costly at 100 TB; `approxDistinct = true`
    * swaps in single-pass HLL `approx_count_distinct` (default ±5% rsd),
    * the profile-at-scale mode (spec-asserted, not oracle-gated —
    * approximation is the point). */
  def tableProfile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.toSeq
    def numeric(dt: DataType) = dt.isInstanceOf[NumericType]
    def atomic(dt: DataType) = dt match {
      case _: NumericType | StringType | BooleanType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    // source refs backtick-quoted (a dotted column name must profile,
    // not parse as struct access); internal aliases are index-based so
    // no user-controlled name ever reaches a generated identifier
    def src(f: StructField): org.apache.spark.sql.Column =
      col("`" + f.name.replace("`", "``") + "`")
    val aggs = Seq(count(lit(1)).as("__n")) ++
      fields.zipWithIndex.flatMap { case (f, i) =>
        val c = src(f)
        val nd =
          if (!atomic(f.dataType)) lit(null).cast("long")
          else if (approxDistinct) approx_count_distinct(c)
          else countDistinct(c)
        val (mnN, mxN, mnS, mxS) =
          if (numeric(f.dataType))
            (round(min(c).cast("double"), 6), round(max(c).cast("double"), 6),
              nullS, nullS)
          else if (atomic(f.dataType))
            (nullD, nullD, min(c).cast("string"), max(c).cast("string"))
          else (nullD, nullD, nullS, nullS)
        Seq(count(c).as(s"__cnt_$i"), nd.as(s"__nd_$i"),
          mnN.as(s"__mnn_$i"), mxN.as(s"__mxn_$i"),
          mnS.as(s"__mns_$i"), mxS.as(s"__mxs_$i"))
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(fields.zipWithIndex.map { case (f, i) => struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$i")).as("n_nulls"),
        col(s"__nd_$i").cast("long").as("n_distinct"),
        col(s"__mnn_$i").as("min_num"),
        col(s"__mxn_$i").as("max_num"),
        col(s"__mns_$i").as("min_str"),
        col(s"__mxs_$i").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Per-FTM-schema document counts derived from mimetypes (A2). */
  def schemaCounts(documents: DataFrame): DataFrame =
    documents
      .withColumn("schema", GraftFunctions.mimeToSchema(col("mimetype")))
      .groupBy("schema")
      .agg(count(lit(1)).as("count"))
      .orderBy("schema")

  /** One index row: entity count, total size, per-schema counts as a sorted
    * map (A2+A1 rollup → the index.json `things.schemata` shape,
    * dataset.py:177-190, golden fixture tests/fixtures/.../index.json). */
  def datasetIndex(documents: DataFrame): DataFrame =
    documents
      .withColumn("schema", GraftFunctions.mimeToSchema(col("mimetype")))
      .groupBy("schema")
      .agg(count(lit(1)).as("cnt"), sum("size").as("sz"))
      .agg(
        sum("cnt").as("entity_count"),
        sum("sz").as("total_file_size"),
        map_from_entries(sort_array(collect_list(struct(col("schema"), col("cnt")))))
          .as("schemata"))

  /** Serialize the index row to the RFC `index.json` shape (driver-side —
    * it is one small object, not a data-plane write). */
  def writeIndexJson(documents: DataFrame, name: String, path: String): Unit = {
    val row = datasetIndex(documents).collect()(0)
    val schemata = row.getMap[String, Long](2).toSeq.sortBy(_._1)
      .map { case (s, c) => s"""{"name":"$s","count":$c}""" }
      .mkString("[", ",", "]")
    val json =
      s"""{"name":"$name","updated_at":"${java.time.Instant.now()}",""" +
        s""""things":{"total":${row.getLong(0)},"schemata":$schemata},""" +
        s""""entity_count":${row.getLong(0)},""" +
        s""""total_file_size":${row.getLong(1)}}"""
    writeString(documents.sparkSession, path, json)
  }

  /** Small-object write through the Hadoop FS (so index/catalog JSON land
    * on s3a://hdfs:// lakes the same as local ones). */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Catalog rollup (A7): per-dataset aggregate row over a multi-dataset
    * documents table carrying a `dataset` column. */
  /** Robust per-group outlier flagging by median absolute deviation —
    * the distribution-free anomaly screen (Leys et al. 2013's
    * median ± k·MAD rule) for event values, quality scores, or any
    * keyed measure where means/stddevs would be dragged by the very
    * outliers being hunted. Both statistics are DISCRETE INCLUSIVE
    * medians (smallest value whose cumulative count satisfies
    * 2·cum ≥ n — the KLL/doc_len_quantiles definition), so every
    * number is an actual data value and the cross-engine story needs
    * no interpolation contract; the flag compare `|x − med| > k·mad`
    * runs the identical IEEE steps on both engines. Null measures are
    * excluded (they have no deviation); a NULL GROUP KEY is a group
    * like any other — every key join below is null-safe (`<=>`), so
    * unkeyed rows get their own median/MAD and flags instead of
    * silently vanishing at an inner equi-join.
    *
    * Scale shape: one scan collapses values to the per-group VALUE
    * DOMAIN histogram; the median and MAD cumulative windows run over
    * that aggregated domain (per-group, ordered — never raw rows), the
    * deviation histogram derives from the value histogram (no rescan),
    * and the per-row flags are a second scan joined against the
    * per-group stats (one row per group — AQE broadcasts bounded
    * domains; unbounded ones stay a keyed join). Two scans total, the
    * surprisal-family floor.
    *
    * Output: input rows (null measures dropped) + (med, mad,
    * is_outlier). */
  def robustOutliers(df: DataFrame, keyCol: String, valueCol: String,
                     k: Double = 3.0): DataFrame = {
    require(k > 0, s"robustOutliers: k=$k must be positive")
    robustOutliersAgainst(df, robustStats(df, keyCol, valueCol),
      keyCol, valueCol, k)
  }

  /** The statistics half of [[robustOutliers]] — per-group discrete
    * inclusive median and MAD as a plain persistable frame
    * `(<keyCol>, med, mad)`: train once on a reference window, write
    * parquet, and screen every later batch/stream with
    * [[robustOutliersAgainst]] — the anomaly screen's
    * train-once/serve-many split (the [[graft.llm.Retrieval.Bm25Index]]
    * / VectorIndex lifecycle: geometry = the reference window;
    * regenerate when the baseline distribution legitimately moves).
    * Same exchange shape as computing them inline. */
  def robustStats(df: DataFrame, keyCol: String,
                  valueCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val h = rows.groupBy(col(keyCol).as("__k"),
        col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    // all key joins are NULL-SAFE: groupBy keeps the null-key group,
    // but a plain equi-join (USING or ===) never matches NULL to NULL,
    // so that group's rows would silently vanish from the output.
    // EqualNullSafe is still an equi-join key (hash-joinable).
    val n = h.groupBy("__k").agg(sum("__c").as("__n"))
      .withColumnRenamed("__k", "__kn")
    val wv = org.apache.spark.sql.expressions.Window.partitionBy("__k")
      .orderBy("__v")
    val med = h.withColumn("__cum", sum("__c").over(wv))
      .join(n, col("__k") <=> col("__kn")).drop("__kn")
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy("__k").agg(min("__v").as("med"))
    val d = h.join(med.withColumnRenamed("__k", "__km"),
        col("__k") <=> col("__km"))
      .groupBy(col("__k"), abs(col("__v") - col("med")).as("__dev"))
      .agg(sum("__c").as("__c"))
    val wd = org.apache.spark.sql.expressions.Window.partitionBy("__k")
      .orderBy("__dev")
    val mad = d.withColumn("__cum", sum("__c").over(wd))
      .join(n, col("__k") <=> col("__kn")).drop("__kn")
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy("__k").agg(min("__dev").as("mad"))
    med.join(mad.withColumnRenamed("__k", "__km"),
        col("__k") <=> col("__km")).drop("__km")
      .select(col("__k").as(keyCol), col("med"), col("mad"))
  }

  /** Flag rows against PRE-COMPUTED (possibly parquet-reloaded)
    * [[robustStats]] — the serving path: one scan + one stats join, no
    * median/MAD recomputation per batch. Rows whose group has no stats
    * row are DROPPED (inner join — an unseen group has no baseline to
    * flag against; union the reference window forward or retrain when
    * new groups appear). Null measures and null-key handling as in
    * [[robustOutliers]] (null-safe key join). */
  def robustOutliersAgainst(df: DataFrame, stats: DataFrame,
                            keyCol: String, valueCol: String,
                            k: Double = 3.0): DataFrame = {
    require(k > 0, s"robustOutliersAgainst: k=$k must be positive")
    val rows = df.filter(col(valueCol).isNotNull)
    val st = stats.select(col(keyCol).as("__k"), col("med"), col("mad"))
    // no forced broadcast: the stats frame is one row per group —
    // tiny for bounded domains (AQE broadcasts it), but a genuinely
    // unbounded key domain degrades to a keyed join instead of a
    // driver-side OOM
    rows.join(st, col(keyCol) <=> col("__k"))
      .drop("__k")
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Exact empirical-CDF normalization (inclusive cume_dist):
    * `pct(x) = #{rows with value ≤ x} / n`, per `keyCol` group when
    * given — the rank-normalizer that puts heterogeneous quality
    * signals (perplexity, length, classifier scores) on the common
    * (0, 1] scale before combining or thresholding them, immune to
    * each signal's units and tail shape. Computed from the
    * VALUE-DOMAIN histogram: one cumulative window over the
    * aggregated per-group domain — never raw rows — then one join
    * back (the [[robustOutliers]] 2-scan shape, null-safe keys).
    * Exact integers, one division per DISTINCT value, so the twin
    * matches bitwise. Null measures are excluded (no rank). Ties
    * share the inclusive pct by construction. Output: input rows +
    * `pct`. For CONTINUOUS values the domain approaches the row count
    * and the per-group window pays an O(domain log domain) sort —
    * exact CDF's inherent cost; at lake scale read approximate ranks
    * from [[graft.llm.Corpus.quantileSketch]]'s bounded KLL state
    * instead (the perplexityBuckets split). One-shot composition of
    * [[rankStats]] (train) + [[rankNormalizeAgainst]] (serve). */
  def rankNormalize(df: DataFrame, valueCol: String,
                    keyCol: String = null): DataFrame =
    rankNormalizeAgainst(df, rankStats(df, valueCol, keyCol),
      valueCol, keyCol)

  /** The CDF half of [[rankNormalize]] — the per-group empirical
    * distribution as a plain persistable frame `(__k, __v, pct)`
    * (when `keyCol` is null, `__k` is the constant 0 all-rows group):
    * train once on a reference window, write parquet, and normalize
    * every later batch/stream with [[rankNormalizeAgainst]] — the
    * rank-normalizer's train-once/serve-many split, exactly the
    * [[robustStats]]/[[robustOutliersAgainst]] lifecycle (geometry =
    * the reference window's value domain; regenerate when the baseline
    * distribution legitimately moves). Same exchange shape as
    * computing the CDF inline. For CONTINUOUS value domains the frame
    * approaches the reference row count — persist the bounded KLL
    * state from [[graft.llm.Corpus.quantileSketch]] instead and serve
    * approximate ranks from it (the perplexityBuckets split). */
  def rankStats(df: DataFrame, valueCol: String,
                keyCol: String = null): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val gk = Option(keyCol).map(col).getOrElse(lit(0))
    val h = rows.groupBy(gk.as("__k"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val n = h.groupBy("__k").agg(sum("__c").as("__n"))
      .withColumnRenamed("__k", "__kn")
    val wv = org.apache.spark.sql.expressions.Window.partitionBy("__k")
      .orderBy("__v")
    h.withColumn("__cum", sum("__c").over(wv))
      .join(n, col("__k") <=> col("__kn")).drop("__kn")
      .select(col("__k"), col("__v"),
        (col("__cum").cast("double") / col("__n")).as("pct"))
  }

  /** Normalize rows against a PRE-COMPUTED (possibly parquet-reloaded)
    * [[rankStats]] CDF — the serving path: one scan + one stats join,
    * zero histogram recomputation per batch. Stateless and
    * stream-static, so it runs unchanged on a readStream frame. Rows
    * whose exact (key, value) has no CDF row are DROPPED by default
    * (inner join — a value outside the reference domain has no defined
    * empirical rank; union the reference window forward or retrain
    * when the domain grows). For a CONTINUOUS or drifting value domain
    * that silent shrinkage is a sharp failure mode — most of a batch
    * can vanish with no signal — so `keepUnmatched = true` switches to
    * a left join emitting NULL `pct` for out-of-domain rows: the
    * caller counts the nulls (`count(*) - count(pct)`) and gates
    * retraining on the observed out-of-domain volume instead of
    * discovering a short frame downstream. The lake-scale answer for
    * such domains is [[rankStatsApprox]] + [[rankNormalizeSketch]],
    * which DEFINES a rank for every probe. Null measures and null keys
    * as in [[rankNormalize]] (null-safe joins). */
  def rankNormalizeAgainst(df: DataFrame, stats: DataFrame,
                           valueCol: String,
                           keyCol: String = null,
                           keepUnmatched: Boolean = false): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val gk = Option(keyCol).map(col).getOrElse(lit(0))
    rows.join(stats, gk <=> col("__k") && col(valueCol) <=> col("__v"),
        if (keepUnmatched) "left" else "inner")
      .drop("__k", "__v")
  }

  /** The CONTINUOUS-DOMAIN rank baseline: per-group KLL quantile
    * sketches of the reference window —
    * `(<keyCol>, sketch BINARY, n BIGINT)`, one bounded row per group
    * — for value domains where the exact [[rankStats]] CDF frame would
    * approach the reference row count (raw-float model scores,
    * unrounded perplexities: the model-scored-corpus common case).
    * Train once, persist as parquet, serve every later batch or stream
    * with [[rankNormalizeSketch]] — the
    * [[robustStats]]/[[rankStats]] lifecycle with O(groups·k) state
    * instead of O(groups·|domain|), and the implemented form of the
    * perplexityBuckets "read approximate ranks from bounded KLL state"
    * split. Built on the same deterministic KLL aggregate the oracled
    * sketch family uses ([[graft.llm.Corpus.quantileSketch]] /
    * mergeQuantileSketches — cross-engine determinism proven there).
    *
    * Accuracy contract (the sketch family's): EXACT — bit-equal to the
    * inclusive empirical CDF — while a group's count stays ≤ k (no
    * compaction), ~1.65/√k normalized-rank error beyond; approximation
    * past the horizon is the operator's design, never a silent drop.
    * Null measures are skipped; a null key is a group like any other.
    * ONE scan, one map-side-combined aggregation. */
  def rankStatsApprox(df: DataFrame, valueCol: String,
                      keyCol: String = null,
                      k: Int = 4096): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val gk = Option(keyCol).map(col).getOrElse(lit(0))
    rows.groupBy(gk.as("__k"))
      .agg(graft.expressions.GraftExpressions
        .kllSketch(col(valueCol), k).as("__sketch"),
        count(col(valueCol)).as("__n"))
  }

  /** Merge [[rankStatsApprox]] frames (disjoint reference slices) into
    * the baseline of their union — the rank normalizer's day-N
    * INCREMENT, which the exact path deliberately lacks (medians and
    * exact CDFs don't merge; docs/incremental.md): per group one
    * relational KLL union over s bounded binaries, counts add. In the
    * exact regime (union count ≤ k per group) the merge is bit-equal
    * to [[rankStatsApprox]] of the concatenated slices (KLL keeps
    * every item until compaction and rank reads sort-view — insertion
    * order never matters); beyond it the ~1.65/√k contract applies.
    * Groups appearing in only some parts carry through. */
  def mergeRankStats(parts: Seq[DataFrame], k: Int = 4096): DataFrame = {
    require(parts.nonEmpty, "mergeRankStats needs at least one part")
    parts.reduce(_ unionByName _)
      .groupBy("__k")
      .agg(graft.expressions.GraftExpressions
        .kllMerge(col("__sketch"), k).as("__sketch"),
        sum("__n").as("__n"))
  }

  /** Fold a new reference batch into a persisted [[rankStatsApprox]]
    * baseline: sketch the batch, merge per group — the whole
    * increment. `extendRankStats(rankStatsApprox(h), b) ≡
    * rankStatsApprox(h ∪ b)` in the exact regime (spec'd + oracled via
    * the shared serving twin); state stays O(groups·k) forever. */
  def extendRankStats(stats: DataFrame, df: DataFrame, valueCol: String,
                      keyCol: String = null,
                      k: Int = 4096): DataFrame =
    mergeRankStats(Seq(stats, rankStatsApprox(df, valueCol, keyCol, k)), k)

  /** Read the robust anomaly baseline — discrete inclusive median +
    * MAD per group — out of a [[rankStatsApprox]] sketch frame: ONE
    * persisted KLL sketch row per group now serves BOTH the rank
    * normalizer ([[rankNormalizeSketch]]) and the anomaly screen
    * (this + [[robustOutliersAgainst]]), and gains the day-N increment
    * the exact [[robustStats]] deliberately lacks (medians don't
    * merge; docs/incremental.md) via the same
    * [[extendRankStats]]/[[mergeRankStats]] fold. The MAD is
    * recoverable because the sketch retains the JOINT (item, weight)
    * pairs: the compiled [[graft.expressions.KllRobustStats]] kernel
    * walks the sorted view for the median, materializes |item − med|
    * deviations from the same retained pairs, and applies the
    * identical doubled-cumulative-weight rule — bit-equal to
    * [[robustStats]] in the no-compaction regime (oracled), ~1.65/√k
    * rank error beyond, approximation by design. Output
    * `(<keyCol>, med, mad)` — exactly [[robustStats]]' schema, so
    * [[robustOutliersAgainst]] serves from it unchanged. Cost: one
    * scan of the |groups|-row sketch frame; zero corpus access. */
  def robustStatsFromSketch(stats: DataFrame,
                            keyCol: String): DataFrame =
    stats.select(col("__k").as(keyCol),
        graft.expressions.GraftExpressions
          .kllRobustStats(col("__sketch")).as("__rs"))
      .select(col(keyCol), col("__rs.med").as("med"),
        col("__rs.mad").as("mad"))

  /** Explode a [[rankStatsApprox]] sketch frame into its per-group
    * sorted CDF view — `(<__k>, __items, __cumw, __sn)`: the SERVING
    * form of the baseline. Computed once per group row (O(groups ·
    * retained) total, bounded), it is what [[rankNormalizeSketch]]
    * actually joins: every probe then binary-searches the arrays in
    * place instead of re-deserializing the sketch binary per row —
    * the difference between O(rows · retained) and O(rows · log
    * retained) serve cost, which is the difference between a serve
    * that survives 100 TB and one that does not. Persist THIS frame
    * when a baseline is trained rarely and served hot (it parquets as
    * plain arrays); persist the sketch frame when it must keep
    * merging ([[extendRankStats]] needs the binaries). Empty-sketch
    * groups carry null arrays (their probes get null pct — rank
    * against nothing is undefined). */
  def sketchCdf(stats: DataFrame): DataFrame =
    stats.select(col("__k"), graft.expressions.GraftExpressions
        .kllCdf(col("__sketch")).as("__cdf"))
      .select(col("__k"), col("__cdf.items").as("__items"),
        col("__cdf.cumw").as("__cumw"), col("__cdf.n").as("__sn"))

  /** Normalize rows against PRE-COMPUTED (possibly parquet-reloaded)
    * [[rankStatsApprox]] sketches — the continuous-domain serving
    * path: one scan + one |groups|-row join (AQE broadcasts bounded
    * group domains), then the compiled
    * [[graft.expressions.SortedCdfRank]] kernel reads
    * `pct = #{ref ≤ v}/n` per row by binary search over the group's
    * [[sketchCdf]] view — O(log retained) per probe, no per-row
    * deserialization, inside whole-stage codegen (the view is exploded
    * once per GROUP on the bounded stats side, never per row). EVERY
    * in-group probe gets a rank — out-of-reference values interpolate
    * into the CDF (below-domain 0.0, above-domain 1.0) instead of
    * dropping, the property the exact path cannot offer on a drifting
    * domain. Rows whose GROUP has no sketch are dropped (no baseline
    * exists at all — the [[robustOutliersAgainst]] contract).
    * Stateless and stream-static: runs unchanged on a readStream
    * frame. Accepts either the sketch frame or an already-exploded
    * [[sketchCdf]] frame. In the sketch's exact regime the output is
    * bit-equal to the exact inclusive CDF (oracled); past it, ranks
    * carry the documented ~1.65/√k error. */
  def rankNormalizeSketch(df: DataFrame, stats: DataFrame,
                          valueCol: String,
                          keyCol: String = null): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
    val gk = Option(keyCol).map(col).getOrElse(lit(0))
    val cdf = if (stats.columns.contains("__items")) stats
              else sketchCdf(stats)
    rows.join(cdf, gk <=> col("__k"))
      .withColumn("pct", graft.expressions.GraftExpressions
        .cdfRank(col("__items"), col("__cumw"), col("__sn"),
          col(valueCol)))
      .drop("__k", "__items", "__cumw", "__sn")
  }

  /** Equal-mass quantile-bucket assignment served from the SAME
    * persisted [[rankStatsApprox]] state as the rank normalizer:
    * `bucket = clamp(ceil(pct · B), 1, B)` over the inclusive sketch
    * CDF — each bucket holds ~1/B of the REFERENCE mass, so bucketing
    * a later batch measures drift as mass imbalance and bucket-mixing
    * (take equal rows per bucket) flattens a skewed score
    * distribution. This is the implemented lake-scale form of
    * perplexity-bucket mixing: the exact NTILE alternative globally
    * sorts the corpus per serve; this is the [[rankNormalizeSketch]]
    * plan (bounded broadcast join + log-time kernel) plus one integer
    * clamp, stream-static like its parent. Probes in groups without a
    * baseline drop; empty-sketch groups carry null pct/bucket. Output
    * = input + `pct` + `bucket` (1-based). */
  def bucketizeSketch(df: DataFrame, stats: DataFrame, valueCol: String,
                      keyCol: String = null,
                      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be ≥ 1, got $buckets")
    rankNormalizeSketch(df, stats, valueCol, keyCol)
      .withColumn("bucket", least(lit(buckets.toLong),
        greatest(lit(1L), ceil(col("pct") * buckets))))
  }

  def catalog(documents: DataFrame): DataFrame =
    documents
      .groupBy("dataset")
      .agg(
        count(lit(1)).as("file_count"),
        sum("size").as("total_file_size"),
        countDistinct("content_hash").as("distinct_blobs"),
        max("updated_at").as("updated_at"))
      .orderBy("dataset")
}
