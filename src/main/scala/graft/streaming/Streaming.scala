package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Incremental / streaming ingest — SURVEY.md §2.9.
  *
  * The reference's incremental model is batch + a task ledger (anycache).
  * Structured Streaming's file source + checkpoint is the Spark-native
  * equivalent: each new file under the source directory is processed exactly
  * once per checkpoint, `Trigger.AvailableNow` gives batch-incremental runs
  * (run-to-completion over the backlog, then stop) — the same contract as a
  * memoized crawl re-run, with exactly-once bookkeeping for free.
  */
object Streaming {

  /** Continuous crawl: watch a drop directory as a file-source stream and
    * publish each micro-batch of new files into the dataset — hash +
    * content-addressed blob write + rebuild-kernel publish, with the
    * stream checkpoint (under the dataset's own metadata root) providing
    * the exactly-once file bookkeeping the reference gets from its task
    * cache. `Trigger.AvailableNow` drains the backlog then stops, so
    * repeated invocations are the streaming equivalent of incremental
    * re-crawls; pass a processing-time trigger for true continuous
    * ingestion.
    *
    * 100 TB shape: the binaryFile source distributes reads; per batch, the
    * only driver-side work is the publish bookkeeping (snapshot + diff of
    * one dataset's metadata). Content never shuffles — bytes flow
    * scan→digest→blob-write within executor partitions.
    */
  def incrementalCrawl(ds: graft.GraftDataset, dropDir: String,
                       trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = ds.spark
    val base = dropDir.stripSuffix("/")
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val stream = spark.readStream.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .schema(binarySchema)
      .load(base)
    stream.writeStream
      .queryName(s"graft_crawl_${ds.name}")
      .option("checkpointLocation", s"${ds.metaRoot}/stream_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val described = batch.select(
          regexp_replace(col("path"),
            "^.*?" + java.util.regex.Pattern.quote(base) + "/", "").as("key"),
          graft.functions.GraftFunctions
            .checksum(col("content"), ds.checksumAlgorithm).as("content_hash"),
          col("length").as("size"),
          graft.pipelines.Crawl.guessMimetype(
            regexp_replace(col("path"), "^.*/", "")).as("mimetype"),
          col("modificationTime").as("created_at"),
          col("modificationTime").as("updated_at"),
          col("content"))
        if (!described.isEmpty) {
          ds.writeBlobsFromBytes(described.select("content"))
          val meta = described.drop("content")
          ds.publish(graft.core.Rebuild.rebuild(ds.documents, meta,
            meta.limit(0)))
        }
        ()
      }
      .start()
  }

  /** The schema [[readEvents]] pins when the events directory is still
    * EMPTY at stream-creation time: the CURRENT testdata generator's
    * µs-NTZ encoding. A pinned guess, not an inference — see
    * [[eventsEncodingMismatch]] for what happens when the producer's
    * first files turn out to carry a different generation. */
  val EventsFallbackSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Directories whose stream schema was PINNED (empty at creation) and
    * is therefore a guess to be checked against the first real files. */
  private val pinnedFallbackDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val mismatchListenerInstalled =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Diagnose an encoding-generation mismatch for an events directory
    * whose stream was created while it was still empty: compares the
    * `ts` type the files on disk NOW carry against the pinned
    * [[EventsFallbackSchema]]. `None` = no files yet, no `ts` column to
    * compare, or encodings agree. The streaming scan itself fails on
    * such a mismatch with a generic parquet conversion error — this
    * helper (and the listener [[readEvents]] installs) turn that into
    * an actionable diagnosis. */
  def eventsEncodingMismatch(spark: SparkSession, dir: String): Option[String] = {
    try {
      val disk = spark.read.parquet(dir).schema
      if (!disk.fieldNames.contains("ts")) None
      else {
        val got = disk("ts").dataType
        val pinned = EventsFallbackSchema("ts").dataType
        if (got == pinned) None
        else Some(s"events encoding generation mismatch at $dir: the " +
          s"stream was created on an empty directory and pinned " +
          s"ts=${pinned.simpleString}, but the files now present carry " +
          s"ts=${got.simpleString}. Recreate the stream — readEvents " +
          "re-infers the schema from files when any exist.")
      }
    } catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** One session-wide listener: when any streaming query dies, probe the
    * registered pinned-fallback dirs and print the precise diagnosis next
    * to Spark's generic conversion error (once per dir). */
  private def installMismatchListener(spark: SparkSession): Unit =
    if (mismatchListenerInstalled.compareAndSet(false, true)) {
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            if (e.exception.isDefined) {
              val it = pinnedFallbackDirs.iterator()
              while (it.hasNext) {
                val d = it.next()
                eventsEncodingMismatch(spark, d).foreach { msg =>
                  System.err.println(s"[graft.streaming] $msg")
                  pinnedFallbackDirs.remove(d)
                }
              }
            }
        })
    }

  /** Streaming view of an events directory, `ts` normalized to the
    * session-zone TIMESTAMP exactly as [[graft.Tables.load]] does for
    * batch (int64-ns, µs-NTZ, and already-normalized encodings all
    * accepted). `readStream` needs the schema up front, so one batch
    * read infers it from the files already present; a still-EMPTY drop
    * directory (the standard create-stream-before-producer setup) falls
    * back to [[EventsFallbackSchema]] rather than failing schema
    * inference — later arrivals are read under it. If those arrivals
    * turn out to be a DIFFERENT encoding generation, the scan fails (by
    * Spark's parquet conversion check) and the installed listener prints
    * the explicit [[eventsEncodingMismatch]] diagnosis — recreate the
    * stream; silent wrong-schema reads cannot happen. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema =
      try spark.read.parquet(dir).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          pinnedFallbackDirs.add(dir)
          installMismatchListener(spark)
          EventsFallbackSchema
      }
    val raw = spark.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window aggregation — the canonical streaming agg.
    * Identical logical shape to SparkEntry's `st_hourly_window` batch query,
    * so batch and stream results can be asserted equal. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Event-time session windows (gap-based) — the streaming counterpart of
    * the batch [[graft.operators.Sessionize]]: a session extends while
    * events arrive within `gap` of the previous one. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup (first-writer-wins): pass each document through
    * only on the FIRST occurrence of its content hash — across
    * micro-batches AND restarts, because the seen-hash set lives in the
    * state store under the query's checkpoint. Built on the engine's own
    * streaming `dropDuplicates` (hash-keyed state, never content), the
    * Spark-first counterpart of [[graft.llm.Dedup.exactAgainst]] for
    * continuously-arriving corpora.
    *
    * Unbounded retention keeps every hash forever (exact dedup against
    * all history — state is one small row per DISTINCT document). At
    * 100 TB with high-churn streams, pass `watermark = Some((tsCol,
    * delay))` to switch to `dropDuplicatesWithinWatermark`, which expires
    * state once late data can no longer arrive — the standard
    * bounded-state trade. */
  def dedupStream(docs: DataFrame, hashCols: Seq[String] = Seq("content_hash"),
                  watermark: Option[(String, String)] = None): DataFrame =
    watermark match {
      case Some((tsCol, delay)) =>
        docs.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(hashCols)
      case None => docs.dropDuplicates(hashCols)
    }

  /** Streaming decontamination: drop any arriving document that shares an
    * `n`-token window with the STATIC benchmark table — the streaming
    * counterpart of [[graft.llm.Dedup.decontaminate]] for
    * continuously-arriving corpora. The benchmark collapses ONCE to a
    * sorted xxhash64 window set (benchmarks are MBs — ~8 bytes per
    * window, collected driver-side and plan-shipped once per executor);
    * each arriving document is then tested by the compiled
    * `WindowSetContains` kernel — one pass over its own tokens, EXACT
    * binary-search membership (a Bloom probe would silently drop clean
    * documents on false positives), no explode, no join, NO STATE. A
    * per-document aggregation of exploded windows would be a stateful
    * stream-stream self-join; this is a pure map filter, so it composes
    * freely with [[dedupStream]] downstream and needs no watermark.
    * Exactly the batch `contaminationHits` semantics (doc-level verdict;
    * hash equality stands in for text equality at p ≈ windows²/2⁶⁴).
    *
    * The benchmark-side collect is GUARDED at `maxWindowHashes` (default
    * [[graft.llm.Dedup.StripRelationalCutover]], 1M ≈ 8 MB): benchmarks
    * are MBs by nature, so a set past the cap means the "benchmark" is
    * really a corpus — `require` fails loudly with guidance instead of
    * OOMing the driver mid-stream. Persist the window-hash set and
    * decontaminate in BATCH ([[graft.llm.Dedup.decontaminate]]'s
    * hash-join shape) in that regime, or raise the cap deliberately. */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
                          textCol: String, n: Int = 13,
                          maxWindowHashes: Long =
                            graft.llm.Dedup.StripRelationalCutover): DataFrame = {
    require(maxWindowHashes > 0 && maxWindowHashes < Int.MaxValue.toLong,
      s"maxWindowHashes must be in (0, Int.MaxValue), got $maxWindowHashes")
    val spark = benchmark.sparkSession
    import spark.implicits._
    val capped = benchmark
      .select(explode(graft.expressions.GraftExpressions
        .wordNGrams(col(textCol), n)).as("w"))
      .select(xxhash64(col("w")).as("h")).distinct()
      .limit(maxWindowHashes.toInt + 1)
      .as[Long].collect()
    require(capped.length <= maxWindowHashes,
      s"decontaminateStream: benchmark window-hash set exceeds " +
        s"maxWindowHashes=$maxWindowHashes — a reference set this large " +
        "must stay distributed, not baked into a stream projection. " +
        "Persist the window hashes and decontaminate in batch " +
        "(Dedup.decontaminate, hash-join shape), or raise maxWindowHashes " +
        "deliberately if driver and executor memory genuinely allow.")
    val hashes = capped.sorted
    // coalesce: a null-text row yields NULL from the kernel and must be
    // KEPT (batch decontaminate keeps it — no windows, no collisions),
    // not silently dropped by filter(NULL)
    docs.filter(!coalesce(graft.expressions.GraftExpressions
      .windowSetContains(col(textCol), n, hashes), lit(false)))
  }

  /** Stateless streaming form of
    * [[graft.llm.Dedup.stripBoilerplate]]: boilerplate is CORPUS-level
    * context a single stream element cannot see, so the flagged-span
    * hash set is computed ONCE from a static reference corpus (e.g. the
    * current lake snapshot) and baked into the compiled rewrite kernel;
    * each arriving document then gains `clean_text` as a pure map-only
    * projection — NO STATE, no stream-side shuffle, composes with
    * [[dedupStream]] and [[decontaminateStream]] in one pipeline.
    * Rewrite semantics are identical to the batch operator (same
    * kernel, same flagged set — parity asserted in StreamingSpec). */
  def stripBoilerplateStream(docs: DataFrame, reference: DataFrame,
                             idCol: String, textCol: String,
                             w: Int = 8, minDocs: Int = 3): DataFrame = {
    val hashes = graft.llm.Dedup.boilerplateHashes(
      reference, idCol, textCol, w, minDocs)
    docs.withColumn("clean_text",
      coalesce(graft.expressions.GraftExpressions
        .stripWindowsInSet(col(textCol), w, hashes), lit("")))
  }

  /** Stateless streaming form of
    * [[graft.llm.Dedup.substringDupStatsAgainst]]: each arriving
    * document gains `(n_windows, n_dup_windows, dup_frac)` against a
    * STATIC reference corpus whose distinct window-hash set is computed
    * once ([[graft.llm.Dedup.substringWindowHashes]] — capped with a
    * loud failure past `maxWindowHashes`, because an over-cap reference
    * must stay distributed in the batch join shape) and baked into ONE
    * compiled kernel projection — NO STATE, no stream-side shuffle,
    * composes with [[dedupStream]]/[[decontaminateStream]] in a single
    * pipeline. Batch parity: windowless rows (shorter than `w` chars,
    * or null text) keep NULL stats rather than being dropped — a stream
    * operator must not swallow rows, so the batch operator's
    * absent-from-output convention maps to null columns here (parity
    * modulo that mapping is asserted in StreamingSpec). */
  def substringDupStream(docs: DataFrame, reference: DataFrame,
                         idCol: String, textCol: String,
                         w: Int = 50, stride: Int = 25,
                         maxWindowHashes: Long =
                           graft.llm.Dedup.StripRelationalCutover): DataFrame = {
    val hashes = graft.llm.Dedup.substringWindowHashes(
      reference, idCol, textCol, w, stride, maxWindowHashes)
    val stats = graft.expressions.GraftExpressions
      .charWindowDupStats(col(textCol), w, stride, hashes)
    docs
      .withColumn("__s", when(length(col(textCol)) >= w, stats))
      .withColumn("n_windows", col("__s.n_windows"))
      .withColumn("n_dup_windows", col("__s.n_dup_windows"))
      .withColumn("dup_frac",
        round(col("n_dup_windows").cast("double") /
          col("n_windows").cast("double"), 6))
      .drop("__s")
  }

  /** Stateless streaming form of
    * [[graft.llm.Corpus.temperatureMix]]: a stream cannot count its own
    * strata (the rates are corpus-level context), so the sqrt-flattening
    * rates derive ONCE from a static reference corpus (e.g. the current
    * lake snapshot) and the arriving documents pass through the same
    * zero-shuffle content-hash predicate — NO STATE, composes with
    * [[dedupStream]]/[[decontaminateStream]]. Strata absent from the
    * reference are DROPPED (an unknown stratum has no defensible rate;
    * route novel strata to a side output before mixing). */
  def temperatureMixStream(docs: DataFrame, reference: DataFrame,
                           stratumCol: String, keyCol: String,
                           maxStrata: Int = 100000): DataFrame =
    graft.llm.Corpus.temperatureMixWithReference(
      docs, reference, stratumCol, keyCol, maxStrata)

  /** Stateless streaming SimHash dedup: drop arriving documents whose
    * SimHash is within `maxHamming` bits of ANY document in the STATIC
    * reference corpus — the streaming counterpart of
    * [[graft.llm.Dedup.simhashNearPairsAgainst]] for continuously-
    * arriving text (intra-stream duplicates are [[dedupStream]]'s job).
    *
    * The stream side must stay window- and state-free, so the usual
    * band-join + per-arrival collapse (a stateful aggregation on a
    * stream) is re-shaped: the reference collapses ONCE per 16-bit
    * chunk band into at most one row per band VALUE — `(value,
    * distinct signatures sharing it)` — and each arrival equi-joins
    * each of its 4 band values against that collapsed table
    * (`left_outer`, ≤ 1 matching row per band by construction, so row
    * cardinality never multiplies), then checks
    * `∃ sig: popcount(sig ⊕ arrival) ≤ maxHamming` in a projection.
    * Four stream-static equi-joins + map work, NO STATE, no watermark.
    * Pigeonhole-complete for maxHamming ≤ 3 with 4 chunks — identical
    * verdicts to the batch operator. A pathologically hot band value
    * concentrates its signatures into one array row (the streaming
    * analog of the batch hot-bucket concern); the array holds DISTINCT
    * signatures only. For many-batch streams, persist the reference
    * signatures up front — the static side re-evaluates per
    * micro-batch otherwise. */
  def simhashDedupStream(stream: DataFrame, reference: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         n: Int = 3, maxHamming: Int = 3): DataFrame = {
    val D = graft.llm.Dedup
    val refSigs = D.simhashSignatures(reference, idCol, textCol)
    def bandTable(c: Int): DataFrame =
      refSigs.select(
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
            .as(s"__v$c"),
          col("simhash"))
        .groupBy(s"__v$c")
        .agg(collect_set(col("simhash")).as(s"__sigs$c"))
    var out = stream.withColumn("__sig",
      graft.expressions.GraftExpressions.simhash64(
        D.shingles(col(textCol), n)))
    for (c <- 0 until 4) {
      out = out
        .withColumn(s"__v$c",
          shiftright(col("__sig"), c * 16).bitwiseAND(lit(0xFFFFL)))
        .join(bandTable(c), Seq(s"__v$c"), "left_outer")
        .withColumn(s"__m$c",
          exists(coalesce(col(s"__sigs$c"), array().cast("array<bigint>")),
            s => bit_count(s.bitwiseXOR(col("__sig"))) <= maxHamming))
        .drop(s"__v$c", s"__sigs$c")
    }
    out.filter(!col("__m0") && !col("__m1") && !col("__m2") && !col("__m3"))
      .drop("__sig", "__m0", "__m1", "__m2", "__m3")
  }

  /** Stateless streaming SemDeDup: drop arriving embeddings that
    * semantically duplicate the STATIC reference corpus — the streaming
    * counterpart of [[graft.llm.Similarity.semanticDedup]] for
    * continuously-arriving vectors (intra-stream duplicates are
    * [[dedupStream]]'s hash-exact job or a batch pass).
    *
    * Cluster structure computes ONCE from the reference (first-N seed
    * or Lloyd-trained centroids + member assignments). The stream side
    * must stay window- and state-free, so each arrival's cluster is
    * assigned by the compiled [[graft.expressions.GraftExpressions.PqAssign]]
    * kernel over NORMALIZED vectors with the normalized centroids baked
    * in as one m=1 "codebook" — after normalization, L2-argmin equals
    * cosine-argmax (‖a−b‖² = 2 − 2·cosine for unit vectors) with the
    * same lowest-id tie-break as the batch `ivfAssign`, so stream and
    * batch agree on cluster membership. The arrival then stream-static
    * joins ONLY its own cluster's reference members and is dropped on
    * any cosine ≥ `threshold`: a map-only assign + one keyed
    * stream-static join, NO STATE. */
  def semanticDedupStream(stream: DataFrame, reference: DataFrame,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          nClusters: Int = 0, threshold: Double = 0.9,
                          trainIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{sqrt => fsqrt}
    val S = graft.llm.Similarity
    // nClusters = 0 auto-sizes from the STATIC reference (one count at
    // query-build time, not per micro-batch) — same knob as the batch op
    val k =
      if (nClusters > 0) nClusters else S.semanticAutoClusters(reference)
    val cents =
      if (trainIters == 0) S.centroids(reference, k, idCol, vecCol)
      else S.trainCentroids(reference, k, trainIters, idCol, vecCol)
    // normalized centroids as one full-width codebook: PqAssign's
    // subspace-0 argmin-L2 over unit vectors IS argmax-cosine, ties to
    // the lowest centroid id — identical to ivfAssign("cosine")
    val books: Seq[(Int, Long, Seq[Double])] = cents
      .select(col("centroid_id"), col("centroid")).collect().map { r =>
        val v = r.getSeq[Double](1)
        val n = math.sqrt(v.map(x => x * x).sum)
        (0, r.getLong(0), if (n == 0) v else v.map(_ / n))
      }.toIndexedSeq
    val members = S.ivfAssign(reference, cents, idCol, vecCol)
      .select(col("centroid_id"), col("corpus_id").as("ref_id"),
        col("cv").as("ref_v"))
    val norm = fsqrt(aggregate(col("__v"),
      lit(0.0), (acc, x) => acc + x * x))
    val assigned = stream
      .withColumn("__v", col(vecCol).cast("array<double>"))
      .withColumn("__nv", transform(col("__v"), x => x / norm))
      .withColumn("__cell",
        graft.expressions.GraftExpressions.pqAssign(col("__nv"), books)(0))
      .drop("__nv")
    // anti semantics without a (stream-unsupported) anti join: LEFT
    // OUTER against the cluster's members with the threshold IN the
    // join condition — an arrival with no duplicate yields exactly one
    // all-null right side, a duplicated arrival only non-null rows —
    // then keep the null rows. Stateless: stream-static outer joins
    // need no watermark.
    assigned.join(members,
        assigned("__cell") === members("centroid_id") &&
          S.cosine(col("__v"), col("ref_v")) >= threshold,
        "left_outer")
      .filter(col("ref_id").isNull)
      .drop("centroid_id", "ref_id", "ref_v", "__v", "__cell")
  }

  /** Streaming index ingestion — the streaming form of
    * [[graft.llm.Similarity.extendVectorIndex]]: encode ARRIVING
    * vectors against a FIXED [[graft.llm.Similarity.VectorIndex]]
    * geometry, producing the index's vectors schema (corpus_id, cell,
    * pq_cell, codes, cv) as a STATELESS map-only stream —
    * `writeStream` append onto the persisted vectors directory IS the
    * incremental index build, so a crawl's embedding stream feeds the
    * serving index continuously with zero training work per batch.
    * Centroids + codebooks are collected ONCE at query build (KB-scale
    * driver constants) and baked into the same compiled kernels the
    * batch encode uses, so stream and batch encodes are bit-identical
    * (asserted in StreamingSpec; geometry pinning rules:
    * docs/sketches.md lifecycle section). */
  def encodeVectorsStream(stream: DataFrame,
                          index: graft.llm.Similarity.VectorIndex,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val spark = index.vectors.sparkSession
    import spark.implicits._
    val centArr = index.centroids
      .select(col("cell").cast("long"), col("centroid").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val books = index.codebooks
      .select(col("sub").cast("int"), col("centroid_id").cast("long"),
        col("centroid").cast("array<double>"))
      .as[(Int, Long, Seq[Double])].collect()
    graft.llm.Similarity.encodeIntoIndex(stream, centArr, books, idCol, vecCol)
  }

  /** Stateless stream-to-static as-of enrichment: each arriving row picks
    * up the carried columns of the LATEST static row with
    * `staticTsCol <= streamTsCol` in its `on` group (dimension-snapshot
    * enrichment — prices, configs, model versions — the streaming
    * counterpart of [[graft.operators.TemporalJoins.asofJoin]]).
    *
    * The static side is transformed ONCE into validity intervals
    * `[ts, next_ts)` via a lead window (ties reduced to the same
    * lexicographic-max representative as the batch operator), then the
    * stream joins it with a plain stream-static broadcast equi-join on
    * the keys plus the interval filter — each stream row matches exactly
    * one interval, left-outer keeps never-enriched rows. NO STATE, no
    * watermark, no window over the stream: Structured Streaming treats
    * stream-static joins as stateless per-batch joins, so this composes
    * freely with [[dedupStream]]/[[decontaminateStream]]. The static
    * side is a dimension snapshot (broadcast-sized by construction);
    * re-plan after snapshot updates to pick up new intervals. */
  def enrichAsOf(stream: DataFrame, static: DataFrame, on: Seq[String],
                 streamTsCol: String, staticTsCol: String,
                 carry: Map[String, String]): DataFrame = {
    require(on.nonEmpty, "enrichAsOf needs at least one equality key")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(on.map(col): _*).orderBy(col("__ts"))
    val iv = static.groupBy(
        (on.map(col) :+ col(staticTsCol).as("__ts")): _*)
      .agg(max(struct(carry.toSeq.sortBy(_._1).map { case (c, out) =>
        col(c).as(out) }: _*)).as("__carry"))
      .withColumn("__end", lead(col("__ts"), 1).over(w))
    val keyCond = on.map(k => stream(k) === iv(k)).reduce(_ && _)
    val cond = keyCond && stream(streamTsCol) >= iv("__ts") &&
      (iv("__end").isNull || stream(streamTsCol) < iv("__end"))
    stream.join(broadcast(iv), cond, "left_outer")
      .select(stream.columns.map(stream(_)).toSeq ++
        carry.values.toSeq.sorted.map(n => col(s"__carry.$n").as(n)): _*)
  }

  /** Run a streaming query to completion over the current backlog
    * (batch-incremental, `Trigger.AvailableNow`) into an in-memory table;
    * returns the result. Used by tests and local verification. */
  def runAvailableNow(df: DataFrame, queryName: String,
                      checkpoint: String,
                      outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(queryName)
  }

  // --------------------------------------------------------- ledger folds

  /** One step of a streamed batch-increment ledger: optionally emitted
    * (append-only, never revised) rows plus the replacement carried
    * state. `shared` lists frames the step persist()ed so both outputs
    * could reuse one computation — the driver unpersists them after
    * the batch's writes complete (never across batches). */
  final case class StreamLedger(emitted: Option[DataFrame],
                                state: DataFrame,
                                shared: Seq[DataFrame] = Nil)

  /** Drive a batch-increment LEDGER from a stream — the streaming form
    * of the carried-state operators ([[graft.operators.Funnel.funnelIncremental]],
    * [[graft.operators.Sessionize.sessionsIncremental]],
    * [[graft.operators.Sessionize.withSessionIdsIncremental]]): each
    * micro-batch folds `step(state, batch)` inside `foreachBatch`,
    * emitted rows land append-only, and the new state replaces the old.
    *
    * Exactly-once by construction, not by luck: state versions are
    * KEYED BY MICRO-BATCH ID (batch `i` reads `state/i`, overwrites
    * `state/i+1` and `emitted/i`), so a replayed batch — Structured
    * Streaming's at-least-once `foreachBatch` contract after a crash —
    * rewrites exactly its own outputs and nothing else. `state/i`
    * depends only on batches < i, hence is always the correct input on
    * replay. The checkpoint under `workDir/ckpt` carries the source
    * offsets; the state directory carries the ledger. Calling again
    * with the SAME workDir resumes: committed batches are skipped by
    * the checkpoint, the day-0 bootstrap write is skipped when
    * `state/0` exists, and the returned ledger is recovered from the
    * DIRECTORIES (the full folded history), never from the resumed
    * invocation's own batches.
    *
    * ORDER CONTRACT: the ledger operators assume per-key append-only
    * batches (their carried watermark raises loudly on violation —
    * never a silent wrong state). With a file source, write arrival
    * files in event-time order and read with `maxFilesPerTrigger=1`:
    * the file source dispatches oldest-modification-time first, making
    * micro-batch order equal file order.
    *
    * 100 TB shape: each fold is the ledger operator's own plan (state
    * join + batch-sized work, zero history rescan); the stream adds
    * only offset bookkeeping. State IO is one parquet write of |keys|
    * rows per batch — partition it by bucketing the write if |keys|
    * is lake-scale. */
  def foldLedgerStream(stream: DataFrame, state0: DataFrame,
                       workDir: String,
                       step: (DataFrame, DataFrame) => StreamLedger)
      : StreamLedger = {
    val spark = state0.sparkSession
    val base = workDir.stripSuffix("/")
    // day-0 only: a RESUME against an existing workDir must keep the
    // folded state, not clobber it back to the bootstrap. The probe is
    // "any numbered state version exists", NOT "state/0 exists" —
    // pruning deletes old versions, and a resume against a pruned
    // ledger must not re-write the bootstrap under the live fold.
    val hconf = spark.sessionState.newHadoopConf()
    val stateRoot = new org.apache.hadoop.fs.Path(s"$base/state")
    val fs = stateRoot.getFileSystem(hconf)
    if (numbered(fs, s"$base/state").isEmpty)
      state0.write.mode("overwrite").parquet(s"$base/state/0")
    // state versions all carry the bootstrap's schema (the fold's
    // output contract) — explicit-schema reads skip the per-batch
    // footer-inference job
    val stSchema = graft.core.Lakehouse.nullableCopy(state0.schema)
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val st = spark.read.schema(stSchema).parquet(s"$base/state/$id")
        val out = step(st, batch)
        out.emitted.foreach(
          _.write.mode("overwrite").parquet(s"$base/emitted/$id"))
        out.state.write.mode("overwrite").parquet(s"$base/state/${id + 1}")
        out.shared.foreach(_.unpersist())
        // RETENTION: replay correctness needs state/id (this batch may
        // re-run until the checkpoint commits it) and state/id+1 (the
        // next batch's input); id−1 is kept as one version of margin
        // (a restart only ever re-runs the newest uncommitted batch,
        // but the margin costs one |keys| write and tolerates a crash
        // straddling the commit-log append). Everything older is dead
        // weight that would otherwise grow storage as batches × |keys|
        // forever — deleted only AFTER this batch's own writes land,
        // so a crash anywhere leaves a replayable suffix.
        numbered(fs, s"$base/state").foreach { case (v, p) =>
          if (v < id - 1)
            fs.delete(new org.apache.hadoop.fs.Path(p), true)
        }
      }
      .start()
    q.awaitTermination()
    // recover the ledger from DISK, not this invocation's memory: a
    // resume (same workDir + ckpt after a crash or a later backlog
    // drain) replays only the missing batches, so in-memory tracking
    // would see a suffix of history — the directories carry all of it
    val emittedAll = numbered(fs, s"$base/emitted").map(_._2)
    val lastVersion = numbered(fs, s"$base/state").map(_._1).max
    StreamLedger(
      if (emittedAll.isEmpty) None
      else Some(spark.read.parquet(emittedAll: _*)),
      spark.read.schema(stSchema).parquet(s"$base/state/$lastVersion"))
  }

  /** Numbered child directories of a ledger dir, ascending. */
  private def numbered(fs: org.apache.hadoop.fs.FileSystem,
                       dir: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption
        .map(_ -> s.getPath.toString))
      .sortBy(_._1)
  }

  /** POST-DRAIN ledger maintenance for [[foldLedgerStream]] workdirs:
    * coalesce the append-only `emitted/<id>` directories (one per
    * micro-batch — a year of daily batches is 365 small-file dirs,
    * the classic lake small-files tax) into a single `emitted/0`, and
    * drop every state version below the latest. The emitted FEED is
    * unchanged as a dataset — compaction rewrites layout, never rows —
    * and the next resume reads the compacted dir plus whatever new
    * batches append after it (new micro-batch ids continue strictly
    * above the old ones under the same checkpoint, so the compacted
    * `0` dir can never collide with a future batch's write).
    *
    * CONTRACT: run BETWEEN drains, never under a live query —
    * `Trigger.AvailableNow` returns only after every batch commits, so
    * post-return there are no pending replays; compacting mid-crash-
    * recovery could instead double rows a replayed batch rewrites.
    * The day-N loop's cadence: drain → compact → next drain. */
  def compactLedger(spark: SparkSession, workDir: String): Unit = {
    val base = workDir.stripSuffix("/")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val emitted = numbered(fs, s"$base/emitted")
    if (emitted.nonEmpty &&
        (emitted.size > 1 || emitted.head._1 != 0L)) {
      val tmp = s"$base/emitted_compacting"
      spark.read.parquet(emitted.map(_._2): _*)
        .write.mode("overwrite").parquet(tmp)
      emitted.foreach { case (_, p) =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true) }
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$base/emitted/0")),
        s"compactLedger: rename $tmp -> $base/emitted/0 failed")
    }
    val states = numbered(fs, s"$base/state")
    states.dropRight(1).foreach { case (_, p) =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true) }
  }

  // ---------------------------------------------------------------- state
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(count: Long, total: Double)
  final case class SessionUpdate(user_id: Long, events: Long, total_value: Double)

  /** Stateful per-user running aggregate via mapGroupsWithState — the
    * engine's `flatMapGroupsWithState` surface for custom state (the
    * reference has no streaming state; this is the 100 TB extension point
    * for sessionization / per-key accumulation). */
  def statefulUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
          var c = prev.count
          var t = prev.total
          it.foreach { e => c += 1; t += e.value }
          state.update(SessionState(c, t))
          SessionUpdate(uid, c, t)
      }
      .toDF()
  }
}
