package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Lakehouse, MiniJson}
import Retrieval.Bm25Index
import Similarity.VectorIndex

/** CHECKPOINTED feed consumption for the serving indexes — the
  * exactly-once discipline [[graft.core.Lakehouse.applyChangesByKeyStream]]
  * gives replicas, applied to BM25 and vector indexes: the raw
  * [[Retrieval.applyFeedToBm25Index]] documents that a REPLAYED window
  * double-subtracts, and [[Similarity.applyFeedToVectorIndex]] leaves
  * window tracking to the caller. A tracked index closes both — it is
  * a directory of immutable versioned state dirs (`<root>/v<N>/…`)
  * named by a tiny offset marker (`<root>/_ptr/v<NNN>.json`) that
  * carries the consumed source watermark `(epoch, gen)`:
  *
  *  - APPLY pulls exactly the `(watermark, toGen]` window from the
  *    source table itself (so the caller cannot hand it a stale or
  *    overlapping frame), LANDS it to parquet before consumption (the
  *    r17 probe lesson — the apply derives several frames from the
  *    feed), applies, materializes the new state ALONGSIDE the old
  *    one, and flips the marker with ONE atomic rename that advances
  *    the watermark in the same commit.
  *  - A REPLAYED window (toGen at or below the watermark) is a no-op
  *    for the same target and a loud raise for an out-of-order one —
  *    never a double-subtract.
  *  - A CRASH anywhere leaves either the old marker (the half-built
  *    state dir is an orphan the retry overwrites) or the new one
  *    (fully consumed) — the marker is the only commit point.
  *  - A source COMPACT/ROLLBACK since the watermark epoch raises
  *    through [[graft.core.Lakehouse.changesBetween]]'s own epoch
  *    guard: cross-epoch windows are unanswerable, rebuild the index.
  *
  * Single-writer per index root, ENFORCED: init and apply run under
  * the same writer lease the lakehouse mutators use
  * ([[graft.core.Lakehouse.withTableLock]] on `<root>_lock`), so two
  * maintenance jobs racing one index serialize instead of splitting
  * the version sequence. Concurrent READERS are safe throughout and
  * never take the lock: state dirs never mutate after their marker
  * lands, and the previous version survives one more cycle before
  * pruning, so a serve that resolved the old marker finishes against
  * files that still exist. At 100 TB each apply costs one index pass
  * + one feed pass (never a corpus read), and marker/state
  * bookkeeping is O(1) driver-side file work. */
object FeedConsumer {

  /** A tracked index's consumed position: marker `version`, the state
    * dir name serving it, and the source watermark — everything at or
    * below `gen` (under `epoch`) is already reflected in the index. */
  final case class FeedOffset(version: Long, state: String, epoch: Long,
                              gen: Long)

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def ptrDir(root: String) = s"${root.stripSuffix("/")}/_ptr"

  private def versionOf(name: String): Long = {
    val body = name.stripPrefix("v").stripSuffix(".json")
    if (name.startsWith("v") && name.endsWith(".json") &&
        body.nonEmpty && body.forall(_.isDigit)) body.toLong
    else -1L
  }

  /** The tracked index's current offset, or None for an
    * un-initialized root. */
  def readOffset(spark: SparkSession, root: String): Option[FeedOffset] = {
    val f = fsOf(spark, root)
    val dir = new Path(ptrDir(root))
    if (!f.exists(dir)) return None
    val markers = f.listStatus(dir).toSeq
      .filter(s => s.isFile && versionOf(s.getPath.getName) >= 0)
      .map(_.getPath)
    if (markers.isEmpty) return None
    val latest = markers.maxBy(p => versionOf(p.getName))
    val in = f.open(latest)
    val body = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val m = MiniJson.parse(body)
    def num(k: String): Long = MiniJson.field(m, k) match {
      case Some(d: Double) => d.toLong
      case _ => -1L
    }
    Some(FeedOffset(versionOf(latest.getName),
      MiniJson.field(m, "state").collect { case s: String => s }
        .getOrElse(s"v${versionOf(latest.getName)}"),
      num("epoch"), num("gen")))
  }

  /** THE commit: the marker lands complete under a tmp name and
    * renames in — the watermark and the state pointer advance
    * atomically together. */
  private def writeOffset(spark: SparkSession, root: String,
                          off: FeedOffset): Unit = {
    val f = fsOf(spark, root)
    val dir = new Path(ptrDir(root))
    f.mkdirs(dir)
    val body = MiniJson.write(Map("version" -> off.version,
      "state" -> off.state, "epoch" -> off.epoch, "gen" -> off.gen))
    val tmp = new Path(dir, f"tmp-v${off.version}%020d.json")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, f"v${off.version}%020d.json")
    require(f.rename(tmp, dst),
      s"FeedConsumer: marker rename $tmp -> $dst failed — tracked " +
        "indexes are single-writer; two maintainers raced")
  }

  /** Drop state dirs and markers more than one version behind AND
    * older than `graceMs` — the previous version always survives one
    * full cycle (an in-flight serve against the old marker finishes),
    * and with a real grace window anything a long-running serve
    * resolved stays readable until every reasonable query has
    * finished, the [[graft.core.Lakehouse.vacuum]] contract applied
    * to index states. Default grace 0 keeps rapid-cycle tests tidy;
    * production maintenance loops should pass their query SLA. */
  private def prune(spark: SparkSession, root: String,
                    current: Long, graceMs: Long): Unit = {
    val f = fsOf(spark, root)
    val cutoff = System.currentTimeMillis() - graceMs
    val base = new Path(root.stripSuffix("/"))
    if (f.exists(base))
      f.listStatus(base).toSeq
        .filter { s =>
          val n = s.getPath.getName
          val body = n.stripPrefix("v")
          s.isDirectory && n.startsWith("v") && body.nonEmpty &&
            body.forall(_.isDigit) && body.toLong < current - 1 &&
            s.getModificationTime <= cutoff
        }
        .foreach(s => f.delete(s.getPath, true))
    val pd = new Path(ptrDir(root))
    if (f.exists(pd))
      f.listStatus(pd).toSeq
        .filter { s =>
          val v = versionOf(s.getPath.getName)
          s.isFile && v >= 0 && v < current - 1 &&
            s.getModificationTime <= cutoff
        }
        .foreach(s => f.delete(s.getPath, false))
  }

  /** Land the `(off.gen, toGen]` window to parquet under the index
    * root and hand back the on-disk frame — the apply derives several
    * subtrees from the feed, and an unlanded `changesBetween` would
    * re-evaluate its window scan under each. */
  private def landWindow(spark: SparkSession, root: String,
                         sourcePath: String, off: FeedOffset,
                         toGen: Long): DataFrame = {
    val staged = s"${root.stripSuffix("/")}/_staging/feed"
    val window = Lakehouse.changesBetween(spark, sourcePath, off.gen,
      toGen, asOfEpoch = off.epoch)
    // the schema is in hand pre-write — the read-back skips the
    // footer-inference job every landed window used to pay
    val schema = window.schema
    window.write.mode("overwrite").parquet(staged)
    spark.read.schema(schema).parquet(staged)
  }

  /** The window's upper bound. The DEFAULT stops at the newest CLOSED
    * generation (`currentGen − 1`): tombstones always stamp the
    * source's current open generation, so a consumer that swallowed
    * the open gen would permanently miss any delete stamped into it
    * AFTER consumption — the open-window rule the replica stream
    * solves by re-pulling, which a never-re-applies index cannot do.
    * An explicit `toGen` (a quiesced source — no writer between the
    * last mutation and this pull) may consume through the open gen. */
  private def resolveWindow(spark: SparkSession, sourcePath: String,
                            off: FeedOffset, toGen: Long,
                            what: String): Option[Long] = {
    val cur = if (toGen >= 0L) toGen
      else math.max(off.gen, Lakehouse.currentGen(spark, sourcePath) - 1)
    if (cur == off.gen) None // replayed / already-consumed: no-op
    else {
      require(cur > off.gen,
        s"$what: window through gen $cur is OUT OF ORDER — the index " +
          s"already consumed through gen ${off.gen}; a tracked index " +
          "never re-applies (the raw apply would double-subtract)")
      Some(cur)
    }
  }

  // ------------------------------------------------------------------
  // BM25
  // ------------------------------------------------------------------

  /** Initialize a tracked BM25 index root: materialize `index`
    * (typically built from `scanAsOf(sourcePath, asOfGen)`) as state
    * v1 and stamp the watermark at (`source epoch`, `asOfGen`). */
  def initTrackedBm25Index(spark: SparkSession, root: String,
                           index: Bm25Index, sourcePath: String,
                           asOfGen: Long): FeedOffset =
    Lakehouse.withTableLock(spark, root.stripSuffix("/")) {
      val (epoch, _) = Lakehouse.epochAndFloor(spark, sourcePath)
      Retrieval.compactBm25Index(index, s"${root.stripSuffix("/")}/v1")
      val off = FeedOffset(1L, "v1", epoch, asOfGen)
      writeOffset(spark, root, off)
      off
    }

  /** [[initTrackedBm25Index]] building the bootstrap index from `docs`
    * directly — the minimal-pass form: the tokenize lineage runs once
    * ([[Retrieval.buildCompactedBm25Index]]) instead of once per frame
    * write, serving-identically. Prefer this when the bootstrap corpus
    * frame is in hand (the usual case: `scanAsOf` of the source at the
    * watermark). */
  def initTrackedBm25IndexOver(spark: SparkSession, root: String,
                               docs: DataFrame, sourcePath: String,
                               asOfGen: Long, idCol: String = "doc_id",
                               textCol: String = "text"): FeedOffset =
    Lakehouse.withTableLock(spark, root.stripSuffix("/")) {
      val (epoch, _) = Lakehouse.epochAndFloor(spark, sourcePath)
      Retrieval.buildCompactedBm25Index(docs,
        s"${root.stripSuffix("/")}/v1", idCol, textCol)
      val off = FeedOffset(1L, "v1", epoch, asOfGen)
      writeOffset(spark, root, off)
      off
    }

  /** The tracked index's current serving state. */
  def loadTrackedBm25Index(spark: SparkSession,
                           root: String): (Bm25Index, FeedOffset) = {
    val off = readOffset(spark, root).getOrElse(throw new
        IllegalArgumentException(
      s"loadTrackedBm25Index: $root has no offset marker — " +
        "initTrackedBm25Index first"))
    (Retrieval.loadBm25Index(spark,
      s"${root.stripSuffix("/")}/${off.state}"), off)
  }

  /** Consume the source's `(watermark, toGen]` window into the tracked
    * index, exactly once. Default `toGen` = the newest CLOSED
    * generation (see [[resolveWindow]] — an open gen can still take
    * late tombstones); pass the open gen explicitly only on a
    * quiesced source. Replayed windows no-op; out-of-order windows
    * raise; the watermark and the new state commit atomically
    * together. */
  def applyFeedToBm25IndexTracked(spark: SparkSession, root: String,
                                  sourcePath: String, toGen: Long = -1L,
                                  idCol: String = "doc_id",
                                  textCol: String = "text",
                                  pruneGraceMs: Long = 0L)
      : (Bm25Index, FeedOffset) =
    Lakehouse.withTableLock(spark, root.stripSuffix("/")) {
      val (idx, off) = loadTrackedBm25Index(spark, root)
      resolveWindow(spark, sourcePath, off, toGen,
          "applyFeedToBm25IndexTracked") match {
        case None => (idx, off)
        case Some(cur) =>
          val feed = landWindow(spark, root, sourcePath, off, cur)
          val v = off.version + 1
          val state = s"v$v"
          // the FUSED apply+compact: one insert tokenize, zero delete
          // tokenize, docfreq/toklen derived from the landed postings
          // (the unfused applyFeedToBm25Index ∘ compactBm25Index pair
          // re-evaluated the whole feed lineage once per frame write;
          // spec'd frame-identical)
          val compacted = Retrieval.applyFeedToBm25IndexCompacted(idx,
            feed, s"${root.stripSuffix("/")}/$state", idCol, textCol)
          val newOff = FeedOffset(v, state, off.epoch, cur)
          writeOffset(spark, root, newOff)
          prune(spark, root, v, pruneGraceMs)
          (compacted, newOff)
      }
    }

  // ------------------------------------------------------------------
  // Vector
  // ------------------------------------------------------------------

  /** Initialize a tracked vector-index root — the dense sibling of
    * [[initTrackedBm25Index]]. */
  def initTrackedVectorIndex(spark: SparkSession, root: String,
                             index: VectorIndex, sourcePath: String,
                             asOfGen: Long): FeedOffset =
    Lakehouse.withTableLock(spark, root.stripSuffix("/")) {
      val (epoch, _) = Lakehouse.epochAndFloor(spark, sourcePath)
      Similarity.saveVectorIndex(index, s"${root.stripSuffix("/")}/v1")
      val off = FeedOffset(1L, "v1", epoch, asOfGen)
      writeOffset(spark, root, off)
      off
    }

  /** The tracked index's current serving state. */
  def loadTrackedVectorIndex(spark: SparkSession,
                             root: String): (VectorIndex, FeedOffset) = {
    val off = readOffset(spark, root).getOrElse(throw new
        IllegalArgumentException(
      s"loadTrackedVectorIndex: $root has no offset marker — " +
        "initTrackedVectorIndex first"))
    (Similarity.loadVectorIndex(spark,
      s"${root.stripSuffix("/")}/${off.state}"), off)
  }

  /** Consume the source's `(watermark, toGen]` window into the tracked
    * vector index, exactly once — semantics identical to
    * [[applyFeedToBm25IndexTracked]]. */
  def applyFeedToVectorIndexTracked(spark: SparkSession, root: String,
                                    sourcePath: String,
                                    toGen: Long = -1L,
                                    idCol: String = "vec_id",
                                    vecCol: String = "embedding",
                                    pruneGraceMs: Long = 0L)
      : (VectorIndex, FeedOffset) =
    Lakehouse.withTableLock(spark, root.stripSuffix("/")) {
      val (idx, off) = loadTrackedVectorIndex(spark, root)
      resolveWindow(spark, sourcePath, off, toGen,
          "applyFeedToVectorIndexTracked") match {
        case None => (idx, off)
        case Some(cur) =>
          val feed = landWindow(spark, root, sourcePath, off, cur)
          val next = Similarity.applyFeedToVectorIndex(idx, feed, idCol,
            vecCol)
          val v = off.version + 1
          val state = s"v$v"
          // the apply preserves geometry by construction and `idx` IS a
          // load of the previous immutable state dir, so centroids /
          // codebooks copy file-level (zero Spark jobs) instead of
          // round-tripping through two more write actions
          val saved = Similarity.saveVectorIndexFrom(next,
            s"${root.stripSuffix("/")}/${off.state}",
            s"${root.stripSuffix("/")}/$state")
          val newOff = FeedOffset(v, state, off.epoch, cur)
          writeOffset(spark, root, newOff)
          prune(spark, root, v, pruneGraceMs)
          (saved, newOff)
      }
    }
}
