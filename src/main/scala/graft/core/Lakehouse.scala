package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MUTATION half of the [[Layout]] lake table: row-level deletes,
  * keyed upserts, generation time travel, rollback, and the compaction
  * that applies it all physically — without ever rewriting resident
  * data on the write path.
  *
  * Why this exists at 100 TB: a training-data lake is append-mostly,
  * but takedowns are not optional — a right-to-be-forgotten request,
  * a licensing retraction, or a contamination finding must remove
  * specific ROWS from a table whose rewrite costs a full 100 TB pass.
  * The lakehouse answer (Iceberg/Delta positional delete vectors) is
  * merge-on-read: record `(file, row_index)` tombstones in a side
  * directory, subtract them at scan time, and fold them into the data
  * only when a scheduled compaction rewrites the table anyway.
  *
  * The mechanics are Spark-native: every file-source row already
  * carries its physical address as the hidden `_metadata.file_path` /
  * `_metadata.row_index` columns, so a tombstone is just that pair
  * projected from the rows a predicate matched. Files are immutable
  * (appends create new files; [[compact]] swaps whole directories), so
  * a recorded position stays valid until the file itself is replaced —
  * and replacement ([[compact]], [[Layout.maintainLayout]]'s rebuild)
  * clears the tombstone set it folded in.
  *
  * Scan cost model: tombstones name their FILES, so [[scan]] splits
  * the read — files with no tombstones stream through UNTOUCHED (no
  * metadata columns, no join; at 100 TB this is almost all of them),
  * and only the touched files pay a broadcast anti-join probe (the
  * tombstone set is broadcast while its on-disk size stays under
  * [[broadcastTombstoneBytes]]; past that the join falls back to a
  * shuffle and [[deleteDebt]] says it is compaction time). The split
  * file list passes through the driver — FILE-count-bounded, the same
  * bound [[Layout.prunedScan]] already rides.
  *
  * Snapshot model: generation-managed layouts ([[Layout.appendGeneration]]
  * / [[Layout.appendZorderedStream]]) get time travel for free — data
  * files carry their generation in the name, and each tombstone is
  * stamped with the table's max generation at delete time. A snapshot
  * at generation g is "data files with gen ≤ g minus tombstones
  * stamped ≤ g" ([[scanAsOf]]); [[rollback]] makes a snapshot
  * permanent by deleting everything stamped later. Snapshot
  * granularity is the generation: deletes issued while the table sat
  * at generation g fold into g's snapshot. Base files written before
  * any generation (plain `part-*`) belong to every snapshot.
  */
object Lakehouse {

  /** Tombstone columns: data-file NAME (not full path — the layout dir
    * is flat and relocatable), row index within it, and the table
    * generation the delete folded into. */
  val FileCol = "__file"
  val PosCol = "__pos"
  val GenCol = "__gen"

  /** Tombstone files carry exactly (__file, __pos, __gen) — a fixed
    * schema, so every debt read passes it explicitly and skips the
    * footer-inference job (tombstone frames are resolved on every
    * scan/changesBetween/deleteDebt; at many-small-files debt the
    * inference listing is pure overhead). */
  private val TombstoneSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(FileCol,
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField(PosCol,
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField(GenCol,
      org.apache.spark.sql.types.LongType)))

  /** Tombstone sets at or under this on-disk size are broadcast into
    * the scan's anti-join (a per-row hash probe, no shuffle of the
    * data side). Past it the anti-join shuffles both sides — correct,
    * but a signal the debt should be compacted away. */
  val broadcastTombstoneBytes: Long = 64L << 20

  /** Tombstone files are sharded past this many rows per output file
    * (a bulk retraction matching ~10⁹ rows must not funnel one write
    * task); takedown-sized deletes still land as one file. */
  val tombstoneRowsPerFile: Long = 1L << 24

  def deletesDir(path: String): String = s"${path}_deletes"

  // ------------------------------------------------------------------
  // Writer concurrency: the mutation surface (deleteWhere /
  // deleteMatching / upsertByKey / compact / rollback and the streamed
  // forms' per-batch bodies) is SINGLE-WRITER per table. The mechanics
  // are racy without it: two writers that both read [[currentGen]]
  // land the SAME generation, and [[Layout.appendGeneration]]'s
  // replay-delete (correct under a single stream's redeliveries) then
  // silently destroys the other writer's freshly landed rows. Every
  // public mutator therefore serializes through [[withTableLock]] — a
  // best-effort lease file under `<path>_lock`. Best-effort means: on
  // a filesystem with atomic create-if-absent (HDFS, local) two
  // in-flight writers serialize or the loser raises loudly after
  // `waitMs`; on an eventually-consistent object store the
  // token-readback narrows but cannot close the race window — there,
  // front the table with a real coordination service and treat the
  // lease as defense in depth (docs/layout.md#concurrency). Readers
  // never take the lock.
  // ------------------------------------------------------------------

  /** Run `body` holding the table's writer lease. Acquisition creates
    * `<path>_lock/lease` with create-if-absent, writes a fresh token,
    * reads it back, and proceeds only if its own token won (the
    * readback closes most of the check-then-create window on local
    * filesystems). A lease older than `leaseMs` is presumed crashed
    * and taken over (stale-lease takeover — a writer that dies without
    * releasing never wedges the table); a LIVE holder keeps its lease
    * fresh with a daemon heartbeat touching the file every
    * `leaseMs / 3`, so a legitimately long mutation (a 100 TB compact
    * runs hours) is never usurped mid-write just for outliving the
    * window. Raises after `waitMs` without acquisition instead of
    * mutating unlocked. If the heartbeat ever finds the lease carrying
    * someone else's token (this process was paused past the whole
    * window and usurped), the call RAISES after the body instead of
    * reporting clean success — the two writers' files may have
    * interleaved and the table should be health-checked/compacted.
    * NOT reentrant: lock only at the public mutator grain. */
  def withTableLock[T](spark: SparkSession, path: String,
                       leaseMs: Long = 15L * 60 * 1000,
                       waitMs: Long = 10L * 60 * 1000)(body: => T): T =
    withTableLock(new FsLeaseBackend(fs(spark, path),
      new Path(s"${path}_lock")), leaseMs, waitMs)(body)

  /** The lease PRIMITIVE [[withTableLock]] rides — a seam, because the
    * soundness of the default file-based lease is exactly as good as
    * the store's create-if-absent: near-atomic on HDFS/local (where
    * the token readback closes the remaining window), best-effort on
    * an eventually-consistent object store. A deployment with a real
    * coordination primitive (an object store's conditional-put /
    * if-none-match, a lock service, a database row) implements these
    * five operations and every mutator's serialization — takeover,
    * heartbeat, usurpation detection included — runs through it
    * unchanged. Implementations must be cheap to call repeatedly
    * (acquisition polls) and tolerate concurrent callers. */
  trait LeaseBackend {
    /** Try to create the lease holding `token`; false when held.
      * Need not be atomic — [[withTableLock]] re-reads the holder and
      * proceeds only if its own token survived. */
    def tryAcquire(token: String): Boolean
    /** The current holder's token; "" when absent or unreadable. */
    def holderToken(): String
    /** Milliseconds since the lease was last refreshed;
      * `Long.MaxValue` when absent. */
    def ageMs(): Long
    /** Refresh the lease's freshness (the holder's heartbeat). */
    def refresh(): Unit
    /** Remove the lease (release, or stale takeover). */
    def release(): Unit
    /** Remove the lease ONLY if it still carries `expectedToken` —
      * compare-and-delete; returns whether it was removed. The
      * default is read-then-delete, exactly as sound as the store's
      * point reads (on [[FsLeaseBackend]] a residual window remains:
      * the holder can change between the read and the delete — the
      * documented FS honesty level). A backend with a real CAS
      * primitive ([[CasLeaseBackend]], an object store's
      * conditional delete) overrides this ATOMICALLY, which makes the
      * stale-lease takeover sound: two contenders that both observed
      * the same stale token cannot each delete a successor's fresh
      * lease — only the first compare-and-delete fires. */
    def releaseIf(expectedToken: String): Boolean =
      if (holderToken() == expectedToken) { release(); true } else false
    /** Where the lease lives — for error messages. */
    def describe: String
  }

  /** The default backend: a lease FILE under `<path>_lock`, created
    * with create-if-absent, aged by modification time. */
  final class FsLeaseBackend(f: FileSystem, dir: Path)
      extends LeaseBackend {
    private val lease = new Path(dir, "lease")
    def tryAcquire(token: String): Boolean =
      try {
        f.mkdirs(dir)
        val out = f.create(lease, false) // fails if a writer holds it
        try out.write(token.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    def holderToken(): String =
      try {
        val in = f.open(lease)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: java.io.IOException => "" }
    def ageMs(): Long =
      try {
        if (!f.exists(lease)) Long.MaxValue
        else System.currentTimeMillis() -
          f.getFileStatus(lease).getModificationTime
      } catch { case _: java.io.IOException => Long.MaxValue }
    def refresh(): Unit = f.setTimes(lease, System.currentTimeMillis(), -1L)
    def release(): Unit = { f.delete(lease, false); () }
    def describe: String = dir.toString
  }

  /** A SOUND reference backend over a true compare-and-set primitive —
    * here a process-wide atomic registry, which is exactly sound for
    * any single-process deployment (a `local[k]` engine: every writer
    * thread shares the JVM). A distributed deployment keeps the SAME
    * four transitions and maps them onto its store's conditional ops:
    *
    *  - `tryAcquire`  → S3 `PutObject` + `If-None-Match: *` / GCS
    *    `x-goog-if-generation-match: 0` / an etcd create-txn — create
    *    iff absent, atomically.
    *  - `refresh`     → conditional put with `If-Match: <read etag>` /
    *    generation-match on the holder's own object.
    *  - `releaseIf`   → conditional `DeleteObject` (`If-Match` /
    *    generation-match) — delete iff the content still carries the
    *    observed token.
    *  - `holderToken` / `ageMs` → a point read (+ LastModified).
    *
    * Every transition here is atomic on the (token, mtime) pair, so
    * the takeover interleaving [[FsLeaseBackend]] documents (two
    * contenders both observing a stale lease, the second deleting the
    * first's FRESH successor) cannot happen: the loser's
    * compare-and-delete finds the successor token and fails. `clock`
    * is injectable so the stale-takeover paths are testable without
    * real waits. */
  final class CasLeaseBackend(scope: String,
                              clock: () => Long = () =>
                                System.currentTimeMillis())
      extends LeaseBackend {
    import CasLeaseBackend._
    def tryAcquire(token: String): Boolean =
      registry.putIfAbsent(scope, Entry(token, clock())) == null
    def holderToken(): String =
      Option(registry.get(scope)).map(_.token).getOrElse("")
    def ageMs(): Long =
      Option(registry.get(scope)).map(e => clock() - e.mtime)
        .getOrElse(Long.MaxValue)
    def refresh(): Unit = {
      registry.computeIfPresent(scope,
        (_, e) => Entry(e.token, clock()))
      ()
    }
    def release(): Unit = { registry.remove(scope); () }
    override def releaseIf(expectedToken: String): Boolean = {
      val removed = new java.util.concurrent.atomic.AtomicBoolean(false)
      registry.computeIfPresent(scope, (_, e) =>
        if (e.token == expectedToken) { removed.set(true); null }
        else e)
      removed.get()
    }
    def describe: String = s"cas:$scope"
  }

  object CasLeaseBackend {
    private final case class Entry(token: String, mtime: Long)
    private val registry =
      new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  }

  /** [[withTableLock]] over an explicit [[LeaseBackend]] — the form a
    * deployment with a sound coordination primitive calls (the path
    * form wraps exactly this over [[FsLeaseBackend]], and the race
    * specs exercise the mechanics through the interface). */
  def withTableLock[T](backend: LeaseBackend, leaseMs: Long,
                       waitMs: Long)(body: => T): T = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      // stale-lease takeover by COMPARE-AND-DELETE: read the holder we
      // believe dead FIRST, then remove only that exact lease — on a
      // CAS backend two contenders that both observed the stale token
      // cannot each delete the other's fresh successor (the loser's
      // conditional delete finds the new token and fails); on the FS
      // backend the same call narrows the window to the store's
      // read-then-delete honesty level (documented residual)
      val stale = backend.holderToken()
      val age = backend.ageMs()
      if (age != Long.MaxValue && age > leaseMs) {
        if (stale.nonEmpty) backend.releaseIf(stale)
        else backend.release() // token-less stale lease: a writer
        // crashed between creating the file and writing its token —
        // nothing to compare against, and nothing fresh to protect
      }
      // double-check: the acquire need not be atomic; proceed only if
      // OUR token survived the race
      acquired = backend.tryAcquire(token) &&
        backend.holderToken() == token
      if (!acquired) {
        require(System.currentTimeMillis() < deadline,
          s"withTableLock: could not acquire the writer lease at " +
            s"${backend.describe} within ${waitMs}ms — another writer " +
            "holds the table (mutations are single-writer; retry, or " +
            "remove a dead writer's stale lease by waiting out its " +
            "lease window)")
        Thread.sleep(100L)
      }
    }
    val usurped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stop = new java.util.concurrent.CountDownLatch(1)
    val beat = new Thread(() => {
      while (!stop.await(math.max(1L, leaseMs / 3),
          java.util.concurrent.TimeUnit.MILLISECONDS)) {
        try {
          if (backend.holderToken() == token) backend.refresh()
          else usurped.set(true)
        } catch { case _: java.io.IOException => () }
      }
    }, s"graft-lease-heartbeat-${backend.describe.hashCode}")
    beat.setDaemon(true)
    beat.start()
    val result = try body finally {
      stop.countDown()
      beat.join(1000L)
      // release only OUR lease — after a usurpation the lease is the
      // new owner's, and releasing it would cascade the race; the
      // compare-and-delete makes this atomic on a CAS backend
      if (!usurped.get()) backend.releaseIf(token)
    }
    // raised only on a CLEAN body (a body failure already propagated)
    require(!usurped.get(),
      s"withTableLock: the writer lease at ${backend.describe} was " +
        s"taken over mid-mutation (this process stalled past " +
        s"${leaseMs}ms and a contender presumed it dead) — the " +
        "mutation DID run, but another writer may have interleaved: " +
        "health-check the table (Layout.layoutHealth, " +
        "Lakehouse.deleteDebt) and compact before trusting further " +
        "snapshots")
    result
  }

  // ------------------------------------------------------------------
  // Compaction epochs + the snapshot floor: one tiny `<path>_epoch`
  // marker holding (epoch, floor). [[compact]] (and the
  // [[Layout.maintainLayout]] rebuild, which IS a compact) bumps the
  // epoch — generation ids are reused afterwards, so any window a
  // replica captured before it is meaningless; [[changesBetween]] /
  // [[scanAsOf]] / [[rollback]] raise on an epoch mismatch instead of
  // silently serving wrong deltas. [[compactRetaining]] keeps the
  // epoch (post-floor generations stay addressable) and raises the
  // FLOOR instead: snapshots below it are expired and raise
  // unconditionally. The marker is written BEFORE the destructive
  // swap — a crash between the two leaves replicas raising spuriously
  // (loud, recoverable), never reading wrong data.
  // ------------------------------------------------------------------

  private def epochPath(path: String) = new Path(s"${path}_epoch")

  /** (compact epoch, snapshot floor) — (0, −1) for a table never
    * compacted. Replicas capture the epoch alongside their `fromGen`
    * and pass it back to [[changesBetween]]. */
  def epochAndFloor(spark: SparkSession, path: String): (Long, Long) = {
    // a pointered table's epoch/floor ride its commit (one atomic
    // marker for data + deletes + epoch + floor); the standalone
    // `_epoch` file is the legacy (never-compacted) form
    readCommit(spark, path) match {
      case Some(c) => return (c.epoch, c.floor)
      case None => ()
    }
    val f = fs(spark, path)
    def readMarker(p: Path): (Long, Long) = {
      val in = f.open(p)
      try (in.readLong(), in.readLong()) finally in.close()
    }
    // `_epoch_next` is the in-flight update's fully-written new value
    // (landed by an atomic rename) — prefer it: reading the NEW marker
    // early is the safe direction (a spurious loud raise at worst,
    // never a silently-served expired window), and a crash between the
    // old marker's delete and the final rename must NOT revert the
    // table to (0, −1)
    val next = new Path(s"${path}_epoch_next")
    if (f.exists(next)) readMarker(next)
    else if (f.exists(epochPath(path))) readMarker(epochPath(path))
    else (0L, -1L)
  }

  /** The table's compaction epoch; bumped by every history-collapsing
    * rewrite. See [[epochAndFloor]]. */
  def compactEpoch(spark: SparkSession, path: String): Long =
    epochAndFloor(spark, path)._1

  /** The oldest still-addressable snapshot generation; raised by
    * [[compactRetaining]]. See [[epochAndFloor]]. */
  def snapshotFloor(spark: SparkSession, path: String): Long =
    epochAndFloor(spark, path)._2

  /** Crash-atomic marker update: the new value lands COMPLETE at
    * `_epoch_next` by rename before the old marker is touched, and
    * [[epochAndFloor]] prefers `_epoch_next` — so no crash point
    * reverts the table to (0, −1) (which would silently stop expired
    * windows from raising). A lingering `_epoch_next` is finished by
    * the next update or by [[recover]]. */
  private def writeEpochFloor(spark: SparkSession, path: String,
                              epoch: Long, floor: Long): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(s"${path}_epoch_tmp")
    val next = new Path(s"${path}_epoch_next")
    // FINISH a prior crashed update first (never delete its `_epoch_next`
    // outright: between that delete and our own rename a reader would
    // find NO marker at all — the exact revert this method exists to
    // prevent)
    if (f.exists(next)) {
      f.delete(epochPath(path), false)
      require(f.rename(next, epochPath(path)),
        s"writeEpochFloor: finishing stale $next failed")
    }
    val out = f.create(tmp, true)
    try { out.writeLong(epoch); out.writeLong(floor) } finally out.close()
    require(f.rename(tmp, next),
      s"writeEpochFloor: rename $tmp -> $next failed")
    // from here the NEW value is what readers see, whatever happens
    f.delete(epochPath(path), false)
    require(f.rename(next, epochPath(path)),
      s"writeEpochFloor: rename $next -> ${epochPath(path)} failed")
  }

  private def requireEpoch(spark: SparkSession, path: String,
                           asOfEpoch: Long, what: String): Unit =
    if (asOfEpoch >= 0) {
      val cur = compactEpoch(spark, path)
      require(asOfEpoch == cur,
        s"$what: the caller's window was captured at compact epoch " +
          s"$asOfEpoch but the table is at epoch $cur — a compaction " +
          "collapsed the generation history in between (ids are " +
          "reused), so the window no longer addresses what it did. " +
          "Re-sync the replica from a full scan and re-capture the " +
          "epoch (Lakehouse.compactEpoch)")
    }

  private def requireAboveFloor(spark: SparkSession, path: String,
                                gen: Long, what: String): Unit = {
    val floor = snapshotFloor(spark, path)
    require(gen >= floor,
      s"$what: generation $gen predates the snapshot floor $floor — " +
        "a retention-preserving compaction expired that history " +
        "(Lakehouse.compactRetaining); only snapshots at or after the " +
        "floor remain addressable")
  }

  /** The schema with every field nullable — what a parquet round-trip
    * reads back; passing it explicitly to a re-read of our own write
    * skips the footer-inference job without risking a false
    * non-nullable promise. */
  private[graft] def nullableCopy(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      s.fields.map(_.copy(nullable = true)))

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  // ------------------------------------------------------------------
  // Version-pointer commits: once a table is COMPACTED (or its schema
  // evolved), its live state is named by a commit LOG under
  // `<path>_commit/` — the Delta/Iceberg log pattern, both halves:
  //
  //  - CHECKPOINT markers `v<NNN>.json` carry the FULL live state
  //    (every data file name, every tombstone file name, epoch/floor,
  //    schema). The first commit (v1) and every compact/retention
  //    rewrite land one, plus every [[CommitCheckpointEvery]]-th
  //    version, so the replay tail stays bounded.
  //  - DELTA markers `v<NNN>.delta.json` carry only the ACTIONS of one
  //    commit — added/removed data names, added/removed tombstone
  //    names — plus the (tiny, scalar) epoch/floor/schema. A
  //    tombstone write, append, or CDC micro-batch therefore commits
  //    O(its own files), never O(table): at 100 TB / 10⁵ live files a
  //    minutes-cadence consumer no longer rewrites a multi-MB file
  //    list per mutation.
  //
  // Each marker is fully written to a tmp name and swapped in by ONE
  // atomic rename. Readers resolve max-version by replaying the
  // latest checkpoint plus its contiguous delta tail (≤
  // [[CommitCheckpointEvery]] small reads); a missing tail marker is a
  // LOUD raise, never a silent partial state — and [[vacuum]] only
  // sweeps markers strictly BELOW the newest checkpoint, so the tail
  // a reader needs is never collectible. Files themselves never move
  // after they land: a compact writes its fresh base ALONGSIDE the
  // old files and flips the pointer, so a long-running scan that
  // resolved the old file list keeps reading files that still exist —
  // replaced files are removed by [[vacuum]] after a grace window,
  // never at commit time. Tables never compacted have no marker and
  // keep the plain directory-listing contract — nothing is pointered
  // until the first operation that needs it.
  // ------------------------------------------------------------------

  /** One committed table version: live file NAMES (relocatable, like
    * tombstone addresses), the compaction epoch and snapshot floor,
    * and the table schema as Spark schema-JSON (the scan schema —
    * additive evolution widens it while resident files null-fill). */
  final case class TableCommit(version: Long, data: Seq[String],
                               deletes: Seq[String], epoch: Long,
                               floor: Long, schemaJson: Option[String])

  def commitDir(path: String): String = s"${path}_commit"

  /** Checkpoint cadence: every Nth version lands as a full marker so
    * the reader's delta-replay tail never exceeds N−1 small files.
    * Compacts/retention rewrites checkpoint unconditionally (their
    * "delta" would BE the full state). Overridable per session via
    * `spark.graft.commit.checkpointEvery` (≥ 2) — a minutes-cadence
    * CDC table may prefer a longer tail (fewer O(live-files)
    * checkpoint writes) while a read-heavy one prefers a shorter
    * resolve. Changing the cadence mid-table is safe: readers resolve
    * whatever checkpoint/tail structure the log holds, and vacuum
    * keys off the markers present, not the setting. */
  private[core] val CommitCheckpointEvery = 8L

  private def checkpointEvery(spark: SparkSession): Long = {
    val v = spark.conf.getOption("spark.graft.commit.checkpointEvery")
      .map(_.toLong).getOrElse(CommitCheckpointEvery)
    require(v >= 2L,
      s"spark.graft.commit.checkpointEvery must be >= 2, got $v — " +
        "1 would checkpoint every commit (use compact for that shape)")
    v
  }

  private def commitVersionOf(name: String): Long = {
    val core =
      if (name.endsWith(".delta.json")) name.stripSuffix(".delta.json")
      else if (name.endsWith(".json")) name.stripSuffix(".json")
      else return -1L
    val body = core.stripPrefix("v")
    if (core.startsWith("v") && body.nonEmpty &&
        body.forall(_.isDigit)) body.toLong
    else -1L
  }

  private def isDeltaMarker(name: String): Boolean =
    name.endsWith(".delta.json")

  private def readMarkerJson(f: FileSystem, p: Path): Map[String, Any] = {
    val in = f.open(p)
    val body = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    MiniJson.parse(body).asInstanceOf[Map[String, Any]]
  }

  /** Parsed-marker cache. A landed marker is IMMUTABLE by
    * construction — version-named, renamed in with fail-if-exists,
    * never rewritten — so its parsed body caches process-wide; the
    * key carries (mtime, length) from the listing the resolver
    * already holds, so even an out-of-band drop-and-recreate of a
    * whole table at the same path cannot serve a stale body.
    * [[readCommit]] still LISTS the log each resolve (the single
    * metadata op through which new commits become visible); warm
    * content reads cost zero further IO, so a checkpoint+tail
    * resolve is one listing instead of up to
    * [[CommitCheckpointEvery]] point reads per plan on an object
    * store. The size cap is protective only (bodies are KB-scale). */
  private val markerCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()

  private def readMarkerCached(f: FileSystem,
                               s: org.apache.hadoop.fs.FileStatus)
      : Map[String, Any] = {
    val key =
      s"${s.getPath}@${s.getModificationTime}:${s.getLen}"
    val hit = markerCache.get(key)
    if (hit != null) hit
    else {
      val m = readMarkerJson(f, s.getPath)
      if (markerCache.size > 8192) markerCache.clear()
      markerCache.put(key, m)
      m
    }
  }

  private def markerNames(m: Map[String, Any], k: String): Seq[String] =
    MiniJson.field(m, k) match {
      case Some(xs: List[_]) => xs.map(_.toString)
      case _ => Seq.empty
    }

  private def markerNum(m: Map[String, Any], k: String,
                        dflt: Long): Long =
    MiniJson.field(m, k) match {
      case Some(d: Double) => d.toLong
      case _ => dflt
    }

  /** The table's current commit — the latest checkpoint marker plus
    * its contiguous delta tail replayed in version order — or None for
    * a never-pointered (plain-directory) table. ≤
    * [[CommitCheckpointEvery]] small marker reads; a gap in the tail
    * (an over-swept or corrupted log) raises loudly rather than
    * resolving a partial state. */
  def readCommit(spark: SparkSession, path: String): Option[TableCommit] = {
    val f = fs(spark, path)
    val dir = new Path(commitDir(path))
    if (!f.exists(dir)) return None
    val markers = f.listStatus(dir).toSeq
      .filter(s => s.isFile && commitVersionOf(s.getPath.getName) >= 0)
    if (markers.isEmpty) return None
    val byVersion = markers
      .map(s => commitVersionOf(s.getPath.getName) -> s)
      .sortBy(_._1)
    val (latestV, _) = byVersion.last
    val checkpoints =
      byVersion.filterNot(x => isDeltaMarker(x._2.getPath.getName))
    require(checkpoints.nonEmpty,
      s"readCommit: ${dir} holds only delta markers — the checkpoint " +
        "they replay over is gone (over-vacuumed or corrupted log)")
    val (baseV, baseStatus) = checkpoints.last
    val base = readMarkerCached(f, baseStatus)
    var data = markerNames(base, "data").toSet
    var dels = markerNames(base, "deletes").toSet
    var latest = base
    val tail = byVersion.filter(x => x._1 > baseV).toMap
    var v = baseV + 1
    while (v <= latestV) {
      val p = tail.getOrElse(v, throw new IllegalStateException(
        s"readCommit: delta tail gap — version $v missing between " +
          s"checkpoint $baseV and head $latestV under $dir"))
      val m = readMarkerCached(f, p)
      data = data -- markerNames(m, "removeData") ++
        markerNames(m, "addData")
      dels = dels -- markerNames(m, "removeDeletes") ++
        markerNames(m, "addDeletes")
      latest = m
      v += 1
    }
    Some(TableCommit(latestV, data.toSeq.sorted, dels.toSeq.sorted,
      markerNum(latest, "epoch", 0L), markerNum(latest, "floor", -1L),
      MiniJson.field(latest, "schema").collect { case s: String => s }))
  }

  /** Stage-and-rename a marker body in atomically: fully written to a
    * tmp name and RENAMED — readers can never observe a partial
    * commit, and the rename fails loudly if the version already exists
    * (the single-writer lock makes that a bug, not a race to resolve). */
  private def markerRenameIn(f: FileSystem, dir: Path, version: Long,
                             suffix: String, body: String): Unit = {
    f.mkdirs(dir)
    val tmp = new Path(dir, f"tmp-v$version%020d$suffix")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, f"v$version%020d$suffix")
    require(f.rename(tmp, dst),
      s"commit: rename $tmp -> $dst failed — version $version " +
        "already exists? Commits are single-writer under the table lock")
  }

  /** Land a CHECKPOINT marker for `version`: the FULL live state.
    * Compacts and retention rewrites call this directly (their data
    * set changes wholesale); incremental mutators go through
    * [[commitAdvance]], which lands O(actions) delta markers and only
    * checkpoints on cadence. Callers hold the table lock. */
  private[core] def commitWrite(spark: SparkSession, path: String,
                                version: Long, data: Seq[String],
                                deletes: Seq[String], epoch: Long,
                                floor: Long,
                                schemaJson: Option[String]): Unit = {
    val body = MiniJson.write(Map(
      "version" -> version, "data" -> data.sorted,
      "deletes" -> deletes.sorted, "epoch" -> epoch, "floor" -> floor,
      "schema" -> schemaJson.orNull))
    markerRenameIn(fs(spark, path), new Path(commitDir(path)), version,
      ".json", body)
  }

  /** Advance a pointered table by ONE commit, landing a marker sized
    * by the commit's ACTIONS, not the table: added/removed data names,
    * added/removed tombstone names, plus the scalar epoch/floor/schema
    * (every marker carries those in full, so the reader never chases
    * scalars through the tail). Writes a delta marker unless the
    * version hits the [[CommitCheckpointEvery]] cadence — then a full
    * checkpoint (the writer holds the resolved state in hand, so a
    * checkpoint costs no extra pass). Returns the resolved new commit
    * for callers that keep mutating. Lock-holding callers only. */
  private[core] def commitAdvance(spark: SparkSession, path: String,
                                  prior: TableCommit,
                                  addData: Seq[String] = Seq.empty,
                                  removeData: Seq[String] = Seq.empty,
                                  addDeletes: Seq[String] = Seq.empty,
                                  removeDeletes: Seq[String] = Seq.empty,
                                  epoch: Long = -1L, floor: Long = -2L,
                                  schemaJson: Option[String] = None)
      : TableCommit = {
    val version = prior.version + 1
    val newEpoch = if (epoch >= 0L) epoch else prior.epoch
    val newFloor = if (floor >= -1L) floor else prior.floor
    val newSchema = schemaJson.orElse(prior.schemaJson)
    val data = ((prior.data.toSet -- removeData) ++ addData).toSeq.sorted
    val dels =
      ((prior.deletes.toSet -- removeDeletes) ++ addDeletes).toSeq.sorted
    if (version % checkpointEvery(spark) == 0L)
      commitWrite(spark, path, version, data, dels, newEpoch, newFloor,
        newSchema)
    else {
      val body = MiniJson.write(Map(
        "version" -> version,
        "addData" -> addData.sorted,
        "removeData" -> removeData.sorted,
        "addDeletes" -> addDeletes.sorted,
        "removeDeletes" -> removeDeletes.sorted,
        "epoch" -> newEpoch, "floor" -> newFloor,
        "schema" -> newSchema.orNull))
      markerRenameIn(fs(spark, path), new Path(commitDir(path)), version,
        ".delta.json", body)
    }
    TableCommit(version, data, dels, newEpoch, newFloor, newSchema)
  }

  /** Pointerize a legacy table: snapshot its directory-listing state
    * (on-disk data + tombstone files, the legacy epoch/floor marker,
    * the current schema) as commit v1. Idempotent-ish: returns the
    * existing commit when one is already present. Lock-holding callers
    * only. */
  private[core] def migrateToCommit(spark: SparkSession,
                                    path: String): TableCommit =
    readCommit(spark, path).getOrElse {
      val data = parquetFiles(spark, path).map(_.getName)
      val dels = parquetFiles(spark, deletesDir(path)).map(_.getName)
      val (epoch, floor) = epochAndFloor(spark, path)
      val schemaJson =
        if (data.isEmpty) None
        else Some(spark.read.parquet(path).schema.json)
      commitWrite(spark, path, 1L, data, dels, epoch, floor, schemaJson)
      TableCommit(1L, data, dels, epoch, floor, schemaJson)
    }

  /** The table's LIVE data files: the commit's named set for a
    * pointered table (dead files may sit alongside until [[vacuum]]),
    * the plain directory listing otherwise. */
  private[core] def dataFilePaths(spark: SparkSession,
                                  path: String): Seq[Path] =
    readCommit(spark, path) match {
      case Some(c) => c.data.map(n => new Path(path, n))
      case None => parquetFiles(spark, path)
    }

  /** The table's LIVE tombstone files — commit-resolved like
    * [[dataFilePaths]]. */
  private[core] def deleteFilePaths(spark: SparkSession,
                                    path: String): Seq[Path] =
    readCommit(spark, path) match {
      case Some(c) => c.deletes.map(n => new Path(deletesDir(path), n))
      case None => parquetFiles(spark, deletesDir(path))
    }

  /** True when the table carries a schema CONTRACT a batch must honor
    * — resident data files, or a committed schema (possibly evolved,
    * possibly on a still-empty table). The keyed mutators check drift
    * against it BEFORE their retraction half, so a drifted batch
    * raises without having mutated anything. */
  private def hasSchemaContract(spark: SparkSession,
                                path: String): Boolean =
    readCommit(spark, path) match {
      case Some(c) => c.data.nonEmpty || c.schemaJson.isDefined
      case None => parquetFiles(spark, path).nonEmpty
    }

  /** The table's SCAN schema: the committed schema-JSON when recorded
    * (survives additive evolution and answers even a zero-file table),
    * else inferred from the live files. */
  def tableSchema(spark: SparkSession,
                  path: String): org.apache.spark.sql.types.StructType =
    readCommit(spark, path) match {
      case Some(c) if c.schemaJson.isDefined =>
        org.apache.spark.sql.types.DataType.fromJson(c.schemaJson.get)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      case Some(c) if c.data.isEmpty =>
        new org.apache.spark.sql.types.StructType()
      case Some(c) =>
        // same-schema is append-enforced, so ONE footer carries the
        // table schema — no need to index every live file for inference
        spark.read.parquet(s"$path/${c.data.head}").schema
      case None =>
        val files = parquetFiles(spark, path)
        if (files.isEmpty) spark.read.parquet(path).schema // loud, as before
        else spark.read.parquet(files.head.toString).schema
    }

  private def parquetFiles(spark: SparkSession, path: String): Seq[Path] = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
  }

  /** Generation of a data file: `gen<g>-…` names carry it; base files
    * from a plain [[Layout.zorder]] write are generation −1 (present
    * in every snapshot). */
  private[core] def genOf(name: String): Long =
    if (name.startsWith("gen")) {
      val dash = name.indexOf('-')
      if (dash > 3) {
        val digits = name.substring(3, dash)
        if (digits.nonEmpty && digits.forall(_.isDigit)) digits.toLong
        else -1L
      } else -1L
    } else -1L

  /** Max generation among the table's data files; −1 for a table with
    * only base files. New tombstones are stamped with this. */
  def currentGen(spark: SparkSession, path: String): Long = {
    val gens = dataFilePaths(spark, path).map(p => genOf(p.getName))
    if (gens.isEmpty) -1L else gens.max
  }

  private def tombstoneFrame(spark: SparkSession, path: String,
                             maxGen: Long = Long.MaxValue): Option[DataFrame] = {
    val files = deleteFilePaths(spark, path)
      .filter(p => maxGen == Long.MaxValue || delGenOf(p.getName) <= maxGen)
      .map(_.toString)
    if (files.isEmpty) None
    else Some(spark.read.schema(TombstoneSchema).parquet(files: _*)
      .filter(col(GenCol) <= maxGen)
      .select(FileCol, PosCol))
  }

  /** Generation stamp in a tombstone file name `del<g>-<seq>.parquet`;
    * −1 base-gen deletes are written as `del-1-<seq>` and parse back. */
  private[core] def delGenOf(name: String): Long = {
    val body = name.stripPrefix("del").stripSuffix(".parquet")
    val dash = body.lastIndexOf('-')
    if (dash <= 0) -1L else body.substring(0, dash).toLong
  }

  /** Rows the delete side has recorded against live files — the
    * merge-on-read debt every [[scan]] pays and [[compact]] clears.
    * Tombstone storage is debt-row-bounded, never table-bounded. */
  def deleteDebt(spark: SparkSession, path: String): Long =
    tombstoneFrame(spark, path).map(_.count()).getOrElse(0L)

  private def tombstoneBytes(spark: SparkSession, path: String): Long =
    deleteFilePaths(spark, path)
      .map(p => fs(spark, path).getFileStatus(p).getLen).sum

  /** Read `files` minus `tombstones`, with the clean-file split: files
    * no tombstone names are read bare (no metadata, no join); touched
    * files ride a left-anti join on (file, pos), broadcast while the
    * debt is small. Empty `files` → empty frame with `schema`. */
  private def readMinus(spark: SparkSession, files: Seq[String],
                        schema: org.apache.spark.sql.types.StructType,
                        tombstones: Option[DataFrame],
                        broadcastable: Boolean): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    tombstones match {
      case None => spark.read.schema(schema).parquet(files: _*)
      case Some(ts) =>
        // file-count-bounded driver list: which files have debt at all
        val touchedNames = ts.select(FileCol).distinct()
          .collect().map(_.getString(0)).toSet
        val (touched, clean) =
          files.partition(f => touchedNames.contains(fileName(f)))
        val cleanDf =
          if (clean.isEmpty) None
          else Some(spark.read.schema(schema).parquet(clean: _*))
        val touchedDf =
          if (touched.isEmpty) None
          else {
            val keyed = spark.read.schema(schema).parquet(touched: _*)
              .withColumn(FileCol,
                element_at(split(col("_metadata.file_path"), "/"), -1))
              .withColumn(PosCol, col("_metadata.row_index"))
            val side = if (broadcastable) broadcast(ts) else ts
            Some(keyed.join(side, Seq(FileCol, PosCol), "left_anti")
              .drop(FileCol, PosCol))
          }
        (cleanDf, touchedDf) match {
          case (Some(c), Some(t)) => c.unionByName(t)
          case (Some(c), None) => c
          case (None, Some(t)) => t
          case (None, None) =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        }
    }
  }

  private def fileName(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) path else path.substring(i + 1)
  }

  /** The table's LIVE rows: every data file minus the recorded
    * tombstones (merge-on-read). With no delete debt this is a plain
    * parquet scan — the read path costs nothing until a delete exists,
    * and after one it costs a broadcast probe on only the files the
    * debt names. */
  def scan(spark: SparkSession, path: String): DataFrame = {
    val files = dataFilePaths(spark, path).map(_.toString)
    val schema = tableSchema(spark, path)
    readMinus(spark, files, schema, tombstoneFrame(spark, path),
      tombstoneBytes(spark, path) <= broadcastTombstoneBytes)
  }

  /** [[Layout.prunedScan]] with the delete debt applied: resolve the
    * box against the manifest (file-count-sized), subtract tombstones
    * from only the kept files, re-apply the predicate. Manifest stats
    * are write-time stats — a file whose live rows no longer reach the
    * recorded min/max still prunes soundly (over-selection only). */
  def prunedScan(spark: SparkSession, path: String,
                 box: Seq[(String, Column, Column)]): DataFrame = {
    require(box.nonEmpty, "prunedScan needs a box predicate")
    val manifest = spark.read.parquet(s"${path}_manifest")
    val kept = Layout.pruneFiles(manifest, box)
      .select("__file").collect().map(r => r.getString(0))
    // on a pointered table the manifest must name EXACTLY the live
    // files: replaced files linger on disk until vacuum, so a stale
    // manifest (a crash between a commit and its manifest rebuild)
    // would silently serve dead data — raise instead. File-name
    // comparison (manifests record build-time paths; tables relocate).
    readCommit(spark, path).foreach { c =>
      val live = c.data.toSet
      val manifested = manifest.select("__file").collect()
        .map(r => fileName(r.getString(0))).toSet
      require(manifested == live,
        s"prunedScan: the manifest at ${path}_manifest names " +
          s"${(manifested -- live).size} dead and misses " +
          s"${(live -- manifested).size} live files — it predates the " +
          "table's current commit (a crashed rewrite?). Run " +
          "Lakehouse.recover and rebuild with Layout.writeManifest")
    }
    val schema = tableSchema(spark, path)
    val pred = box.map { case (c, lo, hi) => col(c).between(lo, hi) }
      .reduce(_ && _)
    readMinus(spark, kept.toSeq, schema, tombstoneFrame(spark, path),
      tombstoneBytes(spark, path) <= broadcastTombstoneBytes)
      .filter(pred)
  }

  /** Tombstone every LIVE row matching `cond`; returns how many rows
    * were newly tombstoned. One pass over the table (filter + project
    * of the hidden address columns — at 100 TB, schedule takedowns in
    * batches so many requests share the pass); rows already tombstoned
    * are skipped, so re-running the same predicate is a no-op writing
    * nothing. The tombstone lands as ONE deterministic-named
    * generation-stamped file (`del<g>-<seq>.parquet`; sharded past
    * [[tombstoneRowsPerFile]] rows). Single-writer: serialized through
    * [[withTableLock]]. */
  def deleteWhere(spark: SparkSession, path: String, cond: Column,
                  rowsPerFile: Long = tombstoneRowsPerFile): Long =
    withTableLock(spark, path) {
      val live = dataFilePaths(spark, path).map(_.toString)
      if (live.isEmpty) 0L
      else {
        val hits = spark.read.schema(tableSchema(spark, path))
          .parquet(live: _*).filter(cond)
          .select(element_at(split(col("_metadata.file_path"), "/"), -1)
            .as(FileCol),
            col("_metadata.row_index").as(PosCol))
        writeTombstones(spark, path, hits, rowsPerFile)._1
      }
    }

  /** Tombstone live rows whose `keyCol` appears in `keys` — the bulk
    * takedown path (a checksum/id retraction list joined, not a
    * predicate). `keys` may be any size: the join is a left-semi on
    * the key, planned like any other join (broadcast when small).
    * Single-writer: serialized through [[withTableLock]]. */
  def deleteMatching(spark: SparkSession, path: String,
                     keys: DataFrame, keyCol: String,
                     rowsPerFile: Long = tombstoneRowsPerFile): Long =
    withTableLock(spark, path) {
      deleteMatchingIn(spark, path,
        dataFilePaths(spark, path).map(_.toString), keys, keyCol,
        rowsPerFile)._1
    }

  /** A retraction batch at or under this many distinct keys probes the
    * Bloom membership manifest (when one exists) to bound its table
    * pass to the files that might hold a batch key — the CDC upsert
    * case, where a small update batch must not pay a full key-column
    * pass per micro-batch. Past it the pass stays full (the probe is
    * per-key per-manifest-row; a retraction-list join beats it). */
  val bloomRetractionMaxKeys: Int = 4096

  /** Narrow a retraction's file set through `<path>_bloom_<keyCol>`:
    * keep files whose sketch might hold ANY batch key, plus files
    * absent from the manifest (appended after it — staleness degrades
    * the skip, never correctness, exactly [[pointLookup]]'s contract).
    * Applies only when the manifest exists, the batch key expression
    * has EXACTLY the key column's type (no join-coercion ambiguity to
    * reason about), and the batch is lookup-sized
    * ([[bloomRetractionMaxKeys]] — the key sample is k-bounded driver
    * work); otherwise returns `files` unchanged. */
  private[graft] def bloomNarrow(spark: SparkSession, path: String,
                                 files: Seq[String], keys: DataFrame,
                                 keyCol: String): Seq[String] = {
    val bDir = s"${path}_bloom_$keyCol"
    if (files.isEmpty || !fs(spark, path).exists(new Path(bDir)))
      return files
    val kt = tableSchema(spark, path)(keyCol).dataType
    if (keys.schema(keyCol).dataType != kt) return files
    val sample = keys.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .distinct().limit(bloomRetractionMaxKeys + 1)
      .collect().map(_.get(0))
    if (sample.length > bloomRetractionMaxKeys) return files
    if (sample.isEmpty) return Seq.empty
    // hashes through Spark's own xxhash64 at the key's exact type —
    // the build side hashed xxhash64(col(keyCol))
    val hashes = spark.range(1)
      .select(sample.toSeq.map(v => xxhash64(lit(v).cast(kt))): _*)
      .head().toSeq.map(_.asInstanceOf[Long])
    val probed = spark.read.parquet(bDir)
      .select(col("__file"),
        graft.expressions.GraftExpressions
          .bloomMightContainAny(col("__bloom"), hashes).as("__might"))
      .collect()
    val manifested = probed.map(r => fileName(r.getString(0))).toSet
    val kept = probed.filter(r => r.getAs[Any]("__might") == true)
      .map(r => fileName(r.getString(0))).toSet
    files.filter(fp => kept.contains(fileName(fp)) ||
      !manifested.contains(fileName(fp)))
  }

  /** [[deleteMatching]] over an explicit file subset — the building
    * block [[upsertByKeyStream]] needs: a REPLAYED upsert batch must
    * not tombstone the rows its own first attempt landed (its
    * generation's files are rewritten under the same deterministic
    * names, so stale positions would kill rewritten rows). The pass is
    * [[bloomNarrow]]-bounded: with a Bloom manifest present and a
    * lookup-sized batch, only files that might hold a batch key are
    * read — a CDC micro-batch's cost stops tracking the table size. */
  private def deleteMatchingIn(spark: SparkSession, path: String,
                               files: Seq[String], keys: DataFrame,
                               keyCol: String,
                               rowsPerFile: Long = tombstoneRowsPerFile,
                               schemaHint: Option[org.apache.spark.sql
                                 .types.StructType] = None,
                               commit: Boolean = true)
      : (Long, Seq[String]) = {
    val narrowed = bloomNarrow(spark, path, files, keys, keyCol)
    if (narrowed.isEmpty) return (0L, Seq.empty)
    // callers that just drift-checked the table pass the schema they
    // proved — skipping the footer-inference job an unpointered
    // table's tableSchema pays per resolve
    val schema = schemaHint.getOrElse(tableSchema(spark, path))
    val addressed = spark.read.schema(schema).parquet(narrowed: _*)
      .select(col(keyCol),
        element_at(split(col("_metadata.file_path"), "/"), -1).as(FileCol),
        col("_metadata.row_index").as(PosCol))
    val hits = addressed
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .select(FileCol, PosCol)
    writeTombstones(spark, path, hits, rowsPerFile, commit)
  }

  /** Stage `hits` minus already-recorded tombstones (natural
    * partitioning — the table pass never funnels one task), count the
    * staged rows (a tombstone-sized read, never a second job over the
    * table), normalize into `ceil(n / rowsPerFile)` shards, and land
    * each under a deterministic generation-stamped name
    * (`del<g>-<seq+k>.parquet`) via the [[Layout.appendGeneration]]
    * staging-then-rename discipline. Takedown-sized deletes land as
    * one file; a ~10⁹-row retraction shards instead of funneling.
    *
    * `commit = false` DEFERS the pointer advance: the landed names are
    * returned for the caller to fold into ITS commit (the upsert/CDC
    * paths land one delta marker per mutation instead of two). Until
    * that commit, the files are invisible to every commit-resolved
    * reader; a crash in between leaves them as plain orphans that age
    * into [[vacuum]]'s sweep, and the mutation as a whole is ATOMIC —
    * a replay recomputes the same hits against the un-advanced state. */
  private def writeTombstones(spark: SparkSession, path: String,
                              hits: DataFrame,
                              rowsPerFile: Long = tombstoneRowsPerFile,
                              commit: Boolean = true)
      : (Long, Seq[String]) = {
    require(rowsPerFile > 0, s"writeTombstones: rowsPerFile must be " +
      s"positive, got $rowsPerFile")
    val gen = currentGen(spark, path)
    val fresh = tombstoneFrame(spark, path) match {
      case Some(ts) => hits.join(ts, Seq(FileCol, PosCol), "left_anti")
      case None => hits
    }
    val dDir = deletesDir(path)
    val f = fs(spark, path)
    var landedNames: Seq[String] = Seq.empty
    val seq = parquetFiles(spark, dDir)
      .map(_.getName).filter(_.startsWith(s"del$gen-"))
      .map(n => n.stripPrefix(s"del$gen-").stripSuffix(".parquet").toLong)
      .foldLeft(-1L)(math.max) + 1
    val raw = s"${path}_incoming/del$gen-$seq-raw"
    val stamped = fresh.withColumn(GenCol, lit(gen))
    stamped.write.mode("overwrite").parquet(raw)
    // the schema is in hand — re-reads of the staged debt skip footer
    // inference
    val rawDf = spark.read.schema(nullableCopy(stamped.schema)).parquet(raw)
    val n = rawDf.count()
    if (n > 0) {
      val shards = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
      val rawParts = f.listStatus(new Path(raw))
        .filter(s => s.getPath.getName.startsWith("part-") &&
          s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath).sortBy(_.getName)
      // the staged write usually already holds the right shard count
      // (AQE coalesces a takedown-sized debt to one file) — then the
      // parts rename in directly, skipping a full second
      // read→shuffle→write of the debt; only a mismatched layout pays
      // the normalizing reshard
      val parts: Array[Path] =
        if (rawParts.length == shards) rawParts
        else {
          val staging = s"${path}_incoming/del$gen-$seq"
          rawDf.repartition(shards)
            .write.mode("overwrite").parquet(staging)
          val ps = f.listStatus(new Path(staging))
            .filter(_.getPath.getName.startsWith("part-"))
            .map(_.getPath).sortBy(_.getName)
          ps
        }
      f.mkdirs(new Path(dDir))
      val landed = parts.zipWithIndex.map { case (p, k) =>
        val dst = new Path(dDir, s"del$gen-${seq + k}.parquet")
        require(f.rename(p, dst),
          s"writeTombstones: $p -> $dst failed")
        dst.getName
      }
      f.delete(new Path(s"${path}_incoming/del$gen-$seq"), true)
      landedNames = landed.toSeq
      // a pointered table's live tombstone set advances by commit —
      // an O(landed-files) delta marker, not a full-state rewrite —
      // unless the caller asked to fold the names into its OWN commit
      if (commit)
        readCommit(spark, path).foreach { c =>
          commitAdvance(spark, path, c, addDeletes = landedNames)
        }
    }
    f.delete(new Path(raw), true)
    (n, landedNames)
  }

  /** Point lookup through the Bloom membership manifest
    * ([[Layout.writeBloomManifest]]): resolve which files COULD hold
    * any of `values` (a manifest-sized read probing each file's sketch
    * — "false ⇒ definitely absent", so skipped files are provably
    * clean), read only those minus the delete debt, and RE-APPLY the
    * exact `IN` predicate — over-selection from Bloom false positives
    * is harmless. Files absent from the manifest (appended after it
    * was built) are treated as KEPT: staleness degrades the skip rate,
    * never results. This is the takedown-verification primitive at
    * 100 TB — "which files still hold these checksums" costs a
    * manifest read plus the few files that might, not a table pass.
    * `values` is a literal handful (each adds one probe per manifest
    * row); for retraction-list scale use [[deleteMatching]]'s join. */
  def pointLookup(spark: SparkSession, path: String, keyCol: String,
                  values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "pointLookup needs at least one value")
    val bDir = s"${path}_bloom_$keyCol"
    require(fs(spark, path).exists(new Path(bDir)),
      s"pointLookup: no Bloom manifest at $bDir — run " +
        s"Layout.writeBloomManifest(spark, path, \"$keyCol\") first")
    val bm = spark.read.parquet(bDir)
    val schema = tableSchema(spark, path)
    // probe hashes computed THROUGH Spark's own xxhash64 (one 1-row
    // job), each literal TRY_CAST to the key column's type first — the
    // build side hashed xxhash64(col(keyCol)), and xxhash64 is
    // type-sensitive (an Int 3 and a Long 3 hash differently), so an
    // uncast probe would miss every file and silently return empty.
    // try_cast, not cast: a probe the key's type cannot REPRESENT
    // (a Long 2^40 against an Int key) can never be present — it
    // drops, instead of raising CAST_OVERFLOW under ANSI or silently
    // wrapping to match the WRONG rows with ANSI off
    val casted = values.map(v => lit(v).try_cast(schema(keyCol).dataType))
    val probeRow = spark.range(1)
      .select(casted.flatMap(c => Seq(c, xxhash64(c))): _*).head()
    val surviving = values.indices.filter(i => !probeRow.isNullAt(2 * i))
    if (surviving.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val typed = surviving.map(i => casted(i))
    val hashes = surviving.map(i => probeRow.getLong(2 * i + 1))
    // ONE manifest-sized job answers both "which files are manifested"
    // and "which might hold a probed key"
    val probed = bm.select(col("__file"),
        graft.expressions.GraftExpressions
          .bloomMightContainAny(col("__bloom"), hashes).as("__might"))
      .collect()
    val manifested = probed.map(r => fileName(r.getString(0))).toSet
    val kept = probed.filter(r => r.getAs[Any]("__might") == true)
      .map(r => fileName(r.getString(0))).toSet
    val files = dataFilePaths(spark, path).map(_.toString)
      .filter(f => kept.contains(fileName(f)) ||
        !manifested.contains(fileName(f)))
    readMinus(spark, files, schema, tombstoneFrame(spark, path),
      tombstoneBytes(spark, path) <= broadcastTombstoneBytes)
      // the re-applied exact predicate uses the SAME casts the hashes
      // rode, so probe typing can never split the two answers
      .filter(col(keyCol).isin(typed: _*))
  }

  /** Streamed takedown feed: retraction keys arriving through
    * `readStream` land as tombstones per micro-batch (AvailableNow
    * drain — returns when every available request is recorded).
    * `foreachBatch`'s at-least-once replay contract is safe WITHOUT
    * generation-keyed files here because deletes are content-idempotent
    * by construction: [[deleteMatching]] anti-joins the already-recorded
    * tombstones, so a replayed batch records nothing (spec'd) — the
    * effect, not the file set, is exactly-once. Each batch costs one
    * pass over the table's key column; batch takedown cadences
    * accordingly (the checkpoint under `<path>_del_ckpt` carries
    * offsets, so a slow cadence never re-reads old requests). */
  def deleteMatchingStream(keys: DataFrame, path: String,
                           keyCol: String): Unit = {
    val spark = keys.sparkSession
    val q = keys.writeStream
      .option("checkpointLocation", s"${path}_del_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        deleteMatching(spark, path, batch, keyCol); ()
      }
      .start()
    q.awaitTermination()
  }

  /** The LOCKED public append surface — [[Layout.appendZordered]]
    * serialized through [[withTableLock]] like every other mutator.
    * The unlocked Layout form stays for lock-HOLDING callers (the
    * lease is not reentrant): two unlocked appends racing can read the
    * same before-listing and mis-slice the manifest, and an unlocked
    * append racing a locked [[deleteWhere]] can tombstone rows in
    * files a replay then rewrites. Route concurrent ingest here. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
             cols: Seq[String], bits: Int = 12,
             partitions: Int = 0): Unit =
    withTableLock(spark, path) {
      Layout.appendZordered(spark, path, batch, cols, bits, partitions)
    }

  /** The LOCKED generation append — [[Layout.appendGeneration]] under
    * the table lease. Two concurrent unlocked generation appends that
    * both read [[currentGen]] land the SAME id, and the replay-delete
    * silently destroys the other writer's rows; the lock is what makes
    * that impossible. See [[append]] for the discipline. */
  def appendAt(spark: SparkSession, path: String, batch: DataFrame,
               cols: Seq[String], gen: Long, bits: Int = 12,
               partitions: Int = 0): Unit =
    withTableLock(spark, path) {
      Layout.appendGeneration(spark, path, batch, cols, bits,
        partitions, gen)
    }

  /** Sidecar suffixes a lakehouse table hangs off its path — used to
    * tell tables from their own metadata dirs during discovery. */
  private val sidecarSuffixes = Seq("_deletes", "_manifest", "_commit",
    "_lock", "_incoming", "_rebuild", "_retain_rebuild",
    "_retain_deletes", "_pre_compact", "_pre_rebuild", "_del_ckpt",
    "_upsert_ckpt", "_apply_ckpt", "_ckpt", "_epoch", "_epoch_next",
    "_epoch_tmp")

  /** The CATALOG surface: one row per lakehouse table found directly
    * under `root` — path, commit version (−1 for a legacy table),
    * epoch, snapshot floor, current generation, live file/byte counts,
    * delete debt, and the manifest-read layout health (null without a
    * manifest; its columns are recovered from the manifest's own
    * `__min_<col>` schema, so no cols argument is needed). A directory
    * is a table when it is not itself a sidecar and carries at least
    * one lakehouse sidecar (`_commit`, `_manifest`, `_deletes`,
    * `_epoch`, `_lock`, or a `_bloom_*`); plain parquet dirs stay out.
    * Day-N at fleet scale operates tables by DISCOVERY, not by
    * remembering raw paths — this is the list verb's engine (CLI
    * `lake-catalog <root>`). Cost: table-count-bounded driver listing
    * plus one debt-sized count per table. */
  def describeTables(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, root)
    val rp = new Path(root)
    val dirs =
      if (!f.exists(rp)) Seq.empty[Path]
      else f.listStatus(rp).toSeq.filter(_.isDirectory).map(_.getPath)
    val names = dirs.map(_.getName).toSet
    val tables = dirs.filter { p =>
      val n = p.getName
      // a dir is a bloom SIDECAR only when some existing sibling is
      // its base table (the same discipline as the suffix sidecars) —
      // a genuine table merely NAMED like one (`accounts_bloom_test`)
      // stays a table
      val isSidecar = sidecarSuffixes.exists(sfx => n.endsWith(sfx) &&
        names.contains(n.stripSuffix(sfx))) ||
        names.exists(m => m != n && n.startsWith(m + "_bloom_"))
      val hasSidecar = sidecarSuffixes.exists(sfx =>
        names.contains(n + sfx)) ||
        names.exists(m => m.startsWith(n + "_bloom_"))
      !isSidecar && hasSidecar
    }
    val rows = tables.map { p =>
      val path = p.toString
      val (epoch, floor) = epochAndFloor(spark, path)
      val data = dataFilePaths(spark, path)
      val dels = deleteFilePaths(spark, path)
      val bytes = data.map(x => f.getFileStatus(x).getLen).sum
      val mDir = s"${path}_manifest"
      val health: Option[Layout.LayoutHealth] =
        if (!f.exists(new Path(mDir)) ||
            parquetFiles(spark, mDir).isEmpty) None
        else {
          val m = spark.read.parquet(mDir)
          val cols = m.columns.filter(_.startsWith("__min_"))
            .map(_.stripPrefix("__min_")).toSeq
          if (cols.isEmpty) None
          else Some(Layout.layoutHealth(m, cols))
        }
      (p.getName, path,
        readCommit(spark, path).map(_.version).getOrElse(-1L),
        epoch, floor, currentGen(spark, path), data.size.toLong,
        dels.size.toLong, deleteDebt(spark, path), bytes,
        health.map(_.files), health.map(_.pointCost))
    }
    rows.toDF("table", "path", "version", "epoch", "floor",
      "current_gen", "data_files", "delete_files", "delete_debt",
      "data_bytes", "manifest_files", "point_cost")
  }

  /** Additive schema evolution — the EXPLICIT opt-in the append-time
    * drift guard points at: widen the table's committed schema to
    * `wider` (a superset of the resident schema; drops and retypes
    * still raise). Metadata-only — no data pass, no rewrite: parquet
    * is name-addressed and every scan reads with the committed schema,
    * so resident files null-fill the new columns from the next query
    * on, and old-generation snapshots and the change feed answer with
    * the evolved shape too (oracled). Pointerizes a legacy table (the
    * schema has to live somewhere atomic). Single-writer. */
  def evolveSchema(spark: SparkSession, path: String,
                   wider: org.apache.spark.sql.types.StructType): Unit =
    withTableLock(spark, path) {
      evolveSchemaBody(spark, path, wider)
    }

  /** UNLOCKED internal form of [[evolveSchema]] for callers already
    * holding the (non-reentrant) table lock — [[applyChangesByKey]]'s
    * opt-in auto-evolve rides this inside its own hold. */
  private[core] def evolveSchemaBody(spark: SparkSession, path: String,
      wider: org.apache.spark.sql.types.StructType): Unit = {
    migrateToCommit(spark, path)
    val resident = tableSchema(spark, path)
    Layout.requireSameSchema(resident, wider, "evolveSchema",
      allowAdditive = true)
    val have = resident.fieldNames.toSet
    val added = wider.fields.filterNot(f => have.contains(f.name))
    if (added.nonEmpty) {
      val evolved = org.apache.spark.sql.types.StructType(
        resident.fields ++ added)
      val c = readCommit(spark, path).get
      commitAdvance(spark, path, c, schemaJson = Some(evolved.json))
      ()
    }
  }

  /** [[append]] with additive evolution in one call: widen the schema
    * to the batch's (raises on drops/retypes like [[evolveSchema]]),
    * then land the batch. Two lock holds (the lease is not
    * reentrant) — the window between them is only ever another
    * writer's complete mutation. Generation-managed tables evolve the
    * same way: [[evolveSchema]] then [[appendAt]]. */
  def appendEvolving(spark: SparkSession, path: String,
                     batch: DataFrame, cols: Seq[String],
                     bits: Int = 12, partitions: Int = 0): Unit = {
    evolveSchema(spark, path, batch.schema)
    append(spark, path, batch, cols, bits, partitions)
  }

  /** Keyed last-writer-wins merge, merge-on-read: tombstone the live
    * rows whose key appears in `updates`, then land `updates` as a new
    * z-ordered generation — history is never rewritten, one pass over
    * the table (the delete) plus one over the batch (the append).
    * `updates` must be key-unique (raises otherwise — two versions of
    * a key in one batch have no defined winner). On a
    * generation-managed table the batch lands as generation
    * max+1 (snapshot-addressable); otherwise as a plain append.
    * Single-writer: the whole delete+append rides ONE
    * [[withTableLock]] hold, so two concurrent upserts serialize —
    * each reads [[currentGen]] after the other's append landed and
    * claims its own generation, instead of both landing the same id
    * and the replay-delete destroying one batch. */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
                  keyCol: String, cols: Seq[String], bits: Int = 12,
                  partitions: Int = 0): Unit =
    withTableLock(spark, path) {
      // schema drift raises BEFORE the retraction half mutates; the
      // proven schema rides into the retraction so it never re-infers
      val tSchema =
        if (hasSchemaContract(spark, path)) Some(tableSchema(spark, path))
        else None
      tSchema.foreach(Layout.requireSameSchema(_, updates.schema,
        "upsertByKey"))
      val dup = updates.groupBy(col(keyCol)).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"upsertByKey: updates carry duplicate $keyCol=${dup.headOption
          .map(_.get(0)).orNull} — last-writer-wins needs one row per key")
      // the retraction DEFERS its commit: the landed tombstone names
      // ride the append's delta marker — ONE commit per upsert (and an
      // atomic one: a crash between the halves leaves only vacuum-aged
      // orphans, never a deleted-but-not-replaced visible state)
      val (_, landedDels) = deleteMatchingIn(spark, path,
        dataFilePaths(spark, path).map(_.toString),
        updates.select(keyCol), keyCol, schemaHint = tSchema,
        commit = false)
      val gen = currentGen(spark, path)
      if (gen >= 0)
        Layout.appendGeneration(spark, path, updates, cols, bits,
          partitions, gen + 1, extraAddDeletes = landedDels)
      else Layout.appendZordered(spark, path, updates, cols, bits,
        partitions, extraAddDeletes = landedDels)
    }

  /** Streamed keyed upserts — the CDC-consumption form: each
    * micro-batch of key-unique updates tombstones the prior versions
    * and lands as ONE generation, exactly-once under `foreachBatch`'s
    * at-least-once replays because both halves are replay-safe — the
    * delete half is content-idempotent AND excludes the batch's own
    * generation files (a replay must not tombstone what its first
    * attempt landed: those files are rewritten under the same
    * deterministic names), and the append half is
    * [[Layout.appendGeneration]]'s rewrite-your-own-files discipline.
    * Generations are `base + micro-batch id`, with `base` pinned to a
    * file under the checkpoint on first use so restarts map replayed
    * ids to the SAME generations. AvailableNow drain. */
  def upsertByKeyStream(updates: DataFrame, path: String, keyCol: String,
                        cols: Seq[String], bits: Int = 12,
                        partitions: Int = 0): Unit = {
    val spark = updates.sparkSession
    val ckpt = s"${path}_upsert_ckpt"
    val f = fs(spark, path)
    val baseFile = new Path(ckpt, "graft_gen_base")
    val base: Long =
      if (f.exists(baseFile)) {
        val in = f.open(baseFile)
        try in.readLong() finally in.close()
      } else {
        val b = currentGen(spark, path) + 1
        f.mkdirs(new Path(ckpt))
        val out = f.create(baseFile, false)
        try out.writeLong(b) finally out.close()
        b
      }
    val q = updates.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(spark, path, batch, keyCol, cols, bits, partitions,
          base + id)
      }
      .start()
    q.awaitTermination()
  }

  /** One upsert micro-batch at a pinned generation — the replay-safe
    * body under [[upsertByKeyStream]] (exposed for direct redelivery
    * testing): tombstone prior versions from every file EXCEPT the
    * target generation's own, then land the batch as that generation. */
  private[graft] def upsertBatch(spark: SparkSession, path: String,
                                 batch: DataFrame, keyCol: String,
                                 cols: Seq[String], bits: Int,
                                 partitions: Int, gen: Long): Unit =
    withTableLock(spark, path) {
      val tSchema =
        if (hasSchemaContract(spark, path)) Some(tableSchema(spark, path))
        else None
      tSchema.foreach(Layout.requireSameSchema(_, batch.schema,
        "upsertBatch"))
      val dup = batch.groupBy(col(keyCol)).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"upsertBatch: generation $gen carries duplicate " +
          s"$keyCol=${dup.headOption.map(_.get(0)).orNull}")
      val older = dataFilePaths(spark, path)
        .filter(p => genOf(p.getName) != gen).map(_.toString)
      // deferred-commit fusion: one delta marker per micro-batch
      // carrying both the tombstone adds and the data adds
      val (_, landedDels) = deleteMatchingIn(spark, path, older,
        batch.select(keyCol), keyCol, schemaHint = tSchema,
        commit = false)
      Layout.appendGeneration(spark, path, batch, cols, bits, partitions,
        gen, extraAddDeletes = landedDels)
    }

  /** The table as of generation `gen`: data files born at or before it,
    * minus tombstones stamped at or before it. Requires a
    * generation-managed layout ([[Layout.appendGeneration]] names carry
    * the generation); base `part-*` files count as generation −1 so
    * `scanAsOf(-1)` is the pre-append base. A manifest is not consulted
    * — snapshots are for audits and diffs, not hot serving.
    * Raises when `gen` predates the [[snapshotFloor]] (that history
    * was expired by [[compactRetaining]]); pass the epoch captured
    * with the generation as `asOfEpoch` to also raise when a full
    * [[compact]] collapsed the namespace in between (−1 skips the
    * epoch check — the generation floor still applies). */
  def scanAsOf(spark: SparkSession, path: String, gen: Long,
               asOfEpoch: Long = -1L): DataFrame = {
    requireEpoch(spark, path, asOfEpoch, "scanAsOf")
    requireAboveFloor(spark, path, gen, "scanAsOf")
    val files = dataFilePaths(spark, path)
      .filter(p => genOf(p.getName) <= gen).map(_.toString)
    val schema = tableSchema(spark, path)
    readMinus(spark, files, schema, tombstoneFrame(spark, path, gen),
      tombstoneBytes(spark, path) <= broadcastTombstoneBytes)
  }

  /** Change data feed between two snapshots — `(fromGen, toGen]`, net
    * semantics: one frame of the table's rows tagged `__op =
    * insert | delete`, such that applying it to the `fromGen` snapshot
    * reproduces the `toGen` snapshot exactly (spec'd as set equality).
    * This is the incremental-sync primitive: a downstream replica
    * applies the delta instead of re-reading the table.
    *
    * Cost is WINDOW-sized, never table-sized: inserts are the rows of
    * files born in the window minus tombstones stamped at or before
    * `toGen` (an older file's rows can never BECOME live later, so old
    * files are never read); deletes are the window's tombstones that
    * address PRE-window files, joined back to their row content (only
    * those files are read — and a (file, pos) lives in at most one
    * tombstone file by construction, so "was it already dead at
    * fromGen" needs no second pass). A row both born and deleted
    * inside the window appears as neither — net, like any replica
    * would want. Requires a generation-managed layout.
    *
    * THE OPEN-WINDOW RULE (the consume contract): deletes are stamped
    * with the table's CURRENT generation, so the window ending at the
    * open (latest) generation can still accumulate deletes after a
    * replica read it; every window ending at a CLOSED generation
    * (toGen < currentGen) is final. A replica therefore either
    * consumes closed windows only, or re-pulls its last window after
    * it closes — safe, because feeds are replay-idempotent through
    * [[applyChangesByKey]] (retractions anti-join what the replica
    * already recorded). [[upsertByKey]] keeps the discipline
    * automatically: its delete (stamped g) and its append (landing
    * g+1, which CLOSES g) are one lock-held mutation, so any
    * quiescent read of a closed window sees both halves.
    *
    * Feed windows must not span a compaction — generation ids are
    * reused after one, so a stale window would silently address the
    * WRONG data. The contract is enforced, not honor-system: a window
    * reaching below the [[snapshotFloor]] raises unconditionally, and
    * a replica that captured the [[compactEpoch]] alongside its
    * `fromGen` passes it as `asOfEpoch` to be told LOUDLY when a full
    * [[compact]] landed in between (−1 skips the epoch check for
    * same-process callers that know no compact ran). */
  def changesBetween(spark: SparkSession, path: String,
                     fromGen: Long, toGen: Long,
                     asOfEpoch: Long = -1L): DataFrame = {
    require(fromGen <= toGen,
      s"changesBetween: need fromGen <= toGen, got ($fromGen, $toGen]")
    requireEpoch(spark, path, asOfEpoch, "changesBetween")
    requireAboveFloor(spark, path, fromGen, "changesBetween")
    val schema = tableSchema(spark, path)
    val bc = tombstoneBytes(spark, path) <= broadcastTombstoneBytes
    val allData = dataFilePaths(spark, path)
    val newFiles = allData
      .filter(p => genOf(p.getName) > fromGen && genOf(p.getName) <= toGen)
      .map(_.toString)
    val inserts = readMinus(spark, newFiles, schema,
      tombstoneFrame(spark, path, toGen), bc)
    val windowTs = {
      val files = deleteFilePaths(spark, path)
        .filter { p =>
          val g = delGenOf(p.getName)
          g > fromGen && g <= toGen
        }.map(_.toString)
      if (files.isEmpty) None
      else Some(spark.read.schema(TombstoneSchema).parquet(files: _*)
        .filter(col(GenCol) > fromGen && col(GenCol) <= toGen)
        .select(FileCol, PosCol))
    }
    val oldFiles = allData
      .filter(p => genOf(p.getName) <= fromGen).map(_.toString)
    val deletes = windowTs match {
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(ts) =>
        val touched = ts.select(FileCol).distinct()
          .collect().map(_.getString(0)).toSet
        val hit = oldFiles.filter(f => touched.contains(fileName(f)))
        if (hit.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else {
          val keyed = spark.read.schema(schema).parquet(hit: _*)
            .withColumn(FileCol,
              element_at(split(col("_metadata.file_path"), "/"), -1))
            .withColumn(PosCol, col("_metadata.row_index"))
          val side = if (bc) broadcast(ts) else ts
          keyed.join(side, Seq(FileCol, PosCol), "left_semi")
            .drop(FileCol, PosCol)
        }
    }
    inserts.withColumn("__op", lit("insert"))
      .unionByName(deletes.withColumn("__op", lit("delete")))
  }

  /** Apply a [[changesBetween]] feed to a KEYED replica table — the
    * consumer half of the CDC loop, as one operator: the feed's
    * `delete` rows retract their keys (content-idempotent — a replayed
    * feed retracts nothing new), the `insert` rows land as one new
    * generation (the replica IS a lakehouse table, so scans, point
    * lookups, snapshots, and compaction all compose on it). Keys must
    * be unique in the source — the replica enforces it per feed with a
    * loud raise, like [[upsertByKey]]. A key UPDATED across the window
    * arrives as delete(old)+insert(new) of the same key; the
    * retraction half applies first, so last-writer-wins holds. The
    * retraction covers the feed's delete keys AND its insert keys
    * (an upsert, not a blind append) — that is what makes the apply
    * REPLAY-IDEMPOTENT in effect: re-applying the same feed retracts
    * the first application's landed rows and lands them again, so
    * counts never double, and re-pulling a still-open window (the
    * open-window rule on [[changesBetween]]) refreshes rather than
    * duplicates. Cost: one pass over the replica's key column (the
    * retraction join) plus one over the feed — never over the source
    * table; that is the entire point of consuming the feed.
    * Single-writer on the replica. Oracled: bootstrap + feed ≡ a
    * direct scan of the source's target snapshot, hash-for-hash. */
  private def feedPtrDir(outDir: String) =
    s"${outDir.stripSuffix("/")}/_ptr"

  private def readFeedMarker(f: FileSystem,
                             dir: Path): Option[(Long, Long, Long)] = {
    if (!f.exists(dir)) return None
    val markers = f.listStatus(dir).toSeq.filter { s =>
      val n = s.getPath.getName
      val body = n.stripPrefix("v").stripSuffix(".json")
      s.isFile && n.startsWith("v") && n.endsWith(".json") &&
        body.nonEmpty && body.forall(_.isDigit)
    }
    if (markers.isEmpty) return None
    val latest = markers.maxBy(s =>
      s.getPath.getName.stripPrefix("v").stripSuffix(".json").toLong)
    val m = readMarkerJson(f, latest.getPath)
    Some((latest.getPath.getName.stripPrefix("v").stripSuffix(".json")
      .toLong, markerNum(m, "epoch", 0L), markerNum(m, "gen", -1L)))
  }

  /** The PRODUCER half of the streaming CDC relay — the watermarked,
    * exactly-once twin of what the runbook did by hand with
    * `--changes from,to --feed-out dir`: land every newly CLOSED
    * generation window of `path`'s change feed as one parquet dir
    * `outDir/win<from>_<to>` and advance a tiny watermark marker
    * (`outDir/_ptr/v<N>.json`, carrying the consumed (epoch, gen)),
    * so a cron-driven producer loop needs no memory of its own.
    * Consumers stream the landed windows with
    * `spark.readStream.schema(s).parquet(s"$outDir/win*")` into
    * [[applyChangesByKeyStream]] / [[graft.llm.FeedConsumer]] — the
    * relay is exactly-once END TO END.
    *
    * ONE WINDOW PER DRAIN: windows must APPLY in order. The feed rows
    * carry no ordering stamp, so a consumer that lets a file stream
    * merge several backlogged windows into one micro-batch loses
    * cross-window key ordering — a key inserted in window N and
    * deleted in window N+1 would re-land (the batch's insert row wins
    * under the upsert treatment, and the shape is indistinguishable
    * from a legitimate single-window update, which is ALSO
    * delete+insert of one key — no loud guard can tell them apart).
    * Run the relay as land → drain (AvailableNow) → land → drain, or
    * apply each landed window one-shot ([[applyChangesByKey]] on
    * `win<from>_<to>`); the oracle gate `layout_feed_relay` pins the
    * per-window loop. (A `__gen`-stamped feed making merged drains
    * order-aware is the documented follow-up.)
    *
    * Semantics mirror the tracked index consumers:
    *  - default `toGen` stops at the newest CLOSED generation
    *    (tombstones stamp the open one — landing it early would
    *    freeze a window late deletes still mutate); an explicit
    *    `toGen` may name the open gen on a quiesced source.
    *  - the first call passes `initFromGen` (the generation consumers
    *    bootstrapped their snapshot at) and writes the init marker —
    *    later calls need nothing.
    *  - a replayed call (nothing new closed) returns None; a window
    *    ending below the watermark raises.
    *  - the window STAGES and renames in atomically under a
    *    DETERMINISTIC name; a crash between the rename and the
    *    marker is healed on replay by reusing the landed dir (its
    *    content is a pure function of (epoch, window)) and just
    *    advancing the marker — consumers can never observe a
    *    half-written or duplicated window.
    *  - a source compact/rollback since the init epoch raises through
    *    [[changesBetween]]'s epoch guard — cross-epoch windows are
    *    unanswerable; re-bootstrap the relay.
    * Producer-side single-writer on `outDir` (the table lease on
    * `<outDir>_lock`); the SOURCE table is only read, never locked.
    * Cost per call: one window-sized [[changesBetween]] write plus
    * O(1) marker IO — at 100 TB the landed window is delta-sized,
    * never table-sized. Returns the landed (fromGen, toGen]. */
  def landChangesTracked(spark: SparkSession, path: String,
                         outDir: String, toGen: Long = -1L,
                         initFromGen: Long = Long.MinValue)
      : Option[(Long, Long)] =
    withTableLock(spark, outDir.stripSuffix("/")) {
      val f = fs(spark, outDir)
      val pd = new Path(feedPtrDir(outDir))
      val (epoch, from, nextVersion) = readFeedMarker(f, pd) match {
        case Some((v, e, g)) => (e, g, v + 1)
        case None =>
          require(initFromGen >= -1L,
            s"landChangesTracked: $outDir has no watermark yet — the " +
              "first call must pass initFromGen (the generation " +
              "consumers bootstrapped their snapshot at)")
          val (e, _) = epochAndFloor(spark, path)
          markerRenameIn(f, pd, 1L, ".json", MiniJson.write(Map(
            "version" -> 1L, "epoch" -> e, "gen" -> initFromGen)))
          (e, initFromGen, 2L)
      }
      val cur =
        if (toGen >= 0L) toGen
        else math.max(from, currentGen(spark, path) - 1)
      if (cur == from) None
      else {
        require(cur > from,
          s"landChangesTracked: window through gen $cur is OUT OF " +
            s"ORDER — the relay already landed through gen $from")
        val base = outDir.stripSuffix("/")
        val dst = new Path(s"$base/win${from}_$cur")
        if (!f.exists(dst)) {
          val staging = s"$base/_staging/win${from}_$cur"
          changesBetween(spark, path, from, cur, asOfEpoch = epoch)
            .write.mode("overwrite").parquet(staging)
          require(f.rename(new Path(staging), dst),
            s"landChangesTracked: $staging -> $dst failed")
        }
        markerRenameIn(f, pd, nextVersion, ".json", MiniJson.write(Map(
          "version" -> nextVersion, "epoch" -> epoch, "gen" -> cur)))
        Some((from, cur))
      }
    }

  def applyChangesByKey(spark: SparkSession, replicaPath: String,
                        feed: DataFrame, keyCol: String,
                        cols: Seq[String], bits: Int = 12,
                        partitions: Int = 0,
                        evolve: Boolean = false): Unit =
    withTableLock(spark, replicaPath) {
      val cached = feed.cache()
      try {
        val inserts = cached.filter(col("__op") === "insert").drop("__op")
        // `evolve = true`: FOLLOW an additively-evolved source without
        // operator intervention — widen the replica to the feed's
        // shape first (drops/retypes still raise, and the evolution
        // commits BEFORE the retraction half, so a refused feed has
        // mutated nothing). Default stays the loud drift raise.
        val tSchema: Option[org.apache.spark.sql.types.StructType] =
          if (hasSchemaContract(spark, replicaPath)) {
            if (evolve) {
              evolveSchemaBody(spark, replicaPath, inserts.schema)
              // post-evolution the commit carries the widened schema —
              // resolving it is a marker read, not a footer job
              Some(tableSchema(spark, replicaPath))
            } else {
              val s = tableSchema(spark, replicaPath)
              Layout.requireSameSchema(s, inserts.schema,
                "applyChangesByKey")
              Some(s)
            }
          } else None
        val dup = inserts.groupBy(col(keyCol)).count()
          .filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"applyChangesByKey: the feed's inserts carry duplicate " +
            s"$keyCol=${dup.headOption.map(_.get(0)).orNull} — a keyed " +
            "replica needs a key-unique source")
        // deferred-commit fusion (see [[upsertByKey]]): the retraction's
        // tombstone names ride the append's marker — one atomic commit
        val (_, landedDels) = deleteMatchingIn(spark, replicaPath,
          dataFilePaths(spark, replicaPath).map(_.toString),
          cached.select(col(keyCol)), keyCol, schemaHint = tSchema,
          commit = false)
        val gen = currentGen(spark, replicaPath)
        if (gen >= 0)
          Layout.appendGeneration(spark, replicaPath, inserts, cols,
            bits, partitions, gen + 1, extraAddDeletes = landedDels)
        else Layout.appendZordered(spark, replicaPath, inserts, cols,
          bits, partitions, extraAddDeletes = landedDels)
      } finally { cached.unpersist(); () }
    }

  /** Streamed [[applyChangesByKey]] — the replica's live consumption
    * form: feed batches (tagged `__op` rows, e.g. the parquet dirs a
    * producer's [[changesBetween]] lands) arrive through `readStream`
    * and each micro-batch applies as one retract+land. Exactly-once
    * under `foreachBatch`'s at-least-once replays by the
    * [[upsertByKeyStream]] discipline: the insert half rides
    * generation `base + micro-batch id` (base pinned under the
    * checkpoint at `<replicaPath>_apply_ckpt`, so restarts map
    * replayed ids to the SAME generations and rewrite exactly their
    * own files), and the delete half is content-idempotent AND
    * excludes the batch's own generation files — a replayed update
    * batch must not tombstone the very rows its first attempt landed.
    * AvailableNow drain. */
  def applyChangesByKeyStream(feed: DataFrame, replicaPath: String,
                              keyCol: String, cols: Seq[String],
                              bits: Int = 12,
                              partitions: Int = 0,
                              evolve: Boolean = false): Unit = {
    val spark = feed.sparkSession
    val ckpt = s"${replicaPath}_apply_ckpt"
    val f = fs(spark, replicaPath)
    val baseFile = new Path(ckpt, "graft_gen_base")
    val base: Long =
      if (f.exists(baseFile)) {
        val in = f.open(baseFile)
        try in.readLong() finally in.close()
      } else {
        val b = currentGen(spark, replicaPath) + 1
        f.mkdirs(new Path(ckpt))
        val out = f.create(baseFile, false)
        try out.writeLong(b) finally out.close()
        b
      }
    val q = feed.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, replicaPath, batch, keyCol, cols, bits,
          partitions, base + id, evolve)
      }
      .start()
    q.awaitTermination()
  }

  /** One feed micro-batch at a pinned generation — the replay-safe
    * body under [[applyChangesByKeyStream]] (exposed for direct
    * redelivery testing). */
  private[graft] def applyBatch(spark: SparkSession, replicaPath: String,
                                batch: DataFrame, keyCol: String,
                                cols: Seq[String], bits: Int,
                                partitions: Int, gen: Long,
                                evolve: Boolean = false): Unit =
    withTableLock(spark, replicaPath) {
      val inserts = batch.filter(col("__op") === "insert").drop("__op")
      if (hasSchemaContract(spark, replicaPath)) {
        if (evolve) evolveSchemaBody(spark, replicaPath, inserts.schema)
        else Layout.requireSameSchema(tableSchema(spark, replicaPath),
          inserts.schema, "applyBatch")
      }
      val dup = inserts.groupBy(col(keyCol)).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"applyBatch: generation $gen's feed inserts carry duplicate " +
          s"$keyCol=${dup.headOption.map(_.get(0)).orNull} — a keyed " +
          "replica needs a key-unique source")
      // retract delete keys AND insert keys (the upsert treatment,
      // like the one-shot form) from every file EXCEPT the pinned
      // generation's own — a replay must not tombstone what its first
      // attempt landed (those files are rewritten in place)
      val older = dataFilePaths(spark, replicaPath)
        .filter(p => genOf(p.getName) != gen).map(_.toString)
      // deferred-commit fusion: one delta marker per micro-batch
      val (_, landedDels) = deleteMatchingIn(spark, replicaPath, older,
        batch.select(col(keyCol)), keyCol, commit = false)
      Layout.appendGeneration(spark, replicaPath, inserts, cols, bits,
        partitions, gen, extraAddDeletes = landedDels)
    }

  /** Make the `gen` snapshot permanent: delete data files, manifest
    * slices (min/max AND Bloom), and tombstone files stamped AFTER it.
    * File-system arithmetic only — never a data pass. The next
    * [[Layout.appendGeneration]] may reuse the rolled-back ids (each
    * rewrites exactly its own files, so reuse is safe) — which makes a
    * rollback as HISTORY-COLLAPSING as a [[compact]]: any window a
    * replica captured before it would silently address the re-appended
    * data under the reused ids, so the [[compactEpoch]] bumps here too
    * (BEFORE the deletions — a crash leaves replicas raising
    * spuriously, never reading wrong deltas). Single-writer
    * ([[withTableLock]]); raises below the [[snapshotFloor]], and on
    * an `asOfEpoch` mismatch when the caller passes the epoch its
    * target generation was captured at. */
  def rollback(spark: SparkSession, path: String, gen: Long,
               asOfEpoch: Long = -1L): Unit =
    withTableLock(spark, path) {
      requireEpoch(spark, path, asOfEpoch, "rollback")
      requireAboveFloor(spark, path, gen, "rollback")
      val f = fs(spark, path)
      // the epoch bump and the live-set shrink ride ONE commit on a
      // pointered table — and the rolled-back files STAY on disk for
      // [[vacuum]]'s grace window (a scan that resolved the
      // pre-rollback commit finishes unharmed): a pointered re-append
      // of the same generation lands under commit-version-salted
      // names ([[Layout.appendGeneration]]), so the dead files never
      // collide with the replacement's rename-in. Legacy tables keep
      // the immediate-delete form — their generation names ARE
      // deterministic, so leaving dead files would collide
      readCommit(spark, path) match {
        case Some(c) =>
          commitAdvance(spark, path, c,
            removeData = c.data.filter(n => genOf(n) > gen),
            removeDeletes = c.deletes.filter(n => delGenOf(n) > gen),
            epoch = c.epoch + 1)
          ()
        case None =>
          val (epoch, floor) = epochAndFloor(spark, path)
          writeEpochFloor(spark, path, epoch + 1, floor)
          parquetFiles(spark, path)
            .filter(p => genOf(p.getName) > gen)
            .foreach(p => f.delete(p, false))
          parquetFiles(spark, deletesDir(path))
            .filter(p => delGenOf(p.getName) > gen)
            .foreach(p => f.delete(p, false))
      }
      def genSlicesAfter(dir: String): Seq[Path] =
        parquetFiles(spark, dir).filter { p =>
          val digits = p.getName.stripPrefix("gen").stripSuffix(".parquet")
          p.getName.startsWith("gen") && digits.nonEmpty &&
            digits.forall(_.isDigit) && digits.toLong > gen
        }
      genSlicesAfter(s"${path}_manifest").foreach(p => f.delete(p, false))
      bloomDirsOf(spark, path)
        .foreach(b => genSlicesAfter(b.toString)
          .foreach(p => f.delete(p, false)))
    }

  /** The table's Bloom membership manifest directories
    * (`<path>_bloom_<keyCol>`), with their key column names. */
  private[core] def bloomDirsOf(spark: SparkSession,
                                path: String): Seq[Path] = {
    val f = fs(spark, path)
    val parent = new Path(path).getParent
    val prefix = s"${new Path(path).getName}_bloom_"
    if (parent == null || !f.exists(parent)) Seq.empty
    else f.listStatus(parent).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(prefix))
  }

  /** Fold the debt in: rewrite the LIVE rows as one fresh z-ordered
    * BASE alongside the old files, then flip the table's version
    * pointer in ONE atomic commit (data set, empty tombstone set,
    * epoch+1) — never a directory swap. THE one full-table pass in
    * the lifecycle — schedule it by [[deleteDebt]] ratio or
    * small-file count, not per delete. Doubles as small-file
    * bin-packing: `targetBytes` sizes the output partitioning from
    * the LIVE files' on-disk bytes. Generation history collapses:
    * the compacted table is a fresh base (snapshot addresses before
    * the compaction are gone, like any lakehouse snapshot expiration).
    *
    * Concurrent readers SURVIVE the compact: the replaced files stay
    * on disk until a [[vacuum]] older than its grace window removes
    * them, so a long-running scan that resolved the old file list
    * (a 30-minute query racing a scheduled compact is routine at
    * 100 TB) completes against the pre-compact version instead of
    * dying mid-job on vanished paths (spec'd). A legacy
    * (never-compacted) table is pointerized by its first compact. */
  def compact(spark: SparkSession, path: String, cols: Seq[String],
              bits: Int = 12, partitions: Int = 0,
              targetBytes: Long = 0L): Unit =
    withTableLock(spark, path) {
      compactBody(spark, path, cols, bits, partitions, targetBytes)
    }

  private def compactBody(spark: SparkSession, path: String,
                          cols: Seq[String], bits: Int,
                          partitions: Int, targetBytes: Long): Unit = {
    val f = fs(spark, path)
    val cur = migrateToCommit(spark, path)
    val parts =
      if (partitions > 0) partitions
      else if (targetBytes > 0L) {
        val bytes = dataFilePaths(spark, path)
          .map(p => f.getFileStatus(p).getLen).sum
        math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      } else 0
    val schemaJson = cur.schemaJson
      .getOrElse(tableSchema(spark, path).json)
    // the fresh base lands ALONGSIDE the old files under names no
    // other commit can claim (the next version is ours — the lock
    // serializes writers), so nothing is destroyed before the commit
    val staged = s"${path}_rebuild"
    Layout.zorder(scan(spark, path), cols, bits, parts)
      .write.mode("overwrite").parquet(staged)
    val next = cur.version + 1
    val stagedParts = f.listStatus(new Path(staged)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
    val newNames = stagedParts.zipWithIndex.map { case (p, k) =>
      val name = f"base$next-part$k%05d.parquet"
      val dst = new Path(path, name)
      if (f.exists(dst)) f.delete(dst, false) // a crashed attempt's orphan
      require(f.rename(p, dst), s"compact: rename $p -> $dst failed")
      name
    }
    f.delete(new Path(staged), true)
    // THE commit: new data set, zero tombstones, epoch+1, floor reset —
    // one atomic marker rename. A crash before this line leaves only
    // orphaned base files (vacuum's job); after it, only stale
    // manifests (recover drops them, prunedScan raises on them)
    commitWrite(spark, path, next, newNames, Seq.empty,
      cur.epoch + 1, -1L, Some(schemaJson))
    writeManifestFromLive(spark, path, cols)
    rebuildBloomManifests(spark, path)
  }

  /** Rebuild the min/max manifest from the table's LIVE files — the
    * directory may hold vacuum-pending dead files a raw-path rebuild
    * would wrongly include. */
  private def writeManifestFromLive(spark: SparkSession, path: String,
                                    cols: Seq[String]): Unit = {
    val f = fs(spark, path)
    val live = dataFilePaths(spark, path).map(_.toString)
    f.delete(new Path(s"${path}_manifest"), true)
    if (live.nonEmpty)
      Layout.statsManifest(spark.read.parquet(live: _*), cols)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${path}_manifest")
  }

  /** Remove files a past commit replaced, once they are older than
    * `graceMs` — the second half of the pointer-commit contract: a
    * commit never destroys what a concurrent reader may still be
    * reading; vacuum does, after every reasonable query has finished.
    * Sweeps dead data files, dead tombstone files, and superseded
    * commit markers; crash orphans (staged files never committed) age
    * into the same sweep. File-count-bounded driver work; takes the
    * table lock so a mid-land writer's uncommitted files are never
    * candidates. No-op on a never-pointered table. Returns the
    * removed paths. */
  def vacuum(spark: SparkSession, path: String,
             graceMs: Long = 7L * 24 * 60 * 60 * 1000): Seq[String] =
    withTableLock(spark, path) {
      readCommit(spark, path) match {
        case None => Seq.empty
        case Some(c) =>
          val f = fs(spark, path)
          val cutoff = System.currentTimeMillis() - graceMs
          def sweep(dir: String, live: Set[String]): Seq[String] =
            parquetFiles(spark, dir)
              .filter(p => !live.contains(p.getName) &&
                f.getFileStatus(p).getModificationTime <= cutoff)
              .map { p => f.delete(p, false); p.toString }
          val deadData = sweep(path, c.data.toSet)
          val deadDels = sweep(deletesDir(path), c.deletes.toSet)
          // a fully-swept tombstone dir disappears with its last file
          // (a debt-free table should look debt-free on disk too)
          val dPath = new Path(deletesDir(path))
          if (c.deletes.isEmpty && f.exists(dPath) &&
              f.listStatus(dPath).isEmpty)
            f.delete(dPath, true)
          // markers at or above the newest CHECKPOINT are the
          // readable log (checkpoint + replay tail) — only the
          // consumed tail strictly below it is sweepable
          val cDir = new Path(commitDir(path))
          val oldCommits =
            if (!f.exists(cDir)) Seq.empty
            else {
              val all = f.listStatus(cDir).toSeq.filter(s =>
                s.isFile && commitVersionOf(s.getPath.getName) >= 0)
              val ckpt = all
                .filterNot(s => isDeltaMarker(s.getPath.getName))
                .map(s => commitVersionOf(s.getPath.getName))
                .foldLeft(-1L)(math.max)
              all.filter { s =>
                commitVersionOf(s.getPath.getName) < ckpt &&
                  s.getModificationTime <= cutoff
              }.map { s => f.delete(s.getPath, false); s.getPath.toString }
            }
          deadData ++ deadDels ++ oldCommits
      }
    }

  /** The executable form of every swap's documented crash recovery:
    * inspect the table's on-disk state and FINISH or UNDO whatever a
    * crashed [[compact]] / [[compactRetaining]] / rebuild left behind.
    * Idempotent; safe on a healthy table (a no-op). Returns a short
    * action log (empty = nothing to do).
    *
    * Cases, in the order the swaps create them:
    *  - table dir MISSING but `<path>_pre_compact/data` present: the
    *    crash hit between the move-out and the move-in — the old table
    *    (and its tombstone dir, if it was moved) renames BACK; the
    *    staged rewrite under `<path>_rebuild` / `_retain_rebuild` is
    *    discarded (it may be incomplete).
    *  - table dir PRESENT and `<path>_pre_compact` lingers: the swap
    *    completed but the cleanup didn't — the leftover (old data +
    *    old tombstones) deletes, matching what the successful path
    *    would have done.
    *  - orphaned staging (`_incoming`, `_rebuild`, `_retain_rebuild`,
    *    `_retain_deletes`) with the table present: discarded — every
    *    writer stages fresh under `mode("overwrite")`, so leftovers
    *    are dead bytes.
    *  - a lease under `<path>_lock` older than `staleLockMs`:
    *    removed (the holder heartbeats every third of its window, so
    *    a day-old lease is a crashed writer).
    * Single-writer: takes the table lock itself (run it when no
    * mutation is in flight — the lock enforces that). */
  def recover(spark: SparkSession, path: String,
              staleLockMs: Long = 24L * 60 * 60 * 1000,
              leaseMs: Long = 15L * 60 * 1000): Seq[String] = {
    val f = fs(spark, path)
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    val root = new Path(path)
    val pre = new Path(s"${path}_pre_compact")
    // phase 1, WITHOUT the lock: an interrupted swap left no table, so
    // a lock wait would be pointless. But mid-swap-looking state under
    // a FRESH lease is a LIVE compactor inside its two-rename window,
    // not a crash — restoring under it would rename the old table back
    // while the compact's staged move-in is in flight. Only a stale or
    // absent lease (holders heartbeat every leaseMs/3) marks a
    // genuinely dead writer.
    if (!f.exists(root) && f.exists(new Path(pre, "data"))) {
      val lease = new Path(s"${path}_lock/lease")
      require(!f.exists(lease) || System.currentTimeMillis() -
          f.getFileStatus(lease).getModificationTime > leaseMs,
        s"recover: $path looks mid-swap but a LIVE writer lease sits " +
          s"at $lease — a compactor may be inside its swap window " +
          "right now, and restoring would race it. Wait out the " +
          s"lease window (${leaseMs}ms without a heartbeat) and re-run")
      require(f.rename(new Path(pre, "data"), root),
        s"recover: rename $pre/data back to $path failed")
      actions += s"restored $path from $pre/data"
      val movedDeletes = new Path(pre, "deletes")
      if (f.exists(movedDeletes)) {
        val dDir = new Path(deletesDir(path))
        if (f.exists(dDir)) f.delete(dDir, true)
        require(f.rename(movedDeletes, dDir),
          s"recover: rename $pre/deletes back to $dDir failed")
        actions += s"restored $dDir from $pre/deletes"
      }
      f.delete(pre, true)
    }
    withTableLock(spark, path, leaseMs = leaseMs, waitMs = 60 * 1000L) {
      // a RETENTION swap that crashed between its data rename and its
      // tombstone install (new data live, `_retain_rebuild` consumed,
      // `_retain_deletes` still staged) must be FINISHED, not cleaned:
      // the staged remapped tombstones are the ONLY valid debt for the
      // folded table — discarding them would permanently resurrect
      // every row a later stamp doomed
      val retainDeletes = new Path(s"${path}_retain_deletes")
      if (f.exists(root) && f.exists(retainDeletes) &&
          !f.exists(new Path(s"${path}_retain_rebuild"))) {
        val dDir = new Path(deletesDir(path))
        if (f.exists(dDir)) f.delete(dDir, true)
        require(f.rename(retainDeletes, dDir),
          s"recover: install $retainDeletes -> $dDir failed")
        actions += s"finished retention swap: installed $dDir"
        // manifests predate the fold and would name vanished files —
        // drop them (performance structures: scans stay correct, a
        // pruned/point scan raises loudly until rebuilt) and say so
        (Seq(new Path(s"${path}_manifest")) ++ bloomDirsOf(spark, path))
          .filter(f.exists)
          .foreach { m =>
            f.delete(m, true)
            actions += s"dropped pre-fold manifest $m — rebuild with " +
              "Layout.writeManifest / writeBloomManifest"
          }
      }
      if (f.exists(root) && f.exists(pre)) {
        f.delete(pre, true)
        actions += s"dropped completed-swap leftover $pre"
      }
      // a rewrite that crashed after its swap but before its manifest
      // rebuild leaves manifests naming vanished files — pruned/point
      // scans would fail loudly on them forever. Detect (file-count-
      // bounded read) and drop, telling the operator to rebuild.
      if (f.exists(root)) {
        // LIVE names (commit-resolved): on a pointered table a
        // manifest naming a vacuum-pending dead file is just as
        // dangling as one naming a vanished file
        val live = dataFilePaths(spark, path).map(_.getName).toSet
        (Seq(new Path(s"${path}_manifest")) ++ bloomDirsOf(spark, path))
          .filter(m => f.exists(m) &&
            parquetFiles(spark, m.toString).nonEmpty)
          .foreach { m =>
            val named = spark.read.parquet(m.toString)
              .select("__file").distinct().collect()
              .map(r => fileName(r.getString(0)))
            if (named.exists(n => !live.contains(n))) {
              f.delete(m, true)
              actions += s"dropped dangling manifest $m (named vanished " +
                "files) — rebuild with Layout.writeManifest / " +
                "writeBloomManifest"
            }
          }
      }
      Seq("_incoming", "_rebuild", "_retain_rebuild", "_retain_deletes",
          "_pre_rebuild")
        .map(s => new Path(s"$path$s"))
        .filter(f.exists)
        .foreach { p =>
          // an EMPTY staging parent is normal residue of a completed
          // write (stagers delete their subdir, not the parent) —
          // clean it silently; only content is a crash orphan
          val orphaned = f.listStatus(p).nonEmpty
          f.delete(p, true)
          if (orphaned) actions += s"discarded orphaned staging $p"
        }
      // a commit marker's tmp file is a crashed commitWrite mid-stage:
      // the version never became visible (the rename is the commit),
      // so it is a plain orphan
      val cDir = new Path(commitDir(path))
      if (f.exists(cDir))
        f.listStatus(cDir).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("tmp-"))
          .foreach { s =>
            f.delete(s.getPath, false)
            actions += s"discarded uncommitted marker ${s.getPath}"
          }
      // finish a crashed epoch/floor marker update: `_epoch_next` holds
      // the complete NEW value (readers already prefer it) — install it
      val next = new Path(s"${path}_epoch_next")
      if (f.exists(next)) {
        f.delete(epochPath(path), false)
        require(f.rename(next, epochPath(path)),
          s"recover: finishing $next -> ${epochPath(path)} failed")
        actions += s"finished epoch/floor marker update at " +
          s"${epochPath(path)}"
      }
      f.delete(new Path(s"${path}_epoch_tmp"), false)
      ()
    }
    val lease = new Path(s"${path}_lock/lease")
    if (f.exists(lease) && System.currentTimeMillis() -
        f.getFileStatus(lease).getModificationTime > staleLockMs) {
      f.delete(lease, false)
      actions += s"removed stale writer lease $lease"
    }
    actions.toSeq
  }

  /** Rebuild every `<path>_bloom_*` manifest found, each under ITS OWN
    * recorded geometry, so point lookups keep their skip rate after a
    * rewrite instead of falling back to stale-safe full keeps. */
  private def rebuildBloomManifests(spark: SparkSession,
                                    path: String): Unit =
    bloomDirsOf(spark, path).foreach { p =>
      val prefix = s"${new Path(path).getName}_bloom_"
      val old = spark.read.parquet(p.toString)
      val geom =
        if (old.columns.contains("__keys"))
          old.select("__keys", "__fpp").take(1).headOption
        else None
      val (keys, fpp) = geom.map(r => (r.getLong(0), r.getDouble(1)))
        .getOrElse((1L << 21, 0.01))
      Layout.writeBloomManifest(spark, path,
        p.getName.stripPrefix(prefix), keys, fpp)
    }

  /** Retention-preserving compaction: fold the delete debt and small
    * files of everything at or below generation `retainAfter` into a
    * fresh z-ordered BASE, while every LATER generation stays
    * byte-identical and snapshot-addressable — debt-folding and time
    * travel coexist, the standard lakehouse retention policy that
    * [[compact]] (full snapshot expiration) cannot offer.
    *
    * What must survive, and how: a tombstone stamped AFTER the floor
    * may address a row in a FOLDED file (live at `retainAfter`, dead
    * later). Dropping it would resurrect the row in later snapshots;
    * keeping it verbatim would address a vanished file name. So the
    * rows those tombstones address are rewritten into their own
    * per-stamp base files (`doom<stamp>-…parquet` — every row in one
    * dies at that one stamp), and the tombstones are REMAPPED to
    * positions 0‥n−1 of those files with their original stamps.
    * `scanAsOf(g ≥ retainAfter)` then reads: new base (live-forever
    * rows) + doom files (dead-at-stamp>g rows excluded by the
    * remapped tombstones) + untouched later generations — exactly the
    * pre-compaction snapshot (oracled against [[scanAsOf]]'s twins).
    *
    * The [[snapshotFloor]] rises to `retainAfter` in the SAME atomic
    * commit that flips the data and tombstone sets — expired windows
    * raise loudly from the instant the fold is visible — while the
    * [[compactEpoch]] stays, because every window at or above the
    * floor remains valid (a replica's feed continues uninterrupted).
    * Later generations are NOT touched at all: their files stay in
    * place and simply carry over into the new commit's live set (the
    * version-pointer protocol removed the old tail copy entirely).
    * Replaced files await [[vacuum]] like any compact's. Cost: one
    * pass over the rows live at `retainAfter`. Single-writer; a
    * legacy table is pointerized first. */
  def compactRetaining(spark: SparkSession, path: String,
                       cols: Seq[String], retainAfter: Long,
                       bits: Int = 12, partitions: Int = 0,
                       rowsPerFile: Long = tombstoneRowsPerFile): Unit =
    withTableLock(spark, path) {
      migrateToCommit(spark, path)
      val all = dataFilePaths(spark, path)
      val fold = all.filter(p => genOf(p.getName) <= retainAfter)
      val keep = all.filter(p => genOf(p.getName) > retainAfter)
      if (keep.isEmpty)
        // nothing newer than the floor: this IS a full compact
        compactBody(spark, path, cols, bits, partitions, 0L)
      else if (fold.nonEmpty)
        compactRetainingBody(spark, path, cols, retainAfter, bits,
          partitions, fold, keep, rowsPerFile)
      // else: nothing at or below the floor to fold — a no-op
    }

  /** First free numeric suffix for `prefix<k>.parquet` names in `dir`,
    * scanned ON-DISK (live and vacuum-pending files both occupy their
    * names until removed). */
  private def nextIndexFor(spark: SparkSession, dir: String,
                           prefix: String): Int =
    parquetFiles(spark, dir).map(_.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).stripSuffix(".parquet"))
      .filter(b => b.nonEmpty && b.forall(_.isDigit)).map(_.toInt)
      .foldLeft(-1)(math.max) + 1

  private def compactRetainingBody(spark: SparkSession, path: String,
                                   cols: Seq[String], retainAfter: Long,
                                   bits: Int, partitions: Int,
                                   fold: Seq[Path], keep: Seq[Path],
                                   rowsPerFile: Long): Unit = {
      val f = fs(spark, path)
      val cur = readCommit(spark, path).get // the wrapper migrated
      val next = cur.version + 1
      val schema = tableSchema(spark, path)
      val foldPaths = fold.map(_.toString)
      val keepNames = keep.map(_.getName)
      val dDir = deletesDir(path)
      // later tombstones (stamp > floor), still meaningful afterwards
      val laterDelFiles = deleteFilePaths(spark, path)
        .filter(p => delGenOf(p.getName) > retainAfter).map(_.toString)
      val laterTs =
        if (laterDelFiles.isEmpty) None
        else Some(spark.read.schema(TombstoneSchema)
          .parquet(laterDelFiles: _*)
          .filter(col(GenCol) > retainAfter)
          .select(FileCol, PosCol, GenCol).cache())
      // rows of folded files that survive EVERY tombstone, any stamp:
      // the new base — staged, then renamed in ALONGSIDE the old files
      // (nothing is destroyed before the commit; vacuum cleans later)
      val baseLive = readMinus(spark, foldPaths, schema,
        tombstoneFrame(spark, path),
        tombstoneBytes(spark, path) <= broadcastTombstoneBytes)
      val staging = s"${path}_retain_rebuild"
      f.delete(new Path(staging), true)
      Layout.zorder(baseLive, cols, bits, partitions)
        .write.mode("overwrite").parquet(staging)
      val baseNames = f.listStatus(new Path(staging)).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
          s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath).sortBy(_.getName).zipWithIndex
        .map { case (p0, k) =>
          val name = f"base$next-part$k%05d.parquet"
          val dst = new Path(path, name)
          if (f.exists(dst)) f.delete(dst, false) // crashed attempt
          require(f.rename(p0, dst),
            s"compactRetaining: rename $p0 -> $dst failed")
          name
        }
      f.delete(new Path(staging), true)
      // stage a frame into size-bounded files under DETERMINISTIC
      // names (`<prefix><k>.parquet`, k past any on-disk sibling) —
      // the writeTombstones discipline: never a single-task funnel,
      // shard count derived from the staged row count. Returns the
      // landed file names.
      def stageSharded(df: DataFrame, destDir: String,
                       prefix: String): Seq[String] = {
        val raw = s"${path}_incoming/$prefix-raw"
        df.write.mode("overwrite").parquet(raw)
        // schema in hand; and when the staged layout already holds the
        // right shard count the parts rename in directly instead of a
        // second read->shuffle->write of the frame (the writeTombstones
        // discipline, r18)
        val rawDf = spark.read.schema(nullableCopy(df.schema)).parquet(raw)
        val n = rawDf.count()
        if (n == 0) { f.delete(new Path(raw), true); Seq.empty }
        else {
          val shards = math.max(1L,
            (n + rowsPerFile - 1) / rowsPerFile).toInt
          val rawParts = f.listStatus(new Path(raw))
            .filter(st => st.getPath.getName.startsWith("part-") &&
              st.getPath.getName.endsWith(".parquet"))
            .map(_.getPath).sortBy(_.getName)
          val tmp = s"${path}_incoming/$prefix-norm"
          val parts: Array[Path] =
            if (rawParts.length == shards) rawParts
            else {
              rawDf.repartition(shards)
                .write.mode("overwrite").parquet(tmp)
              f.listStatus(new Path(tmp))
                .filter(_.getPath.getName.startsWith("part-"))
                .map(_.getPath).sortBy(_.getName)
            }
          val firstIdx = nextIndexFor(spark, destDir, prefix)
          f.mkdirs(new Path(destDir))
          val names = parts.zipWithIndex.map { case (p0, k) =>
            val name = s"$prefix${firstIdx + k}.parquet"
            require(f.rename(p0, new Path(destDir, name)),
              s"compactRetaining: $p0 -> $destDir/$name failed")
            name
          }
          f.delete(new Path(tmp), true)
          f.delete(new Path(raw), true)
          names.toSeq
        }
      }
      val doomNames = scala.collection.mutable.ArrayBuffer.empty[String]
      val delNames = scala.collection.mutable.ArrayBuffer.empty[String]
      laterTs.foreach { ts =>
        // the later debt can be retraction-sized: broadcast only while
        // its on-disk bytes stay under the scan path's same ceiling
        val tsBytes = laterDelFiles
          .map(d => f.getFileStatus(new Path(d)).getLen).sum
        def side(df: DataFrame): DataFrame =
          if (tsBytes <= broadcastTombstoneBytes) broadcast(df) else df
        val keyedFold = spark.read.schema(schema).parquet(foldPaths: _*)
          .withColumn(FileCol,
            element_at(split(col("_metadata.file_path"), "/"), -1))
          .withColumn(PosCol, col("_metadata.row_index"))
        // debt-sized and read once per stamp below — cache the join
        // so the fold-file pass runs once, not once per stamp
        val doomed = keyedFold.join(side(ts), Seq(FileCol, PosCol))
          .drop(FileCol, PosCol).cache()
        // stamps present — debt-bounded driver list
        val stamps = doomed.select(GenCol).distinct()
          .collect().map(_.getLong(0)).sorted
        stamps.foreach { st =>
          val rows = doomed.filter(col(GenCol) === st).drop(GenCol)
          val landedDoom = stageSharded(rows, path, s"doom$st-")
          doomNames ++= landedDoom
          // the remapped tombstones: every doom file dies WHOLE at
          // stamp st, so its positions are read straight off the
          // landed files' own _metadata — one pass over doom bytes,
          // exact at any shard count
          if (landedDoom.nonEmpty) {
            val remapped = spark.read
              .parquet(landedDoom.map(n => s"$path/$n"): _*)
              .select(element_at(split(col("_metadata.file_path"), "/"),
                  -1).as(FileCol),
                col("_metadata.row_index").as(PosCol),
                lit(st).as(GenCol))
            delNames ++= stageSharded(remapped, dDir, s"del$st-")
          }
        }
        // later tombstones addressing KEPT files carry over verbatim
        // (their files are untouched), re-landed under fresh names so
        // the old tombstone files can be vacuumed with the fold
        val keepNamesDf = spark.createDataFrame(
          spark.sparkContext.parallelize(keepNames.map(
            org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(FileCol,
              org.apache.spark.sql.types.StringType))))
        val onKept = ts.join(broadcast(keepNamesDf), Seq(FileCol))
        val keptStamps = onKept.select(GenCol).distinct()
          .collect().map(_.getLong(0)).sorted
        keptStamps.foreach { st =>
          delNames ++= stageSharded(onKept.filter(col(GenCol) === st),
            dDir, s"del$st-")
        }
        doomed.unpersist()
        ts.unpersist()
        ()
      }
      // THE commit: new base + doom files + the untouched kept tail as
      // the data set, the remapped + carried tombstones as the delete
      // set, the floor at `retainAfter`, the epoch unchanged — one
      // atomic marker rename. Everything before this line was additive
      // (orphans at worst); everything after is manifest hygiene.
      commitWrite(spark, path, next,
        baseNames ++ doomNames ++ keepNames, delNames.toSeq,
        cur.epoch, retainAfter,
        cur.schemaJson.orElse(Some(schema.json)))
      // manifest: drop folded slices (old base part-*/base.parquet and
      // gen <= floor), keep later gen slices (their files never
      // moved), land the new base's slice deterministically
      val mDir = s"${path}_manifest"
      if (f.exists(new Path(mDir))) {
        parquetFiles(spark, mDir).foreach { p =>
          val digits = p.getName.stripPrefix("gen").stripSuffix(".parquet")
          val isKeptSlice = p.getName.startsWith("gen") &&
            digits.nonEmpty && digits.forall(_.isDigit) &&
            digits.toLong > retainAfter
          if (!isKeptSlice) f.delete(p, false)
        }
        val baseFiles = dataFilePaths(spark, path)
          .filter(p => genOf(p.getName) <= retainAfter).map(_.toString)
        if (baseFiles.nonEmpty) {
          val tmp = s"${path}_incoming/manifestbase"
          Layout.statsManifest(spark.read.parquet(baseFiles: _*), cols)
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = f.listStatus(new Path(tmp))
            .filter(_.getPath.getName.startsWith("part-")).head.getPath
          val dst = new Path(mDir, "base.parquet")
          if (f.exists(dst)) f.delete(dst, false)
          require(f.rename(part, dst),
            s"compactRetaining: base manifest slice failed")
          f.delete(new Path(tmp), true)
        }
      }
      rebuildBloomManifests(spark, path)
  }
}
