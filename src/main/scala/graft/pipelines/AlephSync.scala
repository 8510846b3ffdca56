package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Diff, DocumentsStore}
import graft.functions.GraftFunctions

/** Pluggable endpoint for the Aleph sync pipelines. Production wires an
  * HTTP client; specs wire a recorder. Must be get-or-create idempotent
  * (the reference's `make_folders`/`ingest_upload` are,
  * connectors/aleph.py:62-74). Serializable because document uploads run
  * from executor partitions.
  */
trait AlephConnector extends Serializable {

  /** Create (or resolve) one folder; `parentId` chains nesting. Returns the
    * folder id. */
  def createFolder(path: String, parentId: Option[String]): String

  /** Upload one document; returns the remote id
    * (sync/aleph.py:109-141). */
  def uploadDocument(key: String, contentHash: String,
                     metadata: Map[String, String]): String

  /** Write one batch of FTM entity lines
    * (sync/aleph_entities.py:78-80). */
  def writeEntities(batch: Seq[String]): Unit
}

/** Counters mirroring the reference's WorkerStatus models
  * (sync/aleph.py:54-56, sync/aleph_entities.py:32-34). */
final case class AlephSyncStatus(versionsReplayed: Long, uploaded: Long,
                                 foldersCreated: Long)
final case class AlephEntitiesStatus(resources: Long, entities: Long)

/** Aleph synchronisation — the reference's main downstream publisher
  * (ftm_datalake/sync/aleph.py:40-141, sync/aleph_entities.py:36-133),
  * recomposed from the repo's set-oriented primitives:
  *
  *   - per-version change feed: [[graft.core.Diff.addedKeys]] over the CSV
  *     snapshots (I3), replacing `get_keys_added`'s diff-line parsing;
  *   - upload/version/folder memoization: the [[Ledger]] anti-join (I1),
  *     replacing anycache's per-task KV lookups;
  *   - folder creation: [[Entities.ancestorFolders]]' depth-ordered distinct
  *     set (J6), replacing the per-key recursion under a lock
  *     (sync/aleph.py:95-107) — folders are directory-cardinality, created
  *     depth-level-parallel (≤10 concurrent, the reference's own pool cap)
  *     with a barrier per level so parents always precede children;
  *   - uploads: executor partitions push to the connector, with the
  *     folder→id map broadcast (file-cardinality work never serializes
  *     through the driver).
  */
object AlephSync {

  /** rigour.mime.types.FTM — the resource filter for entity loads
    * (sync/aleph_entities.py:85). */
  val FtmMimeType = "application/json+ftm"

  private val VersionAction = "aleph_version"
  private val UploadAction = "aleph_upload"
  private val FolderAction = "aleph_folder"
  private val ResourceAction = "aleph_resource"

  /** Replay every unsynced snapshot version's ADDED keys as uploads
    * (sync/aleph.py:73-93): for each version in order, diff against the
    * previous snapshot, resolve ancestor folders depth-first, upload
    * pending documents, and record everything in the ledger so a re-run
    * uploads nothing.
    *
    * @param prefix   optional remote folder prefix (sync/aleph.py:60-62)
    * @return per-run counters (versions replayed, docs uploaded, folders
    *         newly created)
    */
  def syncDocuments(spark: SparkSession, metaRoot: String, ledgerPath: String,
                    dataset: String, connector: AlephConnector,
                    prefix: Option[String] = None,
                    uploadParallelism: Int = 10): AlephSyncStatus = {
    import spark.implicits._
    val versions = DocumentsStore.versions(spark, metaRoot)
    // which versions still need replay: the Ledger.pending ANTI-JOIN,
    // not a driver-resident done-set — the ledger's version history
    // grows without bound while the pending remainder is exactly the
    // work this run must drive from the driver anyway
    val pendingVersions: Set[String] =
      if (versions.isEmpty) Set.empty
      else Ledger.pending(versions.toDF("key"),
          Ledger.read(spark, ledgerPath), dataset, VersionAction)
        .select("key").as[String].collect().toSet

    var replayed = 0L
    var uploadedTotal = 0L
    var foldersTotal = 0L
    versions.zipWithIndex.foreach { case (version, ix) =>
      if (pendingVersions.contains(version)) {
        val prev =
          if (ix == 0)
            DocumentsStore.readCsv(spark, s"$metaRoot/versions/__none__")
          else DocumentsStore.readCsv(spark, s"$metaRoot/versions/${versions(ix - 1)}")
        val next = DocumentsStore.readCsv(spark, s"$metaRoot/versions/$version")
        val added = Diff.addedKeys(prev, next)
          .join(next, Seq("key"), "inner")
        val (up, fc) = uploadBatch(spark, added, ledgerPath, dataset,
          connector, prefix, uploadParallelism)
        uploadedTotal += up
        foldersTotal += fc
        Ledger.append(Seq(version).toDF("key"), ledgerPath, dataset, VersionAction)
        replayed += 1
      }
    }
    AlephSyncStatus(replayed, uploadedTotal, foldersTotal)
  }

  /** Upload one batch of document rows: ledger anti-join → depth-LEVEL
    * parallel folder creation (driver, directory-cardinality, ≤10
    * concurrent per level) → executor-side uploads with the folder→id
    * map broadcast → ledger append. */
  private def uploadBatch(spark: SparkSession, docs: DataFrame,
                          ledgerPath: String, dataset: String,
                          connector: AlephConnector,
                          prefix: Option[String],
                          uploadParallelism: Int = 10): (Long, Long) = {
    import spark.implicits._
    val ledger = Ledger.read(spark, ledgerPath)
    val pending = Ledger.pending(docs, ledger, dataset, UploadAction).cache()

    // Remote folder path per key: parent of (prefix?/key).
    val prefixed = prefix.fold(col("key"))(p => concat(lit(p + "/"), col("key")))
    val withFolder = pending.withColumn("__folder",
      when(col("key").contains("/") || lit(prefix.isDefined),
        regexp_replace(prefixed, "/[^/]*$", "")))

    // Depth-ordered ancestor set of every prefixed pending key (J6):
    // pathAncestors of `prefix?/a/b/file` is exactly the folder chain
    // `[prefix, prefix/a, prefix/a/b]`, prefix included.
    val allFoldersDf = Entities.ancestorFolders(
      pending.select(prefixed.as("key")))
    val allFolders = allFoldersDf
      .select("folder").as[String].collect().toSeq
    // which of this batch's folders are NEW: anti-join against the
    // ledger (Ledger.pending), never a collect of every folder EVER
    // created — that set grows with the dataset's whole history while
    // the fresh remainder is bounded by this batch's directory count
    val freshFolders = Ledger.pending(
        allFoldersDf.select(col("folder").as("key")), ledger, dataset,
        FolderAction)
      .select("key").as[String].collect().toSet
    // Depth-LEVEL batched creation: the external API requires a folder's
    // parent to exist first, but folders at the SAME depth are
    // independent — each level runs with bounded parallelism (≤10,
    // the reference's own Aleph pool cap, connectors/aleph.py:120) and
    // barriers before the next, so parent-before-child ordering holds
    // while million-directory trees stop serializing one call at a time.
    val folderIds = scala.collection.concurrent.TrieMap.empty[String, String]
    val folderConcurrency = math.max(1, math.min(uploadParallelism, 10))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(folderConcurrency)
    try {
      allFolders.groupBy(_.count(_ == '/')).toSeq.sortBy(_._1)
        .foreach { case (_, level) =>
          level.map { f =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              override def call(): Unit = {
                val parent = if (f.contains("/"))
                  Some(f.substring(0, f.lastIndexOf('/'))) else None
                folderIds(f) = connector.createFolder(f, parent.flatMap(folderIds.get))
              }
            })
          }.foreach { fut => // barrier: depth d completes before depth d+1
            try fut.get()
            catch { case e: java.util.concurrent.ExecutionException =>
              throw e.getCause }
          }
        }
    } finally pool.shutdown()
    val newFolders = freshFolders.size.toLong
    if (freshFolders.nonEmpty)
      Ledger.append(freshFolders.toSeq.toDF("key"), ledgerPath, dataset,
        FolderAction)

    // Executor-side uploads: metadata columns are the reference's
    // (file_name, foreign_id, source_url coalesce — sync/aleph.py:119-125),
    // parent resolved from the broadcast folder→id map.
    val folderIdMap = spark.sparkContext.broadcast(folderIds.toMap)
    val uploadCount = spark.sparkContext.longAccumulator("aleph_uploaded")
    val cols = pending.columns.toSet
    val sourceUrl = GraftFunctions.coalesceSourceUrl(
      (Seq("source_url", "url").filter(cols.contains).map(col) :+
        lit(null).cast("string")): _*)
    // concurrency capped at `uploadParallelism` partitions — the reference
    // bounds its Aleph HTTP pool to 10 consumers (connectors/aleph.py:120);
    // one remote endpoint is not a 1000-executor sink
    withFolder.select(
        col("key"), col("content_hash"),
        GraftFunctions.basename(col("key")).as("__name"),
        sourceUrl.as("__source_url"), col("__folder"))
      .repartition(math.max(1, uploadParallelism))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val meta = Map(
            "file_name" -> r.getString(2),
            "foreign_id" -> r.getString(0)) ++
            Option(r.getString(3)).map("source_url" -> _) ++
            Option(r.getString(4)).flatMap(folderIdMap.value.get)
              .map("parent_id" -> _)
          connector.uploadDocument(r.getString(0), r.getString(1), meta)
          uploadCount.add(1)
        }
      }
    Ledger.append(pending.select("key"), ledgerPath, dataset, UploadAction)
    pending.unpersist()
    (uploadCount.value, newFolders)
  }

  /** Build the FTM resource table for published entity sinks — the analog
    * of iterating a catalog's resources (aleph_entities.py:83-88): one row
    * per (dataset, entities-sink path) that exists, with an
    * ORDER-INDEPENDENT but DUPLICATE-SENSITIVE content checksum
    * (2^64-wrapping sum of per-line xxhash64, plus the line count) keying
    * the ledger memoization, so re-publishing identical entities (in any
    * partition order) stays a no-op while any content change invalidates
    * the resource. Sum, not xor: xor cancels pairwise, so adding/removing
    * an even number of identical lines (duplicate FTM fragments are
    * realistic) would leave an xor checksum unchanged — {A,A,B} must not
    * checksum equal to {B}. */
  def entityResources(spark: SparkSession,
                      sinks: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val rows = sinks.flatMap { case (dataset, path) =>
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        // decimal(38,0) sum cannot overflow below ~1e18 lines and keeps
        // the aggregate ANSI-safe; wrap to 64 bits driver-side
        val agg = spark.read.textFile(path).toDF("line")
          .filter(length(trim(col("line"))) > 0)
          .agg(
            coalesce(sum(xxhash64(col("line")).cast("decimal(38,0)")),
              lit(0).cast("decimal(38,0)")).as("s"),
            count(lit(1)).as("n"))
          .head()
        val wrapped = agg.getDecimal(0).toBigInteger
          .mod(java.math.BigInteger.ONE.shiftLeft(64)).longValue()
        Some((dataset, path, FtmMimeType, f"$wrapped%016x-${agg.getLong(1)}%x"))
      }
    }
    rows.toDF("dataset", "url", "mime_type", "checksum")
  }

  /** Entities sync (sync/aleph_entities.py:36-133): select catalog resources
    * by dataset-name glob (P3, fnmatch semantics: exclude first, then
    * include — aleph_entities.py:118-125) and FTM mime (P4), skip resources
    * already loaded (checksum-keyed memoization → ledger anti-join), and
    * push each resource's entity lines in batches of ≤`batchSize` from
    * executor partitions (aleph_entities.py:58-76's 1000-batching, but
    * partition-parallel instead of a single reader).
    *
    * `resources` schema: (dataset, url, mime_type, checksum).
    * `readEntities` maps a resource url to its entity-line Dataset —
    * normally `spark.read.textFile(url)` over the S4 JSON-lines sink.
    */
  def syncEntities(spark: SparkSession, resources: DataFrame,
                   ledgerPath: String, connector: AlephConnector,
                   readEntities: String => DataFrame,
                   includeDataset: Option[String] = None,
                   excludeDataset: Option[String] = None,
                   batchSize: Int = 1000): AlephEntitiesStatus =
    syncEntitiesEach(spark, resources, ledgerPath, _ => connector,
      readEntities, includeDataset, excludeDataset, batchSize)

  /** [[syncEntities]] with a dataset→connector factory: the reference's
    * `load_catalog` creates one worker PER DATASET whose foreign_id
    * defaults to that dataset's own name (connectors/aleph.py:117), i.e.
    * one Aleph collection per dataset — so a catalog sweep must be able
    * to route each dataset's entities through its own connector. */
  def syncEntitiesEach(spark: SparkSession, resources: DataFrame,
                       ledgerPath: String,
                       connectorFor: String => AlephConnector,
                       readEntities: String => DataFrame,
                       includeDataset: Option[String] = None,
                       excludeDataset: Option[String] = None,
                       batchSize: Int = 1000): AlephEntitiesStatus = {
    import spark.implicits._
    val selected = resources
      .filter(col("mime_type") === FtmMimeType)
      .filter(GraftFunctions.globFilter(col("dataset"), includeDataset,
        excludeDataset))
      .select("dataset", "url", "checksum")
      .as[(String, String, String)].collect()

    val ledger = Ledger.read(spark, ledgerPath)
    var nResources = 0L
    var nEntities = 0L
    selected.foreach { case (dataset, url, checksum) =>
      val done = ledger
        .filter(col("dataset") === dataset && col("action") === ResourceAction &&
          col("task_key") === checksum)
        .limit(1).count() > 0
      if (!done) {
        val connector = connectorFor(dataset)
        val lines = readEntities(url)
        val sent = spark.sparkContext.longAccumulator(s"aleph_entities_$checksum")
        Entities.foreachBatch(lines.toDF(), batchSize) { batch =>
          connector.writeEntities(batch.map(_.getString(0)))
          sent.add(batch.size)
        }
        Ledger.append(Seq(checksum).toDF("key"), ledgerPath, dataset,
          ResourceAction)
        nEntities += sent.value
        nResources += 1
      }
    }
    AlephEntitiesStatus(nResources, nEntities)
  }
}
