package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}

import graft.core.{DocumentsStore, Model}
import graft.pipelines.{AlephConnector, AlephSync}

/** Single-JVM (local[*]) recording sink: executor-side connector calls land
  * in these shared buffers. Top-level so the connector closure serializes
  * without capturing the spec instance. */
object AlephRecorder {
  val folders = new java.util.concurrent.CopyOnWriteArrayList[(String, Option[String])]
  val uploads = new java.util.concurrent.CopyOnWriteArrayList[(String, Map[String, String])]
  val batches = new java.util.concurrent.CopyOnWriteArrayList[Seq[String]]
  def reset(): Unit = { folders.clear(); uploads.clear(); batches.clear() }
  def folderCalls: Seq[(String, Option[String])] =
    folders.toArray.map(_.asInstanceOf[(String, Option[String])]).toSeq
  def uploadCalls: Seq[(String, Map[String, String])] =
    uploads.toArray.map(_.asInstanceOf[(String, Map[String, String])]).toSeq
  def batchSizes: Seq[Int] =
    batches.toArray.map(_.asInstanceOf[Seq[String]].size).toSeq
}

class RecordingAlephConnector extends AlephConnector {
  def createFolder(path: String, parentId: Option[String]): String = {
    AlephRecorder.folders.add((path, parentId)); s"folder:$path"
  }
  def uploadDocument(key: String, contentHash: String,
                     metadata: Map[String, String]): String = {
    AlephRecorder.uploads.add((key, metadata)); s"doc:$key"
  }
  def writeEntities(batch: Seq[String]): Unit =
    AlephRecorder.batches.add(batch)
}

/** Aleph sync replay semantics — the analog of the reference's
  * sync/aleph.py version replay (versions → added keys → folders → uploads,
  * all memoized) and sync/aleph_entities.py (FTM-mime + dataset-glob
  * resource selection, ≤1000 batching).
  */
class AlephSyncSpec extends SparkSpec {
  import spark.implicits._

  private def docs(keys: String*): DataFrame = {
    val ts = Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = keys.map(k => Row(k, s"hash-$k", 1L, "text/plain", ts, ts))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Model.documentsSchema)
  }

  test("document sync replays two publishes with correct added-key sets (I3+J6+I1)") {
    AlephRecorder.reset()
    val root = java.nio.file.Files.createTempDirectory("aleph").toString
    val metaRoot = s"$root/meta"
    val ledger = s"$root/ledger"
    DocumentsStore.writeSnapshot(docs("top.txt", "a/b/one.txt"), metaRoot, "v1")
    val st1 = AlephSync.syncDocuments(spark, metaRoot, ledger, "ds1",
      new RecordingAlephConnector)
    assert(st1 == graft.pipelines.AlephSyncStatus(1, 2, 2))
    assert(AlephRecorder.uploadCalls.map(_._1).toSet == Set("top.txt", "a/b/one.txt"))
    // depth-ordered folder creation with parent chaining
    assert(AlephRecorder.folderCalls == Seq(("a", None), ("a/b", Some("folder:a"))))

    // second publish adds two keys under one new and one existing folder
    DocumentsStore.writeSnapshot(
      docs("top.txt", "a/b/one.txt", "a/b/two.txt", "c/three.txt"), metaRoot, "v2")
    AlephRecorder.reset()
    val st2 = AlephSync.syncDocuments(spark, metaRoot, ledger, "ds1",
      new RecordingAlephConnector)
    assert(st2.versionsReplayed == 1)
    assert(st2.uploaded == 2)
    assert(st2.foldersCreated == 1) // only c is new
    assert(AlephRecorder.uploadCalls.map(_._1).toSet ==
      Set("a/b/two.txt", "c/three.txt"))

    // full re-run: everything memoized, nothing replayed or uploaded
    AlephRecorder.reset()
    val st3 = AlephSync.syncDocuments(spark, metaRoot, ledger, "ds1",
      new RecordingAlephConnector)
    assert(st3 == graft.pipelines.AlephSyncStatus(0, 0, 0))
    assert(AlephRecorder.uploadCalls.isEmpty)
  }

  test("version/folder memoization plans as a LEFT ANTI join against " +
      "the ledger — never a driver-resident done-set") {
    import spark.implicits._
    // the exact frame syncDocuments/uploadBatch now build: candidates
    // anti-joined against the ledger slice. A 10^8-row ledger must stay
    // executor-side; only the pending remainder reaches the driver.
    val root = java.nio.file.Files.createTempDirectory("aleph-anti").toString
    graft.pipelines.Ledger.append(Seq("v1").toDF("key"), s"$root/ledger",
      "ds1", "aleph_version")
    val ledger = graft.pipelines.Ledger.read(spark, s"$root/ledger")
    val pending = graft.pipelines.Ledger.pending(
      Seq("v1", "v2").toDF("key"), ledger, "ds1", "aleph_version")
    val plan = pending.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti-join in:\n$plan")
    assert(pending.as[String].collect().toSeq == Seq("v2"))
  }

  test("folder creation is depth-level parallel: parents first, ≤10 concurrent") {
    AlephRecorder.reset()
    val root = java.nio.file.Files.createTempDirectory("aleph").toString
    // a wide 3-level tree: 20 siblings at depth 0, each with a child and
    // a grandchild file → 60 folders total across 3 depth levels
    val keys = (0 until 20).flatMap(i =>
      Seq(s"d$i/doc.txt", s"d$i/c$i/doc.txt", s"d$i/c$i/g$i/doc.txt"))
    DocumentsStore.writeSnapshot(docs(keys: _*), s"$root/meta", "v1")
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val connector = new RecordingAlephConnector {
      override def createFolder(path: String, parentId: Option[String]): String = {
        val now = inFlight.incrementAndGet()
        maxInFlight.getAndUpdate(m => math.max(m, now))
        try { Thread.sleep(5); super.createFolder(path, parentId) }
        finally inFlight.decrementAndGet()
      }
    }
    AlephSync.syncDocuments(spark, s"$root/meta", s"$root/ledger", "dsp",
      connector)
    val calls = AlephRecorder.folderCalls
    assert(calls.size == 60)
    // parent-before-child: every non-root folder's parent id was already
    // resolved when the child was created (no null parent chaining)
    val byPath = calls.toMap
    calls.foreach { case (path, parentId) =>
      if (path.contains("/"))
        assert(parentId.contains(s"folder:${path.substring(0, path.lastIndexOf('/'))}"),
          s"$path created before its parent resolved (got $parentId)")
      else assert(parentId.isEmpty)
    }
    // ...and creation order respects depth levels globally
    val depths = calls.map(_._1.count(_ == '/'))
    assert(depths == depths.sorted, "a deeper folder was created before a shallower one")
    // bounded parallelism: more than 1 in flight (it actually parallelizes
    // on a 20-wide level), never more than the reference's 10-cap
    assert(maxInFlight.get() > 1, "folder creation never ran concurrently")
    assert(maxInFlight.get() <= 10, s"saw ${maxInFlight.get()} concurrent creates")
    assert(byPath.size == 60)
  }

  test("upload metadata carries file_name, foreign_id, and parent folder id") {
    AlephRecorder.reset()
    val root = java.nio.file.Files.createTempDirectory("aleph").toString
    DocumentsStore.writeSnapshot(docs("x/y/doc.pdf"), s"$root/meta", "v1")
    AlephSync.syncDocuments(spark, s"$root/meta", s"$root/ledger", "ds2",
      new RecordingAlephConnector)
    val (key, meta) = AlephRecorder.uploadCalls.head
    assert(key == "x/y/doc.pdf")
    assert(meta("file_name") == "doc.pdf")
    assert(meta("foreign_id") == "x/y/doc.pdf")
    assert(meta("parent_id") == "folder:x/y")
  }

  test("prefix prepends a remote folder level (sync/aleph.py:60-62)") {
    AlephRecorder.reset()
    val root = java.nio.file.Files.createTempDirectory("aleph").toString
    DocumentsStore.writeSnapshot(docs("top.txt", "a/one.txt"), s"$root/meta", "v1")
    AlephSync.syncDocuments(spark, s"$root/meta", s"$root/ledger", "ds3",
      new RecordingAlephConnector, prefix = Some("imports"))
    assert(AlephRecorder.folderCalls ==
      Seq(("imports", None), ("imports/a", Some("folder:imports"))))
    val metas = AlephRecorder.uploadCalls.toMap
    assert(metas("top.txt")("parent_id") == "folder:imports")
    assert(metas("a/one.txt")("parent_id") == "folder:imports/a")
  }

  test("entities sync: FTM-mime + dataset-glob selection, ≤1000 batching, memoized") {
    AlephRecorder.reset()
    val root = java.nio.file.Files.createTempDirectory("aleph").toString
    val lines = (1 to 2345).map(i => s"""{"id":"e$i"}""")
    val entPath = s"$root/entities.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(entPath),
      lines.mkString("\n").getBytes)
    val resources = Seq(
      ("good_ds", entPath, AlephSync.FtmMimeType, "chk1"),
      ("good_ds", entPath, "text/csv", "chk2"), // wrong mime → skipped
      ("excluded_ds", entPath, AlephSync.FtmMimeType, "chk3") // glob-excluded
    ).toDF("dataset", "url", "mime_type", "checksum")
    val st = AlephSync.syncEntities(spark, resources, s"$root/ledger",
      new RecordingAlephConnector, url => spark.read.text(url).coalesce(1),
      excludeDataset = Some("excluded_*"))
    assert(st == graft.pipelines.AlephEntitiesStatus(1, 2345))
    val sizes = AlephRecorder.batchSizes
    assert(sizes.forall(_ <= 1000))
    assert(sizes.sum == 2345)
    assert(sizes.count(_ == 1000) >= 2) // single partition → exact 1000-chunks
    // re-run: resource memoized by checksum
    AlephRecorder.reset()
    val st2 = AlephSync.syncEntities(spark, resources, s"$root/ledger",
      new RecordingAlephConnector, url => spark.read.text(url),
      excludeDataset = Some("excluded_*"))
    assert(st2 == graft.pipelines.AlephEntitiesStatus(0, 0))
    assert(AlephRecorder.batchSizes.isEmpty)
  }

  test("resource checksum is order-independent but duplicate-sensitive") {
    // xor-of-hashes cancels pairwise ({A,A,B} == {B}); the wrapping-sum
    // + count checksum must distinguish those while staying invariant to
    // partition/line order (ledger memoization keys on it)
    val root = java.nio.file.Files.createTempDirectory("alephchk")
    def sink(name: String, lines: String*): (String, String) = {
      val p = root.resolve(name)
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      (name, p.toString)
    }
    val sinks = Seq(
      sink("just_b.json", """{"id":"B"}"""),
      sink("aab.json", """{"id":"A"}""", """{"id":"A"}""", """{"id":"B"}"""),
      sink("baa.json", """{"id":"B"}""", """{"id":"A"}""", """{"id":"A"}"""),
      sink("ab.json", """{"id":"A"}""", """{"id":"B"}"""))
    val chk = AlephSync.entityResources(spark, sinks)
      .select("dataset", "checksum").as[(String, String)].collect().toMap
    assert(chk("aab.json") == chk("baa.json"), "order must not matter")
    assert(chk("aab.json") != chk("just_b.json"),
      "duplicate pair must not cancel out of the checksum")
    assert(chk("aab.json") != chk("ab.json"), "multiplicity must count")
  }
}
