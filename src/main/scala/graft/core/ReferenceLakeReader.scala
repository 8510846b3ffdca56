package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{GraftArchive, GraftDataset}
import graft.pipelines.{ArchiveCopy, Crawl, PointLookup}

/** Read (and migrate) datasets laid out the REFERENCE's way: blobs stored
  * at their logical key paths inside the dataset directory
  * (archive/dataset.py:129-133 `_make_path(file.key)`) with metadata under
  * a configurable prefix (default `.leakrfc`, index.json
  * `metadata_prefix`). Our own lake differs deliberately — content-
  * addressed `blobs/` dedups identical bytes at rest — so this reader is
  * the bridge: point it at an EXISTING reference lake to query it in
  * place, or migrate a dataset into a graft archive wholesale.
  */
final class ReferenceLakeReader(val spark: SparkSession, val root: String,
                                val metadataPrefix: String = ".leakrfc") {

  private def metaRoot(name: String) =
    s"${root.stripSuffix("/")}/$name/$metadataPrefix"

  /** Child directories carrying a metadata-prefix directory. */
  def datasetNames: Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(root)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def isDir(p: org.apache.hadoop.fs.Path): Boolean =
      try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory &&
        isDir(new org.apache.hadoop.fs.Path(st.getPath, metadataPrefix)))
      .map(_.getPath.getName).sorted
  }

  /** The dataset's documents table from its CSV system of record. */
  def documents(name: String): DataFrame =
    DocumentsStore.readCsv(spark, s"${metaRoot(name)}/documents.csv")

  /** Blob bytes live AT the key path in this layout. */
  def openBlob(name: String, key: String): Option[Array[Byte]] = {
    val p = new org.apache.hadoop.fs.Path(s"${root.stripSuffix("/")}/$name/$key")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(in.readAllBytes()) finally in.close()
    }
  }

  /** API-header point lookup over the reference-layout documents table. */
  def lookup(name: String, key: String): Option[Map[String, String]] =
    PointLookup.lookupHeaders(documents(name), name, key)

  /** Migrate one dataset into a graft archive: distributed listing of the
    * key tree (metadata prefix excluded) → executor rehash → content-
    * addressed blob copy → publish. Incremental: already-archived keys are
    * skipped, so re-running after the source grew moves only the delta. */
  def migrateTo(name: String, target: GraftArchive): Map[String, Long] = {
    val srcRoot = s"${root.stripSuffix("/")}/$name"
    val ds: GraftDataset = target.dataset(name)
    val keys = Crawl.listKeys(spark, srcRoot, metadataPrefix = metadataPrefix)
    val fresh = Crawl.skipExisting(keys, ds.documents)
    val described = Crawl.hashAndDescribe(spark, srcRoot, fresh,
      ds.checksumAlgorithm).cache()
    val copied = ArchiveCopy.copyBlobs(spark, described, srcRoot, ds.blobRoot)
    val added = described.count()
    ds.publish(Rebuild.rebuild(ds.documents, described, described.limit(0)))
    described.unpersist()
    Map("added" -> added, "blobs_copied" -> copied)
  }
}
