package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated 10× evidence for the round-17 incremental paths — the
  * numbers the composite gates cannot show because their
  * by-construction table builds dominate:
  *
  *  1. BLOOM-BOUNDED RETRACTION: a lookup-sized takedown against a
  *     Bloom-manifested table vs the same takedown's full key-column
  *     pass. The claim under test: the narrowed delete's wall stops
  *     tracking the table size (it reads only the files that might
  *     hold a batch key), while the full pass grows ~linearly.
  *  2. FEED-DRIVEN INDEX MAINTENANCE at a 1 % delta: a PERSISTED
  *     (parquet-reloaded — the deployment shape) BM25 / VectorIndex
  *     updated through `applyFeedTo*Index` vs a from-scratch rebuild
  *     of the live corpus, both forced through one fixed serve. The
  *     claim: apply pays an index pass + a feed pass (no corpus
  *     re-tokenize / re-encode), so the apply:rebuild gap widens with
  *     scale.
  *
  * Tables and indexes are built OUTSIDE the timed windows; each timed
  * operation runs twice and reports best-of-2 (the ScaleBench
  * discipline). One JSON line per (probe, scale).
  *
  * Usage: `MaintenanceProbe <srcSfDir> <workDir> <copies>` — reuses
  * [[ScaleBench.synthesize]]'s corpus (built once, reused across
  * runs).
  */
object MaintenanceProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def best2[T](body: => T): Double =
    math.min(time(body), time(body))

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: MaintenanceProbe <srcSfDir> <workDir> <copies>")
    val Array(srcDir, workDir, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-maintenance-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scaled = s"$workDir/x$copies"
    val marker = new java.io.File(s"$scaled/documents.parquet")
    if (!marker.exists()) synthesizeDocs(spark, srcDir, scaled, copies)

    // one untimed warmup pass at 1x first: the very first run of each
    // operator family pays codegen + classloading that would otherwise
    // contaminate whichever scale runs first
    probeScale(spark, "warmup", srcDir, s"$workDir/probe-warmup", 16,
      report = false)
    Seq(("1x", srcDir, 16), (s"${copies}x", scaled, 16 * copies))
      .foreach { case (label, dir, parts) =>
        probeScale(spark, label, dir, s"$workDir/probe-$label", parts)
      }
    spark.stop()
  }

  /** Documents + embeddings only (the two tables these probes read) —
    * the [[ScaleBench.synthesize]] mutation discipline (shifted ids,
    * two-axis text rotation so copies stay textually distinct past 10
    * copies) without paying the full 8-table synthesis at 100x. */
  private def synthesizeDocs(spark: SparkSession, srcDir: String,
                             outDir: String, copies: Int): Unit = {
    def rotate(s: String, k: Int): String = {
      val n = ((k % s.length) + s.length) % s.length
      s.drop(n) + s.take(n)
    }
    val alpha = "aeioustnrl"
    val alpha2 = "bcdfghjkmp"
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until copies).map { k =>
      val m1 = if (k % 10 == 0) col("text")
        else translate(col("text"), alpha, rotate(alpha, k % 10))
      val m2 = if (k / 10 % 10 == 0) m1
        else translate(m1, alpha2, rotate(alpha2, k / 10 % 10))
      docs.select((col("doc_id") + lit(k * ScaleBench.Offset))
          .as("doc_id"),
        m2.as("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until copies).map { k =>
      emb.select((col("vec_id") + lit(k * ScaleBench.Offset))
        .as("vec_id"), col("embedding"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  private def probeScale(spark: SparkSession, label: String,
                         dir: String, work: String, parts: Int,
                         report: Boolean = true): Unit = {
    val f = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(work), true)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "n_chars")

    // ---- probe 1: bloom-bounded retraction vs the full pass --------
    // two identical tables (file count grows with scale — the skip's
    // whole subject), one carrying the membership manifest
    val full = s"$work/take_full"
    val bloomed = s"$work/take_bloom"
    Seq(full, bloomed).foreach { p =>
      graft.core.Layout.zorder(docs, Seq("doc_id", "n_chars"), bits = 8,
          partitions = parts)
        .write.parquet(p)
    }
    // geometry sized to the ACTUAL rows per file (~3k here) — the
    // library default (2^21) targets 1 GB files; oversizing sketches
    // 100x would just measure manifest deserialization
    graft.core.Layout.writeBloomManifest(spark, bloomed, "doc_id",
      8192L)
    // a takedown-sized key list from ONE narrow copy-0 id range — a
    // MATERIALIZED small frame (the CDC/takedown shape: the request
    // list arrives as its own tiny table, never as a filter over the
    // corpus being retracted)
    val keys = spark.range(100, 600).select(col("id").as("doc_id"))
    val tFull = best2 {
      graft.core.Lakehouse.deleteMatching(spark, full, keys, "doc_id")
    }
    val tBloom = best2 {
      graft.core.Lakehouse.deleteMatching(spark, bloomed, keys, "doc_id")
    }
    emit("takedown_full_pass", label, tFull, report)
    emit("takedown_bloom_bounded", label, tBloom, report)

    // ---- probe 2: BM25 feed maintenance at a 1 % delta -------------
    // the lakehouse corpus: 99 % resident, 1 % arriving as gen 1
    val lake = s"$work/docs_lake"
    graft.core.Layout.appendGeneration(spark, lake,
      docs.filter(col("doc_id") % 100 =!= 0).select("doc_id", "text"),
      Seq("doc_id"), bits = 8, partitions = parts, gen = 0L)
    // bootstrap index PERSISTED (the deployment shape: serving reloads
    // parquet, never re-tokenizes the corpus)
    val idx0 = graft.llm.Retrieval.bm25Index(
      graft.core.Lakehouse.scanAsOf(spark, lake, 0L))
    idx0.postings.write.parquet(s"$work/bm25/postings")
    idx0.docFreq.write.parquet(s"$work/bm25/docfreq")
    idx0.stats.write.parquet(s"$work/bm25/stats")
    val persisted = graft.llm.Retrieval.Bm25Index(
      spark.read.parquet(s"$work/bm25/postings"),
      spark.read.parquet(s"$work/bm25/docfreq"),
      spark.read.parquet(s"$work/bm25/stats"))
    graft.core.Layout.appendGeneration(spark, lake,
      docs.filter(col("doc_id") % 100 === 0).select("doc_id", "text"),
      Seq("doc_id"), bits = 8, partitions = 2, gen = 1L)
    // the pulled window LANDED to parquet before consumption (the
    // replica discipline — the feed is read once off disk, not
    // re-evaluated per downstream frame)
    graft.core.Lakehouse.changesBetween(spark, lake, 0L, 1L)
      .write.parquet(s"$work/feed")
    val feed = spark.read.parquet(s"$work/feed")
    val q = docs.filter(col("doc_id") < 100)
      .select(col("doc_id").as("query_id"),
        substring(col("text"), 1, 40).as("query_text"))
    def serve(ix: graft.llm.Retrieval.Bm25Index): Long =
      graft.llm.Retrieval.bm25TopKAgainst(ix, q, k = 5).count()
    val tApply = best2 {
      serve(graft.llm.Retrieval.applyFeedToBm25Index(persisted, feed))
    }
    val tRebuild = best2 {
      serve(graft.llm.Retrieval.bm25Index(
        graft.core.Lakehouse.scan(spark, lake)))
    }
    emit("bm25_feed_apply_1pct", label, tApply, report)
    emit("bm25_rebuild", label, tRebuild, report)

    // ---- probe 3: ANN feed maintenance at a 1 % delta --------------
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val elake = s"$work/emb_lake"
    graft.core.Layout.appendGeneration(spark, elake,
      emb.filter(col("vec_id") % 100 =!= 0), Seq("vec_id"), bits = 8,
      partitions = parts, gen = 0L)
    val vidx0 = graft.llm.Similarity.buildVectorIndex(
      graft.core.Lakehouse.scanAsOf(spark, elake, 0L),
      trainOn = emb.filter(col("vec_id") < 2000))
    vidx0.centroids.write.parquet(s"$work/vidx/centroids")
    vidx0.codebooks.write.parquet(s"$work/vidx/codebooks")
    vidx0.vectors.write.parquet(s"$work/vidx/vectors")
    val vPersisted = graft.llm.Similarity.VectorIndex(
      spark.read.parquet(s"$work/vidx/centroids"),
      spark.read.parquet(s"$work/vidx/codebooks"),
      spark.read.parquet(s"$work/vidx/vectors"))
    graft.core.Layout.appendGeneration(spark, elake,
      emb.filter(col("vec_id") % 100 === 0), Seq("vec_id"), bits = 8,
      partitions = 2, gen = 1L)
    graft.core.Lakehouse.changesBetween(spark, elake, 0L, 1L)
      .write.parquet(s"$work/efeed")
    val efeed = spark.read.parquet(s"$work/efeed")
    val eq = emb.filter(col("vec_id") < 20)
    def vserve(ix: graft.llm.Similarity.VectorIndex): Long =
      graft.llm.Similarity.ivfTopKAgainst(ix, eq, k = 10, nprobe = 4)
        .count()
    val tVApply = best2 {
      vserve(graft.llm.Similarity.applyFeedToVectorIndex(vPersisted,
        efeed))
    }
    val tVRebuild = best2 {
      vserve(graft.llm.Similarity.buildVectorIndex(
        graft.core.Lakehouse.scan(spark, elake),
        trainOn = emb.filter(col("vec_id") < 2000)))
    }
    emit("ann_feed_apply_1pct", label, tVApply, report)
    emit("ann_rebuild", label, tVRebuild, report)
  }

  private def emit(probe: String, scale: String, sec: Double,
                   report: Boolean = true): Unit =
    // one greppable JSON line per measurement
    if (report)
      println(f"""{"probe":"$probe","scale":"$scale","sec":$sec%.3f}""")
}
