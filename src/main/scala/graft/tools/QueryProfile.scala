package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft._

/** Per-query job breakdown: run one (or more) SparkEntry queries with a
  * listener that records every Spark job's wall time, then print the
  * timeline — job durations, the driver-side gaps between them, and the
  * job count. The tool the optimization loop needs for the composite
  * lakehouse/index gates, whose cost is a SEQUENCE of dozens of small
  * jobs + FS work rather than one big plan: the bench median says "11 s",
  * this says which of the ~40 jobs (and which inter-job gap) owns them.
  *
  * Usage: `runMain graft.tools.QueryProfile <q1,q2,...> [sfDir] [passes]`
  * Each query runs once untimed (warm: JIT, codegen, FS metadata), then
  * `passes` timed runs; the breakdown printed is the LAST timed run's.
  */
object QueryProfile {
  final case class JobRec(id: Int, desc: String, start: Long, end: Long)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq("text_bm25_feed_tracked"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = mutable.Map[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name.take(90)))
          .getOrElse("?")
        jobs(js.jobId) = JobRec(js.jobId, desc, js.time, -1L)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(r => jobs(je.jobId) = r.copy(end = je.time))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val q = SparkEntry.queries(name)
      // warm pass (not recorded)
      q(spark, dir).count()
      var last: Seq[JobRec] = Nil
      var wall = 0.0
      (1 to passes).foreach { _ =>
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        q(spark, dir).count()
        wall = (System.nanoTime() - t0) / 1e9
        last = jobs.synchronized(jobs.values.toSeq.sortBy(_.start))
      }
      println(s"\n=== $name  wall=${f"$wall%.3f"}s  jobs=${last.size} ===")
      var prevEnd = -1L
      var jobSum = 0.0
      var gapSum = 0.0
      last.foreach { r =>
        val dur = (r.end - r.start) / 1e3
        jobSum += dur
        val gap = if (prevEnd < 0) 0.0 else math.max(0, r.start - prevEnd) / 1e3
        gapSum += gap
        if (dur > 0.05 || gap > 0.05)
          println(f"  job ${r.id}%4d  dur=$dur%7.3fs  gapBefore=$gap%7.3fs  ${r.desc.take(100)}")
        prevEnd = math.max(prevEnd, r.end)
      }
      println(f"  --- jobSum=$jobSum%.3fs gapSum=$gapSum%.3fs wall=$wall%.3fs (driver-side = wall - jobSum overlap-naive)")
    }
    spark.stop()
  }
}
