package graft.tools

import org.apache.spark.sql.SparkSession

/** The deliberately-CPU-loaded calibration check (docs/benchmarking.md):
  * measures the [[graft.Bench.calibrate]] probe quiet, then again under
  * a full-core spinner load, and prints both plus the
  * [[graft.Bench.contendedVerdict]] each reading would produce — the
  * manual proof that the contended wire actually trips on a loaded
  * container. Usage: `sbt "runMain graft.tools.CalCheck"`. */
object CalCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one throwaway probe first: the quiet reading must reflect steady
    // state, not codegen/classloading of the probe plan itself
    graft.Bench.calibrate(spark, reps = 1)
    val quiet = graft.Bench.calibrate(spark)
    @volatile var stop = false
    val hogs = (1 to 2 * cpus.toInt).map { _ =>
      val t = new Thread(new Runnable {
        def run(): Unit = {
          var x = 0L
          while (!stop) x ^= x * 6364136223846793005L + 1442695040888963407L
        }
      })
      t.setDaemon(true)
      t.start()
      t
    }
    val loaded = graft.Bench.calibrate(spark)
    stop = true
    hogs.foreach(_.join(1000))
    println(f"""{"metric":"calcheck","quiet_sec":$quiet%.3f,"loaded_sec":$loaded%.3f,""" +
      s""""quiet_contended":${graft.Bench.contendedVerdict(Seq(quiet, quiet))},""" +
      s""""loaded_contended":${graft.Bench.contendedVerdict(Seq(quiet, loaded))}}""")
    spark.stop()
  }
}
