package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time a SUBSET of registered queries (median of 3 noop-sink
  * materializations, the Bench recipe) without paying for the full 150+
  * query sweep — the iteration loop for targeted perf work. Usage:
  * `runMain graft.QueryTimer <sfDir> <query name>...`. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTimer <sfDir> <query>...")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // match Verify/Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // SPARK_GRAFT_QT_RUNS trims repeats for long sweeps (the sf1 scale
    // sweep times ~60 queries at two SFs); a failing query prints FAILED
    // and the sweep continues instead of dying mid-list.
    val runs = sys.env.getOrElse("SPARK_GRAFT_QT_RUNS", "3").toInt
    // Bench's calibration probe, bracketing each query (policy v5): the
    // median is reported in CALIB UNITS too, directly comparable to the
    // committed "records" map regardless of box speed at measurement time
    // (a fresh QueryTimer JVM rides the same start-of-JVM ramp Bench's
    // interleaved probes divide out).
    def probe(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 50000000L, 1, cpus.toInt)
          .selectExpr("sum((id * 2654435761) % 1000000007) AS s").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      (0 until 3).map(_ => once()).min
    }
    var probeBefore = probe()
    args.tail.foreach { name =>
      val fn = Registry.byName(name).fn
      try {
        val ts = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          materialize(fn(spark, sfDir))
          val t = (System.nanoTime() - t0) / 1e9
          // untimed: drop this run's localCheckpoint blocks so every run
          // starts with a clean storage pool (same policy as Bench)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          t
        }
        val probeAfter = probe()
        val local = math.min(probeBefore, probeAfter)
        probeBefore = probeAfter
        val med = ts.sorted.apply((ts.size - 1) / 2)
        println(f"[qtimer] $name%-28s median=$med%7.3f s = ${med / local}%.2f xcal (probe=$local%.3f)  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[qtimer] $name FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(200)}")
      }
    }
    spark.stop()
  }
}
