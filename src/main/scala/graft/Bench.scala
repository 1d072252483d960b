package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet uses TIMESTAMP(NANOS); read as long (see Relational.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup at the smallest SF: triggers codegen compilation + JIT for every
    // query shape so the timed run measures the engine, not JVM warmup.
    // (Steady-state is 5-10x cold: q_agg_q1 7.6s cold vs 0.6s warm.)
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    spark.catalog.clearCache() // drop any frames persisted during warmup
    // Per-query lower-median-of-3: a transient host/JVM stall poisons at
    // most one of the three samples, so the reported time is a property of
    // the plan, not of the machine's worst moment. (r2 lost ~85 s to one
    // stall smeared across 5 contiguous one-shot timings.)
    val Reps = 3
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
        spark.catalog.clearCache() // isolate queries from each other's state
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val good = times.filter(_ >= 0.0).sorted
      // a query that throws is reported as -1, never as a fast "success"
      name -> (if (good.isEmpty) -1.0 else good((good.size - 1) / 2))
    }
    val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":[${failed.mkString(",")}]}""")
    spark.stop()
  }
}
