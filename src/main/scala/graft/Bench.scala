package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
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
    // optional focus filter for local diagnosis: SPARK_GRAFT_ONLY=q_a,q_b
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name)) }.toSeq
    // Round-robin passes: rep r of EVERY query runs before rep r+1 of any.
    // The r3 driver run showed a single host stall can span minutes — with
    // consecutive per-query reps it poisoned all 3 samples of several
    // adjacent queries (q_ann_ivf "43.5 s" vs 0.6 s clean). With passes,
    // one contiguous stall hits at most one sample per query; the per-query
    // MIN across passes is then a property of the plan, not of the
    // machine's worst moment. (Stalls only ever ADD time, so min is the
    // unbiased estimator of plan cost here.)
    val samples = collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to Reps; (name, fn) <- selected) {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      spark.catalog.clearCache() // isolate queries from each other's state
      val dt = (System.nanoTime() - t0) / 1e9
      // per-rep trace on stderr: lets a post-mortem tell a bad plan
      // (all reps slow) from a transient host stall (one rep slow)
      System.err.println(f"[bench] $name rep$rep ${dt}%.3f s ok=$ok")
      if (ok) samples(name) = dt :: samples.getOrElse(name, Nil)
    }
    val results = selected.map { case (name, _) =>
      // a query that throws in every pass reports -1, never a fast "success"
      name -> samples.get(name).map(_.min).getOrElse(-1.0)
    }.toMap
    val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":[${failed.mkString(",")}]}""")
    spark.stop()
  }
}
