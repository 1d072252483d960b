package graft.tools

import org.apache.spark.sql.SparkSession

/** Second-decade scale probe for the PRODUCTION AutoPlanes knn path
  * (r12 verdict task #1): the `q_knn_join` bench entry deliberately
  * pins `numPlanes = 8` so its oracle can embed the 8-plane hyperplane
  * constants — that fixed-bucket envelope is superlinear BY DESIGN
  * (~n²/256 candidate pairs), while production defaults every LSH
  * self-join to [[graft.operators.Similarity.AutoPlanes]]
  * (planesFor(n): buckets grow with n, occupancy pinned). This main
  * times the production path cold (fresh-JVM rep 0, includes the
  * bucket build) and warm (min of 3) on one fixture dir so the
  * 1×/10×/100× decade ratios measure the sizing rule itself.
  *
  * Usage: `runMain graft.tools.ScaleProbe <sfDir>` — run once per
  * scale in a fresh JVM; emits one JSON line.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <sfDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    val planes = graft.operators.Similarity.resolvePlanes(
      spark, dir, graft.operators.Similarity.AutoPlanes)
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.operators.Similarity.knnJoin(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = run()
    spark.catalog.clearCache()
    val warm = (1 to 3).map { _ =>
      val t = run(); spark.catalog.clearCache(); t
    }.min
    println(f"""{"probe":"knn_join_autoplanes","dir":"$dir","planes":$planes,"cold_s":$cold%.3f,"warm_min_s":$warm%.3f}""")
    spark.stop()
  }
}
