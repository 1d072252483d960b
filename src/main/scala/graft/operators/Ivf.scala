package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to hyperplane LSH (Similarity): a coarse k-means quantizer assigns
  * every vector to one of `nlist` cells; a query probes only the `nprobe`
  * cells whose centroids are nearest, then brute-forces inside them.
  *
  * Index build follows the standard IVF recipe (train the coarse quantizer
  * on a bounded sample, assign the full corpus distributed): a driver-side
  * Lloyd loop over ≤`trainSample` vectors — deterministic (fixed seed-free
  * init: first-k distinct sample rows), no MLlib job storm — then ONE
  * distributed pass tags every vector with its cell via a broadcast
  * centroid table. At 100 TB: write the indexed table partitioned by
  * `cluster` and the probe filter becomes partition pruning at the scan;
  * the sample collect is bounded (default 4096 × 64 floats ≈ 1 MB).
  */
object Ivf {

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Train coarse centroids with Lloyd iterations on a bounded sample. */
  def trainCentroids(sample: Array[Array[Float]], nlist: Int,
      iters: Int = 10): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    val k = math.min(nlist, sample.length)
    // deterministic init: evenly-spaced sample rows
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).map(_.toDouble))
    for (_ <- 1 to iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** Index of the nearest centroid by L2 distance (ties → lowest index). */
  def nearest(centroids: Array[Array[Double]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var j = 0
      val cent = centroids(c)
      while (j < cent.length && j < v.length) {
        val diff = cent(j) - v(j); d += diff * diff; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Index: every vector tagged with its IVF cell + the centroid table. */
  def buildIndex(spark: SparkSession, dir: String, nlist: Int = 16,
      trainSample: Int = 4096): (DataFrame, Array[Array[Double]]) = {
    val df = embeddings(spark, dir)
    val sample = df.select("embedding").limit(trainSample)
      .collect().map(_.getSeq[Float](0).toArray)
    val centroids = trainCentroids(sample, nlist)
    val bc = spark.sparkContext.broadcast(centroids)
    val assign = udf((v: Seq[Float]) => nearest(bc.value, v.toArray))
    (df.withColumn("cluster", assign(col("embedding"))), centroids)
  }

  /** ANN top-k for one query vector: probe the nprobe nearest cells only. */
  def topK(spark: SparkSession, dir: String, queryId: Long, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val (indexed, centroids) = buildIndex(spark, dir, nlist)
    val qVec = indexed.filter(col("vec_id") === queryId)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

    // driver-side: rank centroids by distance to the query (nlist is tiny)
    val probes = centroids.zipWithIndex.map { case (cent, i) =>
      var d = 0.0
      var j = 0
      while (j < cent.length && j < qVec.length) {
        val diff = cent(j) - qVec(j); d += diff * diff; j += 1
      }
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)

    val q = indexed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val dot = expr(
      "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(q_emb AS ARRAY<DOUBLE>), " +
        "(x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val norm = expr(
      "sqrt(aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>), " +
        "(x, y) -> x * y), 0D, (acc, v) -> acc + v))")
    val qnorm = expr(
      "sqrt(aggregate(zip_with(CAST(q_emb AS ARRAY<DOUBLE>), CAST(q_emb AS ARRAY<DOUBLE>), " +
        "(x, y) -> x * y), 0D, (acc, v) -> acc + v))")

    indexed
      .filter(col("cluster").isin(probes.toSeq: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), col("cluster"),
        round(dot / (norm * qnorm), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }
}
