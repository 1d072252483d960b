package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to hyperplane LSH (Similarity): a coarse k-means quantizer assigns
  * every vector to one of `nlist` cells; a query probes only the `nprobe`
  * cells whose centroids are nearest, then brute-forces inside them.
  *
  * At 100 TB: the index build is one MLlib k-means job (sampled train +
  * one assignment pass); search reads only ~nprobe/nlist of the data via a
  * partition-prunable `cluster` column — write the indexed table partitioned
  * by `cluster` and the probe filter becomes partition pruning at the scan.
  * Training uses a fixed seed: rebuilds are reproducible.
  */
object Ivf {

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Index: every vector tagged with its IVF cell + the centroid table.
    * Returns (assignments, centroids). */
  def buildIndex(spark: SparkSession, dir: String, nlist: Int = 16)
      : (DataFrame, Array[Vector]) = {
    val withVec = embeddings(spark, dir)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans()
      .setK(nlist).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(withVec)
    (model.transform(withVec).drop("features"), model.clusterCenters)
  }

  /** ANN top-k for one query vector: probe the nprobe nearest cells only. */
  def topK(spark: SparkSession, dir: String, queryId: Long, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val (indexed, centroids) = buildIndex(spark, dir, nlist)
    val qVec = indexed.filter(col("vec_id") === queryId)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

    // driver-side: rank centroids by distance to the query (nlist is tiny)
    val probes = centroids.zipWithIndex.map { case (c, i) =>
      val arr = c.toArray
      var d = 0.0
      var j = 0
      while (j < arr.length && j < qVec.length) {
        val diff = arr(j) - qVec(j); d += diff * diff; j += 1
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
