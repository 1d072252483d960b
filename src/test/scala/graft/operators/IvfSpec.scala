package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  test("index assigns every vector to a cell; cells bounded by nlist") {
    val (indexed, centroids) = Ivf.buildIndex(spark, sfDir, nlist = 8)
    assert(centroids.length === 8)
    assert(indexed.filter(col("cluster").isNull).count() === 0)
    val cells = indexed.select("cluster").distinct().count()
    assert(cells > 1 && cells <= 8)
  }

  test("IVF top-k finds planted near-neighbors through the probed cells") {
    import spark.implicits._
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    def unit(seed: Long): Array[Float] = {
      val v = Array.tabulate(64)(j => splitmix(seed * 64 + j).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = unit(1L)
    def perturb(seed: Long): Array[Float] = {
      val noise = unit(seed)
      val v = base.zip(noise).map { case (b, n) => b + (0.05 * n).toFloat }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / norm).toFloat)
    }
    val rows = Seq((0L, base, 0)) ++ (1L to 3L).map(i => (i, perturb(100 + i), 0)) ++
      (10L to 80L).map(i => (i, unit(1000 + i), 1))
    val tmp = java.nio.file.Files.createTempDirectory("ivf").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val top = Ivf.topK(spark, tmp, queryId = 0L, k = 3, nlist = 6, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top === Set(1L, 2L, 3L), s"got $top")
  }

  test("materialized probe prunes partitions: only nprobe cells scanned") {
    Ivf.clearIndexCache()
    val (path, centroids) = Ivf.materializeIndex(spark, sfDir, nlist = 16)
    val q = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") === 0L).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val probed = Ivf.probe(spark, path, centroids, q, k = 10, nprobe = 4,
      excludeId = Some(0L))
    val scans = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "probe must be a parquet scan")
    val scan = scans.head
    // the cluster IN (...) predicate must be a PARTITION filter (pruned at
    // file listing), not a post-scan data filter
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cluster")),
      s"cluster filter must prune partitions, got: ${scan.partitionFilters}")
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).length
    val totalCells = spark.read.parquet(path)
      .select("cluster").distinct().count()
    assert(selected <= 4, s"probe must list ≤ nprobe partitions, got $selected")
    assert(selected < totalCells, "probe must read a strict subset of cells")
    assert(probed.count() === 10)
    // build-once: a second topK over the same (dir, nlist) reuses the index
    val (path2, _) = Ivf.materializeIndex(spark, sfDir, nlist = 16)
    assert(path2 === path)
    // a different trainSample is a DIFFERENT index (cache keys on it)
    val (path3, _) = Ivf.materializeIndex(spark, sfDir, nlist = 16,
      trainSample = 128)
    assert(path3 !== path, "trainSample must be part of the cache key")
    // clearIndexCache deletes the materialized temp directories
    Ivf.clearIndexCache()
    assert(!new java.io.File(path).exists(), "clear must delete index dirs")
    assert(!new java.io.File(path3).exists(), "clear must delete index dirs")
  }

  test("probing is selective: fewer rows scanned than brute force") {
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val (indexed, _) = Ivf.buildIndex(spark, sfDir, nlist = 16)
    val largestProbeSet = indexed.groupBy("cluster").count()
      .orderBy(desc("count")).limit(4).agg(sum("count")).collect()(0).getLong(0)
    assert(largestProbeSet < all, "probing must touch a strict subset")
  }
}
