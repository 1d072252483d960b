package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) — the compression half
  * of the standard 100 TB ANN recipe (IVF for pruning + PQ for in-cell
  * distance): the 64-dim float vector (256 bytes) becomes `m` sub-codes
  * of log2(k) bits (m=8, k=16 → 4 bytes, 64× smaller), and query-time
  * distances are table lookups instead of float dot products.
  *
  * Spark shape:
  *  - TRAIN: per-subspace k-means on the SAME layout-independent
  *    hash-gated sample as [[Ivf]] (driver-side Lloyd over ≤4096 rows —
  *    tiny, deterministic, no job storm).
  *  - ENCODE: one narrow map over the corpus (broadcast codebooks).
  *  - SEARCH (ADC — asymmetric distance): the query's per-subspace
  *    distance table (m·k doubles) is folded into a LITERAL array, so
  *    scoring is a codegen'd `aggregate(zip_with(codes, ...))` over the
  *    scan — no join, no shuffle before the final top-k
  *    (`TakeOrderedAndProject`).
  *
  * Correctness treatment mirrors the other ANN operators: every input is
  * fixed (deterministic sample → deterministic codebooks), so recall@k
  * against brute force is a pinned constant in `SparkEntry.oracleSql`,
  * and `PqSpec` pins the reconstruction-error and compression contracts.
  */
object Pq {

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)

  /** Session codebook registry: trained once per (dir, m, k,
    * trainSample), reused by every encode/search — the training sample
    * collect + Lloyd loop must not re-run per query. Same
    * immutable-corpus contract as the other build-once caches. */
  private val codebookCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Int), Array[Array[Array[Double]]]]()

  /** Drop cached codebooks (test hygiene / corpus-changed invalidation). */
  def clearCodebookCache(): Unit = codebookCache.clear()

  /** Per-subspace codebooks: `m` arrays of `k` centroids of dim/m floats.
    * Trains on the hash-ordered uniform sample ([[Ivf.uniformSample]] —
    * layout-independent by the same argument); build-once per session. */
  def trainCodebooks(spark: SparkSession, dir: String, m: Int = 8,
      k: Int = 16, trainSample: Int = 4096): Array[Array[Array[Double]]] =
    codebookCache.computeIfAbsent((dir, m, k, trainSample), { _ =>
      val sample = Ivf.uniformSample(embeddings(spark, dir), trainSample)
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      require(sample.nonEmpty, "empty training sample")
      val dim = sample(0).length
      require(dim % m == 0, s"dim $dim must be divisible by m=$m")
      val sub = dim / m
      Array.tabulate(m) { s =>
        val slice = sample.map(v => v.slice(s * sub, (s + 1) * sub))
        Ivf.trainCentroids(slice, k)
      }
    })

  /** Encode every vector: array of `m` codes, code s = index of the
    * nearest centroid of subspace s (ties → lowest, [[Ivf.nearest]]). */
  def encode(spark: SparkSession, dir: String, m: Int = 8, k: Int = 16,
      trainSample: Int = 4096): DataFrame = {
    val books = trainCodebooks(spark, dir, m, k, trainSample)
    val bc = spark.sparkContext.broadcast(books)
    val sub = books(0)(0).length
    val encodeUdf = udf((v: Seq[Float]) => {
      val arr = v.toArray
      Array.tabulate(m)(s =>
        Ivf.nearest(bc.value(s), arr.slice(s * sub, (s + 1) * sub)))
    })
    embeddings(spark, dir).select(col("vec_id"), col("label"),
      encodeUdf(col("embedding")).as("codes"))
  }

  /** Decode codes back to the reconstructed vector (centroid
    * concatenation) — the quantization-error half of the contract. */
  def reconstruct(books: Array[Array[Array[Double]]],
      codes: Array[Int]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, s) => books(s)(c) }

  /** ADC top-k for one query vector: distance ≈ Σ_s table(s)(code_s),
    * where table(s)(c) = ‖q_s − centroid_c‖². The table is a literal
    * (m·k doubles), so the scoring expression is pure codegen over the
    * codes column — the plan is scan → project → TakeOrderedAndProject. */
  def topK(spark: SparkSession, dir: String, queryId: Long, kNn: Int = 10,
      m: Int = 8, k: Int = 16): DataFrame = {
    val books = trainCodebooks(spark, dir, m, k)
    val qVec = embeddings(spark, dir).filter(col("vec_id") === queryId)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val sub = books(0)(0).length
    // flat lookup table: entry s*k + c = squared L2 of query subvector s
    // to centroid c of subspace s
    val lut: Seq[Double] = (0 until m).flatMap { s =>
      (0 until k).map { c =>
        val cent = books(s)(c)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = cent(j) - qVec(s * sub + j); d += diff * diff; j += 1
        }
        d
      }
    }
    val codes = encode(spark, dir, m, k)
    val adc: Column = aggregate(
      zip_with(col("codes"), typedlit((0 until m).map(_ * k)),
        (c, base) => element_at(typedlit(lut), (base + c + 1).cast("int"))),
      lit(0.0), (acc, v) => acc + v)
    codes.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), round(adc, 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(kNn)
  }

  // --------------------------------------------------- IVF+PQ composition

  /** Session registry of materialized IVF+PQ indexes — the composed
    * build-once artifact: vectors tagged with their IVF cell AND their
    * PQ codes, written partitioned by cell. Same immutable-corpus cache
    * contract as [[Ivf.materializeIndex]]. */
  private val ivfPqCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Int, Int),
    (String, Array[Array[Double]], Array[Array[Array[Double]]])]()

  /** Build the composed index ONCE: IVF cell tags ([[Ivf.buildIndex]]) +
    * PQ codes in the same table, partitioned by cluster — a probe prunes
    * whole cell directories at the scan AND scores 4-byte codes instead
    * of 256-byte vectors. This is the standard 100 TB ANN layout
    * (IVF-PQ); the raw embedding rides along for the exact re-rank
    * stage. */
  def materializeIvfPqIndex(spark: SparkSession, dir: String,
      nlist: Int = 16, m: Int = 8, k: Int = 16, trainSample: Int = 4096)
      : (String, Array[Array[Double]], Array[Array[Array[Double]]]) =
    ivfPqCache.computeIfAbsent((dir, nlist, m, k, trainSample), { _ =>
      val (indexed, centroids) = Ivf.buildIndex(spark, dir, nlist, trainSample)
      val books = trainCodebooks(spark, dir, m, k, trainSample)
      val bc = spark.sparkContext.broadcast(books)
      val sub = books(0)(0).length
      val encodeUdf = udf((v: Seq[Float]) => {
        val arr = v.toArray
        Array.tabulate(m)(s =>
          Ivf.nearest(bc.value(s), arr.slice(s * sub, (s + 1) * sub)))
      })
      val path = java.nio.file.Files.createTempDirectory("ivfpq_index").toString
      indexed.withColumn("codes", encodeUdf(col("embedding")))
        .write.mode("overwrite").partitionBy("cluster").parquet(path)
      (path, centroids, books)
    })

  /** Drop composed indexes and delete their directories (test hygiene /
    * corpus-changed invalidation). */
  def clearIvfPqCache(): Unit = {
    ivfPqCache.values.forEach { case (path, _, _) =>
      Ivf.deleteRecursively(new java.io.File(path))
    }
    ivfPqCache.clear()
  }

  /** Two-stage IVF-PQ search — the full production recipe:
    *  1. PRUNE: read only the `nprobe` nearest cells (parquet partition
    *     pruning, like [[Ivf.probe]]).
    *  2. SHORTLIST: ADC over the 4-byte codes (codegen'd literal-table
    *     fold) keeps the cheapest `kNn·rerank` candidates.
    *  3. RE-RANK: exact cosine on the shortlist's raw embeddings →
    *     final top-k. The expensive float math touches `kNn·rerank`
    *     rows, not the corpus.
    * Plan: pruned scan → codegen project → TakeOrdered(kNn·rerank) →
    * exact-cosine project → TakeOrdered(kNn). No joins, no shuffles. */
  def topKIvfPq(spark: SparkSession, dir: String, queryId: Long,
      kNn: Int = 10, nlist: Int = 16, nprobe: Int = 4, m: Int = 8,
      k: Int = 16, rerank: Int = 4): DataFrame = {
    val (path, centroids, books) = materializeIvfPqIndex(spark, dir, nlist, m, k)
    val qVec = embeddings(spark, dir).filter(col("vec_id") === queryId)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val cells = Ivf.nearestCells(centroids, qVec, nprobe)
    val sub = books(0)(0).length
    val lut: Seq[Double] = (0 until m).flatMap { s =>
      (0 until k).map { c =>
        val cent = books(s)(c)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = cent(j) - qVec(s * sub + j); d += diff * diff; j += 1
        }
        d
      }
    }
    val adc: Column = aggregate(
      zip_with(col("codes"), typedlit((0 until m).map(_ * k)),
        (c, base) => element_at(typedlit(lut), (base + c + 1).cast("int"))),
      lit(0.0), (acc, v) => acc + v)
    val q = qVec.map(_.toDouble)
    val qnorm = math.sqrt(q.map(x => x * x).sum)
    val dotQ: Column = aggregate(
      zip_with(col("embedding").cast("array<double>"), typedlit(q.toSeq),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val dotSelf: Column = aggregate(
      zip_with(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    spark.read.parquet(path)
      .filter(col("cluster").isin(cells: _*))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), col("embedding"),
        adc.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(kNn * rerank)
      .select(col("vec_id"), col("label"),
        round(dotQ / (sqrt(dotSelf) * lit(qnorm)), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(kNn)
  }

  /** Recall@k of PQ-ADC (or the composed IVF-PQ two-stage search when
    * `method = "ivfpq"`) against the exact brute-force neighbors — same
    * pinned-constant oracle treatment as the LSH/IVF recall entries. */
  def annRecall(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, method: String = "pq"): DataFrame = {
    val truth = Similarity.bruteForceTopK(spark, dir, queryId, k)
      .select("vec_id")
    val approx = (method match {
      case "pq" => topK(spark, dir, queryId, k)
      case "ivfpq" => topKIvfPq(spark, dir, queryId, k)
      case other => throw new IllegalArgumentException(
        s"unknown PQ method '$other' (expected 'pq' or 'ivfpq')")
    }).select("vec_id")
    truth.join(approx.withColumn("hit", lit(1)), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .select(lit(method).as("method"), lit(k).as("k"),
        col("n_true"), col("n_hit").cast("long").as("n_hit"),
        round(col("n_hit").cast("double") / col("n_true").cast("double"), 4)
          .as("recall"))
  }
}
