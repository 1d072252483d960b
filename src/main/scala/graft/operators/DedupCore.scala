package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared dedup infrastructure (split out of the former 2,085-line
  * Dedup.scala in round 12 — pure code motion, one trait per operator
  * family, all mixed back into the single public [[Dedup]] object):
  * the grouped-bucket pair generator + prune accounting every LSH
  * family shares, exact dedup, shingle/MinHash-signature/Jaccard
  * expressions. */
private[operators] trait DedupCore {

  /** The (band, band_key) buckets holding more than `maxBucket` docs —
    * i.e. what [[pruneHotBuckets]] WOULD drop. Run this alongside a capped
    * dedup to see what pruning costs: a non-empty result means recall was
    * traded for boundedness on those buckets (legitimate >maxBucket
    * near-dup clusters lose pairs; boilerplate/exact-dup clusters lose
    * nothing that [[exact]] dedup wouldn't catch). */
  private[operators] def hotBuckets(bandKeys: DataFrame,
      maxBucket: Int): DataFrame =
    bandKeys.groupBy("band", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Candidate pairs by grouped-bucket expansion — the classic LSH shape:
    * ONE shuffle groups band keys into buckets (`collect_list`, map-side
    * combined), the `maxBucket` cap is an inline `size` filter on the
    * grouped array (subsuming the former hot-bucket aggregation + anti-
    * join — two extra passes over the band keys), and within-bucket pairs
    * are emitted by a pure array expression over the sorted ids (i < j ⇒
    * doc_a < doc_b). Bucket arrays are bounded by `maxBucket`, so executor
    * memory is bounded by construction; `maxBucket <= 0` disables the cap
    * AND that bound. Pruning is SILENT in the pair output — use
    * [[minHashHotBuckets]] / [[simHashHotBuckets]] to audit what a cap
    * dropped. Measured at sf0.1: ~2× faster than the self-join form, and
    * one pass over the signatures instead of three. */
  private val pruneMetricSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Fresh observation name for a bucket-prune metric — shared with the
    * embedding-LSH caps in [[Similarity]] so ONE listener surfaces every
    * cap's pruning, text and embedding alike. */
  private[operators] def pruneMetricName(): String =
    s"graft_bucket_prune_${pruneMetricSeq.incrementAndGet()}"

  /** Last prune counts per observation name — (pruned_buckets,
    * pruned_docs), updated asynchronously by the per-session listener
    * [[ensurePruneListener]] installs. Test hook + ops surface. Bounded
    * to the most recent [[MaxPruneEntries]] observations (each
    * `bucketPairs` call mints a fresh name, so a long-lived driver would
    * otherwise grow this map forever). */
  private val MaxPruneEntries = 256

  private[operators] val lastPrune: java.util.Map[String, (Long, Long)] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, (Long, Long)](16, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, (Long, Long)]): Boolean =
          size() > MaxPruneEntries
      })

  /** Weak keys: the set must not pin a closed SparkSession (its
    * listenerManager — and our listener with it — dies with the
    * session; only this install-once guard could otherwise leak it). */
  private val pruneListenerInstalled =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Install (once per session) the listener that surfaces hot-bucket
    * pruning INLINE: when a capped dedup query finishes and its
    * `graft_bucket_prune_*` observation shows the `maxBucket` cap
    * actually dropped buckets, WARN with the counts — production runs
    * see the recall trade without running a second audit query. */
  private[operators] def ensurePruneListener(spark: SparkSession): Unit =
    if (pruneListenerInstalled.add(spark)) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("graft_bucket_prune")) {
                val buckets = row.getAs[Long]("pruned_buckets")
                val docsDropped = row.getAs[Long]("pruned_docs")
                lastPrune.put(name, (buckets, docsDropped))
                if (buckets > 0)
                  log.warn(s"$name: maxBucket cap pruned $buckets LSH " +
                    s"bucket(s) holding $docsDropped docs — near-dup " +
                    "recall was traded for boundedness on those buckets " +
                    "(run minHashHotBuckets/simHashHotBuckets to see which)")
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private[operators] def bucketPairs(bandKeys: DataFrame,
      maxBucket: Int): DataFrame = {
    val sized = bandKeys.groupBy("band", "band_key")
      .agg(array_sort(collect_list("doc_id")).as("ids"))
    val metricsOn = bandKeys.sparkSession.conf
      .get("spark.graft.dedup.pruneMetrics", "true").toBoolean
    val capped =
      if (maxBucket > 0 && metricsOn) {
        // inline prune accounting: an `observe` (CollectMetrics) node —
        // the declarative form of a LongAccumulator, zero extra passes.
        // Unique name per call site: observation names must not collide
        // within one query (e.g. clean-corpus composes several dedups).
        // Kill switch: spark.graft.dedup.pruneMetrics=false.
        ensurePruneListener(bandKeys.sparkSession)
        val name = pruneMetricName()
        val over = size(col("ids")) > maxBucket
        sized.observe(name,
            coalesce(sum(when(over, 1L).otherwise(0L)), lit(0L))
              .as("pruned_buckets"),
            coalesce(sum(when(over, size(col("ids")).cast("long"))
              .otherwise(0L)), lit(0L)).as("pruned_docs"))
          .filter(size(col("ids")).between(2, maxBucket))
      }
      else if (maxBucket > 0)
        sized.filter(size(col("ids")).between(2, maxBucket))
      else sized.filter(size(col("ids")) >= 2)
    val ids = col("ids")
    capped.select(explode(flatten(transform(ids, (a, i) =>
        transform(slice(ids, i + lit(2), size(ids)), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("pr"))
      .select(col("pr.doc_a"), col("pr.doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  private[operators] def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** Exact dedup: group identical texts by md5, pick the min doc_id as the
    * canonical representative. One partial-agg shuffle on the hash. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))

  /** Exact-dedup filter form: keep one row per distinct text. */
  def exactKeep(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val keep = d.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
    d.join(keep, Seq("doc_id"), "left_semi")
  }

  // ---------------------------------------------------------------- MinHash

  /** Word k-shingles of a document (k=3). */
  def shingles(text: String, k: Int = 3): Set[String] = {
    if (text == null) return Set.empty
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length < k) Set(words.mkString(" "))
    else words.sliding(k).map(_.mkString(" ")).toSet
  }

  private val Prime = 2147483647L // 2^31 - 1, Mersenne

  /** Deterministic hash-family parameters (no RNG — fixed SplitMix64 walk
    * seeded by the function index so signatures are reproducible). */
  private def hashParams(i: Int): (Long, Long) = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val a = Math.floorMod(splitmix(i.toLong * 2 + 1), Prime - 1) + 1
    val b = Math.floorMod(splitmix(i.toLong * 2 + 2), Prime)
    (a, b)
  }

  /** Per-numHashes memo of the hash family — the parameters are a pure
    * function of the index, but re-deriving 64 splitmix walks per ROW was
    * measurable in the signature pass. */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  private def cachedParams(numHashes: Int): Array[(Long, Long)] =
    paramCache.computeIfAbsent(numHashes, n => Array.tabulate(n)(hashParams))

  /** MinHash signature: numHashes permutations approximated by
    * (a*x + b) mod p over shingle hashes. */
  def minHashSignature(sh: Set[String], numHashes: Int): Array[Long] = {
    val params = cachedParams(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    sh.foreach { s =>
      val x = Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s).toLong, Prime)
      var i = 0
      while (i < numHashes) {
        val (a, b) = params(i)
        val h = (a * x + b) % Prime
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else (a & b).size.toDouble / (a | b).size.toDouble

  /** Column twin of [[shingles]]: word k-gram shingle set as a pure array
    * expression (split → transform/slice → array_distinct) — codegen'd, no
    * UDF, and expressible verbatim in any engine with list functions (the
    * `q_jaccard` DuckDB oracle is the same computation). */
  def shingleArray(textCol: Column, k: Int = 3): Column = {
    val words = filter(split(textCol, "\\s+"), w => length(w) > 0)
    val n = size(words)
    array_distinct(
      when(n < k, array(concat_ws(" ", words)))
        .otherwise(transform(sequence(lit(1), n - (k - 1)), i =>
          concat_ws(" ", slice(words, i, lit(k))))))
  }

  /** Character n-gram shingle set (n=5 default) as a pure array
    * expression — the character-level twin of [[shingleArray]]: robust to
    * tokenization differences (CJK, code, no-whitespace scripts) where
    * word shingles fail. substring is 1-based; texts shorter than n
    * collapse to a single whole-text shingle. */
  def charShingleArray(textCol: Column, n: Int = 5): Column = {
    val len = length(textCol)
    array_distinct(
      when(len <= n, array(textCol))
        .otherwise(transform(sequence(lit(1), len - (n - 1)), i =>
          textCol.substr(i, lit(n)))))
  }

  /** Exact Jaccard of two shingle-array columns (both-empty → 1.0),
    * column twin of [[jaccard]]. */
  def jaccardExpr(a: Column, b: Column): Column = {
    val uni = size(array_union(a, b))
    when(uni === 0, lit(1.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / uni.cast("double"))
  }

  /** Consecutive-pair exact Jaccard scaffold shared by the word- and
    * character-shingle demonstrations: one narrow shuffle-free map per
    * side + an equi-join on doc_id, scored by `shingle` over both texts. */
  private def consecutivePairJaccard(spark: SparkSession, dir: String,
      shingle: Column => Column): DataFrame = {
    val d = docs(spark, dir)
    val a = d.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val b = d.select((col("doc_id") - 1).as("doc_a"),
      col("doc_id").as("doc_b"), col("text").as("text_b"))
    a.join(b, Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"),
        round(jaccardExpr(shingle(col("text_a")),
          shingle(col("text_b"))), 4).as("jaccard"))
  }

  /** Exact 3-gram Jaccard for each consecutive doc-id pair — the oracle-
    * backed demonstration of the exact-similarity path (the same
    * expressions verify LSH candidates in [[minHashPairs]]). */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    consecutivePairJaccard(spark, dir, shingleArray(_))

  /** Exact character-5-gram Jaccard for each consecutive doc-id pair —
    * the character-level twin of [[jaccardPairs]] (same join shape, the
    * tokenization-free similarity a multilingual corpus needs). */
  def charJaccardPairs(spark: SparkSession, dir: String,
      n: Int = 5): DataFrame =
    consecutivePairJaccard(spark, dir, charShingleArray(_, n))

  /** MinHash signatures per document: (doc_id, sig: array<bigint>) —
    * computed by the native codegen expression
    * ([[graft.functions.MinHashExpression]]), not a UDF, so the signature
    * pass stays inside WholeStageCodegen (equivalence to the Scala
    * function is spec-pinned in `MinHashExpressionSpec`). */
  def minHashSignatures(spark: SparkSession, dir: String,
      numHashes: Int = 64): DataFrame =
    docs(spark, dir).select(col("doc_id"), col("text"),
      graft.functions.MinHashExpression.native(col("text"), numHashes)
        .as("sig"))

  /** MinHash-LSH near-duplicate pairs.
    * signatures → band keys (explode bands×docs) → bucketed self-join on
    * (band, band_hash) → exact Jaccard verify on the shingle sets.
    * bands×rows = numHashes; threshold ≈ (1/bands)^(1/rows). */
  /** @param persistSignatures cache the signature frame across the two
    *   sides of the banded self-join. The plan otherwise recomputes the
    *   shingle+minhash UDF on both sides (verified: two FileScan+UDF
    *   branches). Default OFF: persisted frames outlive the query and
    *   pollute later queries sharing the session (observed 4-5x bench
    *   drift); at real scale, materialize signatures to parquet instead. */
  /** One row per (doc, band): band key = hash of the band's sig slice. */
  private[operators] def bandKeysOf(sigs: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows)))
          .as("band_key"))
  }

  private[operators] def minHashBandKeys(spark: SparkSession, dir: String,
      numHashes: Int, bands: Int, persistSignatures: Boolean): DataFrame = {
    val sigsRaw = minHashSignatures(spark, dir, numHashes)
    val sigs = if (persistSignatures)
      sigsRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sigsRaw
    bandKeysOf(sigs, numHashes, bands)
  }
}
