package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composite a pretraining pipeline
  * actually runs, as ONE declarative plan (each stage is its own operator
  * elsewhere in this package; this is their composition):
  *
  *   1. exact dedup     keep the min-doc_id copy of byte-identical texts
  *                      ([[Dedup.exactKeep]] semantics, semi-join)
  *   2. near dedup      drop the higher-id side of every MinHash-LSH
  *                      near-dup pair ([[Dedup.minHashPairs]], anti-join)
  *   3. quality filter  drop documents under `minWords` whitespace words
  *   4. accounting      emit per-doc word + approximate BPE token counts
  *
  * Scale: stages 1-2 are the bucketed-join dedups (never all-pairs, hot
  * buckets capped); 3-4 are narrow column arithmetic fused into the scans.
  * Catalyst plans the whole chain together, so column pruning reaches
  * every branch. At 100 TB each stage's output would be checkpointed to
  * parquet between runs; the single-plan form is the correctness contract.
  */
object Pipeline {

  def cleanCorpus(spark: SparkSession, dir: String, minWords: Int = 30,
      threshold: Double = 0.5): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // stage 1: canonical representative per distinct text
    val exactKeepIds = d.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    // stage 2: near-dup drop set (greedy keep-lowest-id)
    val nearDrops = Dedup.minHashPairs(spark, dir, threshold = threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val nWords = (length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + lit(1)).cast("long")
    d.join(exactKeepIds, Seq("doc_id"), "left_semi")
      .join(nearDrops, Seq("doc_id"), "left_anti")
      .withColumn("n_words", nWords)
      .filter(col("n_words") >= minWords)
      .select(col("doc_id"), col("lang"), col("n_words"),
        ceil(length(col("text")).cast("double") / lit(4.0)).cast("long")
          .as("approx_bpe_tokens"))
  }
}
