package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TablesSpec extends SparkSpec {

  test("drifted documents schema (int ids/counts) normalizes to canonical") {
    // the generator has drifted physical schemas before (events.ts);
    // pin that int32 ids / counts read back as the canonical longs
    val tmp = java.nio.file.Files.createTempDirectory("driftdocs").toString
    spark.sql(
      """SELECT CAST(id AS INT) AS doc_id, text, lang, src AS source,
        |  CAST(length(text) AS INT) AS n_chars
        |FROM VALUES (1, 'alpha beta', 'en', 'web'),
        |            (2, 'alpha beta', 'en', 'web'),
        |            (3, 'gamma delta', 'de', 'book')
        |  AS t(id, text, lang, src)""".stripMargin)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val df = Tables.documents(spark, tmp)
    assert(df.schema("doc_id").dataType === LongType)
    assert(df.schema("n_chars").dataType === LongType)
    // operators run end-to-end on the drifted file
    val groups = Dedup.exact(spark, tmp).collect()
    assert(groups.map(_.getLong(1)).sum === 3L)
    assert(TextOps.textStats(spark, tmp).count() === 3L)
  }

  test("drifted embeddings schema (float64 vectors) normalizes to float32") {
    val tmp = java.nio.file.Files.createTempDirectory("driftemb").toString
    spark.sql(
      """SELECT CAST(id AS INT) AS vec_id,
        |  CAST(array(0.6D, 0.8D) AS ARRAY<DOUBLE>) AS embedding,
        |  CAST(id AS BIGINT) AS label
        |FROM VALUES (1), (2), (3) AS t(id)""".stripMargin)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val df = Tables.embeddings(spark, tmp)
    assert(df.schema("vec_id").dataType === LongType)
    assert(df.schema("embedding").dataType === ArrayType(FloatType))
    assert(df.schema("label").dataType === IntegerType)
    val norms = Similarity.norms(spark, tmp).collect()
    assert(norms.length === 3 && norms.forall(_.getDouble(1) === 1.0))
  }

  test("float64 drift guard: lossless round-trip passes, lossy values " +
      "fail loudly, float32 files are a no-op") {
    // 0.6/0.8 written as float64 are NOT float32-exact (0.6D !=
    // (double)(float)0.6D), so the existing drift fixture shape is the
    // LOSSY case; float32-representable doubles (0.5, 0.25) are lossless
    val lossless = java.nio.file.Files.createTempDirectory("lossless").toString
    spark.sql(
      """SELECT CAST(id AS BIGINT) AS vec_id,
        |  CAST(array(0.5D, 0.25D) AS ARRAY<DOUBLE>) AS embedding,
        |  CAST(id AS INT) AS label
        |FROM VALUES (1), (2) AS t(id)""".stripMargin)
      .write.mode("overwrite").parquet(s"$lossless/embeddings.parquet")
    Tables.assertLosslessEmbeddingDrift(spark, lossless)
    val lossy = java.nio.file.Files.createTempDirectory("lossy").toString
    spark.sql(
      """SELECT CAST(id AS BIGINT) AS vec_id,
        |  CAST(array(0.6D, 0.8D) AS ARRAY<DOUBLE>) AS embedding,
        |  CAST(id AS INT) AS label
        |FROM VALUES (1), (2) AS t(id)""".stripMargin)
      .write.mode("overwrite").parquet(s"$lossy/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.assertLosslessEmbeddingDrift(spark, lossy)
    }
    assert(e.getMessage.contains("float32"))
    // the real (float32) testdata never trips the guard
    Tables.assertLosslessEmbeddingDrift(spark, sfDir)
  }

  test("canonical files pass through with no extra plan nodes") {
    // on an already-canonical file the casts are no-ops Catalyst erases:
    // the optimized plan is the bare scan
    val plan = Tables.documents(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Project ["), s"no-op normalize must erase: $plan")
  }
}
