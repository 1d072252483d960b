package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("cleanCorpus composes dedup stages and the quality filter") {
    import spark.implicits._
    val good = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = (1 to 58).map(i => s"word$i").mkString(" ") + " tail other"
    val short = "too short to keep"
    val rows = Seq(
      (1L, good, "en"), (2L, good, "en"),  // exact dup pair → keep 1
      (5L, near, "en"),                    // near-dup of 1 → dropped
      (7L, short, "en"),                   // under min words → dropped
      (9L, (100 to 170).map(i => s"tok$i").mkString(" "), "de")) // clean
    val tmp = java.nio.file.Files.createTempDirectory("cleanc").toString
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Pipeline.cleanCorpus(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.keySet === Set(1L, 9L), s"got ${out.keySet}")
    assert(out(1L)._2 === 60L, "word accounting on the kept copy")
    assert(out(9L)._1 === "de", "lang passthrough")
  }

  test("flagship entry() returns rows at the smoke SF") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("train/val split: deterministic, exhaustive, salt-sensitive") {
    val s1 = Pipeline.trainValSplit(spark, sfDir)
    val s2 = Pipeline.trainValSplit(spark, sfDir)
    assert(s1.exceptAll(s2).count() === 0, "identical across invocations")
    val bySplit = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val"),
      "13/16 buckets to train must dominate")
    assert(bySplit.values.sum ===
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    // a different salt reshuffles assignments (split is salt-keyed)
    val other = Pipeline.trainValSplit(spark, sfDir, salt = "other")
    assert(s1.join(other, Seq("doc_id"))
      .filter(s1("split") =!= other("split")).count() > 0)
  }
}
