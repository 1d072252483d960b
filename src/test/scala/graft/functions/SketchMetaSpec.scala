package graft.functions

import graft.SparkSpec

/** [[SketchMeta]] read-gate contract: version mismatch always fails;
  * an ABSENT stamp WARNs by default (backward compat for pre-scheme
  * tables) but fails closed when `spark.graft.sketchMeta.strict=true`
  * — the round-13 strict mode for production reads of long-lived
  * stored sketch tables, where a silently-merged pre-fmix64 state is
  * the one remaining wrong-estimates-without-error path. */
class SketchMetaSpec extends SparkSpec {

  private def tmpTable(name: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-meta-$name").toString
    spark.range(3).write.mode("overwrite").parquet(dir)
    dir
  }

  private def withStrict(v: Option[String])(body: => Unit): Unit = {
    val key = SketchMeta.StrictConfKey
    val prior = spark.conf.getOption(key)
    v match { case Some(s) => spark.conf.set(key, s)
              case None => spark.conf.unset(key) }
    try body
    finally prior match { case Some(s) => spark.conf.set(key, s)
                          case None => spark.conf.unset(key) }
  }

  test("stamped current version passes in BOTH modes; a version " +
      "mismatch throws in both; round-trip read returns the stamp") {
    val dir = tmpTable("ok")
    SketchMeta.write(spark, dir)
    assert(SketchMeta.read(spark, dir) === Some(SketchMeta.HashVersion))
    withStrict(None) { SketchMeta.check(spark, dir) }
    withStrict(Some("true")) { SketchMeta.check(spark, dir) }
    // forge a stale stamp (a pre-fmix64 writer)
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_sketch_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("hashVersion=1\n".getBytes("UTF-8")) finally out.close()
    for (mode <- Seq(None, Some("true"))) withStrict(mode) {
      val e = intercept[IllegalStateException] { SketchMeta.check(spark, dir) }
      assert(e.getMessage.contains("hash version 1") &&
        e.getMessage.contains("Rebuild"), e.getMessage)
    }
  }

  test("ABSENT stamp: default mode only WARNs (pre-scheme tables keep " +
      "reading); strict mode fails closed with the stamp instruction") {
    val dir = tmpTable("absent")
    assert(SketchMeta.read(spark, dir) === None)
    withStrict(None) { SketchMeta.check(spark, dir) } // must not throw
    withStrict(Some("false")) { SketchMeta.check(spark, dir) }
    withStrict(Some("true")) {
      val e = intercept[IllegalStateException] { SketchMeta.check(spark, dir) }
      assert(e.getMessage.contains("no _graft_sketch_meta stamp") &&
        e.getMessage.contains(SketchMeta.StrictConfKey), e.getMessage)
    }
    // stamping the table is exactly the documented remediation
    SketchMeta.write(spark, dir)
    withStrict(Some("true")) { SketchMeta.check(spark, dir) }
  }
}
