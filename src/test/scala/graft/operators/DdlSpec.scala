package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DDL/DML surface of the reference's documented workload (SURVEY §2B:
  * notebooks cells 18/95/98/99/102): CTAS, DROP TABLE IF EXISTS,
  * INSERT INTO … SELECT, and CSV export with header. */
class DdlSpec extends SparkSpec {

  test("CTAS + DROP TABLE IF EXISTS over a source view (cells 18, 95, 98)") {
    Relational.table(spark, sfDir, "nation").createOrReplaceTempView("nation_v")
    spark.sql("DROP TABLE IF EXISTS nation_copy")
    spark.sql("CREATE TABLE nation_copy USING parquet AS " +
      "SELECT n_nationkey, n_name FROM nation_v WHERE n_nationkey < 10")
    assert(spark.table("nation_copy").count() === 10)
    spark.sql("DROP TABLE IF EXISTS nation_copy")
    assert(!spark.catalog.tableExists("nation_copy"))
  }

  test("INSERT INTO ... SELECT appends rows (cell 99)") {
    Relational.table(spark, sfDir, "nation").createOrReplaceTempView("nation_v")
    spark.sql("DROP TABLE IF EXISTS nation_ins")
    spark.sql("CREATE TABLE nation_ins USING parquet AS " +
      "SELECT n_nationkey, n_name FROM nation_v WHERE n_nationkey < 5")
    spark.sql("INSERT INTO nation_ins " +
      "SELECT n_nationkey, n_name FROM nation_v WHERE n_nationkey >= 20")
    assert(spark.table("nation_ins").count() === 10)
    spark.sql("DROP TABLE IF EXISTS nation_ins")
  }

  test("CSV export with header + round-trip (COPY TO csv, cell 102)") {
    val out = java.nio.file.Files.createTempDirectory("csvout").toString
    val src = Relational.table(spark, sfDir, "region")
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(out)
    assert(back.count() === src.count())
    assert(back.columns.toSeq === src.columns.toSeq)
    val names = back.select("r_name").collect().map(_.getString(0)).toSet
    assert(names === src.select("r_name").collect().map(_.getString(0)).toSet)
  }

  test("parquet write round-trip preserves schema and values") {
    val out = java.nio.file.Files.createTempDirectory("pqout").toString
    val src = Relational.aggQ1(spark, sfDir)
    src.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    // parquet read-back loosens nullability; names + types must round-trip
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() === src.count())
  }

  test("partitioned parquet write: a lang filter prunes at file listing") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("pqpart").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val q = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = q.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f }.head
    // lang=... must be a PARTITION filter (pruned when listing files),
    // not a post-scan data filter — the layout decision that makes a
    // language-sliced 100 TB corpus readable per-language
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"expected partition filter on lang, got ${scan.partitionFilters}")
    val langs = spark.read.parquet(out).select("lang").distinct().count()
    val listed = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values.toString).distinct.length
    assert(listed === 1 && langs > 1,
      s"listing must touch 1 of $langs lang partitions, got $listed")
    assert(q.count() > 0)
  }
}
