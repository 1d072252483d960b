package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {

  test("zValue interleaves bits (known Morton values)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 0L),
      (0L, 255L), (170L, 85L)).toDF("x", "y")
      .select(col("x"), col("y"), Zorder.zValue(col("x"), col("y")).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    got.foreach { case (x, y, z) => assert(z === morton(x, y), s"($x,$y)") }
    // x=170 (10101010), y=85 (01010101): odd positions get y's bits
    assert(morton(170L, 85L) === got.last._3)
  }

  test("2-D box queries touch far fewer z-ordered files than linearly " +
      "sorted ones — the data-skipping contract") {
    // full 64×64 grid, one row per cell: geometry is the only variable.
    // 64 files ⇒ linear layout = 1×64 stripes, z-order ≈ 8×8 squares.
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("xb"),
        (col("id") / 64).cast("long").as("yb"))
    def touched(df: org.apache.spark.sql.DataFrame): Double = {
      val tmp = java.nio.file.Files.createTempDirectory("zot").toString
      df.write.mode("overwrite").parquet(tmp)
      val stats = spark.read.parquet(tmp)
        .groupBy(input_file_name().as("f"))
        .agg(min("xb").as("x0"), max("xb").as("x1"),
          min("yb").as("y0"), max("yb").as("y1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // every 8×8 box at stride-4 offsets: files whose footer stats
      // intersect the box = files a stats-based reader must open
      val boxes = for (bx <- 0 to 56 by 4; by <- 0 to 56 by 4)
        yield (bx.toLong, bx + 7L, by.toLong, by + 7L)
      boxes.map { case (qx0, qx1, qy0, qy1) =>
        stats.count { case (x0, x1, y0, y1) =>
          !(x1 < qx0 || x0 > qx1 || y1 < qy0 || y0 > qy1)
        }
      }.sum.toDouble / boxes.length
    }
    val linear = touched(grid.repartitionByRange(64, col("xb"))
      .sortWithinPartitions("xb"))
    val z = touched(Zorder.zOrderLayout(grid, col("xb"), col("yb"), 64)
      .drop("zval"))
    info(s"mean files touched by an 8×8 box: linear=$linear zorder=$z")
    // stripes must open ≥8 of 64 files; squares a handful
    assert(z < linear / 2,
      s"z-order ($z) must touch < half the files linear does ($linear)")
  }

  test("a 2-D box filter prunes files by footer stats under z-order") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        ((col("n_chars") / lit(50L)).cast("long") % 256).as("xb"),
        (col("doc_id") % 256).as("yb"))
    val tmp = java.nio.file.Files.createTempDirectory("zoq").toString
    Zorder.zOrderLayout(docs, col("xb"), col("yb"), 8)
      .drop("zval").write.mode("overwrite").parquet(tmp)
    // files whose min/max box intersects the query box — what a
    // stats-based reader must open
    val stats = spark.read.parquet(tmp)
      .groupBy(input_file_name().as("f"))
      .agg(min("xb").as("x0"), max("xb").as("x1"),
        min("yb").as("y0"), max("yb").as("y1"))
      .collect()
    val need = stats.count { r =>
      val (x0, x1, y0, y1) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      !(x1 < 0 || x0 > 4 || y1 < 0 || y0 > 60)
    }
    info(s"box-filter files needed: $need of ${stats.length}")
    assert(need < stats.length,
      "at least one file must be skippable from its footer stats")
  }

  /** File scans of an executed plan, through AQE wrappers. */
  private def fileScans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = plan match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(s.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  test("read-side proof: the conjunctive box filter materializes fewer " +
      "rows from the z-ordered layout (parquet row-group skipping)") {
    // same 64×64 grid, 64 files of 64 rows (one row group each):
    // linear = 1×64 xb stripes, z-order ≈ 8×8 squares
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("xb"),
        (col("id") / 64).cast("long").as("yb"))
    // rows the scan MATERIALIZES for the box query = rows of the row
    // groups that survive min/max skipping (the scan's numOutputRows —
    // Spark prunes parquet row groups from pushed min/max filters, and
    // FilterExec sees only the survivors)
    def rowsMaterialized(df: org.apache.spark.sql.DataFrame): Long = {
      val tmp = java.nio.file.Files.createTempDirectory("zread").toString
      df.write.mode("overwrite").parquet(tmp)
      val q = spark.read.parquet(tmp)
        .filter(col("xb").between(8, 15) && col("yb").between(16, 23))
      assert(q.count() === 64L, "the 8×8 box holds 64 grid cells")
      q.collect()
      val scans = fileScans(q.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      // pushed filters must reach the parquet reader for skipping to
      // exist at all
      assert(scans.head.metadata("PushedFilters").contains("GreaterThan"),
        scans.head.metadata("PushedFilters"))
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val lin = rowsMaterialized(grid.repartitionByRange(64, col("xb"))
      .sortWithinPartitions("xb"))
    val z = rowsMaterialized(
      Zorder.zOrderLayout(grid, col("xb"), col("yb"), 64).drop("zval"))
    info(s"rows materialized for the box query: linear=$lin zorder=$z")
    // linear skips on xb only (~8 of 64 stripes = 512 rows); z-order
    // skips on BOTH dims (the 8×8 box touches a couple of 8×8 file
    // squares). Both must skip SOMETHING (< 4096), and z-order must
    // strictly beat linear — by at least 2× so boundary-straddling
    // files can't mask a layout regression.
    assert(lin < 4096L, s"linear layout skipped nothing ($lin)")
    assert(z * 2 <= lin,
      s"z-order must materialize ≤ half of linear's rows: z=$z lin=$lin")
  }

  test("optimizeLayout: compaction sizing AND clustering in one shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        ((col("n_chars") / lit(50L)).cast("long") % 256).as("xb"),
        (col("doc_id") % 256).as("yb"))
    // tiny targetBytes forces multiple files so clustering is observable
    val optimized = Zorder.optimizeLayout(docs, col("xb"), col("yb"),
      targetBytes = 16L * 1024)
    // file count = the compaction rule's sizing
    assert(optimized.rdd.getNumPartitions ===
      Pipeline.compactionPartitions(docs, 16L * 1024))
    // clustering survives: z-ranges of written files are disjoint
    val tmp = java.nio.file.Files.createTempDirectory("zopt").toString
    optimized.write.mode("overwrite").parquet(tmp)
    val ranges = spark.read.parquet(tmp)
      .groupBy(input_file_name()).agg(min("zval"), max("zval"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "sizing must produce several files")
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"file z-ranges must not interleave: $hi > $lo")
      case _ =>
    }
    // exactly one shuffle: a single RangePartitioning exchange (inspect
    // the pre-adaptive sparkPlan — AQE hides exchanges until execution)
    val exchanges = optimized.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.getClass.getSimpleName }
    assert(exchanges === Seq("RangePartitioning"), exchanges.toSeq)
  }
}
