package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** URL year-range encodings for all 5 APIs (filter_pushdown.cpp:6-97 parity
  * — the encoders the reference defines but never wires). */
class PushdownSpec extends SparkSpec {

  private def opts(kv: (String, String)*): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String]()
    kv.foreach { case (k, v) => m.put(k, v) }
    new CaseInsensitiveStringMap(m)
  }

  private val both = YearRange(Some(2015), Some(2020))
  private val startOnly = YearRange(Some(2015), None)
  private val none = YearRange()

  test("WHO: OData 'and TimeDim ge/le' clauses, percent-encoded") {
    val t = new WhoSource().buildTasks(opts("indicator" -> "X"))
    assert(t(both).head.urls.head.contains(
      "$filter=SpatialDim%20eq%20'SDN'%20and%20TimeDim%20ge%202015" +
        "%20and%20TimeDim%20le%202020"))
    assert(t(startOnly).head.urls.head.contains("and%20TimeDim%20ge%202015"))
    assert(!t(none).head.urls.head.contains("TimeDim"))
  }

  test("FAO: year_start/year_end params") {
    val t = new FaoSource().buildTasks(opts("dataset" -> "QCL", "element" -> "prod"))
    assert(t(both).head.urls.head.contains("&year_start=2015&year_end=2020"))
    assert(t(startOnly).head.urls.head.contains("&year_start=2015"))
    assert(!t(startOnly).head.urls.head.contains("year_end"))
    assert(!t(none).head.urls.head.contains("year_start"))
  }

  test("UNHCR: yearFrom/yearTo params on both coo and coa requests") {
    val t = new UnhcrSource().buildTasks(opts("population_type" -> "refugees"))
    val urls = t(both).map(_.urls.head)
    assert(urls.length === 2)
    assert(urls.forall(_.contains("&yearFrom=2015&yearTo=2020")))
    assert(urls.exists(_.contains("coo=SDN")) && urls.exists(_.contains("coa=SDN")))
  }

  test("ILO: startPeriod/endPeriod on every key-shape candidate") {
    val t = new IloSource().buildTasks(opts("indicator" -> "IND"))
    val task = t(both).head
    assert(task.urls.length === 5)
    assert(task.urls.forall(_.contains("&startPeriod=2015&endPeriod=2020")))
    assert(task.urls.forall(_.contains("ILO,DF_IND/SDN.A")))
    assert(task.firstSuccessOnly)
  }

  test("LIMIT pushdown stops pagination: page 2 never fetched") {
    // counting fetcher over a 2-page World Bank-shaped protocol
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    val fetcher = new graft.core.HttpFetcher {
      def get(url: String): Either[graft.core.FetchError, String] = {
        fetched += url
        val page = "page=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
        Right(s"""[{"page":$page,"pages":2},[{"v":${page}1},{"v":${page}2}]]""")
      }
    }
    val decoder = new RowDecoder {
      def decode(body: String, task: FetchTask): Iterator[Seq[Any]] =
        "\"v\":(\\d+)".r.findAllMatchIn(body).map(m => Seq[Any](m.group(1).toInt))
      override def totalPages(body: String): Option[Int] =
        "\"pages\":(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toInt)
    }
    val task = FetchTask(pagedBase = Some("http://x/api?fmt=json"))
    def rows(limit: Option[Int]): Seq[Int] = {
      fetched.clear()
      val r = new ApiPartitionReader(task, decoder, fetcher, limit)
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (r.next()) out += r.get().getInt(0)
      out.toSeq
    }
    // no limit: both pages fetched, 4 rows
    assert(rows(None) === Seq(11, 12, 21, 22) && fetched.length === 2)
    // limit satisfied by page 1: ONE fetch, page 2 never requested
    assert(rows(Some(2)) === Seq(11, 12) && fetched.length === 1)
    assert(rows(Some(1)) === Seq(11) && fetched.length === 1)
    // limit beyond page 1 spills into page 2, but truncates there
    assert(rows(Some(3)) === Seq(11, 12, 21) && fetched.length === 2)
  }

  test("Spark pushes LIMIT into the v2 scan (visible in scan description)") {
    val df = graft.api.Sudan.worldBank(spark, "SP.POP.TOTL",
      fetcher = graft.api.Sudan.Fetcher("fixtures", "graft/fixtures/worldbank"))
    val limited = df.limit(1)
    assert(limited.queryExecution.executedPlan.toString
      .contains("limit=Some(1)"), limited.queryExecution.executedPlan.toString)
    assert(limited.count() === 1)
    // and an un-limited read still reports limit=None
    assert(df.queryExecution.executedPlan.toString.contains("limit=None"))
  }

  test("reported statistics make an API⋈fact join broadcast the API side") {
    import org.apache.spark.sql.functions._
    val wb = graft.api.Sudan.worldBank(spark, "SP.POP.TOTL",
      fetcher = graft.api.Sudan.Fetcher("fixtures", "graft/fixtures/worldbank"))
    // optimizer-visible size comes from estimateStatistics, not the
    // defaultSizeInBytes fallback (which would force a sort-merge join)
    val stats = wb.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 &&
      stats.sizeInBytes < 10L * 1024 * 1024, stats.sizeInBytes.toString)
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("year", year(col("l_shipdate")))
    val joined = fact.join(wb, Seq("year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.indexOf("BatchScan") > plan.indexOf("BroadcastExchange"),
      "API scan must be the broadcast build side:\n" + plan.take(2000))
  }

  test("column pruning reaches the v2 scan: projection shrinks ReadSchema") {
    import org.apache.spark.sql.functions._
    val wb = graft.api.Sudan.worldBank(spark, "SP.POP.TOTL",
      fetcher = graft.api.Sudan.Fetcher("fixtures", "graft/fixtures/worldbank"))
    val narrow = wb.select("year", "value")
    val scan = narrow.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b
      }.get
    assert(scan.output.map(_.name) === Seq("year", "value"),
      scan.output.map(_.name).mkString(","))
    // pruned read still decodes the right values
    val rows = narrow.filter(col("value").isNotNull)
      .orderBy(desc("year")).collect()
    assert(rows.head.getInt(0) === 2020 &&
      rows.head.getDouble(1) === 44440486.0)
    // full-width read is untouched
    assert(wb.columns.length === 6 && wb.count() === 3)
  }

  test("YearRange extraction from Catalyst filters incl. strict bounds") {
    import org.apache.spark.sql.sources._
    assert(YearRange.fromFilters(Array(GreaterThan("year", 2014), LessThan("year", 2021)))
      === YearRange(Some(2015), Some(2020)))
    assert(YearRange.fromFilters(Array(EqualTo("year", 2019)))
      === YearRange(Some(2019), Some(2019)))
    assert(YearRange.fromFilters(Array(EqualTo("other", 1))) === YearRange())
  }

  test("countries option: ISO2 normalization + default SDN") {
    val t = new WhoSource().buildTasks(opts("indicator" -> "X", "countries" -> "eg, ET"))
    val urls = t(none).map(_.urls.head)
    assert(urls.exists(_.contains("eq%20'EGY'")) && urls.exists(_.contains("eq%20'ETH'")))
    val d = new WhoSource().buildTasks(opts("indicator" -> "X"))
    assert(d(none).map(_.urls.head).head.contains("eq%20'SDN'"))
  }

  test("every generated source URL parses as a valid java.net.URI") {
    // URI.create throwing inside JavaHttpFetcher is swallowed into Left →
    // silent 0 rows on live APIs, invisible to substring-matched fixtures.
    // Guard: every URL any source can emit must be a well-formed URI.
    val all: Seq[FetchTask] =
      new WhoSource().buildTasks(opts("indicator" -> "WHOSIS_000001",
        "countries" -> "SD,EG,ET"))(both) ++
        new WhoIndicatorsSource().buildTasks(opts())(none) ++
        new WorldBankSource().buildTasks(opts("indicator" -> "SP.POP.TOTL"))(both) ++
        new WbIndicatorsSource().buildTasks(opts())(none) ++
        new FaoSource().buildTasks(opts("dataset" -> "QCL",
          "element" -> "production"))(both) ++
        new UnhcrSource().buildTasks(opts("population_type" -> "refugees"))(both) ++
        new IloSource().buildTasks(opts("indicator" -> "UNE_DEAP_SEX_AGE_RT"))(both)
    val urls = all.flatMap(_.urls)
    assert(urls.size >= 10)
    urls.foreach { u =>
      val uri = java.net.URI.create(u) // throws IllegalArgumentException if malformed
      assert(uri.getHost != null, s"no host parsed from $u")
    }
  }
}
