package graft.sources

import graft.SparkSpec
import graft.api.Sudan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-driven source tests (FIXTURES.md §1): every networked DSv2 source
  * exercised offline through the real read path — options → URL → fetch
  * (recorded body) → decode → DataFrame — plus the reference's
  * schema-contract (LIMIT-0) probes and error-message pins. */
class SourcesSpec extends SparkSpec {

  private def fx(dir: String) = Sudan.Fetcher("fixtures", s"graft/fixtures/$dir")

  // ------------------------------------------------------------- World Bank

  test("SQL-only parameterized source access: CREATE TEMPORARY VIEW " +
      "USING <source> OPTIONS (...) — the TVF-named-arg analogue") {
    // the reference's `SUDAN_WorldBank('SP.POP.TOTL', countries := [...])`
    // maps to plain Spark SQL with no Scala in sight: every reader option
    // is a named OPTION, and pushdown still applies through the view
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW wb_sql_tvf
        |USING `sudan.worldbank`
        |OPTIONS (
        |  indicator 'SP.POP.TOTL',
        |  countries 'SDN',
        |  `fetcher.mode` 'fixtures',
        |  `fetcher.fixtures` 'graft/fixtures/worldbank'
        |)""".stripMargin)
    val rows = spark.sql(
      "SELECT country, year, value FROM wb_sql_tvf WHERE year >= 2019")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) >= 2019))
    // equivalent Scala-factory read returns the same rows
    val scalaRows = Sudan.worldBank(spark, "SP.POP.TOTL", Seq("SDN"),
        fetcher = fx("worldbank"))
      .filter(org.apache.spark.sql.functions.col("year") >= 2019)
      .select("country", "year", "value").collect()
    assert(rows.map(_.toString).sorted.toSeq ===
      scalaRows.map(_.toString).sorted.toSeq)
  }

  test("WB data: pagination (2 pages), null value, ISO2 country id") {
    val df = Sudan.worldBank(spark, "SP.POP.TOTL", fetcher = fx("worldbank"))
    val rows = df.orderBy(desc("year")).collect()
    assert(rows.length === 3) // 2 rows page 1 + 1 row page 2
    assert(rows(0).getString(2) === "SD") // API country.id, as the reference emits
    assert(rows(0).getInt(4) === 2020)
    assert(rows(0).getDouble(5) === 44440486.0)
    assert(rows(2).getInt(4) === 2018)
    assert(rows(2).isNullAt(5)) // null value → SQL NULL
  }

  test("WB data: multi-country = one partition each, union of rows") {
    val df = Sudan.worldBank(spark, "SP.POP.TOTL", countries = Seq("SDN", "EGY"),
      fetcher = fx("worldbank"))
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 4)
    assert(df.select("country").distinct().count() === 2)
  }

  test("WB data: schema contract (wb_functions.cpp:80-91)") {
    val df = Sudan.worldBank(spark, "X", fetcher = fx("worldbank"))
    assert(df.schema === StructType(Seq(
      StructField("indicator_id", StringType),
      StructField("indicator_name", StringType),
      StructField("country", StringType),
      StructField("country_name", StringType),
      StructField("year", IntegerType),
      StructField("value", DoubleType))))
  }

  test("WB data: empty indicator throws the reference's message") {
    val e = intercept[Exception] {
      Sudan.worldBank(spark, "", fetcher = fx("worldbank")).collect()
    }
    assert(e.getMessage.contains("SUDAN: The indicator parameter cannot be empty."))
  }

  test("WB data: unknown indicator (no fixture = fetch failure) → 0 rows, no error") {
    assert(Sudan.worldBank(spark, "NO.SUCH", fetcher = fx("worldbank")).count() === 0)
  }

  test("WB year pushdown: filter reaches the URL, semantics unchanged") {
    val plain = Sudan.worldBank(spark, "SP.POP.TOTL", fetcher = fx("worldbank"))
      .filter(col("year") >= 2019)
    // the dated fixture key only matches if the URL carries date=2019:2100
    assert(plain.count() === 2)
    assert(plain.collect().forall(_.getInt(4) >= 2019))
    // and the pushed filter is visible in the plan
    val explain = plain.queryExecution.executedPlan.toString
    assert(explain.contains("year"), explain)
  }

  test("WB pushdown URL encoding (filter_pushdown.cpp:6-20 parity)") {
    val src = new WorldBankSource
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("indicator", "SP.POP.TOTL"))
    val tasks = src.buildTasks(opts)
    assert(tasks(YearRange(Some(2015), Some(2020))).head.pagedBase.get
      .contains("date=2015:2020"))
    assert(tasks(YearRange(Some(2015), None)).head.pagedBase.get
      .contains("date=2015:2100"))
    assert(tasks(YearRange(None, Some(2020))).head.pagedBase.get
      .contains("date=1900:2020"))
    assert(!tasks(YearRange()).head.pagedBase.get.contains("date="))
  }

  test("WB catalog: pagination (2 pages) — rows span both fixture pages") {
    // wb_indicators.cpp:87-126 loops catalog pages exactly like the data
    // scan; the fixture is split 2+2 with pages=2 metadata, so getting all
    // 4 rows (ids from both halves) proves the loop followed page 2.
    val ids = Sudan.wbIndicators(spark, fetcher = fx("worldbank"))
      .select("indicator_id").collect().map(_.getString(0)).toSet
    assert(ids === Set("SP.POP.TOTL", "SP.POP.GROW", "NY.GDP.MKTP.CD", "SH.DYN.MORT"))
  }

  test("WB catalog: search filter ci on id+name; '' sourceNote → NULL") {
    val all = Sudan.wbIndicators(spark, fetcher = fx("worldbank"))
    assert(all.count() === 4)
    val pop = Sudan.wbIndicators(spark, "population", fetcher = fx("worldbank")).collect()
    assert(pop.length === 2)
    val grow = pop.find(_.getString(0) == "SP.POP.GROW").get
    assert(grow.isNullAt(3)) // empty sourceNote → NULL
    val byId = Sudan.wbIndicators(spark, "ny.gdp", fetcher = fx("worldbank"))
    assert(byId.count() === 1)
  }

  // -------------------------------------------------------------------- WHO

  test("WHO data: OData country filter, year coercion, ''→NULL (sudan_who.test schema)") {
    val df = Sudan.who(spark, "WHOSIS_000001", fetcher = fx("who"))
    assert(df.columns.toSeq === Seq("indicator_code", "indicator_name", "country",
      "year", "sex", "value", "region"))
    val rows = df.orderBy(desc("year")).collect()
    assert(rows.length === 3)
    assert(rows(0).getInt(3) === 2019)
    assert(rows(0).getString(4) === "SEX_BTSX")
    assert(rows(0).getDouble(5) === 65.3)
    assert(rows(1).getInt(3) === 2018) // string TimeDim coerced
    assert(rows(1).isNullAt(4)) // "" Dim1 → NULL
    assert(rows(1).isNullAt(6)) // "" ParentLocation → NULL
    assert(rows(2).isNullAt(5)) // missing NumericValue → NULL
    assert(rows.forall(_.isNullAt(1))) // indicator_name: never in data responses
  }

  test("WHO catalog: search + '' language → NULL") {
    val all = Sudan.whoIndicators(spark, fetcher = fx("who"))
    assert(all.count() === 3)
    val mort = Sudan.whoIndicators(spark, "mortality", fetcher = fx("who")).collect()
    assert(mort.length === 1 && mort(0).getString(0) === "MDG_0000000001")
    val obesity = Sudan.whoIndicators(spark, "NCD_BMI", fetcher = fx("who")).collect()
    assert(obesity.length === 1 && obesity(0).isNullAt(2))
  }

  test("WHO: empty indicator error") {
    val e = intercept[Exception] {
      Sudan.who(spark, "", fetcher = fx("who")).collect()
    }
    assert(e.getMessage.contains(
      "SUDAN: The indicator parameter cannot be empty for SUDAN_WHO()."))
  }

  // -------------------------------------------------------------------- FAO

  test("FAO: element ci contains-filter, value coercion ladder, unit NULL (sudan_fao.test:13-18)") {
    val df = Sudan.fao(spark, "QCL", "production", fetcher = fx("fao"))
    assert(df.columns.toSeq === Seq("dataset", "area", "item", "element",
      "year", "value", "unit"))
    val rows = df.orderBy("item").collect()
    // 4 Production rows (contains-match, ci); 'Area harvested' filtered out
    assert(rows.length === 4)
    assert(rows.forall(_.getString(3) === "Production"))
    val byItem = rows.map(r => r.getString(2) -> r).toMap
    assert(byItem("Sorghum").getInt(4) === 2020) // string year coerced
    assert(byItem("Sorghum").getDouble(5) === 3746000.0) // int value
    assert(byItem("Millet").getDouble(5) === 1034000.0) // string value
    assert(byItem("Dates").isNullAt(5)) // null value
    assert(byItem("Dates").isNullAt(6)) // missing unit → NULL
    assert(rows.forall(_.getString(0) === "QCL"))
  }

  test("FAO: empty dataset/element errors") {
    val e1 = intercept[Exception] {
      Sudan.fao(spark, "", "production", fetcher = fx("fao")).collect()
    }
    assert(e1.getMessage.contains(
      "SUDAN: The dataset parameter cannot be empty for SUDAN_FAO()."))
    val e2 = intercept[Exception] {
      Sudan.fao(spark, "QCL", "", fetcher = fx("fao")).collect()
    }
    assert(e2.getMessage.contains(
      "SUDAN: The element parameter cannot be empty for SUDAN_FAO()."))
  }

  // ------------------------------------------------------------------ UNHCR

  test("UNHCR: coo+coa dual fetch, zero-drop, iso fallback, BIGINT value (sudan_unhcr.test:19-24)") {
    val df = Sudan.unhcr(spark, "refugees", fetcher = fx("unhcr"))
    assert(df.columns.toSeq === Seq("year", "population_type", "country_origin",
      "country_origin_name", "country_asylum", "country_asylum_name", "value"))
    assert(df.schema("value").dataType === LongType)
    assert(df.rdd.getNumPartitions === 2) // coo + coa partitions
    val rows = df.orderBy("country_asylum").collect()
    // coo fixture: 3 items, one refugees=0 dropped → 2; coa fixture: 1
    assert(rows.length === 3)
    assert(rows.map(_.getLong(6)).sorted.toSeq === Seq(126000L, 318533L, 409235L))
    // string "318533" coerced to long
    assert(rows.find(_.getString(4) == "EGY").get.getLong(6) === 318533L)
  }

  test("UNHCR: population-type aliases map to the same field") {
    assert(UnhcrDecoders.fieldName("ref") === "refugees")
    assert(UnhcrDecoders.fieldName("IDP") === "idps")
    assert(UnhcrDecoders.fieldName("asylum") === "asylum_seekers")
    assert(UnhcrDecoders.fieldName("returned") === "returned_refugees")
    assert(UnhcrDecoders.fieldName("stateless") === "stateless")
    val alias = Sudan.unhcr(spark, "ref", fetcher = fx("unhcr"))
    assert(alias.count() === 3)
    assert(alias.select("population_type").distinct().collect()(0)
      .getString(0) === "refugees")
  }

  test("UNHCR: empty population_type error lists valid types") {
    val e = intercept[Exception] {
      Sudan.unhcr(spark, "", fetcher = fx("unhcr")).collect()
    }
    assert(e.getMessage.contains("population_type parameter cannot be empty"))
    assert(e.getMessage.contains("'refugees', 'idps', 'asylum_seekers'"))
  }

  // -------------------------------------------------------------------- ILO

  test("ILO SDMX 2.0: key retry, dimension decode, non-numeric obs skipped (sudan_ilo.test:13-18)") {
    val df = Sudan.ilo(spark, "UNE_DEAP_SEX_AGE_RT", fetcher = fx("ilo"))
    assert(df.columns.toSeq === Seq("indicator", "country", "sex", "classif1",
      "year", "value"))
    val rows = df.orderBy("sex", "year").collect()
    // series SEX_T has 2 obs, SEX_M has 1; SEX_F's obs is non-numeric → skipped
    assert(rows.length === 3)
    assert(rows.map(r => (r.getString(2), r.getInt(4), r.getDouble(5))).toSeq ===
      Seq(("SEX_M", 2022, 11.2), ("SEX_T", 2022, 13.1), ("SEX_T", 2023, 13.4)))
    assert(rows.forall(_.getString(3) === "AGE_YTHADULT_Y15-64"))
    assert(rows.forall(_.getString(1) === "SDN"))
    // indicator echoes the user's un-prefixed id
    assert(rows.forall(_.getString(0) === "UNE_DEAP_SEX_AGE_RT"))
  }

  test("ILO SDMX 1.0 layout: root dataSets/structure + CLASSIF1 fallback") {
    val df = Sudan.ilo(spark, "EMP_TEMP_SEX_ECO_NB", fetcher = fx("ilo10"))
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows(0).isNullAt(2)) // no SEX dimension → NULL (ilo:384-385)
    assert(rows(0).getString(3) === "ECO_SECTOR_AGR") // AGE absent → CLASSIF1
    assert(rows(0).getInt(4) === 2021)
    assert(rows(0).getDouble(5) === 7.5)
  }

  test("ILO: DF_ prefix both ways; all key shapes failing → 0 rows") {
    // 'DF_'-prefixed input must not double-prefix (same fixture resolves)
    assert(Sudan.ilo(spark, "DF_UNE_DEAP_SEX_AGE_RT", fetcher = fx("ilo")).count() === 3)
    assert(Sudan.ilo(spark, "NOPE", fetcher = fx("ilo")).count() === 0)
  }

  test("SDMX pure functions: key parsing edge cases") {
    assert(SdmxDecoder.parseKey("0:0:1") === Seq(0, 0, 1))
    assert(SdmxDecoder.parseKey("5") === Seq(5))
    assert(SdmxDecoder.parseKey("x:2") === Seq(0, 2)) // malformed → 0
  }

  // ----------------------------------------------------------------- Search

  test("Search: WB∪WHO fan-out, provider tags, WB first (sudan_search.test)") {
    val rows = Sudan.search(spark, "mortality", fetcher = fx("search")).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).toSeq === Seq("worldbank", "who"))
    assert(rows(0).getString(1) === "SH.DYN.MORT")
    assert(rows(1).getString(1) === "MDG_0000000001")
    // WHO outage (no fixture for WHO) degrades to WB-only, never errors
    val wbOnly = Sudan.search(spark, "mortality", fetcher = fx("worldbank")).collect()
    assert(wbOnly.length === 1 && wbOnly(0).getString(0) === "worldbank")
  }

  test("Search: required-query error (sudan_search.test:13-17)") {
    val e = intercept[IllegalArgumentException] {
      Sudan.search(spark, "", fetcher = fx("worldbank"))
    }
    assert(e.getMessage ===
      "SUDAN: The 'query' parameter is required for SUDAN_Search().")
  }

  test("Search schema contract: (provider, indicator_id, indicator_name)") {
    val df = Sudan.search(spark, "x", fetcher = fx("worldbank"))
    assert(df.columns.toSeq === Seq("provider", "indicator_id", "indicator_name"))
  }
}
