package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Scala-facing factories for all networked sources — the idiomatic
  * counterpart of the reference's 8 networked table functions (SURVEY §7.3:
  * Spark SQL has no named-arg TVFs, so the surface is factories + reader
  * options). `fetcher` switches between live HTTP and recorded fixtures.
  *
  * Example:
  * {{{
  *   Sudan.worldBank(spark, "SP.POP.TOTL", countries = Seq("SDN", "EGY"))
  *     .filter($"year" >= 2020)   // pushed into the API URL as date=2020:2100
  * }}}
  */
object Sudan {

  /** fetcher options passed through to every reader. */
  final case class Fetcher(mode: String = "http", fixtures: String = "")

  val Live: Fetcher = Fetcher()

  private def read(spark: SparkSession, format: String, f: Fetcher,
      opts: (String, String)*): DataFrame = {
    var r = spark.read.format(format)
      .option("fetcher.mode", f.mode)
    if (f.fixtures.nonEmpty) r = r.option("fetcher.fixtures", f.fixtures)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** SUDAN_WorldBank(indicator, countries := [...]). */
  def worldBank(spark: SparkSession, indicator: String,
      countries: Seq[String] = Seq.empty, fetcher: Fetcher = Live): DataFrame =
    read(spark, "sudan.worldbank", fetcher,
      "indicator" -> indicator, "countries" -> countries.mkString(","))

  /** SUDAN_WB_Indicators(search := ...). */
  def wbIndicators(spark: SparkSession, search: String = "",
      fetcher: Fetcher = Live): DataFrame =
    read(spark, "sudan.wb_indicators", fetcher, "search" -> search)

  /** SUDAN_WHO(indicator, countries := [...]). */
  def who(spark: SparkSession, indicator: String,
      countries: Seq[String] = Seq.empty, fetcher: Fetcher = Live): DataFrame =
    read(spark, "sudan.who", fetcher,
      "indicator" -> indicator, "countries" -> countries.mkString(","))

  /** SUDAN_WHO_Indicators(search := ...). */
  def whoIndicators(spark: SparkSession, search: String = "",
      fetcher: Fetcher = Live): DataFrame =
    read(spark, "sudan.who_indicators", fetcher, "search" -> search)

  /** SUDAN_FAO(dataset, element, countries := [...]). */
  def fao(spark: SparkSession, dataset: String, element: String,
      countries: Seq[String] = Seq.empty, fetcher: Fetcher = Live): DataFrame =
    read(spark, "sudan.fao", fetcher, "dataset" -> dataset,
      "element" -> element, "countries" -> countries.mkString(","))

  /** SUDAN_UNHCR(population_type, countries := [...]). */
  def unhcr(spark: SparkSession, populationType: String,
      countries: Seq[String] = Seq.empty, fetcher: Fetcher = Live): DataFrame =
    read(spark, "sudan.unhcr", fetcher, "population_type" -> populationType,
      "countries" -> countries.mkString(","))

  /** SUDAN_ILO(indicator, countries := [...]). */
  def ilo(spark: SparkSession, indicator: String,
      countries: Seq[String] = Seq.empty, fetcher: Fetcher = Live): DataFrame =
    read(spark, "sudan.ilo", fetcher,
      "indicator" -> indicator, "countries" -> countries.mkString(","))

  /** SUDAN_Search(query := ...) — fan-out UNION ALL of the WB catalog
    * (source=2, single page — info_functions.cpp:194) and the WHO catalog,
    * tagged by provider, WB first (:307-308). The required-query check
    * matches the reference's bind error (:167-169). Both catalog scans run
    * as parallel partitions of one union plan — no shuffle. */
  def search(spark: SparkSession, query: String,
      fetcher: Fetcher = Live): DataFrame = {
    if (query == null || query.isEmpty)
      throw new IllegalArgumentException(
        "SUDAN: The 'query' parameter is required for SUDAN_Search().")
    val wb = read(spark, "sudan.wb_indicators", fetcher,
      "search" -> query, "source" -> "2", "max_pages" -> "1")
      .select(lit("worldbank").as("provider"),
        org.apache.spark.sql.functions.col("indicator_id"),
        org.apache.spark.sql.functions.col("indicator_name"))
    val whoC = read(spark, "sudan.who_indicators", fetcher, "search" -> query)
      .select(lit("who").as("provider"),
        org.apache.spark.sql.functions.col("indicator_code").as("indicator_id"),
        org.apache.spark.sql.functions.col("indicator_name"))
    wb.unionAll(whoC)
  }
}
