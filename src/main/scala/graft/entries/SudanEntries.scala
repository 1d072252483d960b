package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, BloomFilterJoin, Dedup, Multimodal,
  RangeJoin, Relational, Similarity, TextOps}
import OracleLib._

/** The reference extension surface: embedded geo sources,
  * GeoCode, the fixture-driven DSv2 API scans and the SQL TVFs.
  *
  * Split out of the monolithic `graft.SparkEntry` (round 11): one module
  * per operator family, each holding the family's `queries` entries and
  * their DuckDB `oracleSql` twins. `SparkEntry` aggregates the modules;
  * `SparkEntrySpec` still guards queries↔oracle key parity on the
  * aggregate. Shared oracle SQL fragments live in [[OracleLib]].
  */
private[graft] object SudanEntries {
  import graft.api.Sudan
  import graft.geo.SudanGeo
  import graft.functions.GeoCode

  // ------------------------------------------------------------ geo helpers

  private def statesGolden(s: SparkSession, dir: String): DataFrame =
    SudanGeo.states(s).select(
      col("iso_code"), col("state_name"), col("state_name_ar"),
      col("centroid_lon"), col("centroid_lat"),
      length(col("geojson")).cast("long").as("n_geojson_chars"),
      substring(col("geojson"), 1, 22).as("geo_prefix"))

  private def boundaryCountry(s: SparkSession, dir: String): DataFrame =
    SudanGeo.boundariesDf(s, "country").select(
      col("country_name"), col("country_name_ar"), col("iso_code"),
      length(col("geojson")).cast("long").as("n_chars"),
      substring(col("geojson"), 1, 22).as("geo_prefix"))

  private def geocodeGolden(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val geocode = udf((n: String) => GeoCode.lookup(n))
    Seq("Khartoum", "الخرطوم", "khartoum", "KHARTOUM", "Red Sea", "red sea",
      "Al Jazirah", "Unknown Place", "")
      .toDF("name")
      .select(col("name"), geocode(col("name")).as("iso_code"))
  }

  private def fixtures(dir: String): Sudan.Fetcher =
    Sudan.Fetcher("fixtures", s"graft/fixtures/$dir")

  /** Run a TVF query with the fixture transport conf set ONLY for the
    * duration of the `spark.sql` analysis (the fetcher conf is baked into
    * the relation options at analysis time), restoring the previous
    * values after — the session's transport selection must not leak into
    * later queries. */
  private def sqlWithFixtures(s: SparkSession, dir: String,
      sql: String): DataFrame = {
    import graft.api.SudanTableFunctions.{FixturesKey, ModeKey}
    graft.api.SudanTableFunctions.registerRuntime(s)
    val oldMode = s.conf.getOption(ModeKey)
    val oldFix = s.conf.getOption(FixturesKey)
    s.conf.set(ModeKey, "fixtures")
    s.conf.set(FixturesKey, s"graft/fixtures/$dir")
    try s.sql(sql)
    finally {
      oldMode.fold(s.conf.unset(ModeKey))(s.conf.set(ModeKey, _))
      oldFix.fold(s.conf.unset(FixturesKey))(s.conf.set(FixturesKey, _))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // embedded geo sources + scalar (§2A S8/S10/S11/F1)
    "q_states" -> (statesGolden _),
    "q_providers" -> ((s, _) => SudanGeo.providers(s)),
    "q_boundary_country" -> (boundaryCountry _),
    "q_geocode" -> (geocodeGolden _),
    // networked DSv2 sources (§2A S1-S9), driven by recorded fixtures —
    // the full read path (options → URL → fetch → decode) runs for real;
    // only the HTTP transport is recorded, as in the reference's own
    // offline testing strategy (FIXTURES.md §1)
    "q_src_worldbank" -> ((s, _) =>
      Sudan.worldBank(s, "SP.POP.TOTL", fetcher = fixtures("worldbank"))),
    "q_src_wb_catalog" -> ((s, _) =>
      Sudan.wbIndicators(s, fetcher = fixtures("worldbank"))),
    "q_src_wb_pushdown" -> ((s, _) =>
      Sudan.worldBank(s, "SP.POP.TOTL", fetcher = fixtures("worldbank"))
        .filter(col("year") >= 2019)),
    "q_src_who" -> ((s, _) =>
      Sudan.who(s, "WHOSIS_000001", fetcher = fixtures("who"))),
    "q_src_who_catalog" -> ((s, _) =>
      Sudan.whoIndicators(s, fetcher = fixtures("who"))),
    "q_src_fao" -> ((s, _) =>
      Sudan.fao(s, "QCL", "production", fetcher = fixtures("fao"))),
    "q_src_unhcr" -> ((s, _) =>
      Sudan.unhcr(s, "refugees", fetcher = fixtures("unhcr"))),
    "q_src_ilo" -> ((s, _) =>
      Sudan.ilo(s, "UNE_DEAP_SEX_AGE_RT", fetcher = fixtures("ilo"))),
    "q_src_ilo_legacy" -> ((s, _) =>
      Sudan.ilo(s, "EMP_TEMP_SEX_ECO_NB", fetcher = fixtures("ilo10"))),
    "q_src_search" -> ((s, _) =>
      Sudan.search(s, "mortality", fetcher = fixtures("search"))),
    // the SQL TVF surface (docs/functions.md spelling, `:=`→`=>`): same
    // DSv2 scans underneath, bound at analysis time by the injected
    // table-function builders — registered here at runtime so the stock
    // Verify/Bench session needs no extensions config. The fetcher conf
    // is read INSIDE s.sql's analysis, then baked into the relation's
    // options — sqlWithFixtures restores the previous conf immediately
    // after analysis, so nothing leaks into later queries on the session.
    "q_sql_tvf_worldbank" -> ((s, _) =>
      sqlWithFixtures(s, "worldbank",
        "SELECT * FROM SUDAN_WorldBank('SP.POP.TOTL', " +
          "countries => array('SDN')) WHERE year >= 2019")),
    "q_sql_tvf_search" -> ((s, _) =>
      sqlWithFixtures(s, "search",
        "SELECT * FROM SUDAN_Search(query => 'mortality')")),
    "q_sql_tvf_states" -> ((s, _) => {
      graft.api.SudanTableFunctions.registerRuntime(s)
      s.sql("SELECT iso_code, state_name, state_name_ar, centroid_lon, " +
        "centroid_lat, CAST(length(geojson) AS BIGINT) AS n_geojson_chars, " +
        "substring(geojson, 1, 22) AS geo_prefix FROM SUDAN_States()")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_states" -> statesOracleSql,
    "q_providers" ->
      ("SELECT provider_id, name, name_ar, description, base_url FROM (VALUES " +
        "('worldbank', 'World Bank', 'البنك الدولي', " +
        "'World Development Indicators and other World Bank datasets', " +
        "'https://api.worldbank.org/v2/'), " +
        "('who', 'World Health Organization', 'منظمة الصحة العالمية', " +
        "'Global Health Observatory (GHO) data', " +
        "'https://ghoapi.azureedge.net/api/'), " +
        "('fao', 'Food and Agriculture Organization', 'منظمة الأغذية والزراعة', " +
        "'FAOSTAT agricultural statistics', " +
        "'https://faostatservices.fao.org/api/v1/'), " +
        "('unhcr', 'UNHCR', 'المفوضية السامية', " +
        "'UN Refugee Agency displacement and population data', " +
        "'https://api.unhcr.org/population/v1/'), " +
        "('ilo', 'International Labour Organization', 'منظمة العمل الدولية', " +
        "'International Labour Organization statistics', " +
        "'https://sdmx.ilo.org/rest/')" +
        ") AS t(provider_id, name, name_ar, description, base_url)"),
    "q_boundary_country" ->
      ("SELECT 'Sudan' AS country_name, 'السودان' AS country_name_ar, " +
        "'SDN' AS iso_code, CAST(103060 AS BIGINT) AS n_chars, " +
        "'{\"type\":\"MultiPolygon\"' AS geo_prefix"),
    "q_geocode" ->
      ("SELECT name, iso_code FROM (VALUES " +
        "('Khartoum', 'SD-KH'), ('الخرطوم', 'SD-KH'), ('khartoum', 'SD-KH'), " +
        "('KHARTOUM', 'SD-KH'), ('Red Sea', 'SD-RS'), ('red sea', 'SD-RS'), " +
        "('Al Jazirah', 'SD-GZ'), ('Unknown Place', ''), ('', '')" +
        ") AS t(name, iso_code)"),
    // networked-source goldens: expected decode of the recorded fixture
    // bodies (FIXTURES.md §1), matching the reference's parse semantics
    "q_src_worldbank" ->
      ("SELECT indicator_id, indicator_name, country, country_name, " +
        "CAST(year AS INTEGER) AS year, CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2020, 44440486.0), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2019, 43232954.5), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2018, CAST(NULL AS DOUBLE))" +
        ") AS t(indicator_id, indicator_name, country, country_name, year, value)"),
    "q_src_wb_catalog" ->
      ("SELECT indicator_id, indicator_name, source, source_note FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'World Development Indicators', 'Total population.'), " +
        "('SP.POP.GROW', 'Population growth (annual %)', 'World Development Indicators', CAST(NULL AS VARCHAR)), " +
        "('NY.GDP.MKTP.CD', 'GDP (current US$)', 'World Development Indicators', 'GDP at purchaser prices.'), " +
        "('SH.DYN.MORT', 'Mortality rate, under-5', 'Health', 'Under-five mortality.')" +
        ") AS t(indicator_id, indicator_name, source, source_note)"),
    "q_src_wb_pushdown" ->
      ("SELECT indicator_id, indicator_name, country, country_name, " +
        "CAST(year AS INTEGER) AS year, CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2020, 44440486.0), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2019, 43232954.5)" +
        ") AS t(indicator_id, indicator_name, country, country_name, year, value)"),
    "q_src_who" ->
      ("SELECT indicator_code, CAST(indicator_name AS VARCHAR) AS indicator_name, " +
        "country, CAST(year AS INTEGER) AS year, sex, " +
        "CAST(value AS DOUBLE) AS value, region FROM (VALUES " +
        "('WHOSIS_000001', NULL, 'SDN', 2019, 'SEX_BTSX', 65.3, 'Africa'), " +
        "('WHOSIS_000001', NULL, 'SDN', 2018, CAST(NULL AS VARCHAR), 65.0, CAST(NULL AS VARCHAR)), " +
        "('WHOSIS_000001', NULL, 'SDN', 2017, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), 'Africa')" +
        ") AS t(indicator_code, indicator_name, country, year, sex, value, region)"),
    "q_src_who_catalog" ->
      ("SELECT indicator_code, indicator_name, language FROM (VALUES " +
        "('WHOSIS_000001', 'Life expectancy at birth (years)', 'EN'), " +
        "('MDG_0000000001', 'Infant mortality rate', 'EN'), " +
        "('NCD_BMI_30A', 'Obesity prevalence', CAST(NULL AS VARCHAR))" +
        ") AS t(indicator_code, indicator_name, language)"),
    "q_src_fao" ->
      ("SELECT dataset, area, item, element, CAST(year AS INTEGER) AS year, " +
        "CAST(value AS DOUBLE) AS value, unit FROM (VALUES " +
        "('QCL', 'Sudan', 'Wheat', 'Production', 2021, 601000.0, 't'), " +
        "('QCL', 'Sudan', 'Sorghum', 'Production', 2020, 3746000.0, 't'), " +
        "('QCL', 'Sudan', 'Millet', 'Production', 2020, 1034000.0, 't'), " +
        "('QCL', 'Sudan', 'Dates', 'Production', 2019, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR))" +
        ") AS t(dataset, area, item, element, year, value, unit)"),
    "q_src_unhcr" ->
      ("SELECT CAST(year AS INTEGER) AS year, population_type, country_origin, " +
        "country_origin_name, country_asylum, country_asylum_name, " +
        "CAST(value AS BIGINT) AS value FROM (VALUES " +
        "(2023, 'refugees', 'SDN', 'Sudan', 'TCD', 'Chad', 409235), " +
        "(2023, 'refugees', 'SDN', 'Sudan', 'EGY', 'Egypt', 318533), " +
        "(2023, 'refugees', 'ERI', 'Eritrea', 'SDN', 'Sudan', 126000)" +
        ") AS t(year, population_type, country_origin, country_origin_name, " +
        "country_asylum, country_asylum_name, value)"),
    "q_src_ilo" ->
      ("SELECT indicator, country, sex, classif1, CAST(year AS INTEGER) AS year, " +
        "CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('UNE_DEAP_SEX_AGE_RT', 'SDN', 'SEX_T', 'AGE_YTHADULT_Y15-64', 2022, 13.1), " +
        "('UNE_DEAP_SEX_AGE_RT', 'SDN', 'SEX_T', 'AGE_YTHADULT_Y15-64', 2023, 13.4), " +
        "('UNE_DEAP_SEX_AGE_RT', 'SDN', 'SEX_M', 'AGE_YTHADULT_Y15-64', 2022, 11.2)" +
        ") AS t(indicator, country, sex, classif1, year, value)"),
    "q_src_ilo_legacy" ->
      ("SELECT indicator, country, sex, classif1, CAST(year AS INTEGER) AS year, " +
        "CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('EMP_TEMP_SEX_ECO_NB', 'SDN', CAST(NULL AS VARCHAR), 'ECO_SECTOR_AGR', 2021, 7.5)" +
        ") AS t(indicator, country, sex, classif1, year, value)"),
    "q_src_search" ->
      ("SELECT provider, indicator_id, indicator_name FROM (VALUES " +
        "('worldbank', 'SH.DYN.MORT', 'Mortality rate, under-5'), " +
        "('who', 'MDG_0000000001', 'Infant mortality rate')" +
        ") AS t(provider, indicator_id, indicator_name)"),
    // SQL TVF spellings: same expected rows as their factory twins —
    // hash-identical results prove the TVF path binds the same scan
    "q_sql_tvf_worldbank" ->
      ("SELECT indicator_id, indicator_name, country, country_name, " +
        "CAST(year AS INTEGER) AS year, CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2020, 44440486.0), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2019, 43232954.5)" +
        ") AS t(indicator_id, indicator_name, country, country_name, year, value)"),
    "q_sql_tvf_search" ->
      ("SELECT provider, indicator_id, indicator_name FROM (VALUES " +
        "('worldbank', 'SH.DYN.MORT', 'Mortality rate, under-5'), " +
        "('who', 'MDG_0000000001', 'Infant mortality rate')" +
        ") AS t(provider, indicator_id, indicator_name)"),
    // same golden rows as q_states: the TVF spelling must hash-match the
    // factory spelling, so they share one oracle string
    "q_sql_tvf_states" -> statesOracleSql,
  )
}
