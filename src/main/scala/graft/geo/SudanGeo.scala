package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Fixtures, Json, Registry}

/** Embedded offline geo sources: the 18-state table, admin boundaries at
  * three levels, and the provider registry — the reference's
  * SUDAN_States / SUDAN_Boundaries / SUDAN_Providers table functions
  * (reference: geo_functions.cpp:62-319, info_functions.cpp:25-127).
  *
  * These are tiny static datasets; on a cluster they are driver-local and
  * always broadcast-able — joins against them never shuffle the big side.
  */
object SudanGeo {

  final case class StateRow(
      state_name: String, state_name_ar: String, iso_code: String,
      centroid_lon: Double, centroid_lat: Double, geojson: String)

  final case class CountryBoundaryRow(
      country_name: String, country_name_ar: String, iso_code: String, geojson: String)

  final case class StateBoundaryRow(
      state_name: String, state_name_ar: String, iso_code: String, geojson: String)

  final case class LocalityBoundaryRow(
      locality_name: String, locality_name_ar: String, state_name: String, geojson: String)

  /** GADM v4.1 MultiPolygon GeoJSON per state (index-aligned with
    * Registry.states) + the country outline, bundled as a resource. */
  lazy val boundaries: (String, IndexedSeq[String]) = {
    val node = Json.parse(Fixtures.resource("graft/sudan_boundaries.json"))
      .getOrElse(throw new IllegalStateException("sudan_boundaries.json unreadable"))
    val country = node.get("country").asText()
    val states = Json.elements(node.get("states")).map(_.asText()).toIndexedSeq
    require(states.length == Registry.states.length, "state/boundary count mismatch")
    (country, states)
  }

  /** SUDAN_States(): 18 rows with bilingual names, ISO code, centroid, geometry. */
  def states(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val geo = boundaries._2
    Registry.states.zipWithIndex.map { case (s, i) =>
      StateRow(s.state_name, s.state_name_ar, s.iso_code, s.centroid_lon, s.centroid_lat, geo(i))
    }.toDF()
  }

  /** SUDAN_Boundaries(level): level-dependent schema, exactly as the
    * reference declares per level (geo_functions.cpp:92-121); invalid level
    * throws with the reference's message (geo_functions.cpp:87-89). */
  def boundariesDf(spark: SparkSession, level: String): DataFrame = {
    import spark.implicits._
    val lower = level.toLowerCase
    lower match {
      case "country" =>
        // ISO3 at country level, per the reference (geo_functions.cpp Init: "SDN")
        Seq(CountryBoundaryRow("Sudan", "السودان", "SDN", boundaries._1)).toDF()
      case "state" =>
        val geo = boundaries._2
        Registry.states.zipWithIndex.map { case (s, i) =>
          StateBoundaryRow(s.state_name, s.state_name_ar, s.iso_code, geo(i))
        }.toDF()
      case "locality" =>
        // admin-2 is a declared-but-empty level in the reference (geo_functions.cpp:156-160)
        spark.emptyDataset[LocalityBoundaryRow].toDF()
      case _ =>
        // echo the user's original input, as the reference does (level.c_str())
        throw new IllegalArgumentException(
          s"SUDAN: Invalid boundary level '$level'. Valid levels: 'country', 'state', 'locality'.")
    }
  }

  /** SUDAN_Providers(): the 5-row provider registry. */
  def providers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Registry.providers.toDF()
  }
}
