package graft.geo

import graft.SparkSpec

/** Opt-in Sedona interop smoke — the spatial half the reference delegates
  * to duckdb-spatial (README.md:113, notebook cells 107-115: `ST_*` over
  * the GeoJSON columns). The Spark-side analogue is Apache Sedona: the
  * `geojson` columns [[SudanGeo]] ships parse directly with
  * `ST_GeomFromGeoJSON`, so any Sedona-enabled session gets area/centroid/
  * predicate queries over the states table with no changes here.
  * Canceled when Sedona is not on the classpath (this CI is offline and
  * carries Spark-only jars — same posture as `LiveSmokeSpec`); run under
  * a Sedona-enabled spark-submit to exercise it for real. */
class SedonaInteropSpec extends SparkSpec {

  private val sedonaPresent: Boolean =
    try {
      Class.forName("org.apache.sedona.spark.SedonaContext")
      true
    } catch { case _: ClassNotFoundException => false }

  test("states geojson parses through Sedona ST_GeomFromGeoJSON → ST_Area") {
    assume(sedonaPresent, "Apache Sedona not on the classpath — add the " +
      "sedona-spark-shaded jar to run the spatial interop smoke")
    // registration via reflection so this file compiles without Sedona:
    // SedonaContext.create(spark) injects the ST_* function registry
    val cls = Class.forName("org.apache.sedona.spark.SedonaContext")
    cls.getMethod("create", classOf[org.apache.spark.sql.SparkSession])
      .invoke(null, spark)
    SudanGeo.states(spark).createOrReplaceTempView("sedona_states")
    val areas = spark.sql(
      """SELECT iso_code,
        |       ST_Area(ST_GeomFromGeoJSON(geojson)) AS area_deg2
        |FROM sedona_states""".stripMargin).collect()
    assert(areas.length === 18)
    // every state polygon is non-degenerate and the largest (Northern,
    // SD-NO, by land area) dwarfs Khartoum
    val byIso = areas.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byIso.values.forall(_ > 0.0))
    assert(byIso("SD-NO") > byIso("SD-KH"))
  }
}
