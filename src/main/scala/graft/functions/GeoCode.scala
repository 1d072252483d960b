package graft.functions

import graft.core.Registry

/** SUDAN_GeoCode(name) → ISO 3166-2 state code.
  * Lookup semantics exactly as the reference (geo_functions.cpp:325-375):
  * exact match on the Arabic name, OR case-insensitive match on the English
  * name; unknown input → '' (empty string, NOT null — pinned by the
  * reference's own golden test, test/sql/sudan_boundaries.test:81-85).
  *
  * The 18-entry lookup tables are built once per JVM and close over the
  * UDF — trivially broadcast to executors with the closure.
  */
object GeoCode {

  private val byArabic: Map[String, String] =
    Registry.states.map(s => s.state_name_ar -> s.iso_code).toMap
  private val byEnglishLower: Map[String, String] =
    Registry.states.map(s => s.state_name.toLowerCase -> s.iso_code).toMap

  /** Pure lookup; total function (null → ""). */
  def lookup(name: String): String = {
    if (name == null) ""
    else byArabic.getOrElse(name,
      byEnglishLower.getOrElse(name.toLowerCase, ""))
  }
}
