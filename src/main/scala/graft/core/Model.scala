package graft.core

/** Core registries of the engine: supported countries, API providers, and
  * Sudan's 18 states. Mirrors the reference's static metadata tables
  * (reference: src/sudan/providers.hpp:11-77, src/sudan/geo/geo_functions.cpp:25-56)
  * re-expressed as Scala case classes so they can become `Dataset[T]`s.
  */
final case class CountryInfo(iso3: String, iso2: String, name: String, nameAr: String)

final case class ProviderInfo(
    provider_id: String,
    name: String,
    name_ar: String,
    description: String,
    base_url: String)

final case class StateInfo(
    iso_code: String,
    state_name: String,
    state_name_ar: String,
    centroid_lon: Double,
    centroid_lat: Double)

object Registry {

  /** Sudan + 7 neighbors (reference: providers.hpp:29-39). Closed domain:
    * every `countries` argument is validated + normalized against this list. */
  val countries: Seq[CountryInfo] = Seq(
    CountryInfo("SDN", "SD", "Sudan", "السودان"),
    CountryInfo("EGY", "EG", "Egypt", "مصر"),
    CountryInfo("ETH", "ET", "Ethiopia", "إثيوبيا"),
    CountryInfo("TCD", "TD", "Chad", "تشاد"),
    CountryInfo("SSD", "SS", "South Sudan", "جنوب السودان"),
    CountryInfo("ERI", "ER", "Eritrea", "إريتريا"),
    CountryInfo("LBY", "LY", "Libya", "ليبيا"),
    CountryInfo("CAF", "CF", "Central African Republic", "جمهورية أفريقيا الوسطى")
  )

  /** The 5 data providers (reference: providers.hpp:42-63). */
  val providers: Seq[ProviderInfo] = Seq(
    ProviderInfo("worldbank", "World Bank", "البنك الدولي",
      "World Development Indicators and other World Bank datasets",
      "https://api.worldbank.org/v2/"),
    ProviderInfo("who", "World Health Organization", "منظمة الصحة العالمية",
      "Global Health Observatory (GHO) data",
      "https://ghoapi.azureedge.net/api/"),
    ProviderInfo("fao", "Food and Agriculture Organization", "منظمة الأغذية والزراعة",
      "FAOSTAT agricultural statistics",
      "https://faostatservices.fao.org/api/v1/"),
    ProviderInfo("unhcr", "UNHCR", "المفوضية السامية",
      "UN Refugee Agency displacement and population data",
      "https://api.unhcr.org/population/v1/"),
    ProviderInfo("ilo", "International Labour Organization", "منظمة العمل الدولية",
      "International Labour Organization statistics",
      "https://sdmx.ilo.org/rest/")
  )

  /** Sudan's 18 states: ISO 3166-2 code, bilingual names, centroid
    * (reference: geo_functions.cpp:35-54; GADM v4.1 derived). */
  val states: Seq[StateInfo] = Seq(
    StateInfo("SD-KH", "Khartoum", "الخرطوم", 32.53, 15.55),
    StateInfo("SD-GZ", "Al Jazirah", "الجزيرة", 33.53, 14.88),
    StateInfo("SD-GD", "Al Qadarif", "القضارف", 35.40, 14.03),
    StateInfo("SD-KA", "Kassala", "كسلا", 36.40, 15.45),
    StateInfo("SD-RS", "Red Sea", "البحر الأحمر", 37.22, 19.62),
    StateInfo("SD-NR", "River Nile", "نهر النيل", 33.93, 17.50),
    StateInfo("SD-NO", "Northern", "الشمالية", 30.22, 19.50),
    StateInfo("SD-NW", "White Nile", "النيل الأبيض", 32.17, 13.17),
    StateInfo("SD-NB", "Blue Nile", "النيل الأزرق", 34.05, 11.25),
    StateInfo("SD-SI", "Sennar", "سنار", 34.13, 13.55),
    StateInfo("SD-DS", "South Darfur", "جنوب دارفور", 24.92, 11.75),
    StateInfo("SD-DN", "North Darfur", "شمال دارفور", 25.08, 15.77),
    StateInfo("SD-DW", "West Darfur", "غرب دارفور", 22.85, 12.83),
    StateInfo("SD-DC", "Central Darfur", "وسط دارفور", 24.23, 13.50),
    StateInfo("SD-DE", "East Darfur", "شرق دارفور", 26.13, 12.75),
    StateInfo("SD-KN", "North Kordofan", "شمال كردفان", 29.42, 13.83),
    StateInfo("SD-KS", "South Kordofan", "جنوب كردفان", 29.67, 11.20),
    StateInfo("SD-KW", "West Kordofan", "غرب كردفان", 28.05, 12.25)
  )

  private val byIso2: Map[String, CountryInfo] = countries.map(c => c.iso2 -> c).toMap
  private val byIso3: Map[String, CountryInfo] = countries.map(c => c.iso3 -> c).toMap

  /** ISO2→ISO3 normalization, case-insensitive; unknown codes pass through
    * upper-cased (reference: providers.cpp:40-50 semantics). */
  def normalizeCountryCode(code: String): String = {
    val up = code.trim.toUpperCase
    byIso2.get(up).map(_.iso3).getOrElse(up)
  }

  def findCountryByIso3(iso3: String): Option[CountryInfo] = byIso3.get(iso3.toUpperCase)

  def isSupported(code: String): Boolean = byIso3.contains(normalizeCountryCode(code))

  /** Parse + normalize a comma-separated countries option; default SDN. */
  def parseCountries(opt: Option[String]): Seq[String] = opt match {
    case None | Some("") => Seq("SDN")
    case Some(s) => s.split(",").iterator.map(_.trim).filter(_.nonEmpty)
      .map(normalizeCountryCode).toSeq
  }
}
