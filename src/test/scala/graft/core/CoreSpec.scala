package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the round-1 infrastructure (HTTP/cache/JSON/registry) —
  * pure JVM, no Spark session needed. */
class CoreSpec extends AnyFunSuite {

  // ------------------------------------------------------------------ cache

  test("ResponseCache: hit within TTL, single fetch") {
    ResponseCache.clear()
    var fetches = 0
    def fetch() = { fetches += 1; Right("body"): Either[FetchError, String] }
    assert(ResponseCache.getOrFetch("u1")(fetch()) === Right("body"))
    assert(ResponseCache.getOrFetch("u1")(fetch()) === Right("body"))
    assert(fetches === 1)
  }

  test("ResponseCache: errors are not cached") {
    ResponseCache.clear()
    var fetches = 0
    def failing() = { fetches += 1; Left(FetchError("u2", "boom")): Either[FetchError, String] }
    assert(ResponseCache.getOrFetch("u2")(failing()).isLeft)
    assert(ResponseCache.getOrFetch("u2")(failing()).isLeft)
    assert(fetches === 2)
  }

  // --------------------------------------------------------------- fixtures

  test("FixtureFetcher: longest-substring key wins; miss = Left") {
    val f = new FixtureFetcher(Map(
      "api.example.org" -> "generic",
      "api.example.org/v2/detail" -> "specific"))
    assert(f.get("https://api.example.org/v2/detail?page=1") === Right("specific"))
    assert(f.get("https://api.example.org/other") === Right("generic"))
    assert(f.get("https://elsewhere.net/").isLeft)
  }

  test("FetcherSpec: unknown mode throws, fixtures/http resolve") {
    assertThrows[IllegalArgumentException](FetcherSpec("fixture").build())
    assert(FetcherSpec("http").build().isInstanceOf[JavaHttpFetcher])
  }

  // ------------------------------------------------------------------- JSON

  private def node(json: String) = Json.parse(json).get

  test("Json coercion ladder: int/double/long from number or string") {
    val n = node("""{"a": 42, "b": "17", "c": 3.5, "d": "2,500.75", "e": "x", "f": null}""")
    assert(Json.intFlexible(n, "a") === Some(42))
    assert(Json.intFlexible(n, "b") === Some(17))
    assert(Json.doubleFlexible(n, "c") === Some(3.5))
    assert(Json.doubleFlexible(n, "d") === Some(2500.75))
    assert(Json.doubleFlexible(n, "e") === None)
    assert(Json.intFlexible(n, "f") === None)
    assert(Json.longFlexible(n, "a") === Some(42L))
  }

  test("Json longFlexible: integral precision above 2^53 preserved") {
    val big = "9007199254740995" // 2^53 + 3: not representable as double
    val n = node(s"""{"v": $big, "s": "$big"}""")
    assert(Json.longFlexible(n, "v") === Some(9007199254740995L))
    assert(Json.longFlexible(n, "s") === Some(9007199254740995L))
  }

  test("Json strNonEmpty maps '' to None (reference NULL convention)") {
    val n = node("""{"a": "", "b": "x"}""")
    assert(Json.strNonEmpty(n, "a") === None)
    assert(Json.strNonEmpty(n, "b") === Some("x"))
  }

  test("Json.parse: malformed input is None, never throws") {
    assert(Json.parse("{nope") === None)
    assert(Json.parse("") === None)
  }

  // --------------------------------------------------------------- registry

  test("Registry: ISO2→ISO3 normalization, case-insensitive, passthrough") {
    assert(Registry.normalizeCountryCode("sd") === "SDN")
    assert(Registry.normalizeCountryCode("EG") === "EGY")
    assert(Registry.normalizeCountryCode("SDN") === "SDN")
    assert(Registry.normalizeCountryCode("usa") === "USA") // unknown passes through
  }

  test("Registry: parseCountries default SDN, trims and normalizes") {
    assert(Registry.parseCountries(None) === Seq("SDN"))
    assert(Registry.parseCountries(Some("")) === Seq("SDN"))
    assert(Registry.parseCountries(Some(" eg ,ET,, SDN")) === Seq("EGY", "ETH", "SDN"))
  }

  test("Registry: 8 countries, 5 providers, 18 states") {
    assert(Registry.countries.length === 8)
    assert(Registry.providers.length === 5)
    assert(Registry.states.length === 18)
    assert(Registry.states.map(_.iso_code).distinct.length === 18)
  }
}
