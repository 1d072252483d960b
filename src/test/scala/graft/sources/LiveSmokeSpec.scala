package graft.sources

import graft.SparkSpec
import graft.api.Sudan
import org.apache.spark.sql.functions.col

/** Opt-in live-HTTP smoke: set GRAFT_LIVE_SMOKE=1 to run the same reads
  * the fixture suite covers, but against the real APIs — closing the loop
  * the reference's own live tests close (`test/sql/sudan_worldbank.test`).
  * Skipped (canceled) by default: this CI is zero-egress, and the
  * reference's CI likewise builds with `skip_tests: true`. The decode
  * paths these hit are identical to the fixture-driven ones — only the
  * transport differs (`Fetcher(mode = "http")`). */
class LiveSmokeSpec extends SparkSpec {

  private val live = sys.env.get("GRAFT_LIVE_SMOKE").contains("1")

  test("live World Bank population fetch decodes rows") {
    assume(live, "set GRAFT_LIVE_SMOKE=1 to run against live APIs")
    val df = Sudan.worldBank(spark, "SP.POP.TOTL")
    assert(df.filter(col("country") === "SD").count() > 0)
  }

  test("live WHO GHO fetch decodes rows") {
    assume(live, "set GRAFT_LIVE_SMOKE=1 to run against live APIs")
    assert(Sudan.who(spark, "WHOSIS_000001").count() > 0)
  }

  test("live UNHCR refugee fetch decodes rows") {
    assume(live, "set GRAFT_LIVE_SMOKE=1 to run against live APIs")
    assert(Sudan.unhcr(spark, "refugees").count() > 0)
  }

  test("live cross-provider search returns merged catalog hits") {
    assume(live, "set GRAFT_LIVE_SMOKE=1 to run against live APIs")
    assert(Sudan.search(spark, "mortality").count() > 0)
  }
}
