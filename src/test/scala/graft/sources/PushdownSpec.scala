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

  test("WHO: OData 'and TimeDim ge/le' clauses") {
    val t = new WhoSource().buildTasks(opts("indicator" -> "X"))
    assert(t(both).head.urls.head
      .contains("$filter=SpatialDim eq 'SDN' and TimeDim ge 2015 and TimeDim le 2020"))
    assert(t(startOnly).head.urls.head.contains("and TimeDim ge 2015"))
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
    assert(urls.exists(_.contains("eq 'EGY'")) && urls.exists(_.contains("eq 'ETH'")))
    val d = new WhoSource().buildTasks(opts("indicator" -> "X"))
    assert(d(none).map(_.urls.head).head.contains("eq 'SDN'"))
  }
}
