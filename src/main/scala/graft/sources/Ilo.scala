package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.Json

/** ILO SDMX source (reference: ilo_functions.cpp:25-430) — the most complex
  * decoder: SDMX-JSON with two layout generations, index-keyed series and
  * observations, and dimension dictionaries.
  *
  * URL protocol: `sdmx.ilo.org/rest/data/ILO,DF_{indicator}/{iso3}.A{dots}`
  * — the dataflow id is auto-prefixed with `DF_` (:109-112); the number of
  * trailing wildcard dimensions varies per indicator, so 5 URL shapes
  * (1..5 dots) are tried until one succeeds (:116-138);
  * `lastNObservations=20` caps the fetch. Year pushdown appends
  * `startPeriod`/`endPeriod` (filter_pushdown.cpp:81-97).
  */
object SdmxDecoder {

  /** A dimension dictionary: id + ordered member ids. */
  final case class Dim(id: String, values: IndexedSeq[String])

  /** Extract the ordered member ids of one dimension node (prefer value.id,
    * fall back to value.name, else ""). */
  def dimValues(dim: JsonNode): IndexedSeq[String] =
    Json.field(dim, "values").map(Json.elements).getOrElse(Iterator.empty)
      .map { v =>
        Json.str(v, "id").orElse(Json.str(v, "name")).getOrElse("")
      }.toIndexedSeq

  private def dims(structure: JsonNode, key: String): IndexedSeq[Dim] =
    Json.field(structure, "dimensions").flatMap(Json.field(_, key))
      .map(Json.elements).getOrElse(Iterator.empty)
      .map(d => Dim(Json.str(d, "id").getOrElse(""), dimValues(d)))
      .toIndexedSeq

  /** `"0:0:1"` → Seq(0, 0, 1); malformed positions decode as 0
    * (ilo_functions.cpp ParseKeyIndices). */
  def parseKey(key: String): IndexedSeq[Int] =
    key.split(":", -1).map { s =>
      try s.toInt catch { case _: Exception => 0 }
    }.toIndexedSeq

  /** Look up a dimension member by dimension id + positional indices. */
  def lookup(dims: IndexedSeq[Dim], dimId: String, indices: IndexedSeq[Int]): String = {
    var i = 0
    while (i < dims.length && i < indices.length) {
      if (dims(i).id == dimId && indices(i) < dims(i).values.length)
        return dims(i).values(indices(i))
      i += 1
    }
    ""
  }

  /** Locate dataSets[0]: SDMX-JSON 1.0 has `dataSets` at root, 2.0 nests it
    * under `data` (ilo_functions.cpp:151-160). */
  def dataset(root: JsonNode): Option[JsonNode] = {
    val atRoot = Json.field(root, "dataSets")
    val arr = atRoot.filter(_.isArray).filter(_.size > 0)
      .orElse(Json.field(root, "data").flatMap(Json.field(_, "dataSets"))
        .filter(_.isArray).filter(_.size > 0))
    arr.map(_.get(0))
  }

  /** Locate the structure: 1.0 `structure` at root; 2.0 `data.structures[0]`
    * (ilo_functions.cpp:163-174). */
  def structure(root: JsonNode): Option[JsonNode] =
    Json.field(root, "structure")
      .orElse(Json.field(root, "data").flatMap(Json.field(_, "structures"))
        .filter(n => n.isArray && n.size > 0).map(_.get(0)))

  /** Decode one SDMX-JSON body into
    * (indicator, country, sex, classif1, year, value) rows. */
  def decode(body: String, indicator: String, country: String): Iterator[Seq[Any]] = {
    val parsed = for {
      root <- Json.parse(body)
      ds <- dataset(root)
      struct <- structure(root)
    } yield {
      val seriesDims = dims(struct, "series")
      val obsDims = dims(struct, "observation")
      Json.field(ds, "series").filter(_.isObject).map { series =>
        val it = series.fields()
        new Iterator[(String, JsonNode)] {
          def hasNext = it.hasNext
          def next() = { val e = it.next(); (e.getKey, e.getValue) }
        }.flatMap { case (seriesKey, seriesVal) =>
          val sIdx = parseKey(seriesKey)
          val sex = lookup(seriesDims, "SEX", sIdx)
          val age = lookup(seriesDims, "AGE", sIdx)
          val classif1 = if (age.nonEmpty) age else lookup(seriesDims, "CLASSIF1", sIdx)
          Json.field(seriesVal, "observations").filter(_.isObject)
            .map { obs =>
              val oit = obs.fields()
              new Iterator[(String, JsonNode)] {
                def hasNext = oit.hasNext
                def next() = { val e = oit.next(); (e.getKey, e.getValue) }
              }
            }.getOrElse(Iterator.empty).flatMap { case (obsKey, obsVal) =>
              val year = try lookup(obsDims, "TIME_PERIOD", parseKey(obsKey)).toInt
                catch { case _: Exception => 0 }
              // observation is [value, ...attributes]; non-numeric → skip row
              val value: Option[Double] =
                if (obsVal != null && obsVal.isArray && obsVal.size > 0 &&
                  obsVal.get(0).isNumber) Some(obsVal.get(0).asDouble())
                else None
              // '' sex/classif1 → SQL NULL (ilo_functions.cpp:384-385)
              value.map(v => Seq(indicator, country,
                if (sex.isEmpty) null else sex,
                if (classif1.isEmpty) null else classif1, year, v))
            }
        }
      }.getOrElse(Iterator.empty)
    }
    parsed.getOrElse(Iterator.empty)
  }

  final case class Rows(indicator: String) extends RowDecoder {
    override def decode(body: String, task: FetchTask): Iterator[Seq[Any]] =
      SdmxDecoder.decode(body, indicator, task.meta.getOrElse("country", ""))
  }
}

final class IloSource extends ApiSourceBase {

  override def shortName(): String = "sudan.ilo"

  override def tableSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("indicator", StringType),
      StructField("country", StringType),
      StructField("sex", StringType),
      StructField("classif1", StringType),
      StructField("year", IntegerType),
      StructField("value", DoubleType)))

  override def decoder: RowDecoder = SdmxDecoder.Rows("")

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val indicator = requireOption(options, "indicator",
      "SUDAN: The indicator parameter cannot be empty for SUDAN_ILO().")
    new ApiTable(shortName(), tableSchema(options), buildTasks(options),
      SdmxDecoder.Rows(indicator), fetcherSpec(options))
  }

  override def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask] = {
    val indicator = requireOption(options, "indicator",
      "SUDAN: The indicator parameter cannot be empty for SUDAN_ILO().")
    val countries = countriesOf(options)
    val dataflow = if (indicator.startsWith("DF_")) indicator else s"DF_$indicator"
    yearRange => countries.map { c =>
      val year =
        yearRange.start.map(y => s"&startPeriod=$y").getOrElse("") +
          yearRange.end.map(y => s"&endPeriod=$y").getOrElse("")
      val base = s"https://sdmx.ilo.org/rest/data/ILO,$dataflow/$c.A"
      val suffix = s"?format=jsondata&detail=dataonly&lastNObservations=20$year"
      // 5 alternative key shapes (1..5 wildcard dims); first success wins
      val urls = (1 to 5).map(n => base + ("." * n) + suffix)
      FetchTask(urls = urls, firstSuccessOnly = true, meta = Map("country" -> c))
    }
  }
}
