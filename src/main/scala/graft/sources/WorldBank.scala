package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.Json

/** World Bank V2 API sources (reference: wb_functions.cpp:30-317,
  * wb_indicators.cpp:25-230).
  *
  * Data scan: one InputPartition per country; each partition paginates
  * `api.worldbank.org/v2/country/{iso3}/indicator/{code}` with
  * `per_page=1000` following the `pages` metadata. Year pushdown appends
  * `date=start:end` (open bounds default 1900/2100 like the reference's
  * encoder, filter_pushdown.cpp:6-20).
  */
object WorldBankDecoders {

  /** `[metadata, data]` envelope shared by data + catalog endpoints. */
  private def dataArray(body: String): Option[JsonNode] =
    Json.parse(body).flatMap { root =>
      if (root.isArray && root.size() >= 2 && root.get(1).isArray) Some(root.get(1))
      else None
    }

  private def pagesOf(body: String): Option[Int] =
    Json.parse(body).flatMap { root =>
      if (root.isArray && root.size() >= 1) Json.intFlexible(root.get(0), "pages")
      else None
    }

  /** Rows: (indicator_id, indicator_name, country, country_name, year, value). */
  object Data extends RowDecoder {
    override def totalPages(body: String): Option[Int] = pagesOf(body)
    override def decode(body: String, task: FetchTask): Iterator[Seq[Any]] =
      dataArray(body).map(Json.elements).getOrElse(Iterator.empty).map { elem =>
        val ind = Json.field(elem, "indicator")
        val ctr = Json.field(elem, "country")
        Seq(
          ind.flatMap(Json.str(_, "id")).getOrElse(""),
          ind.flatMap(Json.str(_, "value")).getOrElse(""),
          ctr.flatMap(Json.str(_, "id")).getOrElse(""),
          ctr.flatMap(Json.str(_, "value")).getOrElse(""),
          Json.intFlexible(elem, "date").getOrElse(0),
          Json.doubleFlexible(elem, "value").orNull)
      }
  }

  /** Rows: (indicator_id, indicator_name, source, source_note); client-side
    * case-insensitive substring filter on id+name (wb_indicators.cpp:158-166). */
  final case class Catalog(searchLower: String) extends RowDecoder {
    override def totalPages(body: String): Option[Int] = pagesOf(body)
    override def decode(body: String, task: FetchTask): Iterator[Seq[Any]] =
      dataArray(body).map(Json.elements).getOrElse(Iterator.empty).flatMap { elem =>
        val id = Json.str(elem, "id").getOrElse("")
        val name = Json.str(elem, "name").getOrElse("")
        val keep = searchLower.isEmpty ||
          name.toLowerCase.contains(searchLower) || id.toLowerCase.contains(searchLower)
        if (!keep) None
        else Some(Seq(
          id, name,
          Json.field(elem, "source").flatMap(Json.str(_, "value")).getOrElse(""),
          Json.strNonEmpty(elem, "sourceNote").orNull))
      }
  }
}

/** `spark.read.format("sudan.worldbank").option("indicator", ...)` */
final class WorldBankSource extends ApiSourceBase {

  override def shortName(): String = "sudan.worldbank"

  override def tableSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("indicator_id", StringType),
      StructField("indicator_name", StringType),
      StructField("country", StringType),
      StructField("country_name", StringType),
      StructField("year", IntegerType),
      StructField("value", DoubleType)))

  override def decoder: RowDecoder = WorldBankDecoders.Data

  override def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask] = {
    val indicator = requireOption(options, "indicator",
      "SUDAN: The indicator parameter cannot be empty.")
    val countries = countriesOf(options)
    yearRange => countries.map { c =>
      val base = s"https://api.worldbank.org/v2/country/$c/indicator/$indicator" +
        "?format=json&per_page=1000"
      val dated = encodeYear(yearRange).fold(base)(p => s"$base&$p")
      FetchTask(pagedBase = Some(dated), meta = Map("country" -> c))
    }
  }

  /** `date=start:end` with 1900/2100 defaults (filter_pushdown.cpp:6-20). */
  private def encodeYear(r: YearRange): Option[String] =
    if (r.isEmpty) None
    else Some(s"date=${r.start.getOrElse(1900)}:${r.end.getOrElse(2100)}")
}

/** `spark.read.format("sudan.wb_indicators").option("search", ...)`.
  * Extra options beyond the reference: `source` (WB source id restriction,
  * used by SUDAN_Search's source=2 probe) and `max_pages`. */
final class WbIndicatorsSource extends ApiSourceBase {

  override def shortName(): String = "sudan.wb_indicators"

  override def tableSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("indicator_id", StringType),
      StructField("indicator_name", StringType),
      StructField("source", StringType),
      StructField("source_note", StringType)))

  override def decoder: RowDecoder = WorldBankDecoders.Catalog("")

  /** One task pages the FULL indicator catalog (~25k rows published) —
    * the honest stats bound, not the per-country-series 256 default. */
  override def rowsPerTaskHint: Long = 32768L

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val search = Option(options.get("search")).getOrElse("").toLowerCase
    new ApiTable(shortName(), tableSchema(options), buildTasks(options),
      WorldBankDecoders.Catalog(search), fetcherSpec(options),
      rowsPerTaskHint)
  }

  override def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask] = {
    val sourceId = Option(options.get("source"))
    val maxPages = Option(options.get("max_pages")).map(_.toInt)
    _ => {
      val base = "https://api.worldbank.org/v2/indicator?format=json&per_page=1000" +
        sourceId.fold("")(s => s"&source=$s")
      maxPages match {
        case Some(1) => Seq(FetchTask(urls = Seq(s"$base&page=1")))
        case _ => Seq(FetchTask(pagedBase = Some(base)))
      }
    }
  }
}
