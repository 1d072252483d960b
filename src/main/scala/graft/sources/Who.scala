package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.Json

/** WHO Global Health Observatory sources (reference: who_functions.cpp).
  * Data: OData endpoint, one request per country with a server-side
  * `$filter=SpatialDim eq '{iso3}'`; year pushdown appends
  * `and TimeDim ge/le` clauses (encoder shape: filter_pushdown.cpp:23-40). */
object WhoDecoders {

  /** Rows: (indicator_code, indicator_name=NULL, country, year, sex, value,
    * region). The GHO data endpoint has no indicator name → always NULL
    * (who_functions.cpp:243). sex/region '' → NULL (:242,248). */
  final case class Data(indicator: String) extends RowDecoder {
    override def decode(body: String, task: FetchTask): Iterator[Seq[Any]] = {
      val country = task.meta.getOrElse("country", "")
      Json.parse(body).flatMap(r => Json.field(r, "value"))
        .map(Json.elements).getOrElse(Iterator.empty).map { elem =>
          Seq(
            Json.str(elem, "IndicatorCode").getOrElse(indicator),
            null, // indicator_name: not present in GHO data responses
            Json.str(elem, "SpatialDim").getOrElse(country),
            Json.intFlexible(elem, "TimeDim").getOrElse(0),
            Json.strNonEmpty(elem, "Dim1").orNull,
            Json.doubleFlexible(elem, "NumericValue").orNull,
            Json.strNonEmpty(elem, "ParentLocation").orNull)
        }
    }
  }

  /** Rows: (indicator_code, indicator_name, language); '' language → NULL;
    * client-side ci substring filter on code+name (who_functions.cpp:387-394). */
  final case class Catalog(searchLower: String) extends RowDecoder {
    override def decode(body: String, task: FetchTask): Iterator[Seq[Any]] =
      Json.parse(body).flatMap(r => Json.field(r, "value"))
        .map(Json.elements).getOrElse(Iterator.empty).flatMap { elem =>
          val code = Json.str(elem, "IndicatorCode").getOrElse("")
          val name = Json.str(elem, "IndicatorName").getOrElse("")
          val keep = searchLower.isEmpty ||
            name.toLowerCase.contains(searchLower) || code.toLowerCase.contains(searchLower)
          if (!keep) None
          else Some(Seq(code, name, Json.strNonEmpty(elem, "Language").orNull))
        }
  }
}

final class WhoSource extends ApiSourceBase {

  override def shortName(): String = "sudan.who"

  override def tableSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("indicator_code", StringType),
      StructField("indicator_name", StringType),
      StructField("country", StringType),
      StructField("year", IntegerType),
      StructField("sex", StringType),
      StructField("value", DoubleType),
      StructField("region", StringType)))

  override def decoder: RowDecoder = WhoDecoders.Data("")

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val indicator = requireOption(options, "indicator",
      "SUDAN: The indicator parameter cannot be empty for SUDAN_WHO().")
    new ApiTable(shortName(), tableSchema(options), buildTasks(options),
      WhoDecoders.Data(indicator), fetcherSpec(options))
  }

  override def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask] = {
    val indicator = requireOption(options, "indicator",
      "SUDAN: The indicator parameter cannot be empty for SUDAN_WHO().")
    val countries = countriesOf(options)
    yearRange => countries.map { c =>
      val year =
        yearRange.start.map(y => s" and TimeDim ge $y").getOrElse("") +
          yearRange.end.map(y => s" and TimeDim le $y").getOrElse("")
      // OData filter values contain spaces, which are illegal in a URI —
      // URI.create would throw inside the fetcher and the error contract
      // would silently turn every live query into 0 rows. Percent-encode
      // the query portion ('%20'; apostrophes are legal query sub-delims).
      val filter = s"SpatialDim eq '$c'$year".replace(" ", "%20")
      val url = s"https://ghoapi.azureedge.net/api/$indicator" +
        s"?$$filter=$filter"
      FetchTask(urls = Seq(url), meta = Map("country" -> c))
    }
  }
}

final class WhoIndicatorsSource extends ApiSourceBase {

  override def shortName(): String = "sudan.who_indicators"

  override def tableSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("indicator_code", StringType),
      StructField("indicator_name", StringType),
      StructField("language", StringType)))

  override def decoder: RowDecoder = WhoDecoders.Catalog("")

  /** One task fetches the FULL GHO indicator catalog (~4k rows
    * published) — the honest stats bound for this protocol. */
  override def rowsPerTaskHint: Long = 8192L

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val search = Option(options.get("search")).getOrElse("").toLowerCase
    new ApiTable(shortName(), tableSchema(options), buildTasks(options),
      WhoDecoders.Catalog(search), fetcherSpec(options), rowsPerTaskHint)
  }

  override def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask] =
    _ => Seq(FetchTask(urls = Seq("https://ghoapi.azureedge.net/api/Indicator")))
}
