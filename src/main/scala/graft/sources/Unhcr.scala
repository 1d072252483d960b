package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.Json

/** UNHCR population source (reference: unhcr_functions.cpp:25-330).
  * Two requests per country — as country-of-origin (`coo=`) and
  * country-of-asylum (`coa=`) — against the unified /population/ endpoint
  * with `limit=10000&cf_type=iso`. Rows whose requested population field is
  * 0 are dropped (:177-181). value is BIGINT. Year pushdown appends
  * `yearFrom`/`yearTo` (filter_pushdown.cpp:62-78). */
object UnhcrDecoders {

  /** User-facing type → JSON field (unhcr_functions.cpp:108-126). */
  def fieldName(populationType: String): String =
    populationType.toLowerCase match {
      case "refugees" | "ref" => "refugees"
      case "idps" | "idp" => "idps"
      case "asylum_seekers" | "asylum" => "asylum_seekers"
      case "returned_refugees" | "returned" => "returned_refugees"
      case "stateless" => "stateless"
      case other => other
    }

  /** Rows: (year, population_type, country_origin, country_origin_name,
    * country_asylum, country_asylum_name, value). ISO codes preferred
    * (coo_iso/coa_iso) with coo/coa fallback (:193-202). */
  final case class Data(field: String) extends RowDecoder {
    override def decode(body: String, task: FetchTask): Iterator[Seq[Any]] =
      Json.parse(body).flatMap(r => Json.field(r, "items"))
        .map(Json.elements).getOrElse(Iterator.empty).flatMap { elem =>
          val value = Json.longFlexible(elem, field).getOrElse(0L)
          if (value == 0L) None // zero-value drop (unhcr_functions.cpp:179-181)
          else Some(Seq(
            Json.intFlexible(elem, "year").getOrElse(0),
            field,
            Json.str(elem, "coo_iso").orElse(Json.str(elem, "coo")).getOrElse(""),
            Json.str(elem, "coo_name").getOrElse(""),
            Json.str(elem, "coa_iso").orElse(Json.str(elem, "coa")).getOrElse(""),
            Json.str(elem, "coa_name").getOrElse(""),
            value))
        }
  }
}

final class UnhcrSource extends ApiSourceBase {

  private val requiredMsg =
    "SUDAN: The population_type parameter cannot be empty for SUDAN_UNHCR(). " +
      "Valid types: 'refugees', 'idps', 'asylum_seekers', 'returned_refugees', 'stateless'."

  override def shortName(): String = "sudan.unhcr"

  override def tableSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("year", IntegerType),
      StructField("population_type", StringType),
      StructField("country_origin", StringType),
      StructField("country_origin_name", StringType),
      StructField("country_asylum", StringType),
      StructField("country_asylum_name", StringType),
      StructField("value", LongType)))

  override def decoder: RowDecoder = UnhcrDecoders.Data("refugees")

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val ptype = requireOption(options, "population_type", requiredMsg)
    new ApiTable(shortName(), tableSchema(options), buildTasks(options),
      UnhcrDecoders.Data(UnhcrDecoders.fieldName(ptype)), fetcherSpec(options))
  }

  override def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask] = {
    requireOption(options, "population_type", requiredMsg)
    val countries = countriesOf(options)
    yearRange => {
      val year =
        yearRange.start.map(y => s"&yearFrom=$y").getOrElse("") +
          yearRange.end.map(y => s"&yearTo=$y").getOrElse("")
      // 2 logical sub-queries per country = 2 InputPartitions (coo + coa)
      countries.flatMap { c =>
        Seq("coo", "coa").map { param =>
          FetchTask(
            urls = Seq("https://api.unhcr.org/population/v1/population/" +
              s"?limit=10000&cf_type=iso&$param=$c$year"),
            meta = Map("country" -> c, "side" -> param))
        }
      }
    }
  }
}
