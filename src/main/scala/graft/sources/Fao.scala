package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.Json

/** FAOSTAT source (reference: fao_functions.cpp:25-310). One request per
  * country (`area={faoCode}`, hard `limit=500` API cap, no offset paging);
  * client-side case-insensitive contains-filter on Element; value coercion
  * real/int/string (:180-193); unit '' → NULL. Year pushdown appends
  * `year_start`/`year_end` (filter_pushdown.cpp:43-59). */
object FaoDecoders {

  /** ISO3 → FAO numeric area code (fao_functions.cpp:111-119). */
  val areaCodes: Map[String, String] = Map(
    "SDN" -> "276", "EGY" -> "59", "ETH" -> "238", "TCD" -> "39",
    "SSD" -> "277", "ERI" -> "178", "LBY" -> "124", "CAF" -> "37")

  def areaCode(iso3: String): String = areaCodes.getOrElse(iso3, iso3)

  /** Rows: (dataset, area, item, element, year, value, unit). */
  final case class Data(dataset: String, elementLower: String) extends RowDecoder {
    override def decode(body: String, task: FetchTask): Iterator[Seq[Any]] =
      Json.parse(body).flatMap(r => Json.field(r, "data"))
        .map(Json.elements).getOrElse(Iterator.empty).flatMap { elem =>
          val elementName = Json.str(elem, "Element").getOrElse("")
          // partial, case-insensitive element match (fao_functions.cpp:140-149)
          if (elementName.nonEmpty && elementLower.nonEmpty &&
            !elementName.toLowerCase.contains(elementLower)) None
          else Some(Seq(
            dataset,
            Json.str(elem, "Area").getOrElse(""),
            Json.str(elem, "Item").getOrElse(""),
            elementName,
            Json.intFlexible(elem, "Year").getOrElse(0),
            Json.doubleFlexible(elem, "Value").orNull,
            Json.strNonEmpty(elem, "Unit").orNull))
        }
  }
}

final class FaoSource extends ApiSourceBase {

  override def shortName(): String = "sudan.fao"

  override def tableSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("dataset", StringType),
      StructField("area", StringType),
      StructField("item", StringType),
      StructField("element", StringType),
      StructField("year", IntegerType),
      StructField("value", DoubleType),
      StructField("unit", StringType)))

  override def decoder: RowDecoder = FaoDecoders.Data("", "")

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val dataset = requireOption(options, "dataset",
      "SUDAN: The dataset parameter cannot be empty for SUDAN_FAO().")
    val element = requireOption(options, "element",
      "SUDAN: The element parameter cannot be empty for SUDAN_FAO().")
    new ApiTable(shortName(), tableSchema(options), buildTasks(options),
      FaoDecoders.Data(dataset, element.toLowerCase), fetcherSpec(options))
  }

  override def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask] = {
    val dataset = requireOption(options, "dataset",
      "SUDAN: The dataset parameter cannot be empty for SUDAN_FAO().")
    requireOption(options, "element",
      "SUDAN: The element parameter cannot be empty for SUDAN_FAO().")
    val countries = countriesOf(options)
    yearRange => countries.map { c =>
      val year =
        yearRange.start.map(y => s"&year_start=$y").getOrElse("") +
          yearRange.end.map(y => s"&year_end=$y").getOrElse("")
      val url = s"https://faostatservices.fao.org/api/v1/en/data/$dataset" +
        s"?area=${FaoDecoders.areaCode(c)}&output_type=objects&limit=500$year"
      FetchTask(urls = Seq(url), meta = Map("country" -> c))
    }
  }
}
