package graft.io

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** S5 (`script/main.py:232-233`, `script/helper.py:7-9`): the driver-side
  * job configuration that parameterises the whole pipeline — column lists,
  * drop lists, and the (country × distribution) iteration matrix from the
  * reference's `script/config.json`.
  *
  * Parsed with Jackson (already on the Spark classpath) into immutable case
  * classes; everything downstream takes the typed model, never raw JSON.
  */
final case class CountryRow(
    geoid: Int,
    countryName: String,
    distributionType: String,
    dataSource: String)

final case class JobConfig(
    dataSource: String,
    dataKind: String,
    colsToDropBaseData: Seq[String],
    colsToDropJson: Seq[String],
    colsToKeep: Seq[String],
    attributesAll: Seq[String],
    geoDropColumns: Seq[String],
    countryValues: Seq[CountryRow],
    /** JSON-branch prefix families stripped unless whitelisted by
      * `colsToKeep` (`script/helper.py:157-163`). The reference hard-codes
      * the two families in its helper; here they ride in the config so a
      * deployment with different naming needs no code change. Absent field
      * = the reference's families.
      */
    jsonDropPrefixes: Seq[String] = JobConfig.defaultJsonDropPrefixes)

object JobConfig {
  val defaultJsonDropPrefixes: Seq[String] = Seq("classified_", "userDefined_")

  private val mapper = new ObjectMapper()

  private def strings(node: JsonNode, field: String): Seq[String] =
    Option(node.get(field)).map(_.elements.asScala.map(_.asText).toSeq)
      .getOrElse(Seq.empty)

  def parse(json: String): JobConfig = {
    val root = mapper.readTree(json)
    JobConfig(
      dataSource = Option(root.get("dataSource")).map(_.asText).getOrElse(""),
      dataKind = Option(root.get("dataKind")).map(_.asText).getOrElse(""),
      colsToDropBaseData = strings(root, "colsToDropBaseData"),
      colsToDropJson = strings(root, "colsToDropJson"),
      colsToKeep = strings(root, "colsToKeep"),
      attributesAll = strings(root, "attributesAll"),
      geoDropColumns = strings(root, "geoDropColumns"),
      countryValues = Option(root.get("countryValues")).map(_.elements.asScala.map { n =>
        CountryRow(
          geoid = n.get("geoid").asInt,
          countryName = n.get("country_name").asText,
          distributionType = n.get("distribution_type").asText,
          dataSource = n.get("data_source").asText)
      }.toSeq).getOrElse(Seq.empty),
      jsonDropPrefixes = Option(root.get("jsonDropPrefixes"))
        .map(_ => strings(root, "jsonDropPrefixes"))
        .getOrElse(defaultJsonDropPrefixes))
  }

  def load(path: String): JobConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
