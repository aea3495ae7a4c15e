package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Minimal Jackson tree-model helpers for the transaction-log JSON.
  *
  * The reference serializes every log type with serde_json
  * (reference: crates/timeseries-table-core/src/transaction_log/actions.rs:46-60);
  * we use Jackson (already on the Spark classpath) with an explicit tree
  * model so the wire format is fully under our control and deterministic.
  */
object Json {
  val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode  = mapper.createArrayNode()

  def parse(s: String): JsonNode = mapper.readTree(s)
  def write(n: JsonNode): String = mapper.writeValueAsString(n)

  def fields(n: JsonNode): Map[String, JsonNode] =
    n.properties().asScala.map(e => e.getKey -> e.getValue).toMap

  def elems(n: JsonNode): Seq[JsonNode] = n.elements().asScala.toSeq

  def getStr(n: JsonNode, k: String): String = {
    val v = n.get(k)
    require(v != null && v.isTextual, s"expected string field '$k' in $n")
    v.asText()
  }
  def getLong(n: JsonNode, k: String): Long = {
    val v = n.get(k)
    require(v != null && v.canConvertToLong, s"expected long field '$k' in $n")
    v.asLong()
  }
  def optStr(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(_.isTextual).map(_.asText())
  def optLong(n: JsonNode, k: String): Option[Long] =
    Option(n.get(k)).filter(_.canConvertToLong).map(_.asLong())
}
