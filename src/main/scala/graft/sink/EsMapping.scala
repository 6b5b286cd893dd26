package graft.sink

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** Parses the reference's Elasticsearch index-definition JSON
  * (`<index>.json` with `mappings.properties`, e.g.
  * tests/fixtures/people.json, courses.json) into the declared
  * StructType the strict sink validates against (A16).
  *
  * ES mappings don't distinguish object from array-of-object (any field
  * may hold an array); [[StrictSchema]] mirrors that leniency by
  * validating JSON arrays element-wise against the declared type.
  */
object EsMapping {

  private val mapper = new ObjectMapper()

  def toStructType(indexDefinitionJson: String): StructType = {
    val root = mapper.readTree(indexDefinitionJson)
    val props = root.path("mappings").path("properties")
    require(!props.isMissingNode, "no mappings.properties in index definition")
    structOf(props)
  }

  private def structOf(props: JsonNode): StructType = {
    val fields = scala.collection.mutable.ArrayBuffer[StructField]()
    val it = props.fields()
    while (it.hasNext) {
      val e = it.next()
      fields += StructField(e.getKey, typeOf(e.getValue))
    }
    StructType(fields.toSeq)
  }

  private def typeOf(node: JsonNode): DataType =
    if (node.has("properties")) structOf(node.get("properties"))
    else node.path("type").asText() match {
      case "text" | "keyword" | "ip" | "date" => StringType
      case "float" | "half_float" | "double" | "scaled_float" => DoubleType
      case "long" | "integer" | "short" | "byte" => LongType
      case "boolean" => BooleanType
      case other => throw new IllegalArgumentException(
        s"unsupported ES field type: $other")
    }
}
