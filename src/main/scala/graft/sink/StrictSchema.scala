package graft.sink

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `dynamic: "strict"` document validation (A16) — the sink equivalent
  * of the reference's Elasticsearch index mappings with strict dynamics
  * that reject documents carrying unexpected fields (reference:
  * src/sinker/sinker.py:74-86, tests/fixtures/courses.json:3,
  * README.md:208-209).
  *
  * A doc violates the mapping when it has an object field not declared
  * in the StructType at that path, an object where a scalar is declared,
  * or unparseable JSON. Scalar leaf values are accepted as-is (ES
  * coerces leaf types; structure is what `strict` polices).
  *
  * Validation runs distributed at the sink edge (the same place the
  * reference does row-wise Python work) via the codegen'd
  * [[graft.functions.StrictViolations]] expression, so no doc ever
  * funnels through the driver and the sink projection stays inside
  * whole-stage codegen.
  */
object SchemaViolationException {
  def apply(index: String, samples: Seq[(String, Seq[String])]): IllegalArgumentException =
    new IllegalArgumentException(
      s"strict mapping violation in index '$index': " +
        samples.map { case (id, vs) => s"id=$id -> ${vs.mkString(", ")}" }.mkString("; "))
}

object StrictSchema {

  @transient private lazy val mapper = new ObjectMapper()

  /** Unknown/mis-shaped field paths of `doc` vs the declared schema;
    * empty = valid. */
  def violations(doc: String, schema: StructType): Seq[String] =
    collect(try mapper.readTree(doc)
            catch { case _: Exception => return Seq("<malformed json>") },
      schema)

  /** [[violations]] straight from utf-8 bytes — the zero-String-copy
    * entry the [[graft.functions.StrictViolations]] codegen kernel
    * calls. */
  def violationsBytes(doc: Array[Byte], schema: StructType): Seq[String] =
    collect(try mapper.readTree(doc)
            catch { case _: Exception => return Seq("<malformed json>") },
      schema)

  private def collect(node: JsonNode, schema: StructType): Seq[String] = {
    val buf = mutable.ArrayBuffer[String]()
    walk(node, schema, "", buf)
    buf.toSeq
  }

  private def walk(node: JsonNode, dt: DataType, path: String,
      buf: mutable.ArrayBuffer[String]): Unit = {
    if (node == null || node.isNull) return
    dt match {
      case st: StructType =>
        // ES mappings don't distinguish object from array-of-object —
        // any field may hold an array of its declared type. Mirror that:
        // validate array elements against the struct.
        if (node.isArray) {
          val it = node.elements()
          while (it.hasNext) walk(it.next(), st, path + "[]", buf)
          return
        }
        if (!node.isObject) { buf += s"$path: expected object"; return }
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          val p = if (path.isEmpty) e.getKey else s"$path.${e.getKey}"
          st.find(_.name == e.getKey) match {
            case Some(f) => walk(e.getValue, f.dataType, p, buf)
            case None => buf += s"$p: unknown field"
          }
        }
      case at: ArrayType =>
        if (!node.isArray) { buf += s"$path: expected array"; return }
        val it = node.elements()
        while (it.hasNext) walk(it.next(), at.elementType, path + "[]", buf)
      case _: MapType => () // open key space by declaration
      case _ =>
        if (node.isObject) { buf += s"$path: expected scalar"; return }
        // ES leniency again: array of scalars fits a scalar mapping
        if (node.isArray) {
          val it = node.elements()
          while (it.hasNext) {
            val e = it.next()
            if (e.isObject || e.isArray) buf += s"$path[]: expected scalar"
          }
        }
    }
  }

  /** Fail-fast batch validation: throws with up to 3 sample violations
    * if any `index` action's doc doesn't fit the mapping. Validation is
    * a native codegen'd expression ([[graft.functions.StrictViolations]]
    * — not a Scala UDF, so the sink projection stays one whole-stage
    * codegen span); a null doc is malformed, matching the reference's
    * treatment of an index action without a body. */
  def validate(actions: DataFrame, schema: StructType, index: String): Unit = {
    graft.functions.GraftExtensions.ensureRegistered(actions.sparkSession)
    val viol = when(col("doc").isNull, array(lit("<malformed json>")))
      .otherwise(call_function("strict_violations",
        col("doc"), lit(schema.toDDL)))
    val violRows = actions
      .filter(col("op") === "index")
      .select(col("id"), viol.as("viol"))
      .filter(size(col("viol")) > 0)
    // The common (clean) batch is the hot path: one partial-aggregated
    // count job — a bare take(3) would escalate through 1/4/20/all
    // partition scans before concluding "no violations" (several jobs,
    // ~1.5 scans of the batch). Samples for the error message are only
    // fetched once a violation is known to exist.
    if (violRows.count() > 0) {
      val bad = violRows.take(3)
      throw SchemaViolationException(index,
        bad.toSeq.map(r => (r.getString(0), r.getSeq[String](1))))
    }
  }
}
