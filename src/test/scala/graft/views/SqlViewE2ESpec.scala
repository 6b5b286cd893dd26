package graft.views

import java.nio.file.Files

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.cdc.ChangeEvent
import graft.pipeline.{InMemoryChangeFeed, PipelineConfig, Runner}
import graft.sink.InMemoryIndex

/** The reference's ACTUAL user workflow, end to end: a definitions
  * directory with `views_to_indices.json`, Postgres-dialect `<view>.sql`
  * files, and `<index>.json` ES index definitions — compiled and run by
  * this engine unchanged (view SQL verbatim from
  * tests/fixtures/person_mv.sql and course_mv.sql; index definitions
  * from people.json and courses.json). */
class SqlViewE2ESpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  /** JSON equality with order-insensitive arrays: Postgres `json_agg`
    * order is scan order; the engine's is partition order. The NATIVE
    * view e2e (PipelineE2ESpec) pins exact golden order via sort keys;
    * here the SQL is the reference's, which specifies none. */
  private def canon(n: JsonNode): JsonNode = n match {
    case a: ArrayNode =>
      val items = (0 until a.size()).map(i => canon(a.get(i)))
        .sortBy(_.toString)
      val out = mapper.createArrayNode()
      items.foreach(out.add)
      out
    case o if o.isObject =>
      val out = mapper.createObjectNode()
      val names = scala.collection.mutable.ArrayBuffer[String]()
      val it = o.fieldNames(); while (it.hasNext) names += it.next()
      names.sorted.foreach(f => out.set[JsonNode](f, canon(o.get(f))))
      out
    case other => other
  }
  private def assertJson(actual: Option[String], expected: String): Unit = {
    actual.isDefined shouldBe true
    canon(mapper.readTree(actual.get)) shouldBe canon(mapper.readTree(expected))
  }

  // ---- fixture state (schema.sql data) ----
  private var person = Seq(
    ("p-1", "John"), ("p-2", "Loren"), ("p-3", "Prof Georgios"), ("p-4", "Prof Matt")
  ).toDF("id", "name")
  private var student = Seq(
    ("s-1", "p-1", true, 3.01), ("s-2", "p-2", true, 3.99)
  ).toDF("id", "person_id", "is_active", "gpa")
  private val teacher = Seq(
    ("t-1", "p-3", 100000.0), ("t-2", "p-4", 100000.0)
  ).toDF("id", "person_id", "salary")
  private val course = Seq(
    ("c-1", "Reth", "How to build a modern Ethereum node", "t-1"),
    ("c-2", "ZK Proofs", "Sometimes zero knowledge is more than enough", "t-1"),
    ("c-3", "Bizchain", "How to build a business on-chain", "t-2")
  ).toDF("id", "name", "description", "teacher_id")
  private var enrollment = Seq(
    ("e-1", "s-1", "c-1", 3.50), ("e-2", "s-2", "c-1", 3.14),
    ("e-3", "s-1", "c-2", 3.50), ("e-4", "s-2", "c-2", 3.14),
    ("e-5", "s-1", "c-3", 3.50)
  ).toDF("id", "student_id", "course_id", "grade")

  private val sources: Map[String, () => DataFrame] = Map(
    "person" -> (() => person), "student" -> (() => student),
    "teacher" -> (() => teacher), "course" -> (() => course),
    "enrollment" -> (() => enrollment))

  // ---- definitions directory, reference layout ----
  private val defsDir = {
    val d = Files.createTempDirectory("graft-defs")
    Files.writeString(d.resolve("views_to_indices.json"),
      """{"person_mv": "people", "course_mv": "courses"}""")
    // person_mv verbatim from the reference fixture
    Files.writeString(d.resolve("person_mv.sql"),
      """select id,
        |       json_build_object(
        |               'name', "name") as "person"
        |from "person"
        |""".stripMargin)
    // course_mv VERBATIM from the reference fixture
    // (tests/fixtures/course_mv.sql) — 3-deep nested correlated
    // subqueries, incl. lookups inside json_agg. Spark handles the
    // projection nesting natively; CorrelationFlattener rewrites the
    // in-aggregate lookups to left joins pre-analysis.
    Files.writeString(d.resolve("course_mv.sql"),
      """select id,
        |       json_build_object('name', "name", 'description', "description", 'teacher',
        |                         (select json_build_object('salary', "salary", 'person',
        |                                                   (select json_build_object('name', "name")
        |                                                    from person
        |                                                    where person.id = person_id))
        |                          from teacher
        |                          where teacher.id = teacher_id), 'enrollments',
        |                         (select json_agg(json_build_object('grade', "grade",
        |                                                            'student', (select json_build_object(
        |                                                                                   'gpa', "gpa",
        |                                                                                   'person',
        |                                                                                   (select json_build_object(
        |                                                                                               'name',
        |                                                                                               "name"
        |                                                                                               )
        |                                                                                    from person
        |                                                                                    where person.id = person_id)
        |                                                                                   )
        |                                                                        from student
        |                                                                        where student.id = student_id)
        |                             ))
        |                          from enrollment
        |                          where enrollment.course_id = course.id)
        |           ) as "course"
        |from "course";
        |""".stripMargin)
    Files.writeString(d.resolve("people.json"),
      """{"mappings": {"dynamic": "strict", "properties": {"name": {"type": "keyword"}}}, "settings": {"index": {"number_of_shards": "1"}}}""")
    Files.writeString(d.resolve("courses.json"),
      """{"mappings": {"dynamic": "strict", "properties": {"name": {"type": "text"}, "description": {"type": "text"}, "teacher": {"properties": {"salary": {"type": "float"}, "person": {"properties": {"name": {"type": "text"}}}}}, "enrollments": {"properties": {"grade": {"type": "float"}, "student": {"properties": {"gpa": {"type": "float"}, "person": {"properties": {"name": {"type": "text"}}}}}}}}}, "settings": {"index": {"number_of_shards": "1"}}}""")
    d.toString
  }

  private val sinks = scala.collection.mutable.Map[String, InMemoryIndex]()
  private val pipelines = PipelineConfig.fromDefinitions(
    spark, defsDir, Files.createTempDirectory("graft-sqlwork").toString,
    sources,
    (index, mapping) => {
      val s = new InMemoryIndex(index, mapping); sinks(index) = s; s
    })
  private val feed = new InMemoryChangeFeed
  private val runner = new Runner(pipelines, feed)

  private def ev(table: String, id: String, op: String = "UPDATE") =
    ChangeEvent("public", table, op, id, None, "0/1", 1L)

  test("definitions dir loads: parents, sources and mappings derived from SQL/JSON") {
    pipelines.map(p => p.view -> p.parentTable).toMap shouldBe
      Map("person_mv" -> "person", "course_mv" -> "course")
    pipelines.find(_.view == "course_mv").get.sourceTables shouldBe
      Set("course", "teacher", "student", "person", "enrollment")
    sinks("courses").mapping.fieldNames.toSet shouldBe
      Set("name", "description", "teacher", "enrollments")
  }

  test("backfill from reference SQL matches the golden documents") {
    runner.backfillAll() shouldBe Map("person_mv" -> 4, "course_mv" -> 3)
    assertJson(sinks("people").get("p-1"), """{"name": "John"}""")
    assertJson(sinks("courses").get("c-1"),
      """{
        "name": "Reth",
        "description": "How to build a modern Ethereum node",
        "teacher": {"salary": 100000.0, "person": {"name": "Prof Georgios"}},
        "enrollments": [
          {"grade": 3.5, "student": {"gpa": 3.01, "person": {"name": "John"}}},
          {"grade": 3.14, "student": {"gpa": 3.99, "person": {"name": "Loren"}}}
        ]
      }""")
  }

  test("rename propagates 4 hops through the reference SQL (test_e2e.py:99-139)") {
    person = person.withColumn("name",
      org.apache.spark.sql.functions.when($"id" === "p-1", "Jane")
        .otherwise($"name"))
    feed.append(ev("person", "p-1"))
    val applied = runner.iterate()
    applied("person_mv") shouldBe 1
    applied("course_mv") shouldBe 3 // John enrolled in all three courses
    assertJson(sinks("people").get("p-1"), """{"name": "Jane"}""")
    assertJson(sinks("courses").get("c-1"),
      """{
        "name": "Reth",
        "description": "How to build a modern Ethereum node",
        "teacher": {"salary": 100000.0, "person": {"name": "Prof Georgios"}},
        "enrollments": [
          {"grade": 3.5, "student": {"gpa": 3.01, "person": {"name": "Jane"}}},
          {"grade": 3.14, "student": {"gpa": 3.99, "person": {"name": "Loren"}}}
        ]
      }""")
  }

  test("delete shrinks docs and drops the person (test_e2e.py:141-171)") {
    person = person.filter($"id" =!= "p-1")
    student = student.filter($"id" =!= "s-1")
    enrollment = enrollment.filter($"student_id" =!= "s-1")
    feed.append(ev("person", "p-1", "DELETE"))
    runner.iterate()
    sinks("people").get("p-1") shouldBe None
    assertJson(sinks("courses").get("c-3"),
      """{
        "name": "Bizchain",
        "description": "How to build a business on-chain",
        "teacher": {"salary": 100000.0, "person": {"name": "Prof Matt"}},
        "enrollments": null
      }""")
  }
}
