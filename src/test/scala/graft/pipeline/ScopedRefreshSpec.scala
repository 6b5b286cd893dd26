package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.when
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeEvent
import graft.refresh.{BucketedSnapshotStore, MvccSnapshotStore}
import graft.sink.InMemoryIndex
import graft.views.SchoolViews

/** Key-scoped incremental refresh: same converged state as the full
  * recompute, but only the affected view keys are recomputed. */
class ScopedRefreshSpec extends SparkSpec {
  import spark.implicits._

  private var person = Seq(
    ("p-1", "John"), ("p-2", "Loren"), ("p-3", "Prof Georgios"), ("p-4", "Prof Matt")
  ).toDF("id", "name")
  private val student = Seq(
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

  private val coursesMapping = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("teacher", StructType(Seq(
      StructField("salary", DoubleType),
      StructField("person", StructType(Seq(StructField("name", StringType))))))),
    StructField("enrollments", ArrayType(StructType(Seq(
      StructField("grade", DoubleType),
      StructField("student", StructType(Seq(
        StructField("gpa", DoubleType),
        StructField("person", StructType(Seq(StructField("name", StringType)))))))))))))

  private val sink = new InMemoryIndex("courses_scoped", coursesMapping)
  private val pipe = new Pipeline(
    "course_mv", "course",
    Set("course", "teacher", "student", "person", "enrollment"),
    () => SchoolViews.courseMv(course, teacher, student, person, enrollment),
    new MvccSnapshotStore(spark, Files.createTempDirectory("graft-scoped").toString),
    sink,
    scopedCompute = Some(changes =>
      SchoolViews.courseMvScoped(course, teacher, student, person, enrollment)(changes)))

  private def ev(table: String, id: String, op: String = "UPDATE") =
    ChangeEvent("public", table, op, id, None, "0/1", 1L)

  test("scoped person rename converges identically to full refresh") {
    pipe.backfill() shouldBe 3
    person = person.withColumn("name",
      when($"id" === "p-1", "Jane").otherwise($"name"))
    // John is enrolled in all 3 courses -> 3 scoped upserts
    pipe.refreshScoped(Seq(ev("person", "p-1"))) shouldBe 3
    sink.get("c-1").get should include("Jane")
    sink.get("c-3").get should include("Jane")
    // the full recompute now finds nothing left to do
    pipe.refresh() shouldBe 0
  }

  test("scoped enrollment grade change touches only its course") {
    enrollment = enrollment.withColumn("grade",
      when($"id" === "e-2", 2.71).otherwise($"grade"))
    pipe.refreshScoped(Seq(ev("enrollment", "e-2"))) shouldBe 1
    sink.get("c-1").get should include("2.71")
    pipe.refresh() shouldBe 0
  }

  test("scoped refresh with an unrelated key is a no-op") {
    pipe.refreshScoped(Seq(ev("person", "p-99"))) shouldBe 0
  }
}
