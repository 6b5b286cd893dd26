package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's two fixture denormalization views, re-expressed as
  * idiomatic Spark transforms producing the mandatory `(id, doc)` shape.
  * These are the golden-test workload AND the worked example of how a
  * user writes a view for this engine: correlated scalar subqueries
  * become left joins + structs (B4), `json_agg` becomes
  * `collect_list(struct(...))` bounded per parent key (B5/B7), and
  * `json_build_object` becomes `to_json(struct(...))` (B6).
  *
  * `ignoreNullFields=false` matches Postgres `json_build_object`, which
  * emits `"field": null` for empty subqueries rather than omitting the
  * key.
  */
object SchoolViews {

  private val jsonOpts = Map("ignoreNullFields" -> "false")

  /** person_mv (reference: tests/fixtures/person_mv.sql:1-4):
    * `select id, json_build_object('name', "name") from "person"`. */
  def personMv(person: DataFrame): DataFrame =
    person.select(col("id"),
      to_json(struct(col("name").as("name")), jsonOpts).as("doc"))

  /** course_mv (reference: tests/fixtures/course_mv.sql:1-26): course →
    * teacher → person scalar chain plus an enrollment → student → person
    * array, 4 levels deep. Enrollment array order is made deterministic
    * by enrollment id (Postgres `json_agg` scan order is insertion order
    * in the fixture).
    *
    * Scale shape: every join is an equi-join on a key column (Catalyst
    * picks broadcast vs shuffle), and `collect_list` groups by course id
    * — bounded by enrollments-per-course, never by table size. */
  def courseMv(
      course: DataFrame,
      teacher: DataFrame,
      student: DataFrame,
      person: DataFrame,
      enrollment: DataFrame): DataFrame = {

    val personName = person.select(col("id").as("p_id"), col("name"))

    val teacherDoc = teacher
      .join(personName, col("person_id") === col("p_id"), "left")
      .select(col("id").as("t_id"),
        struct(
          col("salary").cast("double").as("salary"),
          when(col("p_id").isNotNull, struct(col("name").as("name")))
            .as("person")).as("teacher"))

    val studentDoc = student
      .join(personName, col("person_id") === col("p_id"), "left")
      .select(col("id").as("s_id"),
        struct(
          col("gpa").cast("double").as("gpa"),
          when(col("p_id").isNotNull, struct(col("name").as("name")))
            .as("person")).as("student"))

    val enrollments = enrollment
      .join(studentDoc, col("student_id") === col("s_id"), "left")
      .select(col("course_id").as("e_cid"), col("id").as("e_id"),
        struct(col("grade").cast("double").as("grade"), col("student"))
          .as("e"))
      .groupBy(col("e_cid"))
      .agg(collect_list(struct(col("e_id"), col("e"))).as("es"))
      .select(col("e_cid"),
        expr("transform(sort_array(es), x -> x.e)").as("enrollments"))

    course
      .join(teacherDoc, col("teacher_id") === col("t_id"), "left")
      .join(enrollments, course("id") === col("e_cid"), "left")
      .select(course("id"),
        to_json(struct(
          col("name").as("name"),
          col("description").as("description"),
          col("teacher"),
          col("enrollments")), jsonOpts).as("doc"))
  }

  /** Scoped-compute for course_mv (the 100 TB refresh path —
    * Pipeline.refreshScoped): maps a change batch to the course ids it
    * can affect by walking the view's join graph against CURRENT source
    * state, then recomputes the view for just those courses (the course
    * scan is semi-join-pruned; every downstream join prunes with it).
    *
    * Change ids become literal IN-lists — change batches are bounded
    * (one micro-batch); a huge backfill-style batch should use the full
    * refresh instead.
    *
    * DELETE/UPDATE scoping: a deleted (or re-pointed) row no longer
    * joins to its OLD parent, so affected ids are derived from the
    * EVENTS rather than only the current rows — a course event's id IS
    * a view key; teacher/student event ids feed the FK probes directly
    * (the referencing rows survive); and an enrollment DELETE or UPDATE
    * carries its before-image (real CDC emits old tuples) whose
    * course_id covers the OLD parent — an UPDATE that moves an
    * enrollment to a new course must refresh both courses. Only an
    * enrollment DELETE/UPDATE without a before-image is unscopable —
    * [[courseMvCanScope]] routes that batch to the full refresh.
    */
  def courseMvScoped(
      course: DataFrame,
      teacher: DataFrame,
      student: DataFrame,
      person: DataFrame,
      enrollment: DataFrame)(
      changes: Seq[graft.cdc.ChangeEvent]): (DataFrame, DataFrame) = {
    val spark = course.sparkSession
    import spark.implicits._
    def ids(table: String): Seq[String] =
      changes.filter(_.table == table).map(_.id).distinct
    def inList(c: Column, vs: Seq[String]): Column =
      if (vs.isEmpty) lit(false) else c.isin(vs: _*)
    def idsDf(vs: Seq[String], name: String): DataFrame = vs.toDF(name)

    val personIds = ids("person")
    // event ids union'd in directly: a DELETEd teacher/student row no
    // longer joins, but courses/enrollments referencing it survive
    val viaTeacher = teacher
      .filter(inList(col("person_id"), personIds))
      .select(col("id").as("t_id"))
      .unionByName(idsDf(ids("teacher"), "t_id"))
    val viaStudent = student
      .filter(inList(col("person_id"), personIds))
      .select(col("id").as("s_id"))
      .unionByName(idsDf(ids("student"), "s_id"))
    // enrollment deletes AND updates scope via the before-image's
    // course_id: a delete's parent is gone from the current row set, and
    // an update may have MOVED the row to a different course — the old
    // course's doc must shrink
    val deletedEnrollmentCourses = changes
      .filter(e => e.table == "enrollment" && (e.op == "DELETE" || e.op == "UPDATE"))
      .flatMap(_.doc)
      .flatMap(beforeImageField(_, "course_id"))
    val viaEnrollment = enrollment
      .filter(inList(col("id"), ids("enrollment")))
      .select(col("course_id").as("id"))
      .unionByName(idsDf(deletedEnrollmentCourses, "id"))
    val affected = course
      .join(viaTeacher, col("teacher_id") === col("t_id"), "left_semi")
      .select(col("id"))
      .unionByName(enrollment
        .join(viaStudent, col("student_id") === col("s_id"), "left_semi")
        .select(col("course_id").as("id")))
      .unionByName(viaEnrollment)
      // course event ids verbatim: a DELETEd course is exactly the view
      // key that must vanish, and the diff needs it in the affected set
      .unionByName(idsDf(ids("course"), "id"))
      .distinct()
    val scopedCourse = course.join(affected, Seq("id"), "left_semi")
    (affected, courseMv(scopedCourse, teacher, student, person, enrollment))
  }

  /** Which batches [[courseMvScoped]] can scope: everything except
    * table-level wildcards and enrollment DELETEs/UPDATEs lacking a
    * before-image (an UPDATE without one might have moved the row off
    * its old course, which would then never refresh). */
  def courseMvCanScope(changes: Seq[graft.cdc.ChangeEvent]): Boolean =
    changes.forall(e => e.id != "*" &&
      (e.table != "enrollment" || e.op == "INSERT" || e.doc.nonEmpty))

  private val beforeImageMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Extract one field from a JSON before-image (driver-side; change
    * batches are bounded). */
  private def beforeImageField(doc: String, field: String): Option[String] =
    try {
      Option(beforeImageMapper.readTree(doc).get(field)).map(_.asText())
    } catch { case scala.util.control.NonFatal(_) => None }
}
