package graft

import java.nio.file.Files

import graft.SparkSpec

/** The standalone CLI lifecycle over file-backed sources: backfill from
  * definitions, detect a replaced source table via mtime, refresh, and
  * propagate into the on-disk document index. */
class MainSpec extends SparkSpec {
  import spark.implicits._

  test("build + backfill + file-change refresh end to end") {
    val defs = Files.createTempDirectory("graft-main-defs")
    Files.writeString(defs.resolve("views_to_indices.json"),
      """{"person_mv": "people"}""")
    Files.writeString(defs.resolve("person_mv.sql"),
      """select id, json_build_object('name', "name") as "person" from "person"""")
    Files.writeString(defs.resolve("people.json"),
      """{"mappings": {"dynamic": "strict", "properties": {"name": {"type": "keyword"}}}, "settings": {}}""")

    val srcs = Files.createTempDirectory("graft-main-srcs")
    val work = Files.createTempDirectory("graft-main-work")
    Seq(("p-1", "John"), ("p-2", "Loren")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$srcs/person.parquet")

    val (runner, feed) = Main.build(spark, defs.toString, srcs.toString, work.toString)
    runner.backfillAll() shouldBe Map("person_mv" -> 2)
    feed.mark()
    val sink = runner.pipelines.head.sink
    sink.get("p-1") shouldBe Some("""{"name":"John"}""")

    // idle tick: no file changed
    runner.iterate() shouldBe Map.empty

    // replace the source table -> mtime advances -> refresh propagates
    Thread.sleep(1100) // local FS mtime granularity can be 1s
    Seq(("p-1", "Jane"), ("p-2", "Loren"), ("p-3", "New")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$srcs/person.parquet")
    runner.iterate() shouldBe Map("person_mv" -> 2) // p-1 changed, p-3 added
    sink.get("p-1") shouldBe Some("""{"name":"Jane"}""")
    sink.get("p-3") shouldBe Some("""{"name":"New"}""")
    sink.count() shouldBe 3
  }

  test("GRAFT_ES_URL routes the CLI sink to the ES bulk endpoint") {
    val stub = new graft.sink.EsStubServer
    try {
      val defs = Files.createTempDirectory("graft-maines-defs")
      Files.writeString(defs.resolve("views_to_indices.json"),
        """{"person_mv": "people"}""")
      Files.writeString(defs.resolve("person_mv.sql"),
        """select id, json_build_object('name', "name") as "person" from "person"""")
      Files.writeString(defs.resolve("people.json"),
        """{"mappings": {"dynamic": "strict", "properties": {"name": {"type": "keyword"}}}, "settings": {}}""")
      val srcs = Files.createTempDirectory("graft-maines-srcs")
      Seq(("p-1", "John")).toDF("id", "name")
        .write.mode("overwrite").parquet(s"$srcs/person.parquet")
      val settings = new graft.core.GraftSettings(Map(
        "GRAFT_ES_URL" -> stub.url, "ELASTICSEARCH_CHUNK_SIZE" -> "50",
        "ELASTICSEARCH_USER" -> "elastic",
        "ELASTICSEARCH_PASSWORD" -> "pw"))
      val (runner, _) = Main.build(spark, defs.toString, srcs.toString,
        Files.createTempDirectory("graft-maines-work").toString, settings)
      runner.backfillAll() shouldBe Map("person_mv" -> 1)
      stub.indexCreated.get should startWith("people:")
      stub.docs.get("p-1") shouldBe Some("""{"name":"John"}""")
      runner.pipelines.head.sink.get("p-1") shouldBe Some("""{"name":"John"}""")
      // credentials flow from settings through the CLI wiring to every
      // request (recreate DELETE/PUT, bulk POST, _doc GET)
      import scala.jdk.CollectionConverters._
      all(stub.authHeaders.asScala.toSeq) shouldBe
        ("Basic " + java.util.Base64.getEncoder
          .encodeToString("elastic:pw".getBytes("UTF-8")))
    } finally stub.stop()
  }

  test("PGHOST switches the CLI to JDBC-source + slot-feed wiring (no connection made)") {
    val defs = Files.createTempDirectory("graft-mainpg-defs")
    Files.writeString(defs.resolve("views_to_indices.json"),
      """{"person_mv": "people"}""")
    Files.writeString(defs.resolve("person_mv.sql"),
      """select id, json_build_object('name', "name") as "person" from "person"""")
    Files.writeString(defs.resolve("people.json"),
      """{"mappings": {"dynamic": "strict", "properties": {"name": {"type": "keyword"}}}, "settings": {}}""")
    val settings = new graft.core.GraftSettings(Map(
      "PGHOST" -> "db.example", "PGPORT" -> "5433", "PGDATABASE" -> "app",
      "PGUSER" -> "svc"))
    settings.pgJdbcUrl shouldBe Some("jdbc:postgresql://db.example:5433/app")
    // wiring is lazy: pipelines + slot feed are built without touching
    // the (nonexistent) database
    val (runner, _) = Main.buildPg(
      spark, defs.toString,
      Files.createTempDirectory("graft-mainpg-work").toString, settings)
    runner.pipelines.map(_.view) shouldBe Seq("person_mv")
    runner.pipelines.head.sourceTables shouldBe Set("person")
  }
}
