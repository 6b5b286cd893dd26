package graft.sink

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._

import graft.SparkSpec

/** In-process Elasticsearch-shaped HTTP stub: _bulk (NDJSON), _doc,
  * _count, index create/delete. Modes inject transient 503s and
  * item-level mapping rejections to exercise the sink's retry/raise
  * behavior. */
class EsStubServer {
  val docs = new TrieMap[String, String]()
  val bulkBodies = new java.util.concurrent.CopyOnWriteArrayList[String]()
  /** Authorization header of every request, "" when absent. */
  val authHeaders = new java.util.concurrent.CopyOnWriteArrayList[String]()
  val failNextBulks = new AtomicInteger(0) // 503 this many bulk calls
  @volatile var rejectIds: Set[String] = Set.empty // item-level error ids
  @volatile var indexCreated: Option[String] = None

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.start()
  val port: Int = server.getAddress.getPort
  def url = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { ex.getResponseBody.write(bytes) }
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    authHeaders.add(
      Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    (method, path) match {
      case ("POST", "/_bulk") =>
        if (failNextBulks.getAndUpdate(n => math.max(0, n - 1)) > 0) {
          respond(ex, 503, """{"error":"unavailable"}"""); return
        }
        bulkBodies.add(body)
        val lines = body.split('\n').filter(_.nonEmpty).iterator
        val items = scala.collection.mutable.ArrayBuffer[String]()
        var anyError = false
        while (lines.hasNext) {
          val action = lines.next()
          val mapper = EsHttp.mapperRef
          val node = mapper.readTree(action)
          if (node.has("index")) {
            val id = node.get("index").get("_id").asText()
            val doc = lines.next()
            if (rejectIds.contains(id)) {
              anyError = true
              items += s"""{"index":{"_id":${EsHttp.jstr(id)},"status":400,"error":{"type":"strict_dynamic_mapping_exception","reason":"mapping set to strict"}}}"""
            } else {
              docs.put(id, doc)
              items += s"""{"index":{"_id":${EsHttp.jstr(id)},"status":200}}"""
            }
          } else if (node.has("delete")) {
            val id = node.get("delete").get("_id").asText()
            docs.remove(id)
            items += s"""{"delete":{"_id":${EsHttp.jstr(id)},"status":200}}"""
          }
        }
        respond(ex, 200,
          s"""{"took":1,"errors":$anyError,"items":[${items.mkString(",")}]}""")
      case ("GET", p) if p.endsWith("/_count") =>
        respond(ex, 200, s"""{"count":${docs.size}}""")
      case ("GET", p) if p.contains("/_doc/") =>
        val id = java.net.URLDecoder.decode(p.split("/_doc/")(1), "UTF-8")
        docs.get(id) match {
          case Some(d) => respond(ex, 200, s"""{"_id":${EsHttp.jstr(id)},"found":true,"_source":$d}""")
          case None => respond(ex, 404, s"""{"found":false}""")
        }
      case ("DELETE", _) =>
        docs.clear(); respond(ex, 200, """{"acknowledged":true}""")
      case ("PUT", p) =>
        indexCreated = Some(p.stripPrefix("/") + ":" + body)
        respond(ex, 200, """{"acknowledged":true}""")
      case _ => respond(ex, 400, """{"error":"bad request"}""")
    }
  } catch { case e: Throwable => respond(ex, 500, e.toString) }
}

/** Bulk-API parity of [[EsHttpBulkSink]] against the stub: NDJSON
  * shapes, 100-action chunking, transient-retry budget, and
  * strict-mapping rejection surfaced without retries
  * (reference: src/sinker/es.py:15-25, settings.py:23-41). */
class EsHttpSinkSpec extends SparkSpec {
  import spark.implicits._

  private val nameMapping = StructType(Seq(StructField("name", StringType)))

  private def withStub(f: (EsStubServer, EsHttpBulkSink) => Unit): Unit = {
    val stub = new EsStubServer
    try f(stub, new EsHttpBulkSink(stub.url, "people", nameMapping,
      chunkSize = 100, maxRetries = 3, timeoutMs = 5000))
    finally stub.stop()
  }

  private def actions(n: Int) =
    (1 to n).map(i => ("index", s"p-$i", s"""{"name":"doc $i"}""")).toDF("op", "id", "doc")

  test("recreate deletes then PUTs the index definition body") {
    withStub { (stub, sink) =>
      sink.recreate("""{"mappings":{"dynamic":"strict"}}""")
      stub.indexCreated.get shouldBe """people:{"mappings":{"dynamic":"strict"}}"""
    }
  }

  test("bulk NDJSON shapes and chunk boundaries (chunk_size=100)") {
    withStub { (stub, sink) =>
      sink.applyActions(actions(250).coalesce(1))
      // 250 actions in one partition -> 3 chunks: 100/100/50
      stub.bulkBodies.size shouldBe 3
      val sizes = (0 until 3).map(i =>
        stub.bulkBodies.get(i).split('\n').count(_.startsWith("""{"index""")))
      sizes.sorted shouldBe Seq(50, 100, 100)
      stub.docs.size shouldBe 250
      sink.count() shouldBe 250
      sink.get("p-7").get shouldBe """{"name":"doc 7"}"""
      // deletes ship as action-line-only entries
      sink.applyActions(Seq(("delete", "p-7", null: String)).toDF("op", "id", "doc"))
      sink.get("p-7") shouldBe None
      sink.count() shouldBe 249
    }
  }

  test("transient 503s retry up to the budget, then surface") {
    withStub { (stub, sink) =>
      stub.failNextBulks.set(2) // 2 failures < 3 retries -> succeeds
      sink.applyActions(actions(5).coalesce(1))
      stub.docs.size shouldBe 5

      val stubborn = new EsStubServer
      try {
        stubborn.failNextBulks.set(1000)
        val sink2 = new EsHttpBulkSink(stubborn.url, "people", nameMapping,
          chunkSize = 100, maxRetries = 2, timeoutMs = 2000)
        val e = intercept[Exception](sink2.applyActions(actions(1).coalesce(1)))
        e.getMessage should include("503")
      } finally stubborn.stop()
    }
  }

  test("strict-mapping rejection raises and is NOT retried (raise_on_error)") {
    withStub { (stub, sink) =>
      stub.rejectIds = Set("p-2")
      val before = stub.bulkBodies.size
      val e = intercept[Exception](sink.applyActions(actions(3).coalesce(1)))
      e.getMessage should include("strict_dynamic_mapping_exception")
      // exactly one bulk attempt: deterministic rejection burns no retries
      stub.bulkBodies.size - before shouldBe 1
    }
  }

  test("basic auth header reaches every request; no-auth default sends none") {
    val stub = new EsStubServer
    try {
      val header = new graft.core.GraftSettings(Map(
        "ELASTICSEARCH_USER" -> "elastic",
        "ELASTICSEARCH_PASSWORD" -> "s3cret")).esAuthHeader
      val authed = new EsHttpBulkSink(stub.url, "people", nameMapping,
        chunkSize = 100, maxRetries = 2, timeoutMs = 5000, auth = header)
      authed.recreate("""{"mappings":{"dynamic":"strict"}}""")
      authed.applyActions(actions(3).coalesce(1))
      authed.count() shouldBe 3
      import scala.jdk.CollectionConverters._
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("elastic:s3cret".getBytes("UTF-8"))
      // DELETE + PUT (recreate), POST _bulk, GET _count — all authed
      stub.authHeaders.asScala.toSeq should not be empty
      all(stub.authHeaders.asScala.toSeq) shouldBe expected

      stub.authHeaders.clear()
      val anon = new EsHttpBulkSink(stub.url, "people", nameMapping,
        chunkSize = 100, maxRetries = 2, timeoutMs = 5000)
      anon.applyActions(actions(1).coalesce(1))
      all(stub.authHeaders.asScala.toSeq) shouldBe ""
    } finally stub.stop()
  }

  test("client-side strict schema still validates before any HTTP call") {
    withStub { (stub, sink) =>
      val bad = Seq(("index", "p-1", """{"name":"x","extra_field":1}"""))
        .toDF("op", "id", "doc")
      intercept[IllegalArgumentException](sink.applyActions(bad))
      stub.bulkBodies.size shouldBe 0
    }
  }
}
