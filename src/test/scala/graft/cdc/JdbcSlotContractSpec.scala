package graft.cdc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, ResultSet, Statement}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Recorded-wire contract for [[JdbcSlotConnection]]: a stub JDBC
  * driver captures every SQL string the class sends and replays canned
  * rows, pinning the statements to the reference's templates
  * (reference: src/sinker/query_templates.py:1-3,34 — CHECK_SLOT,
  * CREATE_SLOT, DROP_SLOT, GET_ALL_CHANGES — plus the peek/advance
  * pair the deferred-offset feed needs). No Postgres exists in this
  * environment; until a live soak runs, this spec is what keeps the
  * wire text from drifting.
  */
class JdbcSlotContractSpec extends AnyFunSuite with Matchers {

  /** One scripted result set: rows are returned for any query; every
    * executed SQL string is recorded. Built with reflective proxies so
    * the giant java.sql interfaces need no hand-written stubs. */
  private class StubDriver extends Driver {
    val executed = ArrayBuffer[String]()
    @volatile var rows: Seq[Seq[AnyRef]] = Seq(Seq(java.lang.Long.valueOf(0L)))
    @volatile var closed = false

    private def resultSet(data: Seq[Seq[AnyRef]]): ResultSet = {
      var idx = -1
      val meta = Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[java.sql.ResultSetMetaData]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
            m.getName match {
              case "getColumnCount" =>
                Integer.valueOf(data.headOption.map(_.size).getOrElse(0))
              case _ => null
            }
        })
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[ResultSet]), new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
            m.getName match {
              case "next" =>
                idx += 1; java.lang.Boolean.valueOf(idx < data.length)
              case "getObject" => data(idx)(a(0).asInstanceOf[Integer] - 1)
              case "getMetaData" => meta
              case "close" => null
              case _ => null
            }
        }).asInstanceOf[ResultSet]
    }

    private def statement(): Statement =
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Statement]), new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
            m.getName match {
              case "executeQuery" =>
                executed += a(0).asInstanceOf[String]; resultSet(rows)
              case "close" => null
              case _ => null
            }
        }).asInstanceOf[Statement]

    override def acceptsURL(url: String): Boolean =
      url.startsWith("jdbc:graftstub:")
    override def connect(url: String, info: java.util.Properties): Connection =
      if (!acceptsURL(url)) null
      else Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]), new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
            m.getName match {
              case "createStatement" => statement()
              case "close" => closed = true; null
              case "isClosed" => java.lang.Boolean.valueOf(closed)
              case _ => null
            }
        }).asInstanceOf[Connection]
    override def getMajorVersion = 1
    override def getMinorVersion = 0
    override def getPropertyInfo(u: String, i: java.util.Properties) =
      Array.empty
    override def jdbcCompliant() = false
    override def getParentLogger = null
  }

  private def withStub(f: (StubDriver, JdbcSlotConnection) => Unit): Unit = {
    val drv = new StubDriver
    DriverManager.registerDriver(drv)
    try f(drv, new JdbcSlotConnection(
      "jdbc:graftstub:mem", new java.util.Properties()))
    finally DriverManager.deregisterDriver(drv)
  }

  test("slot lifecycle SQL matches the reference templates verbatim") {
    withStub { (drv, conn) =>
      drv.rows = Seq(Seq(java.lang.Long.valueOf(1L)))
      conn.slotExists("sinker") shouldBe true
      conn.createSlot("sinker")
      conn.dropSlot("sinker")
      drv.executed.toSeq shouldBe Seq(
        // CHECK_SLOT (query_templates.py:1)
        "SELECT count(*) FROM pg_replication_slots WHERE slot_name='sinker'",
        // CREATE_SLOT with the test_decoding plugin (:3)
        "SELECT pg_create_logical_replication_slot('sinker', 'test_decoding')",
        // DROP_SLOT (:2)
        "SELECT pg_drop_replication_slot('sinker')")
    }
  }

  test("drain and deferred-offset SQL: get/peek/advance shapes") {
    withStub { (drv, conn) =>
      drv.rows = Seq(
        Seq(java.lang.Long.valueOf(777L), "0/1A2B3C8", "BEGIN 777"),
        Seq(java.lang.Long.valueOf(777L), "0/1A2B3D0",
          """table public.person_mv: INSERT: id[text]:'p-1' doc[json]:'{"name":"x"}'"""))
      val got = conn.getChanges("sinker")
      got.map(_.xid) shouldBe Seq(777L, 777L)
      got.head.lsn shouldBe "0/1A2B3C8"
      got(1).data should include("person_mv")
      val peeked = conn.peekChanges("sinker")
      peeked.size shouldBe 2
      conn.advance("sinker", "0/1A2B3D0")
      drv.executed.toSeq shouldBe Seq(
        // GET_ALL_CHANGES (query_templates.py:34)
        "SELECT xid, lsn, data FROM pg_logical_slot_get_changes('sinker', NULL, NULL)",
        "SELECT xid, lsn, data FROM pg_logical_slot_peek_changes('sinker', NULL, NULL)",
        "SELECT pg_replication_slot_advance('sinker', '0/1A2B3D0'::pg_lsn)")
    }
  }

  test("slot names with quotes are escaped, not injected") {
    withStub { (drv, conn) =>
      drv.rows = Seq(Seq(java.lang.Long.valueOf(0L)))
      conn.slotExists("sin'ker") shouldBe false
      drv.executed.head should include("slot_name='sin''ker'")
    }
  }

  test("close closes the underlying JDBC connection") {
    withStub { (drv, conn) =>
      drv.rows = Seq(Seq(java.lang.Long.valueOf(0L)))
      conn.slotExists("s") // force lazy connect
      conn.close()
      drv.closed shouldBe true
    }
  }
}
