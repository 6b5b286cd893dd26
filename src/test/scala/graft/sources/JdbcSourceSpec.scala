package graft.sources

import java.sql.DriverManager
import java.util.Properties

import graft.SparkSpec

/** Partitioned + chunked JDBC backfill against an embedded Derby —
  * proving the live-Postgres scan path parallelizes: ranged tables
  * read with >1 partition, keyless tables fall back to one, and the
  * fetchsize (reference PGCHUNK_SIZE — settings.py:50) reaches the
  * scan options. */
class JdbcSourceSpec extends SparkSpec {

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.executeUpdate) finally st.close()
    } finally conn.close()
  }

  exec(
    "CREATE TABLE ranged(id INT NOT NULL PRIMARY KEY, name VARCHAR(32))",
    (1 to 100).map(i => s"($i, 'row $i')")
      .mkString("INSERT INTO ranged VALUES ", ", ", ""),
    "CREATE TABLE keyless(name VARCHAR(32))",
    "INSERT INTO keyless VALUES ('a'), ('b'), ('c')",
    "CREATE TABLE emptied(id INT NOT NULL PRIMARY KEY)",
    "CREATE TABLE tiny(id INT NOT NULL PRIMARY KEY)",
    "INSERT INTO tiny VALUES (7), (8)",
    "CREATE TABLE nullkey(id INT, name VARCHAR(16))",
    "INSERT INTO nullkey VALUES (1,'a'), (2,'b'), (NULL,'c'), (NULL,'d'), (9,'e')")

  private val props = new Properties()

  test("ranged table splits into numPartitions range-disjoint tasks") {
    val df = JdbcSource.read(spark, url, "ranged", props,
      fetchSize = 10, numPartitions = 4)
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 100
    // every row exactly once — the range predicates partition, not sample
    df.select("ID").collect().map(_.getInt(0)).sorted shouldBe (1 to 100).toArray
  }

  test("keyless table falls back to a single chunked cursor") {
    val df = JdbcSource.read(spark, url, "keyless", props,
      fetchSize = 2, numPartitions = 4)
    df.rdd.getNumPartitions shouldBe 1
    df.count() shouldBe 3
  }

  test("empty table: bounds probe yields nulls, single partition, zero rows") {
    val df = JdbcSource.read(spark, url, "emptied", props,
      fetchSize = 10, numPartitions = 4)
    df.count() shouldBe 0
  }

  test("nullable key: null rows survive the ranged read (first-partition clause)") {
    // Spark's range partitioning adds `col IS NULL` to the first
    // partition predicate — rows with a null key must not be dropped
    val df = JdbcSource.read(spark, url, "nullkey", props,
      fetchSize = 2, numPartitions = 3)
    df.count() shouldBe 5
    df.filter("ID IS NULL").count() shouldBe 2
  }

  test("keyColumn override wins over the auto-probe; bad names fail loudly") {
    // two numeric columns: auto-probe would pick SEQ (first); the
    // override ranges on ID instead
    exec(
      "CREATE TABLE twokeys(seq INT NOT NULL, id INT NOT NULL PRIMARY KEY)",
      (1 to 40).map(i => s"(1, $i)")
        .mkString("INSERT INTO twokeys VALUES ", ", ", ""))
    val df = JdbcSource.read(spark, url, "twokeys", props,
      fetchSize = 10, numPartitions = 4, keyColumn = Some("id"))
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 40
    // auto-probe on SEQ (all 1s): bounds collapse to one value
    JdbcSource.read(spark, url, "twokeys", props, 10, 4)
      .rdd.getNumPartitions shouldBe 1
    intercept[IllegalArgumentException](
      JdbcSource.read(spark, url, "twokeys", props, 10, 4,
        keyColumn = Some("nope")))
    intercept[IllegalArgumentException](
      JdbcSource.read(spark, url, "keyless", props, 10, 4,
        keyColumn = Some("name"))) // non-numeric
  }

  test("partition count clamps to the key range on tiny tables") {
    val df = JdbcSource.read(spark, url, "tiny", props,
      fetchSize = 10, numPartitions = 32)
    // our clamp caps at hi-lo+1=2; Spark's own stride rule may reduce
    // further — the contract is "no 32-way fan-out on a 2-row table"
    df.rdd.getNumPartitions should be <= 2
    df.count() shouldBe 2
  }
}
