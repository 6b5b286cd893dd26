package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, MapType, StringType}

import graft.core.Tables

/** The relational (§2B) operator surface of the reference, expressed as
  * idiomatic Spark over the driver's TPC-H-ish tables.
  *
  * The reference (paradigmxyz/sinker) delegates all relational work to
  * Postgres inside user-supplied materialized-view SQL
  * (reference: src/sinker/query_templates.py:10-13); the constructs below
  * are the ones its fixtures exercise (reference:
  * tests/fixtures/course_mv.sql:1-26, tests/test_parse_schema_tables.py)
  * plus standard warehouse staples needed at 100 TB.
  *
  * Oracle-exactness discipline (the driver hash-compares against DuckDB):
  *   - money arithmetic runs in exact DECIMAL and is surfaced as DOUBLE,
  *     with the identical cast chain in the oracle SQL, so both engines
  *     round the same exact value once;
  *   - averages are written as sum/count so no engine-specific AVG
  *     rounding is involved;
  *   - array aggregations are explicitly sorted by a full key;
  *   - top-k queries carry a unique tie-break key.
  */
object Relational {

  private val P = DecimalType(12, 2) // prices (~1e5, 2dp exact in data)
  private val R = DecimalType(4, 2)  // rates: discount/tax/value fractions
  private def dP(c: Column): Column = c.cast(P)
  private def dR(c: Column): Column = c.cast(R)
  private def dbl(c: Column): Column = c.cast("double")
  /** revenue term: extendedprice * (1 - discount), exact decimal */
  private def discPrice(price: Column, disc: Column): Column =
    dP(price) * (lit(1) - dR(disc))

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: scan → filter → hash agg.
    * Exercises B1/B3/B16; partial aggregation keeps the shuffle tiny. */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dbl(sum(dP(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
          .as("sum_disc_price"),
        dbl(sum(discPrice(col("l_extendedprice"), col("l_discount")) *
          (lit(1) + dR(col("l_tax"))))).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dbl(sum(dP(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(dR(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  SUM(l_quantity) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Filter + projection; both pushed into the parquet scan (B2/B3). */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 &&
        col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_shipdate"))
  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_shipdate
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2000-01-01'""".stripMargin

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3-style: selective dim filter, fact join, top-k (B13, topk).
    * Aggregates lineitem BEFORE the 3-way join so the join input is one
    * row per order. No broadcast hint on customer: its filtered slice
    * grows linearly with scale factor, so a hard-coded broadcast would
    * OOM executors at 100 TB — AQE picks broadcast vs shuffle from
    * runtime sizes instead. */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-06-30").cast("timestamp")
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cut)
      .groupBy(col("l_orderkey"))
      .agg(dbl(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"))
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(rev, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }
  private val q03Sql =
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-30'
      |  AND l_shipdate  > TIMESTAMP '1998-06-30'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** EXISTS via left-semi join with a non-equi conjunct (B3, semi). */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }
  private val q04Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5-style multiway join; dims broadcast, facts shuffle once. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val dims = nat.join(broadcast(reg),
      col("n_regionkey") === col("r_regionkey"))
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(dims), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dbl(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"))
  }
  private val q05Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** TPC-H Q6-style single-pass scan agg — pure pushdown + codegen. */
  private def q06(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dbl(sum(dP(col("l_extendedprice")) * dR(col("l_discount"))))
        .as("revenue"))
  private val q06Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q07
  /** LEFT OUTER join with null-aware counting (B14). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"), col("l_quantity"))
    ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(count(col("l_orderkey")).as("n_big_items"),
        count(lit(1)).as("n_rows"))
  }
  private val q07Sql =
    """SELECT o_orderpriority,
      |  COUNT(l_orderkey) AS n_big_items, COUNT(*) AS n_rows
      |FROM orders LEFT JOIN lineitem
      |  ON o_orderkey = l_orderkey AND l_quantity >= 48
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Window ranking: top-3 orders per customer (extension beyond the
    * reference; unique (price,orderkey) tiebreak keeps it deterministic). */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"))
  }
  private val q08Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      |FROM orders
      |QUALIFY rn <= 3""".stripMargin

  // ---------------------------------------------------------------- q09
  /** DISTINCT ON (B15): latest order per customer via row_number()=1. */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        col("o_orderdate").as("latest_orderdate"))
  }
  private val q09Sql =
    """SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
      |FROM orders
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""".stripMargin

  // ---------------------------------------------------------------- q10
  /** CTE + derived aggregate (B12/B17), run through Spark SQL text. */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH cust_rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS seg_rev
        |FROM customer JOIN cust_rev ON c_custkey = o_custkey
        |WHERE n_orders >= 2
        |GROUP BY c_mktsegment""".stripMargin)
  }
  private val q10Sql =
    """WITH cust_rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS seg_rev
      |FROM customer JOIN cust_rev ON c_custkey = o_custkey
      |WHERE n_orders >= 2
      |GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q11
  /** person_mv parity (B2/B6): keyed (id, doc) JSON document projection.
    * Reference: tests/fixtures/person_mv.sql:1-4. */
  private def q11(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey").as("id"),
        to_json(struct(col("c_name").as("name"),
          col("c_mktsegment").as("segment"))).as("doc"))
  private val q11Sql =
    """SELECT c_custkey AS id,
      |  CAST(json_object('name', c_name, 'segment', c_mktsegment) AS VARCHAR) AS doc
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q12
  /** course_mv parity (B5/B6/B7): parent row + sorted array of child
    * structs serialized as one nested JSON doc.
    * Reference: tests/fixtures/course_mv.sql:9-24 (json_agg subquery). */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").as("line"),
        col("l_partkey").as("part"),
        col("l_quantity").cast("long").as("qty")))).as("items"))
    Tables.orders(s, dir)
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey").as("id"),
        to_json(struct(col("o_orderstatus").as("status"), col("items")))
          .as("doc"))
  }
  private val q12Sql =
    """SELECT o_orderkey AS id,
      |  to_json(struct_pack(status := o_orderstatus,
      |    items := list(struct_pack(line := l_linenumber, part := l_partkey,
      |                              qty := CAST(l_quantity AS BIGINT))
      |                  ORDER BY l_linenumber, l_partkey, l_quantity))) AS doc
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey, o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q13
  /** unnest/explode (B10): word frequencies over documents.text.
    * The delimiter goes through [[graft.ops.Dedup.words]], which
    * Pattern.quotes it — Spark's split() is regex-based while the
    * DuckDB oracle's string_split is literal, and quoting keeps the
    * two aligned for ANY delimiter, not just the space. */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(graft.ops.Dedup.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
  private val q13Sql =
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word""".stripMargin

  // ---------------------------------------------------------------- q14
  /** split_part (B9). try_element_at + coalesce("") matches Postgres/
    * DuckDB split_part's missing-field behavior (returns '') and stays
    * safe under ANSI mode, where plain element_at throws on a too-short
    * array. */
  private def q14(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        coalesce(try_element_at(split(col("c_name"), "#"), lit(2)), lit(""))
          .as("cust_num"))
  private val q14Sql =
    "SELECT c_custkey, split_part(c_name, '#', 2) AS cust_num FROM customer"

  // ---------------------------------------------------------------- q15
  /** JSON field extraction (B11-adjacent): props -> typed value. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
  // DuckDB SUM(BIGINT) widens to HUGEINT (→ float64 in pandas) while the
  // Spark side stays int64; the outer CAST pins both to int64.
  private val q15Sql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q16
  /** UNION ALL + re-aggregation (set-op extension). */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nationkey"), lit("customer").as("kind"))
    val p = Tables.supplier(s, dir)
      .select(col("s_nationkey").as("nationkey"), lit("supplier").as("kind"))
    c.union(p).groupBy(col("nationkey"), col("kind"))
      .agg(count(lit(1)).as("n"))
  }
  private val q16Sql =
    """SELECT nationkey, kind, COUNT(*) AS n
      |FROM (SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      |      UNION ALL
      |      SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier)
      |GROUP BY nationkey, kind""".stripMargin

  // ---------------------------------------------------------------- q17
  /** CASE WHEN routing — the A4 filter/route operator as an expression.
    * Reference: src/sinker/bulk_action_generator.py:44-58. */
  private def q17(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(when(col("event_type").isin("click", "view"), lit("read"))
        .when(col("event_type") === "error", lit("error"))
        .otherwise(lit("write")).as("route"),
        col("value"))
      .groupBy(col("route"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(dP(col("value")))).as("sum_value"))
  private val q17Sql =
    """SELECT CASE WHEN event_type IN ('click','view') THEN 'read'
      |            WHEN event_type = 'error' THEN 'error'
      |            ELSE 'write' END AS route,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Tumbling event-time window aggregation (streaming-shape, batch-run).
    * Same 5-minute bucketing Structured Streaming uses (epoch-aligned). */
  private def q18(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(dP(col("value")))).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
  private val q18Sql =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Correlated scalar subquery (B4) — Catalyst decorrelates to a join.
    * Reference: tests/fixtures/course_mv.sql:3-8. */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT MAX(n_name) FROM nation WHERE n_nationkey = c_nationkey) AS nation_name
        |FROM customer""".stripMargin)
  }
  private val q19Sql =
    """SELECT c_custkey, c_name,
      |  (SELECT MAX(n_name) FROM nation WHERE n_nationkey = c_nationkey) AS nation_name
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Correlated aggregate subquery (B5) — COUNT over children per parent,
    * including zero-row parents (the COUNT-bug case Catalyst handles).
    * Reference: tests/fixtures/course_mv.sql:9-24. */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
        |FROM orders""".stripMargin)
  }
  private val q20Sql =
    """SELECT o_orderkey,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q21
  /** jsonb_each_text (B11): JSON map → (key, value) rows via
    * explode(from_json(_, MapType)). Reference:
    * tests/test_parse_schema_tables.py:76 (`jsonb_each_text(attendees)
    * as kv(key, value)`). */
  private def q21(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(explode(from_json(col("props"), MapType(StringType, StringType)))
        .as(Seq("key", "value")))
      .groupBy(col("key"), (col("value").cast("long") % 10).as("vbucket"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("long")).as("sum_v"))
  private val q21Sql =
    """SELECT key,
      |  CAST(CAST(json_extract_string(props, '$.' || key) AS BIGINT) % 10 AS BIGINT) AS vbucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS BIGINT) AS sum_v
      |FROM (SELECT unnest(json_keys(props)) AS key, props FROM events)
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Case-sensitive quoted identifiers (B18): camelCase aliases survive
    * end-to-end under spark.sql.caseSensitive=true (reference fixtures
    * quote "EmailAddress"/"personId" — tests/test_parse_schema_tables
    * .py:10). DuckDB renames output columns that collide
    * case-insensitively, so the same-name-different-case proof lives in
    * RelationalSpec instead. */
  private def q22(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey").as("personId"),
        col("c_name").as("personName"),
        upper(col("c_name")).as("PersonNameUpper"))
  private val q22Sql =
    """SELECT c_custkey AS "personId", c_name AS "personName", upper(c_name) AS "PersonNameUpper"
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Ingest timestamp (B19): `now()` column default, compared on a
    * derived stable predicate (reference: tests/fixtures/schema.sql:9
    * `created_at timestamp not null default now()`). */
  private def q23(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("ingest_ts", current_timestamp())
      .select(col("c_custkey"),
        (col("ingest_ts") >= lit("2026-01-01").cast("timestamp"))
          .as("ingested_after_2026"))
  private val q23Sql =
    """SELECT c_custkey, now() >= TIMESTAMP '2026-01-01' AS ingested_after_2026
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q41
  /** ROLLUP hierarchy totals (beyond-parity extension): per-(flag,
    * status), per-flag, and grand-total revenue in one pass — Catalyst
    * expands grouping sets into a single shuffle. `grouping()` flags
    * pin the NULL-indicator semantics to the oracle's. */
  private def q41(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dbl(sum(dP(col("l_extendedprice")))).as("revenue"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .select(col("l_returnflag"), col("l_linestatus"), col("revenue"),
        col("n"), col("g_flag"), col("g_status"))
  private val q41Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Exact distribution quantiles per group (beyond-parity extension):
    * Spark's `percentile` (exact linear interpolation on the sorted
    * group) bit-matches DuckDB's `quantile_cont` — verified bitwise at
    * sf0.01 AND sf0.1 before gating. Exact quantiles sort each group's
    * values, so this is for grouped distributions (priorities, sources,
    * languages); unbounded-cardinality profiling at 100 TB uses the
    * mergeable `approx_percentile` sketch instead
    * (ops/Sketches.scala, spec-gated vs exact). */
  private def q51(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        count(lit(1)).as("n"))
  private val q51Sql =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Set operations (beyond-parity extension): customers ordering in
    * BOTH 1996 and 1997 (INTERSECT) and customers who churned after
    * 1996 (EXCEPT), labeled and unioned. Catalyst plans both as
    * aggregate/anti-join shapes — one shuffle each on the key. */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    def inYear(y: Int) = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    val c96 = inYear(1996)
    val c97 = inYear(1997)
    c96.intersect(c97).withColumn("cohort", lit("both"))
      .unionByName(c96.except(c97).withColumn("cohort", lit("churned")))
  }
  private val q53Sql =
    """SELECT o_custkey, 'both' AS cohort FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |UNION ALL
      |SELECT o_custkey, 'churned' AS cohort FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)""".stripMargin

  // ---------------------------------------------------------------- q54
  /** FULL OUTER join (beyond-parity extension): daily click counts vs
    * view counts — days where either side is absent survive with a
    * zero. Both inputs pre-aggregate to one row per day BEFORE the
    * join (join input ∝ distinct days, not events), the full-outer
    * itself is one sort-merge on the day key, and COALESCE keeps the
    * output columns non-null so the schema is stable. */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    // date_trunc keeps TIMESTAMP typing on both engines (a DATE column
    // round-trips as python date objects and defeats the dtype check)
    def perDay(t: String, as: String) = Tables.events(s, dir)
      .filter(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as(as))
    perDay("click", "clicks")
      .join(perDay("view", "views"), Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("clicks"), lit(0L)).as("clicks"),
        coalesce(col("views"), lit(0L)).as("views"))
  }
  private val q54Sql =
    """SELECT COALESCE(c.day, v.day) AS day,
      |  COALESCE(c.clicks, 0) AS clicks,
      |  COALESCE(v.views, 0) AS views
      |FROM (SELECT date_trunc('day', ts) AS day, COUNT(*) AS clicks
      |      FROM events WHERE event_type = 'click' GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT date_trunc('day', ts) AS day, COUNT(*) AS views
      |      FROM events WHERE event_type = 'view' GROUP BY 1) v
      |ON c.day = v.day""".stripMargin

  // ---------------------------------------------------------------- q55
  /** NOT EXISTS anti-join (beyond-parity extension): customers with no
    * 1997 order. Catalyst plans a LeftAnti hash join on the key — one
    * shuffle, no row duplication, the complement of q04's semi-join. */
  private def q55(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(year(col("o_orderdate")) === 1997)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  private val q55Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND year(o.o_orderdate) = 1997)""".stripMargin

  // ---------------------------------------------------------------- q56
  /** Explicit window frame (beyond-parity extension): per-customer
    * running revenue in order-date order, ROWS UNBOUNDED PRECEDING →
    * CURRENT ROW. Prices go through cents-as-BIGINT so the running
    * fold is exact integer arithmetic in both engines (a double fold
    * would expose engine-internal summation order); the unique
    * (custkey, date, orderkey) sort makes every prefix deterministic.
    * One hash-partitioned window on the customer key. */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("cents")).over(w).as("running_cents"))
  }
  private val q56Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS running_cents
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q60
  /** lag() inter-event gaps (beyond-parity extension): microseconds
    * since each user's previous event — the building block under
    * sessionization (q40 consumes exactly this shape). Exact integer
    * microsecond arithmetic on both engines; the (ts, event_id) sort
    * is unique so every lag is deterministic. One window shuffle on
    * the user key. */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
  }
  private val q60Sql =
    """SELECT event_id, user_id,
      |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Stratified deterministic sampling — the data-mixing primitive: each
    * language stratum keeps a different fraction of documents, decided
    * by a salted md5 of the key (NOT rand(), so the sample is stable
    * across retries, executors, and engines — a training-data split you
    * can reproduce). Pure per-row predicate: the filter pushes to the
    * scan, zero shuffle, and the same expression splits a 100 TB corpus
    * with per-source mixing weights. */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val bucket = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 15),
      16, 10).cast("long") % 100
    val rate = when(col("lang") === "en", 70)
      .when(col("lang").isin("es", "fr"), 40)
      .otherwise(20)
    Tables.documents(s, dir)
      .filter(bucket < rate)
      .select(col("doc_id"), col("lang"), col("source"))
  }
  private val q63Sql =
    """SELECT doc_id, lang, source FROM documents
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':mix'), 1, 15))::BIGINT % 100 <
      |  CASE WHEN lang = 'en' THEN 70
      |       WHEN lang IN ('es', 'fr') THEN 40
      |       ELSE 20 END""".stripMargin

  // ---------------------------------------------------------------- q64
  /** GROUPING SETS: per-(lang, source), per-lang, and grand-total corpus
    * stats in ONE pass — Catalyst expands the sets into a single
    * shuffle (one Expand + one HashAggregate), not three scans.
    * `grouping()` indicators disambiguate "subtotal row" from a real
    * NULL group value, matching the oracle bit-for-bit. */
  private def q64(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq()),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        grouping(col("lang")).cast("int").as("g_lang"),
        grouping(col("source")).cast("int").as("g_source"))
  private val q64Sql =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  CAST(GROUPING(lang) AS INT) AS g_lang,
      |  CAST(GROUPING(source) AS INT) AS g_source
      |FROM documents
      |GROUP BY GROUPING SETS ((lang, source), (lang), ())""".stripMargin

  // ---------------------------------------------------------------- q65
  /** PIVOT: document counts per source with one column per language —
    * the corpus-composition report every mixing run starts from. Spark's
    * pivot with an EXPLICIT value list stays a single shuffle (no
    * distinct-scan to discover columns — at 100 TB that discovery pass
    * is the difference); empty cells coalesce to 0 to match COUNT
    * FILTER semantics. */
  private val PivotLangs = Seq("de", "en", "es", "fr", "zh")
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.documents(s, dir)
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
    pivoted.select(col("source") +:
      PivotLangs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
  }
  private val q65Sql =
    """SELECT source,
      |  COUNT(*) FILTER (WHERE lang = 'de') AS de,
      |  COUNT(*) FILTER (WHERE lang = 'en') AS en,
      |  COUNT(*) FILTER (WHERE lang = 'es') AS es,
      |  COUNT(*) FILTER (WHERE lang = 'fr') AS fr,
      |  COUNT(*) FILTER (WHERE lang = 'zh') AS zh
      |FROM documents GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Forward-fill (gap filling): carry each user's last purchase value
    * forward across their event stream — `last_value(... IGNORE NULLS)`
    * over a running frame. The standard repair for sparse attributes
    * before featurization; one window shuffle on the user key, values
    * pass through untouched (no arithmetic to diverge on). The
    * (ts, event_id) sort is unique, so the fill is deterministic. */
  private def q70(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w).as("last_purchase"))
  }
  private val q70Sql =
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q71
  /** LATERAL correlated subquery (new SQL surface in Spark 3.2+): the
    * 3 longest documents per source — a per-group top-k written the way
    * Postgres users write it. Catalyst decorrelates the LATERAL into a
    * ranked window under the hood, so the plan is the same single
    * shuffle as q08's explicit window; the construct, not the plan, is
    * what this gates. Tie-break on doc_id keeps the cut deterministic. */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT s.source, d.doc_id, d.n_chars
        |FROM (SELECT DISTINCT source FROM documents) s,
        |LATERAL (SELECT doc_id, n_chars FROM documents d
        |         WHERE d.source = s.source
        |         ORDER BY n_chars DESC, doc_id LIMIT 3) d""".stripMargin)
  }
  private val q71Sql =
    """SELECT s.source, d.doc_id, d.n_chars
      |FROM (SELECT DISTINCT source FROM documents) s,
      |LATERAL (SELECT doc_id, n_chars FROM documents d
      |         WHERE d.source = s.source
      |         ORDER BY n_chars DESC, doc_id LIMIT 3) d""".stripMargin

  // ---------------------------------------------------------------- q74
  /** RANGE-INTERVAL window frame: trailing-hour event count and spend
    * per user — the event-time sliding aggregate (rate limits, velocity
    * features) that ROWS frames can't express. One keyed window
    * shuffle; the sum rides the cents-as-BIGINT discipline so both
    * engines aggregate exact integers. Per-user timestamps are unique
    * in this data, so the RANGE frame is deterministic. */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_last_hour,
        |  SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS cents_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
        .stripMargin)
  }
  private val q74Sql =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_last_hour,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_last_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Distribution ranking functions: ntile/percent_rank/cume_dist spend
    * quartiles per order priority. Partitioned window (keyed shuffle) —
    * the scale-honest form; a global rank would serialize through one
    * reducer. Sort key is cents-as-BIGINT + unique tie-break, and
    * percent_rank/cume_dist are single divisions of exact integers, so
    * both engines emit identical doubles. */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("spend_quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }
  private val q76Sql =
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4) OVER w AS spend_quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) ASC,
      |                      o_orderkey ASC)""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Percent-of-total (ratio_to_report): each nation's share of its
    * region's revenue — aggregate first (25 rows), THEN window over the
    * tiny aggregate; the corpus-sized input sees only the groupBy
    * shuffle, never a window. Shares are one exact-integer division. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val nrev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    nrev.select(col("n_name"), col("r_name"), col("cents"),
      (col("cents").cast("double") /
        sum(col("cents")).over(Window.partitionBy(col("r_name")))
          .cast("double")).as("region_share"))
  }
  private val q77Sql =
    """WITH nrev AS (
      |  SELECT n.n_name, r.r_name,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o_custkey = c_custkey
      |  JOIN nation n ON c_nationkey = n_nationkey
      |  JOIN region r ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT n_name, r_name, cents,
      |  cents::DOUBLE /
      |    CAST(SUM(cents) OVER (PARTITION BY r_name) AS BIGINT)::DOUBLE AS region_share
      |FROM nrev""".stripMargin

  // ---------------------------------------------------------------- q78
  /** FILTER-clause aggregation: one pass computing several predicated
    * aggregates side by side — no self-joins, no second scan; exactly
    * the conditional-count pattern pivot (q65) generalizes. */
  private def q78(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        sum(when(col("o_orderstatus") === "F",
          round(col("o_totalprice") * 100).cast("long"))).as("cents_finished"))
  private val q78Sql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
      |       FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cents_finished
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q83
  /** CUBE totals: every subset of (status, priority) — the full
    * cross-dimensional summary a BI layer asks for. Like ROLLUP (q41)
    * and GROUPING SETS (q64), Catalyst expands the 4 grouping sets into
    * ONE expand + ONE shuffle, with partial aggregation ahead of it;
    * money sums ride the exact-cents BIGINT trick (q78). */
  private def q83(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"))
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("n"), col("cents"), col("g_status"), col("g_prio"))
  private val q83Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Ordered funnel with a conversion window: users who viewed, then
    * clicked within 12 h AFTER their first view, then purchased within
    * 12 h AFTER that first qualifying click — the sequential-pattern
    * query behind conversion analysis. Each stage is one keyed
    * aggregation (min ts per user) plus one keyed join against the
    * previous stage; after partial aggregation only user-level rows
    * shuffle, so a K-stage funnel over 100 TB of events costs K
    * user-keyed passes, never a per-event self-join. */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    val win = expr("INTERVAL 12 HOURS")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("ts") > col("t_view") && col("ts") <= col("t_view") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val buys = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("ts") > col("t_click") && col("ts") <= col("t_click") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_buy"))
    def stage(n: Int, name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(n).cast("int").as("stage"),
          lit(name).as("event_type"), col("n_users"))
    stage(1, "view", views)
      .union(stage(2, "click", clicks))
      .union(stage(3, "purchase", buys))
  }
  private val q84Sql =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view
      |        AND e.ts <= v.t_view + INTERVAL 12 HOURS GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t_buy FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |        AND e.ts <= c.t_click + INTERVAL 12 HOURS GROUP BY 1)
      |SELECT CAST(1 AS INT) AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM v
      |UNION ALL
      |SELECT CAST(2 AS INT), 'click', COUNT(*) FROM c
      |UNION ALL
      |SELECT CAST(3 AS INT), 'purchase', COUNT(*) FROM p""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Z-order (Morton) clustering key over (customer, order day) —
    * [[graft.ops.Layout.zValue2]]. Writing a table range-partitioned +
    * sorted on this value makes parquet row-group min/max stats prune
    * scans filtered on EITHER dimension (the lakehouse multi-dim
    * clustering layout); the value itself is pure codegen'd bit
    * arithmetic, recomputed identically by the oracle's shifts. The
    * layout machinery (range partition + sort) is spec-gated
    * (LayoutSpec); this gates the curve arithmetic. */
  private val ZBits = 16
  private def q86(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_orderkey"),
      graft.ops.Layout.zValue2(col("o_custkey"),
        unix_date(col("o_orderdate").cast("date")), ZBits).as("z"))
  private val q86Sql = {
    val mask = (1L << ZBits) - 1
    def dim(e: String, off: Int) = (0 until ZBits)
      .map(i => s"((((($e) & $mask) >> $i) & 1) << ${2 * i + off})")
      .mkString(" | ")
    val days = "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
    s"""SELECT o_orderkey,
       |  CAST((${dim("o_custkey", 0)}) | (${dim(days, 1)}) AS BIGINT) AS z
       |FROM orders""".stripMargin
  }

  // ---------------------------------------------------------------- q87
  /** Salted fact-dim join under the oracle gate: revenue by order
    * priority through [[graft.ops.Skew.saltedJoin]] (fact keys fanned
    * over 8 reducers, dim replicated 8×). The oracle is the PLAIN join
    * — the gate proves salting is semantically invisible, which is the
    * whole contract (SkewSpec proves it against the unsalted plan;
    * this proves it against a second engine). Deterministic xxhash64
    * salt, so retries/speculation can't re-salt rows differently. */
  private val Salts = 8
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey"),
        col("l_extendedprice"))
    val dim = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.ops.Skew.saltedJoin(fact, dim, "okey", Salts, Seq("l_partkey"))
      .groupBy(col("o_orderpriority"))
      .agg(dbl(sum(dP(col("l_extendedprice")))).as("revenue"),
        count(lit(1)).as("n"))
  }
  private val q87Sql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Hot-key probe ([[graft.ops.Skew.hotKeys]]): per-key row counts at
    * or above a threshold — the measurement that decides whether a join
    * needs salting at all. One partial-aggregated groupBy; output is
    * bounded by the number of genuinely hot keys. */
  private val HotThreshold = 70L
  private def q88(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.hotKeys(Tables.events(s, dir), "user_id", HotThreshold)
  private val q88Sql =
    s"""SELECT user_id, COUNT(*) AS n_rows FROM events
       |GROUP BY user_id HAVING COUNT(*) >= $HotThreshold""".stripMargin

  // ---------------------------------------------------------------- q94
  /** TARGETED salted join ([[graft.ops.Skew.saltedJoinHotOnly]]) under
    * the oracle gate: same contract as q87 — the oracle is the PLAIN
    * join, proving hot-key-only salting is semantically invisible — but
    * here only keys with ≥ `HotOnlyThreshold` fact rows pay the salts×
    * dim replication; the cold tail takes the plain equi-join and is
    * never replicated (SkewSpec proves the split). This is the variant
    * that survives 100×: replication cost ∝ actual skew, not dim size. */
  private val HotOnlyThreshold = 5L
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey"),
        col("l_extendedprice"))
    val dim = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderstatus"))
    graft.ops.Skew.saltedJoinHotOnly(fact, dim, "okey", Salts,
        Seq("l_partkey"), HotOnlyThreshold)
      .groupBy(col("o_orderstatus"))
      .agg(dbl(sum(dP(col("l_extendedprice")))).as("revenue"),
        count(lit(1)).as("n"))
  }
  private val q94Sql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Deterministic keyset-style pagination: page 3 of the price-ranked
    * order book via OFFSET+LIMIT over a total order with a unique
    * tie-break. Spark plans offset+limit after a sort as
    * TakeOrderedAndProject (top-(offset+limit) per partition, merge on
    * the driver) — no global sort, the same shape as q03's top-k. */
  private def q90(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(20).limit(10)
  private val q90Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10 OFFSET 20""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Sorted-distinct string aggregation (Postgres `string_agg` — a
    * denormalization-SQL staple the reference's MV layer leans on):
    * `collect_set` is a partial-aggregating hash set, sorted once per
    * group at output, so the string is deterministic under any
    * partitioning — never aggregate strings in shuffle order. */
  private def q91(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        count(lit(1)).as("n"))
  private val q91Sql =
    """SELECT o_orderpriority,
      |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q92
  /** ISO-weekday seasonality: Spark's `weekday` (Mon=0) + 1 equals
    * DuckDB/Postgres `isodow` (Mon=1..7) — the explicit mapping matters
    * because `dayofweek` (Sun=1) silently disagrees across engines;
    * the exact-cents trick keeps money order-independent. */
  private def q92(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy((weekday(col("o_orderdate").cast("date")) + 1).cast("long")
        .as("dow"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
  private val q92Sql =
    """SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q119
  /** Market-basket pairs ([[graft.ops.Cooccur.pairCounts]]): the 20
    * part pairs most often ordered together. The op expands each
    * order's bounded distinct-part set into i<j combinations per-row
    * (no fact self-join — the fact is read and shuffled once), counts
    * support with a partial-aggregated groupBy, and takes the top-k as
    * `TakeOrderedAndProject` under a full (support, a, b) tie-break.
    * The oracle is the naive self-join formulation — two independent
    * shapes, one answer. */
  private val BasketTopK = 20
  private def q119(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cooccur.pairCounts(
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", BasketTopK)
  private val q119Sql =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       |SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_groups
       |FROM li a JOIN li b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |GROUP BY 1, 2
       |ORDER BY n_groups DESC, item_a, item_b
       |LIMIT $BasketTopK""".stripMargin

  // ---------------------------------------------------------------- q120
  /** Exact correlation / regression-slope analytics: per event type,
    * the Pearson correlation between spend (in exact cents) and
    * hour-of-day, plus the regression slope of cents per hour. All six
    * moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINT sums —
    * associative, so any shuffle order produces identical bits — and
    * the corr/slope formulas are one double expression over those
    * integers, rounded once. One partial-aggregated groupBy, zero
    * joins. At 100 TB the same moments accumulate in DECIMAL(38,0)
    * to dodge BIGINT overflow; the plan is unchanged. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_type"),
      round(col("value") * 100d, 0).cast("long").as("x"),
      hour(col("ts")).cast("long").as("y"))
    e.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("corr_cents_hour"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double"), 6)
          .as("slope_cents_per_hour"))
  }
  /** q120's oracle, shared verbatim with q254 (the incremental
    * five-store composition must reproduce the batch analytics
    * exactly). */
  private[queries] def corrStatsSql: String = q120Sql
  private val q120Sql =
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(SUM(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxy,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx,
      |    CAST(SUM(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS syy
      |  FROM events GROUP BY 1)
      |SELECT event_type, n,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_cents_hour,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    CAST(n * syy - sy * sy AS DOUBLE), 6) AS slope_cents_per_hour
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q121
  /** Multi-distinct aggregation: per event type, distinct users,
    * distinct active days, and total events in ONE aggregate. Spark
    * plans multiple COUNT(DISTINCT ...) via Expand (one replicated
    * stream per distinct set, then a two-phase aggregate) — the
    * standard shape for audience/reach reporting. At 100 TB swap in
    * approx_count_distinct (HLL++) when ±2% error is acceptable and
    * the Expand fan-out is not. */
  private def q121(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"))
  private val q121Sql =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q126
  /** Per-type winsorization of event values at the exact p05/p95
    * quantiles — the robust-stats outlier clamp applied before any
    * mean-based metric (the value-column sibling of q93's MAD filter).
    * Spark `percentile` bit-matches DuckDB `quantile_cont` (the q51
    * precedent), so the clamp thresholds — and therefore every
    * boundary comparison — are identical across engines. Plan: the
    * quantile side reads only the (event_type, value) projection and
    * aggregates to |event_type| rows, which broadcast back over the
    * fact scan — the fact side itself never shuffles. */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.05)").as("__p05"),
      expr("percentile(value, 0.95)").as("__p95"))
    ev.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(p), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(least(greatest(col("value"), col("__p05")), col("__p95")), 6)
          .as("winsorized"))
  }
  private val q126Sql =
    """WITH p AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.05) AS p05,
      |    quantile_cont(value, 0.95) AS p95
      |  FROM events GROUP BY 1)
      |SELECT event_id, e.event_type, value,
      |  round(least(greatest(value, p05), p95), 6) AS winsorized
      |FROM events e JOIN p ON e.event_type = p.event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01 _,
    "q02_filter_project" -> q02 _,
    "q03_topk_revenue" -> q03 _,
    "q04_exists_semijoin" -> q04 _,
    "q05_region_revenue" -> q05 _,
    "q06_scan_agg" -> q06 _,
    "q07_left_join" -> q07 _,
    "q08_window_rank" -> q08 _,
    "q09_distinct_on" -> q09 _,
    "q10_cte_rollup" -> q10 _,
    "q11_doc_project" -> q11 _,
    "q12_doc_nested_agg" -> q12 _,
    "q13_explode_words" -> q13 _,
    "q14_split_part" -> q14 _,
    "q15_json_extract" -> q15 _,
    "q16_union_all" -> q16 _,
    "q17_case_route" -> q17 _,
    "q18_time_window" -> q18 _,
    "q19_scalar_subquery" -> q19 _,
    "q20_correlated_agg" -> q20 _,
    "q21_jsonb_each" -> q21 _,
    "q22_mixed_case" -> q22 _,
    "q23_ingest_ts" -> q23 _,
    "q41_rollup" -> q41 _,
    "q51_quantiles" -> q51 _,
    "q53_setops" -> q53 _,
    "q54_full_outer" -> q54 _,
    "q55_anti_join" -> q55 _,
    "q56_running_sum" -> q56 _,
    "q60_event_gaps" -> q60 _,
    "q63_stratified_sample" -> q63 _,
    "q64_grouping_sets" -> q64 _,
    "q65_pivot" -> q65 _,
    "q70_forward_fill" -> q70 _,
    "q71_lateral_topk" -> q71 _,
    "q74_range_frame" -> q74 _,
    "q76_rank_dist" -> q76 _,
    "q77_region_share" -> q77 _,
    "q78_filter_agg" -> q78 _,
    "q83_cube" -> q83 _,
    "q84_funnel" -> q84 _,
    "q86_zorder" -> q86 _,
    "q87_salted_join" -> q87 _,
    "q88_hot_keys" -> q88 _,
    "q90_pagination" -> q90 _,
    "q94_salted_hot_join" -> q94 _,
    "q91_string_agg" -> q91 _,
    "q92_weekday" -> q92 _,
    "q119_basket_pairs" -> q119 _,
    "q120_corr_stats" -> q120 _,
    "q121_multi_distinct" -> q121 _,
    "q126_winsorize" -> q126 _)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_topk_revenue" -> q03Sql,
    "q04_exists_semijoin" -> q04Sql,
    "q05_region_revenue" -> q05Sql,
    "q06_scan_agg" -> q06Sql,
    "q07_left_join" -> q07Sql,
    "q08_window_rank" -> q08Sql,
    "q09_distinct_on" -> q09Sql,
    "q10_cte_rollup" -> q10Sql,
    "q11_doc_project" -> q11Sql,
    "q12_doc_nested_agg" -> q12Sql,
    "q13_explode_words" -> q13Sql,
    "q14_split_part" -> q14Sql,
    "q15_json_extract" -> q15Sql,
    "q16_union_all" -> q16Sql,
    "q17_case_route" -> q17Sql,
    "q18_time_window" -> q18Sql,
    "q19_scalar_subquery" -> q19Sql,
    "q20_correlated_agg" -> q20Sql,
    "q21_jsonb_each" -> q21Sql,
    "q22_mixed_case" -> q22Sql,
    "q23_ingest_ts" -> q23Sql,
    "q41_rollup" -> q41Sql,
    "q51_quantiles" -> q51Sql,
    "q53_setops" -> q53Sql,
    "q54_full_outer" -> q54Sql,
    "q55_anti_join" -> q55Sql,
    "q56_running_sum" -> q56Sql,
    "q60_event_gaps" -> q60Sql,
    "q63_stratified_sample" -> q63Sql,
    "q64_grouping_sets" -> q64Sql,
    "q65_pivot" -> q65Sql,
    "q70_forward_fill" -> q70Sql,
    "q71_lateral_topk" -> q71Sql,
    "q74_range_frame" -> q74Sql,
    "q76_rank_dist" -> q76Sql,
    "q77_region_share" -> q77Sql,
    "q78_filter_agg" -> q78Sql,
    "q83_cube" -> q83Sql,
    "q84_funnel" -> q84Sql,
    "q86_zorder" -> q86Sql,
    "q87_salted_join" -> q87Sql,
    "q88_hot_keys" -> q88Sql,
    "q90_pagination" -> q90Sql,
    "q94_salted_hot_join" -> q94Sql,
    "q91_string_agg" -> q91Sql,
    "q92_weekday" -> q92Sql,
    "q119_basket_pairs" -> q119Sql,
    "q120_corr_stats" -> q120Sql,
    "q121_multi_distinct" -> q121Sql,
    "q126_winsorize" -> q126Sql)
}
