package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Partitioned, chunked JDBC table scans — the backfill path when the
  * engine is pointed at a live Postgres.
  *
  * The reference streams its backfill through a server-side cursor in
  * `PGCHUNK_SIZE`-row chunks (reference: src/sinker/sinker.py:62-72,
  * settings.py:50 `PGCHUNK_SIZE=2000`) so it never buffers a whole
  * table. The Spark-native analogue is two-fold:
  *
  *  - `fetchsize` on every JDBC read — the driver-level cursor chunk,
  *    so each task streams its rows instead of materializing its whole
  *    partition result set in memory (Postgres JDBC only honors it
  *    inside a transaction, which Spark's JDBC source arranges);
  *  - ranged partition predicates over a numeric key — a `min/max`
  *    probe (one 1-row query) splits the scan into `numPartitions`
  *    range-disjoint tasks, so a 100 TB backfill reads in parallel
  *    across the cluster instead of through one connection.
  *
  * Tables with no numeric column fall back to a single-partition scan
  * (still chunked by fetchsize) — the same behavior the reference's
  * single cursor has, and the only safe option without a splittable
  * key.
  */
object JdbcSource {

  /** Numeric types usable as a range-partitioning key (Spark's JDBC
    * relation accepts numeric, date and timestamp partition columns;
    * we probe numerics — primary keys in practice). */
  private def isRangeKey(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }

  private def withFetch(props: Properties, fetchSize: Int): Properties = {
    val p = new Properties()
    p.putAll(props)
    p.setProperty("fetchsize", fetchSize.toString)
    p
  }

  /** Read `table` (caller-quoted, e.g. `"person"`) with streaming
    * fetch and, when a numeric column exists, ranged parallelism.
    * Schema resolution and the bounds probe are metadata-sized
    * queries; no data moves until an action runs.
    *
    * `keyColumn` overrides the auto-probe (first numeric column) — the
    * production knob for tables whose first numeric column is
    * unindexed or skewed; it must name a numeric column or the read
    * fails loudly rather than scanning on a bad key. */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties, fetchSize: Int = 2000,
      numPartitions: Int = 32, keyColumn: Option[String] = None): DataFrame = {
    val p = withFetch(props, fetchSize)
    val whole = spark.read.jdbc(url, table, p)
    val key = keyColumn match {
      case Some(name) =>
        val f = whole.schema.fields.find(_.name.equalsIgnoreCase(name))
          .getOrElse(throw new IllegalArgumentException(
            s"partition column $name not found in $table " +
              s"(have: ${whole.schema.fieldNames.mkString(", ")})"))
        require(isRangeKey(f.dataType),
          s"partition column $name has non-numeric type ${f.dataType.sql}")
        Some(f)
      case None => whole.schema.fields.find(f => isRangeKey(f.dataType))
    }
    key match {
      case None => whole // keyless: one cursor, chunked by fetchsize
      case Some(f) if numPartitions <= 1 => whole
      case Some(f) =>
        val q = "\"" + f.name + "\""
        // 1-row aggregate pushed to the database; alias form is
        // accepted by Postgres and Derby alike
        val bounds = spark.read
          .jdbc(url, s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM $table) graft_bounds", p)
          .head()
        if (bounds.isNullAt(0)) whole // empty table
        else {
          val lo = bounds.get(0).asInstanceOf[Number].longValue()
          val hi = bounds.get(1).asInstanceOf[Number].longValue()
          // no more partitions than distinct range values — avoids
          // degenerate empty range slices on tiny tables
          val parts = math.max(1L, math.min(numPartitions.toLong, hi - lo + 1L)).toInt
          spark.read.jdbc(url, table, f.name, lo, hi, parts, p)
        }
    }
  }
}
