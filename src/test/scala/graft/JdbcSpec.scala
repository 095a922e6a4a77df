package graft

import java.sql.DriverManager

import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** Real-JDBC round-trip (reference O1/O2 scans + O17–O21 upsert
  * writers) against embedded Apache Derby — the only SQL database on
  * the sandbox classpath (it ships with Spark for the Hive metastore).
  */
class JdbcSpec extends SparkTestBase {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withStmt(f: java.sql.Statement => Unit): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); try f(st) finally st.close() }
    finally conn.close()
  }

  test("partitioned JDBC read matches source, filter is pushed down") {
    withStmt { st =>
      st.executeUpdate(
        "CREATE TABLE customers (c_custkey BIGINT PRIMARY KEY, " +
          "c_name VARCHAR(64), c_acctbal DOUBLE)")
    }
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("c_acctbal"))
    Jdbc.writeAppend(cust, url, "customers", driver)

    val n = cust.count()
    val bounds = cust.agg(min("c_custkey"), max("c_custkey")).collect()(0)
    val back = Jdbc.read(spark, url, "customers", driver,
      "c_custkey", bounds.getLong(0), bounds.getLong(1), 4)
    assert(back.count() === n)
    // partition-parallel: the scan really is 4 range slices
    assert(back.rdd.getNumPartitions === 4)
    // predicate pushdown reaches the JDBC scan node (Derby uppercases
    // unquoted identifiers)
    val plan = back.filter(col("c_acctbal") > 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.toUpperCase.contains("GREATERTHAN(C_ACCTBAL"), plan)
    val posJdbc = back.filter(col("c_acctbal") > 0).count()
    val posLocal = cust.filter(col("c_acctbal") > 0).count()
    assert(posJdbc === posLocal)
  }

  test("batched keyed upsert: insert-new + update-existing, LWW in batch") {
    withStmt { st =>
      st.executeUpdate(
        "CREATE TABLE dim_state (user_id BIGINT PRIMARY KEY, " +
          "state VARCHAR(32), seq BIGINT)")
    }
    import spark.implicits._
    val initial = Seq(
      (1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L)
    ).toDF("user_id", "state", "seq")
    Jdbc.writeAppend(initial, url, "dim_state", driver)

    // updates hit keys 2,3 (key 3 twice — LWW must keep seq 22), key 4 is new
    val updates = Seq(
      (2L, "b2", 20L), (3L, "c2", 21L), (3L, "c3", 22L), (4L, "d", 20L)
    ).toDF("user_id", "state", "seq")
    Jdbc.upsert(updates, url, "dim_state", driver,
      keyCols = Seq("user_id"), seqCol = "seq", batchSize = 2)

    val got = Jdbc.readWhole(spark, url, "dim_state", driver)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> ("a", 10L), 2L -> ("b2", 20L), 3L -> ("c3", 22L), 4L -> ("d", 20L)))
  }

  test("upsert is idempotent (exactly-once effect on replay)") {
    withStmt { st =>
      st.executeUpdate(
        "CREATE TABLE dim_replay (k BIGINT PRIMARY KEY, v VARCHAR(32), seq BIGINT)")
    }
    import spark.implicits._
    val batch = Seq((1L, "x", 1L), (2L, "y", 1L)).toDF("k", "v", "seq")
    Jdbc.upsert(batch, url, "dim_replay", driver, Seq("k"), "seq")
    Jdbc.upsert(batch, url, "dim_replay", driver, Seq("k"), "seq") // replay
    val got = Jdbc.readWhole(spark, url, "dim_replay", driver)
    assert(got.count() === 2)
  }

  test("CDC apply: deletes remove, updates win by seq, inserts land") {
    withStmt { st =>
      st.executeUpdate(
        "CREATE TABLE dim_cdc (k BIGINT PRIMARY KEY, v VARCHAR(32), seq BIGINT)")
    }
    import spark.implicits._
    val initial = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "v", "seq")
    Jdbc.writeAppend(initial, url, "dim_cdc", driver)

    // key 1: updated twice (seq 3 wins); key 2: deleted; key 3:
    // update then delete then re-insert (seq 4 wins); key 4: fresh
    val log = Seq(
      (1L, "U", "a2", 2L), (1L, "U", "a3", 3L),
      (2L, "D", null, 2L),
      (3L, "U", "c2", 2L), (3L, "D", null, 3L), (3L, "I", "c4", 4L),
      (4L, "I", "d", 2L)
    ).toDF("k", "op", "v", "seq")
    Jdbc.applyCdc(log, url, "dim_cdc", driver,
      keyCols = Seq("k"), seqCol = "seq", opCol = "op")

    val got = Jdbc.readWhole(spark, url, "dim_cdc", driver)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a3", 3L -> "c4", 4L -> "d"))
  }

  test("streaming foreachBatch upsert maintains a keyed dimension") {
    withStmt { st =>
      st.executeUpdate(
        "CREATE TABLE dim_last_event (user_id BIGINT PRIMARY KEY, " +
          "event_type VARCHAR(64), es BIGINT)")
    }
    // `ts` arrives as raw epoch-nanos LongType (see Tables.events): LWW
    // sequences directly on it, no truncation needed
    val events = graft.streaming.StreamingPipeline.readEvents(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts").as("es"))
    val q = events.writeStream
      .outputMode("update")
      .foreachBatch(Jdbc.upsertBatchFn(url, "dim_last_event", driver,
        keyCols = Seq("user_id"), seqCol = "es"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-jdbc").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    // the dimension holds exactly one row per user, and it is a state
    // the user actually had at that timestamp
    val dim = Jdbc.readWhole(spark, url, "dim_last_event", driver)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(dim.count() === users)
    val joined = dim.as("d").join(
      Tables.events(spark, sf)
        .select(col("user_id"), col("event_type"), col("ts").as("es")).as("e"),
      Seq("user_id", "event_type", "es"), "left_semi")
    assert(joined.count() === users)
  }

  test("mysql dialect upsert SQL matches the reference's ON DUPLICATE KEY form") {
    val sql = Jdbc.mysqlUpsertSql("product_table",
      Seq("productId", "productName", "productPrice"), Seq("productId"))
    assert(sql ===
      "INSERT INTO product_table (productId, productName, productPrice) " +
        "VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE productName = VALUES(productName), " +
        "productPrice = VALUES(productPrice)")
  }
}
