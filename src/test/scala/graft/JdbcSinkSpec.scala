package graft

import java.sql.DriverManager
import java.util.Properties

import graft.sinks.JdbcSink

/** cap_sink_jdbc (SURVEY.md §2.A): Derby round-trip — append, idempotent
  * keyed upsert, type fidelity. Derby is the only JDBC backend in this
  * zero-egress image (SURVEY.md §7.5 H3); the MySQL dialect differs only in
  * the upsert statement behind JdbcSink.UpsertDialect.
  */
class JdbcSinkSpec extends SparkSuite {
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val table = "products"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c)
    finally c.close()
  }

  private def readBack() = {
    val props = new Properties()
    spark.read.jdbc(url, table, props)
  }

  test("cap_sink_jdbc: append, then idempotent upsert") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () }
      st.execute(
        s"CREATE TABLE $table (upc BIGINT PRIMARY KEY, name VARCHAR(64), price DOUBLE, loaded_at TIMESTAMP)")
      st.close()
    }
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val initial = Seq(
      (1L, "widget", 9.99, t0),
      (2L, "gadget", 19.99, t0),
      (3L, "gizmo", 29.99, t0)
    ).toDF("upc", "name", "price", "loaded_at")
    JdbcSink.writeAppend(initial, url, table, new Properties())
    assert(readBack().count() == 3)

    // Upsert: key 2 changes price, key 4 is new.
    val delta = Seq(
      (2L, "gadget", 24.99, t0),
      (4L, "doohickey", 5.0, t0)
    ).toDF("upc", "name", "price", "loaded_at")
    JdbcSink.upsert(delta, url, table, keyCols = Seq("upc"))
    val afterFirst = readBack().collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(afterFirst.size == 4)
    assert(afterFirst(2L) == 24.99)
    assert(afterFirst(4L) == 5.0)

    // Idempotence: re-running the same upsert changes nothing.
    JdbcSink.upsert(delta, url, table, keyCols = Seq("upc"))
    val afterSecond = readBack().collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(afterSecond == afterFirst)

    // Type fidelity through the round trip.
    val row = readBack().filter("upc = 1").head()
    assert(row.getString(1) == "widget")
    assert(row.getDouble(2) == 9.99)
    assert(row.getTimestamp(3) == t0)
  }

  test("cap_stream_sink_jdbc: foreachBatch streaming upsert converges under replayed keys") {
    import spark.implicits._
    val streamTable = "stream_products"
    withConn { c =>
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $streamTable")
      catch { case _: java.sql.SQLException => () }
      st.execute(s"CREATE TABLE $streamTable (upc BIGINT PRIMARY KEY, name VARCHAR(64), price DOUBLE)")
      st.close()
    }
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = JdbcSink.streamUpsert(
      ms.toDF().toDF("upc", "name", "price"),
      url,
      streamTable,
      keyCols = Seq("upc"),
      checkpointDir = ckpt)
    try {
      ms.addData((1L, "widget", 9.99), (2L, "gadget", 19.99))
      q.processAllAvailable()
      // second micro-batch re-delivers key 1 (price change) + a new key —
      // the at-least-once replay shape
      ms.addData((1L, "widget", 11.49), (3L, "gizmo", 29.99))
      q.processAllAvailable()
      val rows = spark.read
        .jdbc(url, streamTable, new Properties())
        .collect()
        .map(r => r.getLong(0) -> r.getDouble(2))
        .toMap
      assert(rows == Map(1L -> 11.49, 2L -> 19.99, 3L -> 29.99), s"got $rows")
    } finally q.stop()
  }

  test("upsert tolerates repeated keys within one micro-batch chunk (last wins)") {
    import spark.implicits._
    val dupTable = "dup_products"
    withConn { c =>
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $dupTable")
      catch { case _: java.sql.SQLException => () }
      st.execute(s"CREATE TABLE $dupTable (upc BIGINT PRIMARY KEY, name VARCHAR(64), price DOUBLE)")
      st.close()
    }
    // Two NEW rows with the same key in one partition: the naive two-wave
    // batch protocol double-inserts (PK violation). coalesce(1) pins both
    // rows into one chunk so in-chunk order is the Seq order → last wins.
    val batch = Seq(
      (7L, "first", 1.0),
      (7L, "second", 2.0),
      (8L, "other", 3.0)
    ).toDF("upc", "name", "price").coalesce(1)
    JdbcSink.upsert(batch, url, dupTable, keyCols = Seq("upc"))
    val rows = spark.read
      .jdbc(url, dupTable, new Properties())
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(rows == Set((7L, "second", 2.0), (8L, "other", 3.0)), s"got $rows")
  }

  test("OnDuplicateKeyDialect emits the single-statement MySQL upsert") {
    val sql = JdbcSink.onDuplicateKeySql(
      "products",
      allCols = Seq("upc", "name", "price", "loaded_at"),
      keyCols = Seq("upc"))
    assert(
      sql == "INSERT INTO products (upc, name, price, loaded_at) " +
        "VALUES (?, ?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE name = VALUES(name), price = VALUES(price), " +
        "loaded_at = VALUES(loaded_at)")
  }
}
