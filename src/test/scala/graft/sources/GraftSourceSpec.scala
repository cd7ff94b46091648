package graft.sources

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The format("graft") surface: read with time travel + pushdown, write
  * with SaveModes, against the reference golden fixtures and our own
  * writes. */
class GraftSourceSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  test("format('graft') reads the golden fixture with time travel options") {
    val simple = TestBase.fixture("simple")
    val latest = spark.read.format("graft").load(simple)
    assert(latest.count() == 200 && latest.columns.length == 4)
    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(simple)
    assert(v0.count() == 100 && v0.columns.length == 3)
    assert(v0.filter(col("count") > 30).count() == 61)
  }

  test("format('graft') write roundtrip with SaveModes and partitioning") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_src").toString + "/tbl"
    val df = (0 until 50).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "k")
    df.write.format("graft").option("partitionBy", "k").save(path)
    df.write.format("graft").mode("append").save(path)
    val back = spark.read.format("graft").load(path)
    assert(back.count() == 100)
    assert(back.filter($"k" === "k1").count() > 0)
    intercept[Exception] { df.write.format("graft").save(path) } // ErrorIfExists
    df.limit(5).write.format("graft").mode("overwrite").save(path)
    assert(spark.read.format("graft").load(path).count() == 5)
  }

  test("filters push through the source API into the engine") {
    val part = TestBase.fixture("partition")
    val df = spark.read.format("graft").option("versionAsOf", 0)
      .load(part).filter(col("col1") === 1)
    assert(df.count() == 21)
  }

  /** Empty-table DDL (`CREATE TABLE (cols…) USING graft`, no AS SELECT):
    * creates commit 0 with metadata + zero adds; a declared schema over
    * an EXISTING table must agree or the DDL refuses. */
  test("CREATE TABLE with explicit columns creates an empty delta table") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ddl").toString + "/tbl"
    spark.sql("DROP TABLE IF EXISTS graft_empty_ddl")
    spark.sql(s"CREATE TABLE graft_empty_ddl (k BIGINT, v STRING) USING graft LOCATION '$path'")
    try {
      assert(spark.table("graft_empty_ddl").count() == 0L)
      assert(graft.delta.DeltaLog.forTable(spark, path).tableExists)
      assert(graft.delta.GraftDelta.readDelta(spark, path).schema.fieldNames.toSeq ==
        Seq("k", "v"))
      // the empty table accepts ordinary engine writes
      graft.sql.GraftSql.sql(spark,
        "INSERT INTO graft_empty_ddl VALUES (1, 'a'), (2, 'b')")
      assert(spark.table("graft_empty_ddl").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b")))
      // re-declaring over the existing table with a DIFFERENT schema refuses
      val e = intercept[Exception] {
        spark.sql("DROP TABLE IF EXISTS graft_empty_ddl2")
        spark.sql(s"CREATE TABLE graft_empty_ddl2 (wrong INT) USING graft LOCATION '$path'")
        spark.table("graft_empty_ddl2").count()
      }
      assert(e.getMessage.contains("does not match"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_empty_ddl")
      spark.sql("DROP TABLE IF EXISTS graft_empty_ddl2")
    }
  }

  /** replaceWhere writer option: predicate-scoped overwrite replaces
    * only the matching partitions and refuses rows that violate the
    * predicate, exactly like the functional API. */
  test("option('replaceWhere') scopes an overwrite to matching partitions") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_rw").toString + "/tbl"
    val df = (1L to 40L).map(i => (i, s"p${i % 4}")).toDF("id", "part")
    df.write.format("graft").option("partitionBy", "part").save(path)
    // replace partition p1 only: ids shift +1000
    (1L to 40L).filter(_ % 4 == 1).map(i => (i + 1000L, "p1")).toDF("id", "part")
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "part = 'p1'").save(path)
    val back = spark.read.format("graft").load(path)
    assert(back.count() == 40)
    assert(back.filter($"part" === "p1").select("id").as[Long].collect().forall(_ > 1000L))
    assert(back.filter($"part" =!= "p1").select("id").as[Long].collect().forall(_ <= 40L))
    // a row OUTSIDE the predicate must fail the write
    val e = intercept[Exception] {
      Seq((9999L, "p2")).toDF("id", "part")
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "part = 'p1'").save(path)
    }
    assert(e.getMessage.toLowerCase.contains("replacewhere"), e.getMessage)
  }

  /** Batch CDF reads through reader options (delta-spark parity): the
    * option-addressed feed must equal the functional tableChanges call
    * bit-for-bit, honor endingVersion bounds, and refuse unbounded or
    * time-travel-combined reads loudly. */
  test("option('readChangeFeed') serves the change feed with version bounds") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_cdf").toString + "/tbl"
    val df = (1L to 30L).map(i => (i, i % 3)).toDF("id", "g")
    graft.delta.GraftDelta.toDelta(df, path)                        // v0
    graft.delta.GraftDelta.enableChangeDataFeed(spark, path)        // v1
    graft.delta.GraftDelta.deleteWhere(spark, path,
      Seq(Seq(graft.delta.Predicate("g", "==", 0L))))               // v2
    graft.delta.GraftDelta.updateWhereWithDv(spark, path,
      Seq(Seq(graft.delta.Predicate("id", "<", 5L))),
      Map("g" -> (col("g") + 10)))                                  // v3
    def canon(d: org.apache.spark.sql.DataFrame) = d
      .select($"id", $"g", $"_change_type", $"_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val viaOpts = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .load(path)
    val direct = graft.delta.GraftDelta.tableChanges(spark, path, 2L)
    assert(canon(viaOpts) == canon(direct) && canon(direct).nonEmpty)
    val bounded = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2).option("endingVersion", 2)
      .load(path)
    assert(canon(bounded) == canon(graft.delta.GraftDelta.tableChanges(spark, path, 2L, Some(2L))))
    val unbounded = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true").load(path)
    }
    assert(unbounded.getMessage.contains("startingVersion"), unbounded.getMessage)
    val mixed = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", 0).option("versionAsOf", 1).load(path)
    }
    assert(mixed.getMessage.contains("cannot combine"), mixed.getMessage)
  }

  /** txnAppId/txnVersion batch idempotency: a retried job re-running the
    * same (appId, version) must SKIP, a later version must append, and
    * an independent appId must be unaffected — plus loud refusal when
    * only one option is set. */
  test("txnAppId/txnVersion make format('graft') batch writes idempotent") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_txn").toString + "/tbl"
    val df = (0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    def writeBatch(app: String, v: Long): Unit =
      df.write.format("graft").mode("append")
        .option("txnAppId", app).option("txnVersion", v).save(path)
    writeBatch("jobA", 1L)
    writeBatch("jobA", 1L) // duplicate attempt: skipped
    assert(spark.read.format("graft").load(path).count() == 10)
    writeBatch("jobA", 0L) // stale replay: skipped
    assert(spark.read.format("graft").load(path).count() == 10)
    writeBatch("jobA", 2L) // next batch: lands
    writeBatch("jobB", 1L) // other app: independent watermark, lands
    assert(spark.read.format("graft").load(path).count() == 30)
    val e = intercept[IllegalArgumentException] {
      df.write.format("graft").mode("append")
        .option("txnAppId", "jobC").save(path)
    }
    assert(e.getMessage.contains("together"), e.getMessage)
  }
}
