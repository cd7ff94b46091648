package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

import java.nio.file.Files

/** Identity columns (delta.identity.* field metadata, writer protocol 6):
  * watermarked allocation on append, GENERATED ALWAYS vs BY DEFAULT,
  * step/start alignment, stability under DML, merge allocation, and the
  * metadata commit that advances the high watermark. */
class IdentityColumnsSpec extends GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_ident")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def meta(start: Long, step: Long, explicitOk: Boolean) =
    new MetadataBuilder()
      .putLong("delta.identity.start", start)
      .putLong("delta.identity.step", step)
      .putBoolean("delta.identity.allowExplicitInsert", explicitOk)
      .build()

  /** Seed frame: (id carrying identity metadata, v). */
  private def seed(ids: Seq[Long], start: Long = 1L, step: Long = 1L,
      explicitOk: Boolean = true) =
    ids.map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("id", col("id").as("id", meta(start, step, explicitOk)))

  private def hwmOf(path: String): Option[Long] = {
    val f = DeltaLog.forTable(spark, path).snapshot(None).schema("id")
    if (f.metadata.contains("delta.identity.highWaterMark"))
      Some(f.metadata.getLong("delta.identity.highWaterMark"))
    else None
  }

  test("create stamps protocol 6 + watermark; appends allocate above it") {
    val path = tmp()
    GraftDelta.toDelta(seed(1L to 7L), path)                              // v0
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.protocol.minWriterVersion == 6)
    // seed values advanced the watermark in the create commit itself
    assert(hwmOf(path).contains(7L))

    // an append WITHOUT the column allocates: unique, aligned, above hwm
    GraftDelta.toDelta(
      (8 to 12).map(i => s"w$i").toDF("v").repartition(3), path, mode = "append") // v1
    val got = GraftDelta.readDelta(spark, path).select($"id", $"v")
      .as[(Long, String)].collect()
    assert(got.length == 12)
    assert(got.map(_._1).distinct.length == 12, "ids must be unique")
    val allocated = got.filter(_._2.startsWith("w")).map(_._1)
    assert(allocated.forall(_ > 7L), s"allocated ids must exceed the watermark: ${allocated.toSeq}")
    assert(allocated.forall(i => (i - 1L) % 1L == 0L))
    // and the append advanced the watermark to cover them
    assert(hwmOf(path).contains(allocated.max))
  }

  test("GENERATED ALWAYS refuses explicit values; BY DEFAULT accepts and covers them") {
    val always = tmp()
    GraftDelta.toDelta(seed(1L to 3L, explicitOk = false), always)
    val e = intercept[IllegalStateException] {
      GraftDelta.toDelta(Seq((99L, "x")).toDF("id", "v"), always, mode = "append")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // omitting the column allocates fine on the same table
    GraftDelta.toDelta(Seq("y").toDF("v"), always, mode = "append")
    assert(GraftDelta.readDelta(spark, always).count() == 4)

    val byDefault = tmp()
    GraftDelta.toDelta(seed(1L to 3L, explicitOk = true), byDefault)
    GraftDelta.toDelta(Seq((100L, "x")).toDF("id", "v"), byDefault, mode = "append")
    // explicit high value covered by the watermark: next allocation goes above
    assert(hwmOf(byDefault).contains(100L))
    GraftDelta.toDelta(Seq("z").toDF("v"), byDefault, mode = "append")
    val zId = GraftDelta.readDelta(spark, byDefault)
      .filter($"v" === "z").select($"id").as[Long].head()
    assert(zId > 100L, s"allocation must clear the explicit value: $zId")
  }

  test("start/step respected, including negative step") {
    val path = tmp()
    // start=100, step=10, no seed rows carrying ids: create from an empty
    // slice then append
    GraftDelta.toDelta(seed(Nil, start = 100L, step = 10L), path)
    GraftDelta.toDelta((1 to 5).map(i => s"a$i").toDF("v"), path, mode = "append")
    val ids = GraftDelta.readDelta(spark, path).select($"id").as[Long].collect()
    assert(ids.length == 5 && ids.distinct.length == 5)
    assert(ids.forall(i => i >= 100L && (i - 100L) % 10L == 0L), ids.toSeq.toString)

    val neg = tmp()
    GraftDelta.toDelta(seed(Nil, start = 0L, step = -5L), neg)
    GraftDelta.toDelta((1 to 4).map(i => s"b$i").toDF("v"), neg, mode = "append")
    val negIds = GraftDelta.readDelta(spark, neg).select($"id").as[Long].collect()
    assert(negIds.forall(i => i <= 0L && (0L - i) % 5L == 0L), negIds.toSeq.toString)
    // negative-step watermark tracks the MINIMUM
    assert(hwmOf(neg).contains(negIds.min))
    GraftDelta.toDelta(Seq("c").toDF("v"), neg, mode = "append")
    val next = GraftDelta.readDelta(spark, neg)
      .filter($"v" === "c").select($"id").as[Long].head()
    assert(next < negIds.min)
  }

  test("identity is stable under DML: SET refused, rewrites preserve ids") {
    val path = tmp()
    GraftDelta.toDelta(seed(1L to 20L).repartition(2), path)
    val e = intercept[IllegalArgumentException] {
      GraftDelta.updateWhere(spark, path,
        Seq(Seq(Predicate("v", "==", "v3"))), Map("id" -> lit(999L)))
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
    // updating another column must carry ids through the rewrite unchanged
    GraftDelta.updateWhere(spark, path,
      Seq(Seq(Predicate("id", "<=", 5L))), Map("v" -> lit("touched")))
    val ids = GraftDelta.readDelta(spark, path).select($"id").as[Long].collect()
    assert(ids.sorted.toSeq == (1L to 20L))
    assert(hwmOf(path).contains(20L), "a rewrite must not move the watermark")
  }

  test("merge allocates ids for inserts, keeps target ids on UpdateAll") {
    val path = tmp()
    GraftDelta.toDelta(seed(1L to 10L), path)
    // source omits the identity column entirely
    val res = GraftDelta.mergeInto(spark, path,
      Seq("v3", "vNew").toDF("v"), on = Seq("v"))
    assert(res.matchedRows == 1L && res.insertedRows == 1L)
    val byV = GraftDelta.readDelta(spark, path).select($"v", $"id")
      .as[(String, Long)].collect().toMap
    assert(byV("v3") == 3L, "UpdateAll keeps the target's identity value")
    assert(byV("vNew") > 10L, "insert allocates above the watermark")
    assert(hwmOf(path).contains(byV("vNew")), "merge advances the watermark")

    // a source CARRYING a GENERATED ALWAYS identity column refuses
    val always = tmp()
    GraftDelta.toDelta(seed(1L to 3L, explicitOk = false), always)
    val e = intercept[IllegalStateException] {
      GraftDelta.mergeInto(spark, always,
        Seq((77L, "q")).toDF("id", "v"), on = Seq("v"))
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
  }

  test("merge with EXPLICIT identity values advances the watermark — later appends never collide") {
    val path = tmp()
    GraftDelta.toDelta(seed(1L to 5L), path) // hwm = 5
    // source CARRIES the identity column (allowExplicitInsert=true) and
    // inserts a value far above the stale watermark; pre-fix the merge
    // path only rebased when the source OMITTED the column, so the
    // watermark stayed at 5 and a later append would march toward 50
    // and silently collide
    GraftDelta.mergeInto(spark, path,
      Seq((50L, "explicit"), (3L, "upd")).toDF("id", "v"), on = Seq("id"))
    assert(hwmOf(path).contains(50L),
      s"merge must cover explicitly-provided ids, got ${hwmOf(path)}")
    GraftDelta.toDelta(Seq("later").toDF("v"), path, mode = "append")
    val got = GraftDelta.readDelta(spark, path).select($"id").as[Long].collect()
    assert(got.distinct.length == got.length,
      s"append after explicit-id merge produced a collision: ${got.sorted.toSeq}")
    assert(got.max > 50L, "allocation must continue above the covered value")
  }

  test("foreign writer-6 table is writable; identity + CDF inserts agree") {
    // foreign protocol: stamp (1,6) via a manual commit, then append
    val path = tmp()
    GraftDelta.toDelta(seed(1L to 4L), path)
    val log = DeltaLog.forTable(spark, path)
    assert(log.snapshot(None).protocol == Protocol(1, 6))

    // CDF + identity: the cdc insert rows must carry EXACTLY the ids the
    // table got (the nondeterministic allocation is evaluated once)
    GraftDelta.enableChangeDataFeed(spark, path)
    GraftDelta.mergeInto(spark, path,
      Seq("vA", "vB").toDF("v"), on = Seq("v"))
    val tableIds = GraftDelta.readDelta(spark, path)
      .filter($"v".isin("vA", "vB")).select($"id").as[Long].collect().toSet
    val cdcIds = GraftDelta.tableChanges(spark, path, 1L)
      .filter($"_change_type" === "insert" && $"v".isin("vA", "vB"))
      .select($"id").as[Long].collect().toSet
    assert(cdcIds == tableIds, s"cdc $cdcIds vs table $tableIds")
  }
}
