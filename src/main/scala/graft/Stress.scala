package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale stress for the dedup pipeline: sf0.1 documents replicated
  * K× with per-copy word perturbations — every original becomes a K-clique
  * of near-dups, so pair volume scales quadratically in K. Not part of the
  * bench; run manually to probe headroom. */
object Stress {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    val copies = spark.range(k).crossJoin(base)
      .select(($"doc_id" * k + $"id").as("doc_id"),
        // perturb: append a copy-specific token so copies are near- not exact-dups
        concat($"text", lit(" copytoken"), $"id".cast("string")).as("text"))
    val n = copies.count()
    println(s"[stress] corpus: $n docs")
    var t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minhashNearDups(copies, "doc_id", "text", 0.5)
    val np = pairs.count()
    println(f"[stress] minhash pairs: $np in ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val clusters = graft.operators.Dedup.nearDupClusters(pairs)
    val nc = clusters.select("cluster_id").distinct().count()
    println(f"[stress] clusters: $nc in ${(System.nanoTime()-t0)/1e9}%.1f s")

    // ---- DML at scale: a multi-million-row clustered table --------------
    import graft.delta.{DeltaDml, GraftDelta, Predicate}
    val rows = 5000000L
    val path = java.nio.file.Files.createTempDirectory("graft_stress_dml").toString + "/t"
    t0 = System.nanoTime()
    GraftDelta.toDelta(
      spark.range(rows).select($"id",
        (rand(7) * 1000).cast("long").as("score"),
        concat(lit("payload-"), $"id").as("v"))
        .repartitionByRange(64, $"id"),
      path)
    println(f"[stress] staged $rows%,d-row table (64 files) in ${(System.nanoTime()-t0)/1e9}%.1f s")

    t0 = System.nanoTime()
    val del = GraftDelta.deleteWhere(spark, path,
      Seq(Seq(Predicate("id", ">=", 1000000L), Predicate("id", "<", 1050000L))))
    println(f"[stress] DELETE 1%% slice: ${del.affectedRows}%,d rows, " +
      f"${del.rewrittenFiles} of 64 files rewritten in ${(System.nanoTime()-t0)/1e9}%.1f s")

    t0 = System.nanoTime()
    val src = spark.range(2000000L, 2100000L).select($"id",
      lit(-1L).as("score"), lit("merged").as("v"))
      .unionByName(spark.range(rows, rows + 100000L).select($"id",
        lit(-2L).as("score"), lit("inserted").as("v")))
    val mrg = GraftDelta.mergeInto(spark, path, src, on = Seq("id"))
    println(f"[stress] MERGE 100k upd + 100k ins: matched ${mrg.matchedRows}%,d, " +
      f"inserted ${mrg.insertedRows}%,d, ${mrg.removedFiles} files rewritten " +
      f"in ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
