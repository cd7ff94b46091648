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
    spark.stop()
  }
}
