package graft.delta

import graft.queries.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the physical plans must be the ones that
  * survive a 100× scale-up — filters pushed to the parquet scan, small
  * dims broadcast, top-k as TakeOrderedAndProject, partition pruning
  * shrinking the file list before the scan exists. */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = Relational.queries(name)(spark, sf)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("q06 filter+projection reach the parquet scan") {
    val p = plan("q06_filter_proj")
    // data filters pushed into the scan (list is truncated in toString;
    // check the leading entries + the DataFilters mirror)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("DataFilters: [isnotnull(l_shipdate"), p)
    // column pruning: the scan reads 6 columns, not all 11
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scanLine.contains("[l_orderkey") && !scanLine.contains("l_returnflag"), scanLine)
  }

  test("q02/q03 broadcast the small dimensions (no shuffle of the probe side)") {
    assert(plan("q02_join_agg").contains("BroadcastHashJoin"))
    assert(plan("q03_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q05 top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q05_topk").contains("TakeOrderedAndProject"))
  }

  test("q01 aggregation is partial (map-side combine before the shuffle)") {
    val df = Relational.queries("q01_agg")(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count") ||
      p.contains("Partial"), p)
  }

  test("t16 decontamination broadcasts the eval grams; corpus side never shuffles text") {
    val df = graft.queries.PipelineQ.queries("t16_decontamination")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    spark.catalog.clearCache()
  }

  test("t15 stable split is a narrow projection + one partial aggregation") {
    val df = graft.queries.PipelineQ.queries("t15_stable_split")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    // one agg exchange + the final orderBy's range partitioning, no more
    // (count only the AQE final plan, not the echoed initial plan).
    // Spread.adaptive's round-robin read fan-out is excluded: it exists
    // only when the scan has fewer splits than cores (single-row-group
    // local testdata) and is a provable no-op at production split counts.
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.toLowerCase.contains("roundrobin"))
    assert(exchanges <= 2, s"$exchanges keyed exchanges:\n$finalPlan")
  }

  test("t20 e2e pipeline: eval grams broadcast; vocab top-k never sorts globally") {
    val df = graft.queries.PipelineQ.queries("t20_pipeline_e2e")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // decontamination inside the composed plan still broadcasts the
    // (tiny) eval-gram side rather than shuffling the corpus against it
    assert(p.contains("BroadcastHashJoin"), p)
    spark.catalog.clearCache()

    val vocab = graft.queries.PipelineQ.queries("t19_vocab")(spark, sf)
    vocab.collect()
    val vp = vocab.queryExecution.executedPlan.toString
    assert(vp.contains("TakeOrderedAndProject"), vp)
    assert(vp.contains("partial_count"), vp)
  }

  test("minhash/simhash signatures plan with ZERO exchanges (row-local, shuffle-free)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sig = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    sig.collect()
    val p = sig.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"minhash signature plan shuffles:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("ObjectHashAggregate"),
      s"minhash signature plan aggregates:\n$p")

    val ssig = graft.operators.Dedup.simhashSignatures(docs, "doc_id", "text")
    ssig.collect()
    val sp = ssig.queryExecution.executedPlan.toString
    assert(!sp.contains("Exchange"), s"simhash signature plan shuffles:\n$sp")
    assert(!sp.contains("HashAggregate") && !sp.contains("ObjectHashAggregate"),
      s"simhash signature plan aggregates:\n$sp")
  }

  test("as-of join sweeps with ONE exchange in both directions — no join operator") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/events.parquet")
    val ev = graft.queries.EventsIO.withTsUs(spark, sf)
    val probes = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val states = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    Seq("backward", "forward").foreach { dir =>
      val out = graft.operators.AsofJoin.asofJoin(probes, states,
        Seq("user_id"), "ts_us", "ts_us", Seq("event_id", "value"), direction = dir)
      out.collect()
      // AQE's toString repeats the plan under "== Initial Plan ==" —
      // count exchanges in the final section only
      val p = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges <= 1, s"$dir as-of join should shuffle once:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"),
        s"$dir as-of join must not plan a join operator:\n$p")
    }
  }

  test("t28 keyword search: top-k heaps, partial aggregation, tiny sides broadcast") {
    val df = graft.queries.PipelineQ.queries("t28_keyword_search")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // top-k must be per-partition heaps, never a global sort of scores
    assert(p.contains("TakeOrderedAndProject"), p)
    // tf aggregation partial-aggregates the filtered tokens map-side
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    // df/N sides are ≤|terms|+1 rows — they broadcast into the scoring
    // join; the corpus-sized tf side must never be the build side
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("delta partition pruning shrinks the scanned file set before the scan") {
    val path = java.nio.file.Files.createTempDirectory("graft_plan").toString + "/tbl"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    GraftDelta.toDelta(orders, path, partitionBy = Seq("o_orderstatus"))
    val all = GraftDelta.readDelta(spark, path)
    val pruned = GraftDelta.readDelta(spark, path,
      filters = Seq(Seq(Predicate("o_orderstatus", "==", "O"))))
    assert(pruned.inputFiles.length < all.inputFiles.length)
    assert(pruned.inputFiles.forall(_.contains("o_orderstatus=O")))
    // row-level predicates still push to parquet below the delta scan
    val rowFiltered = GraftDelta.readDelta(spark, path,
      filters = Seq(Seq(Predicate("o_totalprice", ">", 1000))))
    val p = rowFiltered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("o_totalprice"), p)
  }

  test("delta snapshot never scans pruned partitions' files at log level") {
    val path = java.nio.file.Files.createTempDirectory("graft_plan2").toString + "/tbl"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    GraftDelta.toDelta(orders, path, partitionBy = Seq("o_orderstatus"))
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    val files = DeltaRead.prunedFiles(snap, Seq(Seq(Predicate("o_orderstatus", "in", Seq("O", "F")))))
    assert(files.map(_.partitionValues("o_orderstatus")).toSet == Set("O", "F"))
  }

  test("t30 temperature mix: rank and count windows share ONE exchange") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.Sampling.temperatureRebalance(
      spark.read.parquet(s"$sf/documents.parquet"), "lang", "doc_id", perSqrt = 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both windows are partitioned by lang: Catalyst plans them over the
    // same hashpartitioning — a second Exchange would mean the windows
    // didn't share their shuffle. (AQE's toString repeats the plan as
    // "Initial Plan" — count the final section only.)
    val finalSection = p.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, found $exchanges:\n$p")
  }

  test("t32 bloom decontamination never joins or shuffles gram text") {
    val df = graft.queries.PipelineQ.queries("t32_bloom_decontam")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the sketch is a broadcast literal, not a join side: the only joins
    // would come from a mis-ported exact path
    assert(!p.contains("Join"), s"bloom path must be join-free:\n$p")
    // the gram column is consumed scan-side: every exchange carries only
    // (doc_id, count) aggregation rows, never the exploded gram strings
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.forall(!_.contains("gram")),
      s"gram text crossed an exchange:\n${exchangeLines.mkString("\n")}")
    spark.catalog.clearCache()
  }

  test("t41 LM scoring: no cartesian products, V broadcast, partial aggregation") {
    val df = graft.queries.PipelineQ.queries("t41_lm_score")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"LM scoring must never plan a cartesian product:\n$p")
    // the one-row vocab-size side joins as a broadcast nested loop over
    // literally one row (crossJoin(broadcast(v))) — never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"V must broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"gram counts must combine map-side:\n$p")
    spark.catalog.clearCache()
  }

  test("t42 group centroids: map-side combine, no collect-to-driver operators") {
    val df = graft.queries.PipelineQ.queries("t42_group_centroids")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"per-(group,pos) sums must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    spark.catalog.clearCache()
  }

  test("partitioned shallow clone with 500+ partitions plans ONE scan relation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_clone")
    dir.toFile.deleteOnExit()
    val src = s"$dir/src"
    val clone = s"$dir/clone"
    // 512 partitions, a few rows each — the shape that used to build a
    // 512-relation union (plan size and analyzer cost O(#partitions))
    GraftDelta.toDelta(
      spark.range(0, 2048).select(($"id" % 512).cast("long").as("p"), $"id".as("v")),
      src, partitionBy = Seq("p"))
    GraftDelta.shallowClone(spark, src, clone)
    val df = GraftDelta.readDelta(spark, clone)
    assert(df.agg(sum($"v")).head().getLong(0) == (0L until 2048L).sum)
    assert(df.filter($"p" === 7L).count() == 4L)
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected ONE scan relation, got $scans:\n${p.take(2000)}")
    assert(!p.contains("Union"), s"per-partition union must be gone:\n${p.take(2000)}")
    // log-level pruning still bites through the clone: a partition
    // predicate plans only that partition's file(s)
    val pruned = DeltaRead.load(spark, clone,
      filters = Seq(Seq(Predicate("p", "==", 3L))))
    assert(pruned.count() == 4L)
    val prunedScan = pruned.queryExecution.executedPlan.toString
    assert(prunedScan.contains("FileScan parquet"), prunedScan)
  }

  test("mapped partitioned scans also plan ONE relation (no per-partition union)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_mapped")
    dir.toFile.deleteOnExit()
    val path = s"$dir/tbl"
    GraftDelta.toDelta(
      spark.range(0, 512).select(($"id" % 64).cast("long").as("p"), $"id".as("v")),
      path, partitionBy = Seq("p"))
    GraftDelta.enableColumnMapping(spark, path)
    GraftDelta.renameColumn(spark, path, "v", "value")
    val df = GraftDelta.readDelta(spark, path)
    assert(df.agg(sum($"value")).head().getLong(0) == (0L until 512L).sum)
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected ONE scan relation for 64 partitions, got $scans")
    assert(!p.contains("Union"), p.take(1500))
  }

  test("t33 skew join broadcasts only the hot-key set; both arms hash-join") {
    val df = graft.queries.PipelineQ.queries("t33_skew_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Union"), s"expected the hot/cold two-arm union:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"hot-key semi/anti must broadcast:\n$p")
    spark.catalog.clearCache()
  }

  test("t45 BM25: term filter scan-side, no global sort, no cartesian") {
    val df = graft.queries.PipelineQ.queries("t45_bm25_rank")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the final top-k must not be a full sort of the scored corpus
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // tf×df×stats combine via hash joins — a cartesian/nested-loop would
    // mean the tiny sides failed to join on the term key
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the term filter runs before any exchange: the exploded token column
    // filters in the same stage as the scan (corpus text never shuffles)
    val firstExchange = p.linesIterator.indexWhere(_.contains("Exchange"))
    val scanIdx = p.linesIterator.toSeq.lastIndexWhere(_.contains("FileScan parquet"))
    assert(firstExchange >= 0 && scanIdx > firstExchange,
      s"scan must sit below every exchange (filter scan-side):\n$p")
    spark.catalog.clearCache()
  }

  test("t46 typo pairs: variant candidates hash-join, never a cartesian") {
    val df = graft.queries.PipelineQ.queries("t46_typo_pairs")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"deletion-variant join must be an equi hash join:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    spark.catalog.clearCache()
  }
}
