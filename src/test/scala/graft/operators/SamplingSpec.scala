package graft.operators

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reproducibility pins for deterministic sampling: membership must be a
  * pure function of the id — invariant under repartitioning (the exact
  * property `df.sample()` lacks) — and splits must partition the corpus
  * exhaustively with roughly the requested proportions. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  test("sample membership is invariant under repartitioning") {
    import spark.implicits._
    val df = (1L to 20000L).toDF("id")
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.deterministicSample(d, "id", 1000).select("id")
        .collect().map(_.getLong(0)).toSet
    val a = ids(df)
    val b = ids(df.repartition(17, col("id") % 3))
    val c = ids(df.coalesce(1))
    assert(a == b && b == c, "sample drifted under repartitioning")
    // ~10% requested; LCG bucketing should land within ±2 percentage points
    assert(math.abs(a.size / 20000.0 - 0.10) < 0.02, s"sample fraction ${a.size / 20000.0}")
  }

  test("stratifiedSample keeps exactly n per group, stable under repartitioning") {
    import spark.implicits._
    // group sizes 30 / 300 / 3000: below, at, and above n
    val df = ((1L to 30L).map(i => ("small", i * 7)) ++
      (1L to 300L).map(i => ("mid", 100000L + i)) ++
      (1L to 3000L).map(i => ("big", 200000L + i))).toDF("g", "id")
    def sample(d: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
      Sampling.stratifiedSample(d, "g", "id", 300).select("g", "id")
        .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val a = sample(df)
    assert(a("small").size == 30, "undersized groups keep every row")
    assert(a("mid").size == 300 && a("big").size == 300, "capped at n")
    val b = sample(df.repartition(13, col("id") % 5))
    assert(a == b, "stratified membership drifted under repartitioning")
    // growing a group only ever swaps members by hash rank — adding rows
    // with losing hashes leaves the sample untouched; pin determinism by
    // re-running on a shuffled row order
    val c = sample(df.orderBy(rand(42)))
    assert(a == c, "row order must not matter")
  }

  test("stableSplit partitions exhaustively with requested proportions") {
    import spark.implicits._
    val df = (1L to 50000L).toDF("id")
    val bySplit = Sampling.stableSplit(df, "id", 8000, 1000)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == 50000L)
    assert(bySplit.keySet == Set("train", "eval", "test"))
    assert(math.abs(bySplit("train") / 50000.0 - 0.8) < 0.02, bySplit.toString)
    assert(math.abs(bySplit("eval") / 50000.0 - 0.1) < 0.02, bySplit.toString)
    // a row's split never changes when the corpus grows
    val before = Sampling.stableSplit(df.limit(1000), "id", 8000, 1000)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Sampling.stableSplit(df, "id", 8000, 1000)
      .filter(col("id") <= 1000).select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after, "split drifted as the corpus grew")
  }

  test("weightedMix samples each source at its weight") {
    import spark.implicits._
    val s1 = (1L to 10000L).toDF("id").withColumn("src", lit("a"))
    val s2 = (10001L to 20000L).toDF("id").withColumn("src", lit("b"))
    val mixed = Sampling.weightedMix(Seq((s1, 5000), (s2, 1000)), "id")
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(mixed("a") / 10000.0 - 0.5) < 0.03, mixed.toString)
    assert(math.abs(mixed("b") / 10000.0 - 0.1) < 0.03, mixed.toString)
  }

  test("temperatureRebalance keeps min(n, perSqrt*floor(sqrt(n))) per group, stably") {
    import spark.implicits._
    // group sizes 3 / 9 / 10000: quota below size, exactly at the sqrt
    // knee, and a head group squashed by orders of magnitude
    val df = ((1L to 3L).map(i => ("tiny", i)) ++
      (1L to 9L).map(i => ("knee", 100L + i)) ++
      (1L to 10000L).map(i => ("head", 10000L + i))).toDF("g", "id")
    def run(d: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
      Sampling.temperatureRebalance(d, "g", "id", perSqrt = 2)
        .select("g", "id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val a = run(df)
    assert(a("tiny").size == 2, s"min(3, 2*floor(sqrt 3)) = 2, got ${a("tiny").size}")
    assert(a("knee").size == 6, s"min(9, 2*3) = 6, got ${a("knee").size}")
    assert(a("head").size == 200, s"min(10000, 2*100) = 200, got ${a("head").size}")
    val b = run(df.repartition(11, col("id") % 7))
    assert(a == b, "temperature mix membership drifted under repartitioning")
  }

  test("deterministicShuffle: order is a pure function of (id, seed); shards are contiguous") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("id")
    def order(d: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      Sampling.deterministicShuffle(d, "id", seed, shards = 4)
        .select("id").as[Long].collect().toSeq
    val a = order(df, 42L)
    // repartition-proof: identical order from any input layout
    assert(a == order(df.repartition(13, col("id") % 5), 42L),
      "shuffle order drifted under repartitioning")
    // a different seed is a different permutation of the same set
    val c = order(df, 43L)
    assert(c != a && c.toSet == a.toSet)
    // actually shuffled: not the identity order
    assert(a != (1L to 5000L).toSeq)
    // shards are CONTIGUOUS slices of the shuffled order: walking the
    // order, the shard number never decreases
    val shards = Sampling.deterministicShuffle(df, "id", 42L, shards = 4)
      .select("shard").as[Long].collect().toSeq
    assert(shards == shards.sorted, "shards must slice the shuffled order contiguously")
    assert(shards.distinct.sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("groupAwareSplit keeps every cluster in one split; singletons match stableSplit") {
    import spark.implicits._
    val docs = (1L to 2000L).toDF("doc_id")
    // synthetic clusters: docs 1..300 clustered in threes on the smallest
    // member — mixing ids whose OWN splits would differ
    val clusters = (1L to 300L).map(i => (i, ((i - 1) / 3) * 3 + 1))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.groupAwareSplit(docs, "doc_id", clusters, 8000, 1000)
      .persist()
    // 1. leakage-impossible: every cluster maps to exactly one split
    val straddle = out.join(clusters, "doc_id")
      .groupBy("cluster_id").agg(countDistinct($"split").as("ns"))
      .filter($"ns" > 1).count()
    assert(straddle == 0)
    // 2. a cluster's split IS the representative's own stable split
    val repSplit = Sampling.stableSplit(
        clusters.select($"cluster_id".as("doc_id")).distinct(), "doc_id", 8000, 1000)
      .select($"doc_id".as("cluster_id"), $"split".as("rep_split"))
    assert(out.join(clusters, "doc_id").join(repSplit, "cluster_id")
      .filter($"split" =!= $"rep_split").count() == 0)
    // 3. unclustered docs split exactly as stableSplit would
    val single = Sampling.stableSplit(docs.filter($"doc_id" > 300L), "doc_id", 8000, 1000)
      .select($"doc_id", $"split".as("own_split"))
    assert(out.join(single, "doc_id").filter($"split" =!= $"own_split").count() == 0)
    // 4. pure function of (id, cluster map): repartition-invariant
    val re = Sampling.groupAwareSplit(docs.repartition(13), "doc_id",
        clusters.repartition(7), 8000, 1000)
      .select($"doc_id", $"split".as("s2"))
    assert(out.join(re, "doc_id").filter($"split" =!= $"s2").count() == 0)
    out.unpersist()
  }

  test("groupAwareSplit takes custom group column names and survives a __rep column") {
    import spark.implicits._
    // caller's cluster frame uses its own naming, and the data frame
    // already carries a __rep column (the old internal join name) plus a
    // stray doc_id that must NOT be joined through (r12 ADVICE)
    val docs = (1L to 500L).map(i => (i, s"payload$i", i + 7000L))
      .toDF("doc_id", "__rep", "other_id")
    val groups = (1L to 90L).map(i => (i, ((i - 1) / 3) * 3 + 1))
      .toDF("member", "keeper")
    val out = Sampling.groupAwareSplit(docs, "doc_id", groups, 8000, 1000,
      groupIdCol = "member", groupRepCol = "keeper").persist()
    assert(out.columns.toSeq == Seq("doc_id", "__rep", "other_id", "split"),
      out.columns.mkString(","))
    // the caller's __rep column passes through untouched
    assert(out.filter($"__rep" =!= concat(lit("payload"), $"doc_id")).count() == 0)
    val straddle = out.join(groups, $"doc_id" === $"member")
      .groupBy("keeper").agg(countDistinct($"split").as("ns"))
      .filter($"ns" > 1).count()
    assert(straddle == 0)
    // a groups frame missing the named columns refuses loudly
    val e = intercept[IllegalArgumentException](
      Sampling.groupAwareSplit(docs, "doc_id", groups, 8000, 1000))
    assert(e.getMessage.contains("doc_id"), e.getMessage)
    out.unpersist()
  }

  test("importanceSelect: weights match a pure-Scala reference; target-like docs rank first") {
    import spark.implicits._
    // two dialects: A-docs share a vocabulary with the target, B-docs don't
    val aWords = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val bWords = Array("omega", "sigma", "tau", "rho", "phi")
    val rnd = new scala.util.Random(5)
    def doc(vocab: Array[String], seed: Int) = {
      val r = new scala.util.Random(seed)
      Seq.fill(12)(vocab(r.nextInt(vocab.length))).mkString(" ")
    }
    val docs = ((1L to 10L).map(i => (i, doc(aWords, i.toInt))) ++
      (11L to 40L).map(i => (i, doc(bWords, i.toInt)))).toDF("doc_id", "text")
    val target = (100L to 104L).map(i => (i, doc(aWords, i.toInt))).toDF("tid", "ttext")

    // weight table vs a pure-Scala reference (same gram contract as the
    // t51 kernel: literal-space unigrams + bigrams with whole-text fallback)
    val P = 1000000007L
    def h31(g: String): Long = {
      var h = 0L; var i = 0
      while (i < g.length) { h = (31L * h + g.codePointAt(i)) % P; i += Character.charCount(g.codePointAt(i)) }
      h
    }
    def gramsOf(s: String): Seq[String] = {
      val ws = s.split(" ", -1)
      ws.toSeq ++ (if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Seq(s))
    }
    val d = 256
    def refCounts(rows: Seq[String]): Map[Int, Long] =
      rows.flatMap(gramsOf).groupBy(g => (h31(g) % d).toInt)
        .map { case (b, gs) => b -> gs.size.toLong }
    val tcRef = refCounts(target.select("ttext").as[String].collect().toSeq)
    val rcRef = refCounts(docs.select("text").as[String].collect().toSeq)
    val expect = IndexedSeq.tabulate(d) { b =>
      math.min(Int.MaxValue.toLong,
        (tcRef.getOrElse(b, 0L) + 1L) * 1000L / (rcRef.getOrElse(b, 0L) + 1L)).toInt
    }
    assert(Sampling.importanceWeights(target, "ttext", docs, "text", d = d) == expect)

    // top-10 selection = exactly the A-dialect (target-like) docs
    val selected = Sampling.importanceSelect(docs, "doc_id", "text",
      target, "ttext", k = 10, d = d)
      .select("doc_id").as[Long].collect().toSet
    assert(selected == (1L to 10L).toSet, s"selected $selected")
    // repartition-invariant
    val again = Sampling.importanceSelect(docs.repartition(7), "doc_id", "text",
      target, "ttext", k = 10, d = d)
      .select("doc_id").as[Long].collect().toSet
    assert(again == selected)
  }

  test("tokenBudgetSample: budget binds per group, deterministic, never crosses") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 200L).map { id =>
      val words = 5 + rnd.nextInt(20)
      (id, Seq.fill(words)("w" + rnd.nextInt(50)).mkString(" "), s"src${id % 4}")
    }.toDF("doc_id", "text", "source")
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
      defaultBudget = 120L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // every group present, every group's cum stays within budget, and the
    // budget BINDS (not everything kept — each group carries ~700 tokens)
    val byGroup = out.groupBy(_._2)
    assert(byGroup.keySet == Set("src0", "src1", "src2", "src3"))
    byGroup.foreach { case (g, rows) =>
      val maxCum = rows.map(_._4).max
      assert(maxCum <= 120L, s"$g crossed its budget: $maxCum")
      // the NEXT doc would have crossed: cum + min token count > budget is
      // not provable per-row, but the kept set must be a strict subset
      assert(rows.length < 50, s"$g: budget must bind (kept ${rows.length}/50)")
      // cum_tokens is the running sum of n_tokens in output order
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).sum == sorted.last._4)
    }
    // deterministic + repartition-invariant
    val again = Sampling.tokenBudgetSample(docs.repartition(7), "doc_id", "text",
      "source", defaultBudget = 120L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // per-group budget overrides: src0 gets 0 tokens → absent entirely
    val zeroed = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
      defaultBudget = 120L, budgets = Map("src0" -> 0L))
      .select("source").as[String].collect().toSet
    assert(zeroed == Set("src1", "src2", "src3"))
  }

  test("tokenBudgetSample: exact vs brute-force prefix incl. zero-token boundary docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // empty texts (0 tokens) interleave with real docs, so the
    // exact-budget boundary + zero-mass-row edge of the threshold bound
    // is exercised: a zero-token doc sitting right AT cum == budget must
    // keep/drop identically to the unbounded window formula
    val docs = (1L to 400L).map { id =>
      val words = if (id % 7 == 0) 0 else 1 + rnd.nextInt(12)
      (id, Seq.fill(words)("w" + rnd.nextInt(30)).mkString(" "), s"s${id % 3}")
    }.toDF("doc_id", "text", "source")
    for (budget <- Seq(0L, 37L, 200L, 100000L)) {
      val got = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
          defaultBudget = budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      // brute-force reference: full per-group sort + running sum in Scala
      val proj = docs.select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
          Sampling.shuffleKey(col("doc_id"), 7L).as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val want = proj.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._4, r._1)).flatMap { r =>
          cum += r._3
          if (cum <= budget) Some((r._1, g, r._3, cum)) else None
        }
      }.toSet
      assert(got == want, s"budget $budget drifted from the brute-force prefix")
    }
  }

  test("bounded-window plan pin: threshold bounds the window input (VERDICT r15 #1)") {
    import spark.implicits._
    // one hot source with ~25k tokens against an 800-token budget: the
    // running-sum window must see ~the kept prefix, not the whole source
    val docs = (1L to 5000L).map(id =>
      (id, Seq.fill(5)("w" + id % 97).mkString(" "), "hot")).toDF("doc_id", "text", "source")
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
      defaultBudget = 800L)
    // 1) the physical plan carries the broadcast threshold filter — the
    //    window's input is the thresholded join, not the raw scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__thr"), s"threshold filter missing from plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"threshold must arrive via broadcast:\n$plan")
    // 2) behavioral bound: the frame actually entering the window is a
    //    small multiple of the kept set, never the whole group
    val proj = docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        Sampling.shuffleKey(col("doc_id"), 7L).as("__h"))
      .withColumn("__m", col("n_tokens"))
    val boundedRows = Sampling.boundedPrefix(proj, "source", (_, _) => 800L).count()
    val kept = out.count()
    assert(kept >= 100, s"budget should keep ~160 five-token docs, got $kept")
    assert(boundedRows < 5000 / 4,
      s"window input $boundedRows must be far below the 5000-row group")
    assert(boundedRows.toDouble / kept < 4.0,
      s"window input $boundedRows vs kept $kept — threshold too loose")
    // 3) stratified + temperature ride the same bound
    val stratPlan = Sampling.stratifiedSample(
      docs.withColumn("g", lit("hot")), "g", "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(stratPlan.contains("__thr"), "stratifiedSample lost the threshold bound")
    val tempPlan = Sampling.temperatureRebalance(
      docs.withColumn("g", lit("hot")), "g", "doc_id", perSqrt = 2)
      .queryExecution.executedPlan.toString
    assert(tempPlan.contains("__thr"), "temperatureRebalance lost the threshold bound")
  }

  test("bounded samplers keep NULL and non-string groups intact") {
    import spark.implicits._
    // a NULL group must survive the broadcast threshold join (equality
    // join would silently drop it — the NullGroupKey sentinel keeps it
    // as its own partition, matching window semantics)
    val docs = (1L to 300L).map { id =>
      val g = if (id % 3 == 0) null else s"s${id % 2}"
      (id, Seq.fill(4)("w").mkString(" "), g)
    }.toDF("doc_id", "text", "source")
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "text", "source",
        defaultBudget = 40L)
      .collect().map(r => (Option(r.getString(1)), r.getLong(3)))
    val byG = out.groupBy(_._1)
    assert(byG.keySet == Set(None, Some("s0"), Some("s1")),
      s"null group lost: ${byG.keySet}")
    byG.foreach { case (g, rows) =>
      assert(rows.map(_._2).max == 40L, s"$g must fill its 40-token budget")
    }
    // non-string group column: the histogram round-trips through the
    // driver as a string — an INT group must not ClassCastException
    val intGrouped = (1L to 200L).map(id => (id, "a b c", (id % 4).toInt))
      .toDF("doc_id", "text", "grp")
    val got = Sampling.stratifiedSample(intGrouped, "grp", "doc_id", 10)
      .groupBy("grp").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 10L), got.toString)
  }

  test("stratified/temperature exactness vs the unbounded window formula") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (1L to 6000L).map(id => (s"g${rnd.nextInt(5)}", id)).toDF("g", "id")
    // reference: full sort by (bucket, id) in Scala, take quota
    val proj = df.select(col("g"), col("id"),
        Sampling.hashBucket(col("id"), 1 << 20).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def refTake(quota: Map[String, Long]): Set[(String, Long)] =
      proj.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(quota(g).toInt).map(r => (g, r._2))
      }.toSet
    val sizes = proj.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val gotStrat = Sampling.stratifiedSample(df, "g", "id", 100)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(gotStrat == refTake(sizes.view.mapValues(n => math.min(n, 100L)).toMap))
    val gotTemp = Sampling.temperatureRebalance(df, "g", "id", perSqrt = 3)
      .select("g", "id").as[(String, Long)].collect().toSet
    val tempQuota = sizes.view.mapValues(n =>
      math.min(n, 3L * math.floor(math.sqrt(n.toDouble)).toLong)).toMap
    assert(gotTemp == refTake(tempQuota))
  }
}
