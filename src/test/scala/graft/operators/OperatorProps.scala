package graft.operators

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the operator layer: the sampling hash must agree
  * with an independent pure-Scala evaluation on ANY long id (the SQL
  * oracle mirrors the same arithmetic), and the two exact-dedup
  * implementations must be extensionally equal on random corpora. */
object OperatorProps extends Properties("Operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxSize(60)

  private lazy val spark = TestBase.spark

  /** Reference evaluation of Sampling.hashBucket in plain Scala. */
  private def refBucket(id: Long, buckets: Int): Long = {
    val x0 = (id & 0x7FFFFFFFL) ^ ((id >> 31) & 0x7FFFFFFFL)
    val x1 = (x0 * 1103515245L + 12345L) & 0x7FFFFFFFL
    val x2 = (x1 * 1103515245L + 12345L) & 0x7FFFFFFFL
    (x2 >> 11) % buckets
  }

  property("hashBucket equals the pure-Scala reference on any long id") =
    forAll(Gen.listOfN(50, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))) { ids =>
      import spark.implicits._
      val got = ids.toDF("id")
        .select(col("id"), Sampling.hashBucket(col("id"), 10000).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ids.forall(id => got(id) == refBucket(id, 10000))
    }

  private val corpusGen: Gen[List[(Long, String, Long)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 10000L)
      key <- Gen.oneOf("a", "b", "c", "d")
      ord <- Gen.chooseNum(0L, 100L)
    } yield (id, key, ord)).map(_.zipWithIndex.map {
      // unique ord per row so both variants are deterministic
      case ((id, key, _), i) => (id, key, i.toLong)
    })

  property("exact dedup: min_by aggregation equals the window variant") =
    forAll(corpusGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("id", "key", "ord")
      val a = Dedup.exact(df, Seq("key"), "ord")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val b = Dedup.exactViaWindow(df, Seq("key"), "ord")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      a == b
    }

  /** Random doc: words drawn from a small vocabulary so overlaps happen,
    * lengths spanning the shingling edge cases (empty handled upstream,
    * < n words → whole-doc shingle). */
  private val docsGen: Gen[List[(Long, String)]] = for {
    vocabSize <- Gen.chooseNum(3, 30)
    n <- Gen.chooseNum(2, 40)
    docs <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(1, 25)
      ws <- Gen.listOfN(len, Gen.chooseNum(0, vocabSize - 1).map(i => s"w$i"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Prefix filtering must be LOSSLESS at any threshold on any corpus —
    * the DedupSpec pin covers one seeded corpus; this sweeps random
    * ones (high-overlap small vocabularies stress tie handling in the
    * global token order). */
  property("ngramJaccardDups equals all-pairs Jaccard on random corpora") =
    forAll(docsGen, Gen.oneOf(0.3, 0.5, 0.8)) { (docs, threshold) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.ngramJaccardDups(df, "doc_id", "text", threshold)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = Dedup.withShingleSet(df, "doc_id", "text")
      val brute = sets.as("l").join(sets.as("r"), col("l.doc_id") < col("r.doc_id"))
        .withColumn("i", size(array_intersect(col("l.sh_set"), col("r.sh_set"))).cast("double"))
        .withColumn("u", size(col("l.sh_set")) + size(col("r.sh_set")) - col("i"))
        .filter(col("i") / col("u") >= threshold)
        .select(col("l.doc_id"), col("r.doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      got == brute
    }

  /** R-7 linear interpolation in plain Scala — the cross-engine
    * contract of TextAnalysis.groupPercentiles. */
  private def refPercentile(xs: Seq[Long], p: Double): Double = {
    val s = xs.sorted
    val rank = p * (s.length - 1)
    val lo = rank.toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (rank - lo) * (s(hi) - s(lo))
  }

  property("groupPercentiles equals the R-7 reference, repartition-invariant") =
    forAll(Gen.listOfN(40, Gen.chooseNum(0L, 1000000L)),
           Gen.chooseNum(2, 16)) { (vals, parts) =>
      import spark.implicits._
      val df = vals.zipWithIndex.map { case (v, i) => (s"g${i % 3}", v) }
        .toDF("g", "x")
      val got = TextAnalysis.groupPercentiles(df.repartition(parts), "g", "x")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val want = vals.zipWithIndex.groupBy { case (_, i) => s"g${i % 3}" }
        .map { case (g, vs0) =>
          val vs = vs0.map(_._1)
          g -> (vs.length.toLong,
            refPercentile(vs, 0.25), refPercentile(vs, 0.5), refPercentile(vs, 0.75))
        }
      // bit-exact equality — dyadic points over integrals are exact
      got == want
    }

  /** Pure-Scala reference of TextAnalysis.ngramLmScore's arithmetic. */
  private def refLmScores(
      docs: Seq[(Long, String)], scale: Long): Map[Long, (Long, Long)] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val c1 = docs.flatMap(d => toks(d._2)).groupBy(identity).view.mapValues(_.size.toLong)
    val v = c1.size.toLong
    val allBi = docs.flatMap { case (_, t) =>
      val w = toks(t); if (w.length < 2) Nil else w.zip(w.tail)
    }
    val c2 = allBi.groupBy(identity).view.mapValues(_.size.toLong)
    docs.map { case (id, t) =>
      val w = toks(t)
      val bi = if (w.length < 2) Nil else w.zip(w.tail)
      val score = bi.map { b =>
        (scale * (c2(b) + 1)) / (c1(b._1) + v)
      }.sum
      id -> (bi.length.toLong, score)
    }.toMap
  }

  private val wordGen = Gen.oneOf("ab", "cd", "ef", "gh", "zz")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  property("ngramLmScore equals the pure-Scala reference on random corpora") =
    forAll(Gen.listOfN(12, docGen), Gen.chooseNum(2, 8)) { (texts, parts) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextAnalysis.ngramLmScore(
          docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == refLmScores(docs, 10000L)
    }

  /** Pure-Scala reference of TextAnalysis.stripBoilerplateLines. */
  private def refStrip(
      docs: Seq[(Long, String)], maxDf: Long): Map[Long, (String, Long)] = {
    def lines(t: String) = t.split("\n", -1).toSeq
    val df = docs.flatMap { case (_, t) => lines(t).filter(_.nonEmpty).distinct }
      .groupBy(identity).view.mapValues(_.size.toLong)
    val boiler = df.filter(_._2 > maxDf).keySet
    docs.map { case (id, t) =>
      val ls = lines(t)
      val kept = ls.filterNot(boiler.contains)
      val dropped = ls.count(l => l.nonEmpty && boiler.contains(l))
      id -> (kept.mkString("\n"), dropped.toLong)
    }.toMap
  }

  private val lineGen = Gen.oneOf("HEAD", "FOOT", "body", "more", "")
  private val docLinesGen: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, lineGen).map(_.mkString("\n")))

  property("stripBoilerplateLines equals the pure-Scala reference on random corpora") =
    forAll(Gen.listOfN(10, docLinesGen), Gen.chooseNum(1, 6), Gen.chooseNum(2, 8)) {
      (texts, maxDf, parts) =>
        import spark.implicits._
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val got = TextAnalysis.stripBoilerplateLines(
            docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", maxDf)
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        got == refStrip(docs, maxDf)
    }

  /** Pure-Scala reference of the RollingHash60 window hashes: per-window
    * polyhash60-family over UTF-16 code units. */
  private def refRolling(s: String, l: Int): Seq[Long] =
    if (s.length < l) Nil
    else (0 to s.length - l).map { i =>
      var h1 = 0L; var h2 = 0L
      s.substring(i, i + l).foreach { c =>
        h1 = (31L * h1 + c) % 1000000007L
        h2 = (131L * h2 + c) % 998244353L
      }
      h2 * 1073741824L + h1
    }

  property("rollingHash60 equals the per-window reference on ARBITRARY strings") =
    forAll(Gen.listOfN(8, Gen.asciiPrintableStr), Gen.chooseNum(1, 12)) { (ss, l) =>
      import spark.implicits._
      val got = ss.toDF("s")
        .select(org.apache.spark.sql.graft.VectorBridge.rollingHash60(col("s"), l).as("h"))
        .as[Seq[Long]].collect().toSeq
      got == ss.map(refRolling(_, l))
    }

  /** Reference Levenshtein for the typo-pair completeness property. */
  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Small-alphabet words maximize near-collisions, so the deletion-
    * neighborhood candidate scheme is stressed where it could break:
    * dense clusters of distance-1 AND distance-2 lookalikes. */
  private val typoVocabGen: Gen[List[String]] =
    Gen.listOfN(30, for {
      len <- Gen.chooseNum(4, 7)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)

  property("typoPairs equals the brute-force ed<=1 join on dense random vocabularies") =
    forAll(typoVocabGen) { words =>
      import spark.implicits._
      val got = Dedup.typoPairs(words.toDF("w"), "w")
        .as[(String, String)].collect().toSet
      val vocab = words.distinct.filter(_.length >= 4)
      val truth = (for {
        a <- vocab; b <- vocab if a < b && refLev(a, b) <= 1
      } yield (a, b)).toSet
      got == truth
    }
}
