package graft.operators

import graft.delta.TestBase
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed semantics pins for the bigram-LM quality score:
  * add-one-smoothed quantized conditional probabilities summed per doc,
  * zero-bigram docs included at 0, and the result invariant under
  * repartitioning (pure aggregation arithmetic, no order dependence). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  test("ngramLmScore matches hand-computed add-one bigram statistics") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),  // bigrams (a,b) (b,a) (a,b)
      (2L, "a b"),      // bigram  (a,b)
      (3L, "c"),        // no bigrams
      (4L, "")          // no tokens at all
    ).toDF("doc_id", "text")
    // c1: a=3 b=3 c=1; V=3; c2: (a,b)=3 (b,a)=1
    // p_q(a,b) = 10000*4 DIV 6 = 6666 ; p_q(b,a) = 10000*2 DIV 6 = 3333
    val want = Map(
      1L -> (3L, 6666L + 3333L + 6666L),
      2L -> (1L, 6666L),
      3L -> (0L, 0L),
      4L -> (0L, 0L))
    val got = TextAnalysis.ngramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    val gotRepart = TextAnalysis.ngramLmScore(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotRepart == want, "score must be repartition-invariant")
  }

  test("stripBoilerplateLines drops high-DF lines, keeps order, blanks, empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HEADER\nbody one\n\nFOOTER"),
      (2L, "HEADER\nbody two\nFOOTER"),
      (3L, "HEADER\nunique text"),
      (4L, "HEADER")).toDF("doc_id", "text")
    // df(HEADER)=4 > 2 dropped; df(FOOTER)=2 kept; blank lines never count
    val got = TextAnalysis.stripBoilerplateLines(docs, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("body one\n\nFOOTER", 1L),
      2L -> ("body two\nFOOTER", 1L),
      3L -> ("unique text", 1L),
      4L -> ("", 1L)))
    // repartition-invariant (order pinned by position, not row placement)
    val again = TextAnalysis.stripBoilerplateLines(
      docs.repartition(5), "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(again == got)
  }

  test("ngramLmScore ranks natural repetition above gibberish") {
    import spark.implicits._
    // the corpus LM is dominated by the common phrase; the outlier doc's
    // unseen bigrams draw only smoothing mass
    val docs = (1L to 20L).map(i => (i, "the quick brown fox jumps")) :+
      (99L, "zxq wvut qqq plk mnb")
    val scored = TextAnalysis.ngramLmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    val common = scored(1L)._1.toDouble / scored(1L)._2
    val gibberish = scored(99L)._1.toDouble / scored(99L)._2
    assert(common > gibberish * 3,
      s"common-phrase avg $common must dominate gibberish avg $gibberish")
  }

  /** The fused fingerprint / token-count kernels must equal their
    * composed-HOF oracles bit-for-bit across the split-semantics edges:
    * Spark's `split(s, "")` is per CODE POINT (a surrogate pair stays
    * one element; empty text → empty array) and `ascii()` yields the
    * code point; `split(s, "[^A-Za-z0-9]+")`'s non-empty tokens are the
    * maximal ASCII-alnum runs (multi-byte chars are separators). */
  test("fingerprint and regex-token-count kernels equal composed HOF paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val samples = Seq(
      "the quick brown fox",
      "",                                  // empty: fingerprint 0, tokens 0
      "unicode äöü߀ and £¥",               // multi-byte code points
      "emoji 😀 and 🎉 pairs",              // non-BMP: one element per emoji
      "punct!!!only???",                   // alnum runs split by punct
      "___",                               // no alnum runs at all
      "a1b2 c3_d4-e5",                     // digits join letter runs
      " leading and trailing ",
      (1 to 300).map(i => s"w$i").mkString(", ")) // long mixed doc
    val df = samples.toDF("s")
    val rows = df.select(
        TextAnalysis.fingerprint($"s").as("fp_k"),
        TextAnalysis.fingerprintOfChars(split($"s", "")).as("fp_h"),
        TextAnalysis.regexTokenCount($"s").cast("int").as("tc_k"),
        TextAnalysis.regexTokenCountViaSplit($"s").cast("int").as("tc_h"))
      .as[(Long, Long, Int, Int)].collect()
    rows.zip(samples).foreach { case ((fpK, fpH, tcK, tcH), s) =>
      assert(fpK == fpH, s"fingerprint kernel drifted on <$s>: $fpK != $fpH")
      assert(tcK == tcH, s"token-count kernel drifted on <$s>: $tcK != $tcH")
    }
  }

  test("bm25Rank matches hand-computed rational BM25 and plans a top-k") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // N=3 docs, S=10 total tokens, query term "join" with df=2:
    //   idf       = (2N-2df+1)/(2df+1) = 3/5
    //   p(doc)    = (10000·3·22·tf·10) DIV (5·(100·tf + 30 + 27·dl))
    //   d1 tf=1,dl=3 → 6600000 DIV 1055 = 6256 (floor)
    //   d2 tf=2,dl=3 → 13200000 DIV 1555 = 8488
    val docs = Seq(
      (1L, "a b join"), (2L, "join join b"), (3L, "c c c c")).toDF("id", "txt")
    val out = TextAnalysis.bm25Rank(docs, "id", "txt", Seq("join"), k = 10)
    val got = out.as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 13200000L / 1555), (1L, 6600000L / 1055)), got.toString)
    // saturation: tf=2 scores less than 2× tf=1 (the k1 damping)
    assert(got.head._2 < 2 * got(1)._2)

    // longer doc with the same tf is penalized (b-length normalization)
    val docs2 = Seq(
      (1L, "join a"), (2L, "join a b c d e f g")).toDF("id", "txt")
    val got2 = TextAnalysis.bm25Rank(docs2, "id", "txt", Seq("join"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(got2.map(_._1) == Seq(1L, 2L), got2.toString)

    // scale shape: the top-k is a TakeOrderedAndProject, never a full sort
    val plan = TextAnalysis.bm25Rank(docs, "id", "txt", Seq("join"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)

    // repartition-invariant (pure aggregation arithmetic)
    val shuffled = TextAnalysis.bm25Rank(docs.repartition(7), "id", "txt",
      Seq("join"), 10).as[(Long, Long)].collect().toSeq
    assert(shuffled == got)
  }

  test("topNgramCoverage: hand-computed Gopher top-gram coverage + thresholds") {
    import spark.implicits._
    val docs = Seq(
      // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b" ×3,
      // len 11 → 3*3*10000/11 = 8181; 3-grams top "a b a" ×2 (ties: "a b a"
      // beats "b a b" at count 2 by gram asc) → 2*5*10000/11 = 9090
      (1L, "a b a b a b"),
      // no repeated 2-gram: top count 1 → "quick brown" (len 11) over len 45
      // ... any count-1 gram; ties break gram-asc so the SMALLEST gram wins
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "single"),          // < 2 words → both coverages 0
      (4L, "two words")        // one 2-gram ×1, no 3-gram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgramCoverage(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(got(1L) == (11L, 3L * 3 * 10000 / 11, 2L * 5 * 10000 / 11, 0),
      got(1L).toString)
    assert(got(3L) == (6L, 0L, 0L, 1), got(3L).toString)
    assert(got(4L) == (9L, 1L * 9 * 10000 / 9, 0L, 0), got(4L).toString)
    // doc 2: every 2-gram count 1; smallest gram asc = "brown fox" (9 ch,
    // len 44): 1*9*10000/44 = 2045 — verify the TIE-BREAK is total
    val t2 = "the quick brown fox jumps over the lazy dog"
    val w2 = t2.split(" ", -1)
    val g2 = w2.sliding(2).map(_.mkString(" ")).toSeq
    val top2 = g2.groupBy(identity).toSeq.map { case (g, os) => (os.size, g) }
      .sortBy { case (c, g) => (-c, g) }.head
    assert(got(2L)._2 == top2._1.toLong * top2._2.length * 10000 / t2.length)
    // repartition invariance (doc-local + per-doc agg)
    val a = TextAnalysis.topNgramCoverage(docs.repartition(3), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted.toSeq
    val b = TextAnalysis.topNgramCoverage(docs.coalesce(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(a == b)
  }

  /** Pure-Scala reference for the hashed-linear classifier — split on
    * literal ' ' keeping empties, whole-text fallback below n words,
    * polyhash31 over code points, bucket = h mod D, occurrence counts. */
  private def qcRef(s: String, w: IndexedSeq[Int], ns: Seq[Int]): (Long, Long) = {
    val P = 1000000007L
    def h31(g: String): Long = {
      var h = 0L; var i = 0
      while (i < g.length) {
        val cp = g.codePointAt(i); h = (31L * h + cp) % P
        i += Character.charCount(cp)
      }
      h
    }
    val words = s.split(" ", -1)
    var score = 0L; var grams = 0L
    ns.foreach { n =>
      val gs = if (words.length < n) Seq(s)
               else words.sliding(n).map(_.mkString(" ")).toSeq
      gs.foreach { g => score += w((h31(g) % w.length).toInt); grams += 1 }
    }
    (score, grams)
  }

  test("qualityClassifier: kernel is bit-equal to the pure-Scala reference") {
    import spark.implicits._
    val w = TextAnalysis.defaultQualityWeights()
    val texts = Seq(
      "the cat sat on the mat",
      "single",                     // 1 word → bigram falls back to whole text
      "",                           // empty → unigram [''], bigram whole-text ''
      "a  b",                       // double space → empty middle word
      "zz éthe ünicode grams here"  // non-ASCII code points
    )
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassifier(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == qcRef(t, w, Seq(1, 2)),
        s"kernel drifted from reference on '$t'")
    }
    // the corpus too, plus repartition invariance (row-local arithmetic)
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val base = TextAnalysis.qualityClassifier(corpus, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    val texts2 = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    base.foreach { case (id, sc, nf, keep) =>
      val (rs, rn) = qcRef(texts2(id), w, Seq(1, 2))
      assert((sc, nf) == (rs, rn), s"doc $id drifted")
      assert(keep == (if (sc >= 0) 1 else 0))
    }
    assert(base.exists(_._4 == 0) && base.exists(_._4 == 1),
      "threshold must actually split the corpus (weights span negative and positive)")
    val shuffled = TextAnalysis.qualityClassifier(
      corpus.repartition(7), "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    assert(shuffled == base)
    // codegen compiles loudly: fallback off would surface a broken doGenCode
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val again = TextAnalysis.qualityClassifier(docs, "doc_id", "text", w)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(again == got)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  /** Pure-Scala greedy longest-match reference — the contract the
    * codegen'd BpeStatsQ kernel must hit bit-for-bit. */
  private def bpeRef(s: String, vocab: Seq[String]): (Long, Long) = {
    val maxLen = vocab.map(_.length).max
    val set = vocab.toSet
    var i = 0; var ntok = 0L; var ck = 0L
    while (i < s.length) {
      val matched = (math.min(maxLen, s.length - i) to 2 by -1)
        .find(l => set.contains(s.substring(i, i + l))).getOrElse(0)
      ntok += 1
      if (matched > 0) { ck += ntok * matched; i += matched }
      else { ck += ntok; i += Character.charCount(s.codePointAt(i)) }
    }
    (ntok, ck)
  }

  test("bpeTokenStats: kernel is bit-equal to the pure-Scala reference") {
    import spark.implicits._
    // hand-picked shapes: vocab hits at start/middle/end, overlapping
    // candidates where longest must win (" the" over " t"/"th"), ties
    // through punctuation entries (", ", ". "), empty and vocab-free text
    val texts = Seq(
      "the cat sat on the mat.",
      "running and jumping, resting.",
      "xyzq",                       // no vocab entry at all → all singles
      "thethethe",                  // back-to-back matches
      " the the",                   // leading-space entries
      "",                           // empty → (0, 0)
      "zzéthe"                 // non-ASCII single before a match
    )
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == bpeRef(t, TextAnalysis.BpeVocab),
        s"kernel drifted from reference on '$t'")
    }
    // the corpus too — every doc, not just the shapes above
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val ks = TextAnalysis.bpeTokenStats(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val texts2 = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ks.foreach { case (id, n, ck) =>
      assert((n, ck) == bpeRef(texts2(id), TextAnalysis.BpeVocab), s"doc $id drifted")
    }
    // longest-match sanity: "the cat..." must tokenize "the" as ONE token
    // (not t+h+e) — count strictly below character count
    assert(got(0L)._1 < texts(0).length)
  }

  test("bpeTrainMerges matches a pure-Scala trainer; learned vocab drives the walk (VERDICT r15 #2)") {
    import spark.implicits._
    // reference trainer: word-frequency weighting, total (count desc,
    // left, right) tie-break, greedy left-to-right scan-with-skip merge
    def refTrain(texts: Seq[String], m: Int): Seq[(Long, String, String, Long)] = {
      def merge(syms: Vector[String], l: String, r: String): Vector[String] = {
        val b = Vector.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        b.result()
      }
      var words: Seq[(Vector[String], Long)] =
        texts.flatMap(_.split(" ").filter(_.nonEmpty))
          .groupBy(identity).toSeq
          .map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var rank = 1L
      var go = true
      while (rank <= m && go) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        words.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) += c) }
        if (counts.isEmpty) go = false
        else {
          val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          out += ((rank, l, r, c))
          words = words.map { case (syms, n) => merge(syms, l, r) -> n }
          rank += 1
        }
      }
      out.toSeq
    }
    // engineered shapes: tied counts (lexicographic break must decide),
    // same-symbol runs (overlap handling), repeated words
    val texts = Seq(
      "the cat sat on the mat",
      "the mat the cat the hat",
      "banana bandana cabana",
      "aaaa aaa aa",
      "zz zz zz zz")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMerges(df, "text", 6)
    assert(got == refTrain(texts, 6), s"trainer drifted:\n$got\nvs\n${refTrain(texts, 6)}")
    // the real corpus — every round, not just toy shapes
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpusTexts = corpus.select("text").collect().map(_.getString(0)).toSeq
    val gotC = TextAnalysis.bpeTrainMerges(corpus, "text", 8)
    assert(gotC == refTrain(corpusTexts, 8), "corpus training drifted")
    assert(gotC.size == 8)
    // t49 rerun on the LEARNED vocabulary: the trained merges feed the
    // same greedy longest-match kernel, checked against the pure-Scala
    // walk reference per doc
    val learnedVocab = gotC.map { case (_, l, r, _) => l + r }.distinct.toIndexedSeq
    assert(learnedVocab.forall(_.length >= 2))
    val walked = TextAnalysis.bpeTokenStats(corpus, "doc_id", "text", learnedVocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    corpus.select("doc_id", "text").collect().foreach { r =>
      assert(walked(r.getLong(0)) == bpeRef(r.getString(1), learnedVocab),
        s"learned-vocab walk drifted on doc ${r.getLong(0)}")
    }
  }

  test("bpeTrainMergesBatched: batch=1 IS sequential BPE; batch=2 matches a batched reference") {
    import spark.implicits._
    def merge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    // pure-Scala batched reference: per round, greedy symbol-disjoint
    // top picks from ONE count pass, applied in rank order
    def refBatched(texts: Seq[String], m: Int, k: Int): Seq[(Long, String, String, Long)] = {
      var words: Seq[(Vector[String], Long)] =
        texts.flatMap(_.split(" ").filter(_.nonEmpty))
          .groupBy(identity).toSeq
          .map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var go = true
      while (out.size < m && go) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        words.foreach { case (s, c) => s.zip(s.tail).foreach(p => counts(p) += c) }
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var j = 0
        var stop = false
        while (j < math.min(k, m - out.size) && !stop) {
          val used = picked.flatMap(p => Seq(p._1, p._2)).toSet
          val cands = counts.toSeq.filter { case ((l, r), _) =>
            !used.contains(l) && !used.contains(r) }
          if (cands.isEmpty) stop = true
          else {
            val ((l, r), c) = cands.minBy { case ((a, b), n) => (-n, a, b) }
            picked += ((l, r, c))
          }
          j += 1
        }
        if (picked.isEmpty) go = false
        else {
          picked.foreach { case (l, r, c) => out += ((out.size + 1L, l, r, c)) }
          words = words.map { case (s, c) =>
            picked.foldLeft(s) { case (acc, (l, r, _)) => merge(acc, l, r) } -> c }
        }
      }
      out.toSeq
    }
    val texts = Seq(
      "the cat sat on the mat", "the mat the cat the hat",
      "banana bandana cabana", "aaaa aaa aa", "zz zz zz zz")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // batch=1 must equal the sequential trainer EXACTLY
    assert(TextAnalysis.bpeTrainMergesBatched(df, "text", 6, batch = 1) ==
      TextAnalysis.bpeTrainMerges(df, "text", 6))
    // batch=2 matches the batched reference on toy + real corpus
    assert(TextAnalysis.bpeTrainMergesBatched(df, "text", 6, batch = 2) ==
      refBatched(texts, 6, 2))
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpusTexts = corpus.select("text").collect().map(_.getString(0)).toSeq
    val gotC = TextAnalysis.bpeTrainMergesBatched(corpus, "text", 8, batch = 2)
    assert(gotC == refBatched(corpusTexts, 8, 2), "batched corpus training drifted")
    assert(gotC.size == 8)
    // production caps (VERDICT r16 #2): batch up to 64 accepted and
    // consistent with the reference; the old 64-merge ceiling is gone
    assert(TextAnalysis.bpeTrainMergesBatched(df, "text", 6, batch = 64) ==
      refBatched(texts, 6, 64))
    val big = TextAnalysis.bpeTrainMergesBatched(corpus, "text", 80, batch = 16)
    assert(big == refBatched(corpusTexts, 80, 16), "80-merge training drifted")
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrainMergesBatched(df, "text", 100001, batch = 8)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrainMergesBatched(df, "text", 6, batch = 65)
    }
  }

  test("bpeTrainMergesBatched: one round = one pair-count TakeOrdered + one apply job (VERDICT r16 #2)") {
    import spark.implicits._
    // all-disjoint word shapes so the greedy top-K scan never needs the
    // saturation fallback: each word is a distinct 2-symbol pair
    val wordFreq = Seq("ab" -> 13, "cd" -> 12, "ef" -> 11, "gh" -> 10,
      "ij" -> 9, "kl" -> 8, "mn" -> 7, "op" -> 6, "qr" -> 5, "st" -> 4)
    val text = wordFreq.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def settledCount(): Int = {
      // listener delivery is async: poll until the counter stops moving
      var prev = -1
      var cur = jobs.get()
      var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur; Thread.sleep(100); cur = jobs.get(); spins += 1
      }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = TextAnalysis.bpeTrainMergesBatched(df, "text", 8, batch = 8)
      // one round fills the whole batch from the sorted top-K prefix
      assert(got.map(m => (m._2, m._3, m._4)) ==
        wordFreq.take(8).map { case (w, n) =>
          (w(0).toString, w(1).toString, n.toLong) })
      val jobsBatch8 = settledCount()
      jobs.set(0)
      val one = TextAnalysis.bpeTrainMergesBatched(df, "text", 1, batch = 1)
      assert(one.size == 1)
      val jobsBatch1 = settledCount()
      // the pick cost must be INDEPENDENT of batch: a full batch=8 round
      // runs the same job count as a batch=1 round (one fused pair-count
      // + top-K TakeOrdered collect, one rewrite checkpoint, plus the
      // word-table build) — NOT the old shape's ≤batch serial limit(1)
      // jobs per round (VERDICT r16 #2)
      assert(jobsBatch8 == jobsBatch1,
        s"batch=8 round ran $jobsBatch8 jobs vs batch=1's $jobsBatch1 — picks are not one collect")
      assert(jobsBatch8 <= 6,
        s"a single round should stay within a handful of jobs, got $jobsBatch8")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bpeTrainMergesBatched: saturation fallback keeps exact filtered-TakeOrdered semantics") {
    import spark.implicits._
    // every top pair shares symbol 'a', so after picking the first rule
    // the greedy scan must skip a long overlapping prefix; with the
    // internal K = max(32, 4·batch) this exercises the path where picks
    // come from deep in the order — semantics must match the pure
    // reference regardless of which path (prefix scan or fallback) ran
    def refBatched(texts: Seq[String], m: Int, k: Int): Seq[(Long, String, String, Long)] = {
      def merge(syms: Vector[String], l: String, r: String): Vector[String] = {
        val b = Vector.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        b.result()
      }
      var words: Seq[(Vector[String], Long)] =
        texts.flatMap(_.split(" ").filter(_.nonEmpty))
          .groupBy(identity).toSeq
          .map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var go = true
      while (out.size < m && go) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        words.foreach { case (s, c) => s.zip(s.tail).foreach(p => counts(p) += c) }
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var j = 0
        var stop = false
        while (j < math.min(k, m - out.size) && !stop) {
          val used = picked.flatMap(p => Seq(p._1, p._2)).toSet
          val cands = counts.toSeq.filter { case ((l, r), _) =>
            !used.contains(l) && !used.contains(r) }
          if (cands.isEmpty) stop = true
          else {
            val ((l, r), c) = cands.minBy { case ((a, b), n) => (-n, a, b) }
            picked += ((l, r, c))
          }
          j += 1
        }
        if (picked.isEmpty) go = false
        else {
          picked.foreach { case (l, r, c) => out += ((out.size + 1L, l, r, c)) }
          words = words.map { case (s, c) =>
            picked.foldLeft(s) { case (acc, (l, r, _)) => merge(acc, l, r) } -> c }
        }
      }
      out.toSeq
    }
    // >32 distinct words all of the form a+X / X+a with graded counts:
    // the sorted pair list's head is saturated by the shared symbol
    val letters = ('b' to 'z').map(_.toString)
    val words = letters.map(x => s"a$x") ++ letters.map(x => s"${x}a")
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(words.size + 5 - i)(w) }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMergesBatched(df, "text", 12, batch = 12)
    assert(got == refBatched(Seq(text), 12, 12), "saturated-prefix training drifted")
  }

  test("bpeTrainMergesBatched: Delta merge table persists rules and resumes from round boundaries") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oneShot = TextAnalysis.bpeTrainMergesBatched(corpus, "text", 24, batch = 8)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/merges"
    // first run learns ≥8 rules (the table always stores FULL rounds, so
    // up to batch-1 past the request) and commits them transactionally
    val first = TextAnalysis.bpeTrainMergesBatched(corpus, "text", 8, batch = 8,
      mergeTablePath = Some(path))
    assert(first == oneShot.take(8))
    val storedFirst = graft.delta.DeltaRead.load(spark, path).count()
    assert(storedFirst >= 8 && storedFirst < 16,
      s"table must hold the request's full rounds: $storedFirst")
    // rerun with a higher target RESUMES: the stored rounds replay from
    // the table (no retraining drift), the remaining rounds train and
    // append — even when the original request cut a round mid-flight
    val resumed = TextAnalysis.bpeTrainMergesBatched(corpus, "text", 24, batch = 8,
      mergeTablePath = Some(path))
    assert(resumed == oneShot, "resumed training drifted from one-shot")
    val stored = graft.delta.DeltaRead.load(spark, path)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(stored.take(24) == oneShot && stored.size < 24 + 8,
      "Delta merge table drifted from the learned rules")
    // a target at or below the stored count returns the prefix WITHOUT
    // touching the corpus (and without writing anything)
    val storedBefore = stored.size
    val prefix = TextAnalysis.bpeTrainMergesBatched(
      corpus.limit(0), "text", 16, batch = 8, mergeTablePath = Some(path))
    assert(prefix == oneShot.take(16))
    assert(graft.delta.DeltaRead.load(spark, path).count() == storedBefore)
    // resume with a DIFFERENT batch refuses loudly (ADVICE r17): the
    // round structure is batch-dependent, and a silent mismatch would
    // yield a rule sequence matching neither one-shot run — the table
    // property stamped at creation is the guard
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrainMergesBatched(corpus, "text", 24, batch = 4,
        mergeTablePath = Some(path))
    }
    assert(e.getMessage.contains("batch=8") && e.getMessage.contains("batch=4"),
      e.getMessage)
  }

  test("merges.txt interchange: export → import round-trips the trained rules " +
      "bit-exactly; foreign files parse; malformed lines refuse (VERDICT r17 #4)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rules = TextAnalysis.bpeTrainMerges(corpus, "text", 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_merges")
    val path = s"$dir/merges.txt"
    TextAnalysis.exportMergesTxt(rules, path)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.get(0).startsWith("#version:"), "GPT-2-style header line")
    assert(lines.size == rules.size + 1)
    val imported = TextAnalysis.importMergesTxt(path)
    assert(imported == rules.map(r => (r._1, r._2, r._3)),
      "export → import must round-trip the in-memory rules exactly")
    assert(TextAnalysis.vocabFromMerges(imported) ==
      rules.map { case (_, l, r, _) => l + r }.distinct.toIndexedSeq)
    // a FOREIGN file (comments, blank lines, rules we never trained)
    val foreign = s"$dir/foreign.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(foreign),
      "#version: 0.2\nq u\nqu e\n\n# comment\nx y\n".getBytes("UTF-8"))
    assert(TextAnalysis.importMergesTxt(foreign) ==
      Seq((1L, "q", "u"), (2L, "qu", "e"), (3L, "x", "y")))
    // malformed line refuses with its line number
    val bad = s"$dir/bad.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      "a b\nc b d\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](TextAnalysis.importMergesTxt(bad))
    assert(e.getMessage.contains("line 2"), e.getMessage)
  }

  test("redactPii: hand-computed counts, sequential redaction, RE2-safe patterns") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b-c_d@x-y.co.uk now"),
      (2L, "call +1 (555) 010-1234 soon"),
      (3L, "host 192.168.0.1 and 10.0.0.7"),
      (4L, "u1@a.io or u2@b.org, tel 555 123 4567, ip 8.8.8.8"),
      (5L, "no pii here 12 34"),
      (6L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPiiTyped(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "mail <EMAIL> now", 1L, 0L, 0L),
      (2L, "call <PHONE> soon", 0L, 1L, 0L),
      (3L, "host <IP> and <IP>", 0L, 0L, 2L),
      (4L, "<EMAIL> or <EMAIL>, tel <PHONE>, ip <IP>", 2L, 1L, 1L),
      (5L, "no pii here 12 34", 0L, 0L, 0L),
      (6L, "", 0L, 0L, 0L)), got.mkString("\n"))
    // idempotence: redacting redacted text changes nothing (placeholders
    // carry no digits or @)
    val again = TextAnalysis.redactPiiTyped(
        TextAnalysis.redactPiiTyped(df, "doc_id", "text")
          .select($"doc_id", $"clean_text".as("text")), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.map(_._2).toSeq == got.map(_._2).toSeq)
    assert(again.forall(r => r._3 == 0L && r._4 == 0L && r._5 == 0L))
  }

  test("duplicateSegmentStats: hand-computed fractions and Gopher keep flag") {
    import spark.implicits._
    val df = Seq(
      // lines: [ab, cd, ab, ef] -> 4 lines, 1 dup occurrence (2500 pm),
      // chars 8, dup chars 2 (2500 pm > the 2000 char threshold -> keep 0);
      // paras: [ab\ncd, ab\nef] distinct
      (1L, "ab\ncd\n\nab\nef"),
      // all four lines identical: dup 3/4 = 7500 pm, char dup 7500 pm;
      // paras both "xx\nxx": dup 1/2 = 5000 pm -> keep = 0
      (2L, "xx\nxx\n\nxx\nxx"),
      // single line, single para, empties from adjacent separators ignored
      (3L, "solo\n\n"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.duplicateSegmentStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7)))
    assert(got.toSeq == Seq(
      (1L, 4L, 2500L, 2500L, 2L, 0L, 0L, 0),
      (2L, 4L, 7500L, 7500L, 2L, 5000L, 5000L, 0),
      (3L, 1L, 0L, 0L, 1L, 0L, 0L, 1),
      (4L, 0L, 0L, 0L, 0L, 0L, 0L, 1)))
    // zero-shuffle contract
    val plan = TextAnalysis.duplicateSegmentStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be scan-local:\n$plan")
  }

  test("filterLines: word minimum, banned phrases, punctuation rule, doc drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two three.\nshort\nfour five six!\nbad cookie line here."),
      (2L, "only one surviving line here.\ntoo short"), // < 2 kept -> dropped
      (3L, "no punct but enough words\nanother fine line here?")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.filterLines(df, "doc_id", "text",
        minWords = 3, banned = Seq("cookie"),
        requireTerminalPunct = true, minKeptLines = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "one two three.\nfour five six!", 2L, 2L)))
    // without the punctuation rule doc 3 survives with both lines
    val noPunct = TextAnalysis.filterLines(df, "doc_id", "text",
        minWords = 3, banned = Seq("cookie"),
        requireTerminalPunct = false, minKeptLines = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(noPunct.toSeq == Seq((1L, 2L), (3L, 2L)))
    val plan = TextAnalysis.filterLines(df, "doc_id", "text", 3, Seq("cookie"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be scan-local:\n$plan")
  }
}
