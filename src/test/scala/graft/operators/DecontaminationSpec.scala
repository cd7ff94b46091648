package graft.operators

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-contamination pins: a training doc embedding an eval passage
  * must flag (and only it), and decontaminate() must drop exactly the
  * flagged docs. Repetition stats must separate boilerplate from prose. */
class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  private val evalSentence =
    "the quick brown fox jumps over the lazy dog while seven wizards watch quietly tonight"

  test("13-gram overlap flags the doc embedding an eval passage") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"some prefix words here $evalSentence and a suffix tail"),
      (2L, "a completely clean document with plenty of ordinary words " +
        "that never quote any benchmark content at all in any way"),
      (3L, "another clean one talking about cooking recipes and garden tools " +
        "for a while longer than thirteen words total")
    ).toDF("doc_id", "text")
    val evals = Seq(Tuple1(evalSentence)).toDF("text")

    val flagged = Decontamination.flagContaminated(docs, "doc_id", "text", evals, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L), s"flagged $flagged")
    assert(flagged(1L) >= 1L)

    val kept = Decontamination.decontaminate(docs, "doc_id", "text", evals, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("short eval strings fall back to whole-text matching") {
    import spark.implicits._
    val docs = Seq((1L, "short secret"), (2L, "unrelated words")).toDF("doc_id", "text")
    val evals = Seq(Tuple1("short secret")).toDF("text")
    val flagged = Decontamination.flagContaminated(docs, "doc_id", "text", evals, "text")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("repetition stats separate boilerplate from prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(60)("buy now click here").mkString(" ")), // heavy repetition
      (2L, (1 to 240).map(i => s"tok$i").mkString(" "))       // all-distinct prose
    ).toDF("doc_id", "text")
    val st = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (dupW1, dupG1) = st(1L)
    val (dupW2, dupG2) = st(2L)
    assert(dupW1 > 9000 && dupG1 > 9000, s"boilerplate should score high: $dupW1/$dupG1")
    assert(dupW2 == 0 && dupG2 == 0, s"distinct prose should score zero: $dupW2/$dupG2")
  }

  test("PII redaction replaces emails and long numbers") {
    import spark.implicits._
    val df = Seq((1L, "contact me at alice.smith+x@example.co.uk or call 41255512345 now"))
      .toDF("doc_id", "text")
    val red = df.select(TextAnalysis.redactPii(col("text"))).head().getString(0)
    assert(red == "contact me at <EMAIL> or call <NUMBER> now", red)
    val counts = TextAnalysis.piiCounts(df, "doc_id", "text").head()
    assert(counts.getLong(1) == 1L && counts.getLong(2) == 1L)
  }

  test("native polyhash31 equals the HOF rolling hash, unicode included") {
    import spark.implicits._
    val df = Seq("hello world", "a", "", "tab\tand space", "naïve café",
      "emoji 😀 tail", "ascii only gram text here").toDF("s")
    val got = df.select(Decontamination.gramHash(col("s")).as("n"),
        Decontamination.gramHashViaHof(col("s")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
  }

  /** Bloom-sketch decontamination is one-sided: every doc (and every
    * gram) the exact path flags MUST be flagged by the sketch — false
    * negatives would let contamination through. On the sf0.001 documents
    * corpus the sketch answer must dominate the exact answer per-doc. */
  test("word_gram_hash31 kernel equals the composed gram-string path, " +
      "adversarial whitespace and unicode included") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    def randWord(): String = {
      val alphabet = "abc αβ é 𝒜xyz" // incl. an astral-plane char
      (0 until 1 + rnd.nextInt(6)).map { _ =>
        val c = alphabet.charAt(rnd.nextInt(alphabet.length))
        if (c == ' ') 'q' else c
      }.mkString
    }
    val adversarial = Seq(
      "", " ", "  ", "a", "a b", "one two three four",
      "lead  double  spaces and a trailing space ",
      " leading space then words enough to pass thirteen total words here now ok",
      "dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup dup",
      "unicode αβγ mixé 𝒜stral 𝒜stral chars σπασμένα words padded to thirteen plus tokens one two three four",
      ("w " * 40).trim, // 40 identical words → 1 distinct gram
      (1 to 30).map(i => s"tok$i").mkString(" ")
    ) ++ (1 to 40).map(_ => (0 until rnd.nextInt(40)).map(_ => randWord()).mkString(" "))
    for (n <- Seq(3, 13)) {
      val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def byDoc(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        d.groupBy($"doc_id").agg(sort_array(collect_list($"gh")).as("ghs"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      def diff(c: Map[Long, Seq[Long]], f: Map[Long, Seq[Long]]): String =
        (c.keySet ++ f.keySet).filter(k => c.get(k) != f.get(k)).take(3)
          .map(k => s"doc $k: composed=${c.get(k)} fused=${f.get(k)} " +
            s"text='${adversarial(k.toInt)}'").toString
      val grams = df.select($"doc_id",
        explode(Dedup.shinglesOfWords(split($"text", " "), n)).as("gram"))
      // h31 (the bloom-decontamination hash)
      val c31 = byDoc(grams.select($"doc_id", Decontamination.gramHash($"gram").as("gh")))
      val f31 = byDoc(df.select($"doc_id",
        explode(graft.functions.VectorFunctions.wordGramHash31($"text", n)).as("gh")))
      assert(f31 == c31, s"n=$n h31: kernel diverges: ${diff(c31, f31)}")
      // h60 (the simhash feature hash)
      val c60 = byDoc(grams.select($"doc_id",
        graft.functions.VectorFunctions.polyhash60($"gram").as("gh")))
      val f60 = byDoc(df.select($"doc_id",
        explode(graft.functions.VectorFunctions.wordGramHash60($"text", n)).as("gh")))
      assert(f60 == c60, s"n=$n h60: kernel diverges: ${diff(c60, f60)}")
    }
  }

  test("bloom decontamination has no false negatives vs the exact path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evals = docs.filter(col("doc_id") < 5)
    val exact = Decontamination.flagContaminated(docs, "doc_id", "text", evals, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Decontamination.bloomFlagContaminated(docs, "doc_id", "text", evals, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"false-negative docs: ${exact.keySet.diff(bloom.keySet)}")
    exact.foreach { case (id, n) =>
      assert(bloom(id) >= n, s"doc $id: sketch flagged ${bloom(id)} < exact $n grams")
    }
    // eval docs flag themselves entirely (every gram is a member)
    assert(Seq(0L, 1L, 2L, 3L, 4L).forall(bloom.contains), s"eval docs missing: $bloom")
  }

  test("bloom sketch flags a planted contaminated doc and skips clean ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"some prefix words here $evalSentence and a suffix tail"),
      (2L, "a completely clean document with plenty of ordinary words " +
        "that never quote any benchmark content at all in any way")
    ).toDF("doc_id", "text")
    val evals = Seq(Tuple1(evalSentence)).toDF("text")
    val flagged = Decontamination.bloomFlagContaminated(docs, "doc_id", "text", evals, "text")
      .collect().map(_.getLong(0)).toSet
    assert(flagged.contains(1L), s"planted contamination missed: $flagged")
    // doc 2's grams could false-positive only with p ~ 1e-4 per gram —
    // a hit here means the probe arithmetic is broken, not bad luck
    assert(!flagged.contains(2L), s"clean doc false-flagged: $flagged")
  }

  test("sourceOverlap matches a hand-computed matrix (n=3, distinct-gram semantics)") {
    import spark.implicits._
    // n=3 grams per doc (docs under 3 words contribute their whole text):
    //   A1 "a b c d"    → {abc, bcd}
    //   A2 "a b c"      → {abc}         (within-source duplicate gram: distinct)
    //   B1 "a b c x"    → {abc, bcx}
    //   C1 "p q"        → {pq}          (whole-text gram, shared with C-only)
    //   B2 "p q"        → {pq}
    // totals: A={abc,bcd}=2, B={abc,bcx,pq}=3, C={pq}=1
    // shared: (A,B)={abc}=1 → 10000/(2+3-1)=2500
    //         (B,C)={pq}=1  → 10000/(3+1-1)=3333 ; (A,C)=∅ → no row
    val docs = Seq(
      ("A", "a b c d"), ("A", "a b c"),
      ("B", "a b c x"), ("B", "p q"),
      ("C", "p q")
    ).toDF("source", "text")
    val got = Decontamination.sourceOverlap(docs, "source", "text", n = 3)
      .orderBy("src_a", "src_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("A", "B", 1L, 2L, 3L, 2500L),
      ("B", "C", 1L, 3L, 1L, 3333L)), got.toString)
    // repartition-invariant (pure hash/aggregation arithmetic)
    val shuffled = Decontamination.sourceOverlap(
        docs.repartition(7), "source", "text", n = 3)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(shuffled == got)
  }

  test("removeEvalSpans: hand-computed span cuts against an eval set") {
    import spark.implicits._
    // spanLen 5. Eval doc "HELLO" defines exactly one 5-char span.
    val eval = Seq((100L, "HELLO"), (101L, "hi")).toDF("eid", "etext") // "hi" < spanLen: no spans
    val docs = Seq(
      (1L, "xxHELLOyy"),        // one cut [3,8) → "xx" + "yy"
      (2L, "HELLOHELLO"),       // cuts at 1 and 6 → fully covered → ""
      (3L, "clean text here"),  // no eval span → untouched
      (4L, "hi"),               // shorter than spanLen → untouched
      (5L, "xHELLO")            // cut [2,7) covers through end → "x"
    ).toDF("doc_id", "text")
    Seq(true, false).foreach { hashed =>
      val got = Decontamination.removeEvalSpans(docs, "doc_id", "text",
        eval, "etext", spanLen = 5, hashedShingles = hashed)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      assert(got(1L) == (9L, 4L, "xxyy"), s"hashed=$hashed: ${got(1L)}")
      assert(got(2L) == (10L, 0L, ""), s"hashed=$hashed: ${got(2L)}")
      assert(got(3L) == (15L, 15L, "clean text here"), s"hashed=$hashed: ${got(3L)}")
      assert(got(4L) == (2L, 2L, "hi"), s"hashed=$hashed: ${got(4L)}")
      assert(got(5L) == (6L, 1L, "x"), s"hashed=$hashed: ${got(5L)}")
    }
    // the plan matches the corpus against BROADCAST eval keys — the
    // corpus never shuffles for the match
    val plan = Decontamination.removeEvalSpans(docs, "doc_id", "text",
      eval, "etext", spanLen = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval keys must broadcast:\n$plan")
  }
}
