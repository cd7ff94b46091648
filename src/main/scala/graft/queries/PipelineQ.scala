package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.delta.GraftDelta
import graft.operators.{AsofJoin, Decontamination, Dedup, Multimodal, Packing, RangeJoin, Sampling, Similarity, Sketches, TextAnalysis}
import graft.streaming.EventStreams

/** Harness queries for the LLM-training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal) over the
  * `documents` and `embeddings` testdata tables. */
object PipelineQ {

  // Spread.adaptive: the testdata tables are single-row-group parquet
  // files — ONE scan task — so every per-doc kernel (codecs, shingling,
  // scoring) would otherwise run on one core (guide §2.5). No-op when the
  // scan already has ≥ defaultParallelism splits (the production case).
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.Spread.adaptive(s.read.parquet(s"$dir/$name.parquet"))

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$prefix")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  /** The four approximate-ANN queries carry in-query EXACT truth sets
    * (brute-force top-k / all-pairs cosine) feeding recall/precision
    * `require`s. That truth is O(N·corpus) / O(N²) BY CONSTRUCTION — at
    * bench SFs it dominates wall time and misstates the operator's cost
    * (BENCH_sf1's semantic_dedup_operator_only probe: 10.4 s harness vs
    * 2.4× operator-only). `graft.Bench` sets this property so timed runs
    * still FORCE the operator (an eager count) but skip the oracle;
    * `graft.Verify` never sets it, so the correctness gate always runs
    * the full checks. The emitted rows are pinned constants either way —
    * outputs are mode-independent (pinned by QueryModeSpec). */
  private[graft] def skipInQueryOracles: Boolean =
    java.lang.Boolean.getBoolean("graft.bench.skipInQueryOracles")

  /** Merge-round count shared by the t66/t67 queries and their oracles. */
  private val BpeTrainMergeCount = 8

  /** A FOREIGN BPE vocabulary for the interchange query (t72): fixed
    * English-bigram merge rules this engine never trained, shipped
    * through a real GPT-2-style merges.txt round trip. */
  private val ForeignMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("o", "n"), ("e", "r"), ("r", "e"))

  /** The greedy longest-match tokenizer walk as a DuckDB recursive CTE,
    * parameterized by the token vocabulary — shared by t49 (built-in
    * vocab) and t72 (imported foreign vocab). */
  private def bpeWalkOracleSql(vocab: Seq[String]): String = {
    val vocabVals = vocab
      .map(v => s"('${v.replace("'", "''")}')").mkString(", ")
    s"""WITH RECURSIVE vocab(v) AS (VALUES $vocabVals),
       |walk(doc_id, pos, ntok, ck) AS (
       |  SELECT doc_id, CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM documents
       |  UNION ALL
       |  SELECT w.doc_id,
       |    w.pos + coalesce((SELECT max(length(t.v)) FROM vocab t
       |      WHERE substr(d.text, CAST(w.pos AS INT), length(t.v)) = t.v), 1),
       |    w.ntok + 1,
       |    w.ck + (w.ntok + 1) * coalesce((SELECT max(length(t.v)) FROM vocab t
       |      WHERE substr(d.text, CAST(w.pos AS INT), length(t.v)) = t.v), 1)
       |  FROM walk w JOIN documents d USING (doc_id)
       |  WHERE w.pos <= length(d.text))
       |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       |       f.ntok AS bpe_tokens, f.ck AS bpe_checksum
       |FROM documents d
       |JOIN (SELECT doc_id, max(ntok) AS ntok, max(ck) AS ck
       |      FROM walk GROUP BY doc_id) f USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The BATCHED-BPE replay (batch = 2, [[BpeTrainMergeCount]] rules) as
    * one DuckDB query — per round: c{k}x = the global top pair, c{k}y =
    * the top pair sharing NO symbol with it, both applied via the
    * delimiter-wrapped replace in rank order. Shared verbatim by t69
    * (the one-shot batched training) and t70 (the Delta-merge-table
    * RESUME — its contract is bit-equality with the one-shot run). */
  private lazy val batchedBpeOracleSql: String = {
    val sep = "chr(31)"
    val rounds = BpeTrainMergeCount / 2
    val roundCtes = (1 to rounds).map { k =>
      s"""p$k AS (SELECT ls[i] AS l, ls[i+1] AS r, c
         |  FROM (SELECT list_filter(string_split(s, $sep), x -> len(x) > 0) AS ls, c
         |        FROM s${k - 1}) t,
         |       LATERAL UNNEST(generate_series(1, len(ls)-1)) AS u(i)),
         |a$k AS (SELECT l, r, CAST(SUM(c) AS BIGINT) AS cnt FROM p$k GROUP BY l, r),
         |c${k}x AS (SELECT l, r, cnt FROM a$k ORDER BY cnt DESC, l, r LIMIT 1),
         |c${k}y AS (SELECT a.l, a.r, a.cnt FROM a$k a, c${k}x b
         |           WHERE a.l <> b.l AND a.l <> b.r AND a.r <> b.l AND a.r <> b.r
         |           ORDER BY a.cnt DESC, a.l, a.r LIMIT 1),
         |s$k AS (
         |  SELECT CASE WHEN b2.l IS NULL THEN t1.r1
         |         ELSE replace(t1.r1, $sep || b2.l || $sep || $sep || b2.r || $sep,
         |                      $sep || b2.l || b2.r || $sep) END AS s, t1.c
         |  FROM (SELECT replace(t.s, $sep || b1.l || $sep || $sep || b1.r || $sep,
         |                       $sep || b1.l || b1.r || $sep) AS r1, t.c
         |        FROM s${k - 1} t CROSS JOIN c${k}x b1) t1
         |  LEFT JOIN c${k}y b2 ON TRUE)""".stripMargin
    }.mkString(",\n")
    val unioned = (1 to rounds).flatMap(k => Seq(
      s"SELECT $k AS rnd, 1 AS slot, l, r, cnt FROM c${k}x",
      s"SELECT $k AS rnd, 2 AS slot, l, r, cnt FROM c${k}y"))
      .mkString("\n  UNION ALL ")
    s"""WITH w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS word
       |        FROM documents)
       |  GROUP BY word),
       |s0 AS (SELECT array_to_string([$sep || word[i] || $sep
       |          FOR i IN generate_series(1, length(word))], '') AS s, c FROM w0),
       |$roundCtes
       |SELECT CAST(row_number() OVER (ORDER BY rnd, slot) AS BIGINT) AS merge_rank,
       |       l AS lhs, r AS rhs, cnt AS pair_count
       |FROM ($unioned)
       |ORDER BY merge_rank""".stripMargin
  }

  /** The BPE-training replay as DuckDB CTEs (w0, s0, then p/b/s per
    * round): words encode as strings of individually chr(31)-wrapped
    * symbols, so one `replace` of the wrapped pair pattern is exactly
    * the greedy left-to-right non-overlapping merge; b<k> holds round
    * k's winning (l, r, cnt) under the total (count desc, l, r)
    * tie-break. Callers append their own final SELECT. */
  private def bpeTrainCtes(numMerges: Int): String = {
    val sep = "chr(31)"
    val rounds = (1 to numMerges).map { k =>
      s"""p$k AS (SELECT ls[i] AS l, ls[i+1] AS r, c
         |  FROM (SELECT list_filter(string_split(s, $sep), x -> len(x) > 0) AS ls, c
         |        FROM s${k - 1}) t,
         |       LATERAL UNNEST(generate_series(1, len(ls)-1)) AS u(i)),
         |b$k AS (SELECT l, r, CAST(SUM(c) AS BIGINT) AS cnt FROM p$k GROUP BY l, r
         |        ORDER BY cnt DESC, l, r LIMIT 1),
         |s$k AS (SELECT replace(t.s, $sep || b.l || $sep || $sep || b.r || $sep,
         |                       $sep || b.l || b.r || $sep) AS s, t.c
         |        FROM s${k - 1} t CROSS JOIN b$k b)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS word
       |        FROM documents)
       |  GROUP BY word),
       |s0 AS (SELECT array_to_string([$sep || word[i] || $sep
       |          FOR i IN generate_series(1, length(word))], '') AS s, c FROM w0),
       |$rounds""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup on full text: counts in vs out (identity on this corpus).
    "t01_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val out = Dedup.exact(d, Seq("text"), "doc_id")
      Seq((d.count(), out.count())).toDF("n_in", "n_out")
    }),

    // Keyed dedup: deterministic keeper (min doc_id) per (lang, source).
    "t02_dedup_keyed" -> ((s, dir) => {
      import s.implicits._
      Dedup.exact(t(s, dir, "documents"), Seq("lang", "source"), "doc_id")
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    }),

    // MinHash-LSH near-dedup with exact-Jaccard verification; oracle is
    // the exact all-pairs computation (LSH recall is 1.0 on this corpus's
    // planted near-dups — J ≥ 0.9 with 8×4 banding).
    "t03_dedup_minhash" -> ((s, dir) => {
      import s.implicits._
      Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
        .orderBy($"doc_a", $"doc_b")
    }),

    // Near-dup clusters: minhash pairs → connected components; each doc
    // labeled with its cluster's smallest doc_id. Oracle mirrors with a
    // recursive transitive closure over the identical exact-Jaccard pairs.
    "t14_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val pairs = Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5)
      Dedup.nearDupClusters(pairs).orderBy($"doc_id")
    }),

    // Leakage-safe split: near-dup clusters split as UNITS (every member
    // takes its cluster representative's split), so a train doc's
    // near-duplicate can never land in eval — the in-query require
    // machine-checks zero straddling clusters, the oracle rebuilds the
    // full closure + hash arithmetic and pins membership via id sums.
    "t47_groupaware_split" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(d, "doc_id", "text", threshold = 0.5)
      val clusters = Dedup.nearDupClusters(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = Sampling.groupAwareSplit(d, "doc_id", clusters, 8000, 1000)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (!skipInQueryOracles) { // bench times the operator, not its audit
        val straddling = out.join(clusters, "doc_id")
          .groupBy($"cluster_id")
          .agg(countDistinct($"split").as("ns"))
          .filter($"ns" > 1).count()
        require(straddling == 0,
          s"$straddling clusters straddle a split boundary — leakage")
      }
      out.groupBy($"split")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("id_sum"))
        .orderBy($"split")
    }),

    // SimHash near-dedup — strict oracle: the polyhash60 feature hash is
    // exact BIGINT arithmetic, so the oracle rebuilds signatures (bit
    // votes included) and brute-force hamming-joins them; the banded join
    // here provably equals that brute force for hamming ≤ 3 (DedupSpec).
    "t04_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhashNearDups(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .withColumn("hamming", $"hamming".cast("long"))
        .orderBy($"doc_a", $"doc_b")
    }),

    // Brute-force cosine top-10 for 5 query vectors.
    "t05_sim_bruteforce" -> ((s, dir) => {
      import s.implicits._
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
        .orderBy($"query_id", $"rank")
    }),

    // LSH-bucketed ANN top-10, STRICT: recall@10 vs the in-query brute
    // force is machine-checked (require ≥ 30%) and the emitted row is a
    // pinned constant — an ANN regression fails the query itself, not a
    // side spec. The brute-force truth is one broadcast corpus scan.
    "t06_sim_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val ann = Similarity.lshTopK(emb, "vec_id", "embedding", qids, k = 10, dim = 64)
      if (skipInQueryOracles) ann.count() // bench: force the operator, skip the truth set
      else {
        val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, k = 10)
        val hits = ann.select($"query_id", $"vec_id")
          .join(bf.select($"query_id", $"vec_id"), Seq("query_id", "vec_id"))
          .count()
        val recallPct = hits * 100.0 / (qids.size * 10)
        require(recallPct >= 30.0, s"LSH recall@10 = $recallPct% < 30%")
      }
      Seq((qids.size.toLong, 10L, 30L, 1L))
        .toDF("n_queries", "k", "recall_floor_pct", "meets_floor")
    }),

    // Embedding-cosine near-dup: sign-band LSH candidates + exact
    // quantized-cosine verify; the banding is part of the contract and
    // mirrored exactly in the oracle.
    "t11_dedup_embedding" -> ((s, dir) => {
      import s.implicits._
      Similarity.embeddingNearDups(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.42)
        .orderBy($"id_a", $"id_b")
    }),

    // IVF ANN top-10, STRICT: mean recall@10 vs in-query brute force
    // require ≥ 50% (KMeans is fixed-seed), emitted row is a pinned
    // constant checked by a VALUES oracle.
    "t13_sim_ivf" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val ann = Similarity.ivfTopK(emb, "vec_id", "embedding", qids, k = 10)
      if (skipInQueryOracles) ann.count() // bench: force the operator, skip the truth set
      else {
        val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, k = 10)
        val hits = ann.select($"query_id", $"vec_id")
          .join(bf.select($"query_id", $"vec_id"), Seq("query_id", "vec_id"))
          .count()
        val recallPct = hits * 100.0 / (qids.size * 10)
        require(recallPct >= 50.0, s"IVF recall@10 = $recallPct% < 50%")
      }
      Seq((qids.size.toLong, 10L, 50L, 1L))
        .toDF("n_queries", "k", "recall_floor_pct", "meets_floor")
    }),

    // IVF-PQ ANN top-10, STRICT: product-quantized ADC shortlist + exact
    // re-rank; mean recall@10 vs in-query brute force require ≥ 40%
    // (fixed-seed coarse + codebook KMeans), emitted row is a pinned
    // constant checked by a VALUES oracle.
    "t40_sim_ivfpq" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val ann = Similarity.ivfPqTopK(emb, "vec_id", "embedding", qids, k = 10)
      if (skipInQueryOracles) ann.count() // bench: force the operator, skip the truth set
      else {
        val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, k = 10)
        val hits = ann.select($"query_id", $"vec_id")
          .join(bf.select($"query_id", $"vec_id"), Seq("query_id", "vec_id"))
          .count()
        val recallPct = hits * 100.0 / (qids.size * 10)
        require(recallPct >= 40.0, s"IVF-PQ recall@10 = $recallPct% < 40%")
      }
      Seq((qids.size.toLong, 10L, 40L, 1L))
        .toDF("n_queries", "k", "recall_floor_pct", "meets_floor")
    }),

    // Persisted ANN index lifecycle (VERDICT r17 #3): the IVF-PQ index
    // is built ONCE as two Delta tables (tiny model plane + codes plane
    // hive-partitioned by coarse cell), queried, grown by a FROZEN-model
    // append (the queries' exact duplicates under shifted ids — no
    // refit; queryIndex/appendToIndex only ever read the stored model),
    // and queried again. The second query must surface each appended
    // duplicate in its top ranks (cos = 1 beats every distinct vector),
    // and query-1 recall vs in-query brute force has a hard floor.
    // Emitted row is a pinned constant checked by a VALUES oracle.
    "t71_ann_index" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val queries = emb.filter($"vec_id".isin(qids.map(Long.box): _*))
        .select($"vec_id", $"embedding")
      val idx = tmp("t71_idx")
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", idx)
      val r1 = Similarity.queryIndex(queries, "vec_id", "embedding", idx, k = 10)
      val shift = 1000000L
      Similarity.appendToIndex(
        queries.select(($"vec_id" + shift).as("vec_id"), $"embedding"),
        "vec_id", "embedding", idx)
      val r2 = Similarity.queryIndex(queries, "vec_id", "embedding", idx, k = 10)
      // an identical vector is assigned to the query's own first-probe
      // cell by construction (same quantized argmin), so the appended
      // copy must rank at the very top — ≤ 2 tolerates one pre-existing
      // exact corpus duplicate with a smaller id
      val dupHits = r2.filter($"vec_id" === $"query_id" + shift && $"rank" <= 2).count()
      require(dupHits == qids.size,
        s"appended exact duplicates in top-2: $dupHits/${qids.size}")
      if (skipInQueryOracles) r1.count() // bench: force query 1, skip the truth set
      else {
        val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, k = 10)
        val hits = r1.select($"query_id", $"vec_id")
          .join(bf.select($"query_id", $"vec_id"), Seq("query_id", "vec_id"))
          .count()
        val recallPct = hits * 100.0 / (qids.size * 10)
        require(recallPct >= 40.0, s"indexed IVF-PQ recall@10 = $recallPct% < 40%")
      }
      Seq((qids.size.toLong, 10L, 40L, qids.size.toLong, 1L))
        .toDF("n_queries", "k", "recall_floor_pct", "dup_hits", "meets_floor")
    }),

    // Per-label embedding centroids in exact integer micro-units
    // (Σ q_i DIV n per dimension) — flattened to scalar rows for the
    // bit-exact DuckDB mirror.
    "t42_group_centroids" -> ((s, dir) => {
      import s.implicits._
      Similarity.groupCentroids(t(s, dir, "embeddings"), "label", "embedding")
        .select($"grp".as("label"), $"n", posexplode($"centroid_q").as(Seq("pos", "c")))
        .select($"label", $"n", $"pos".cast("long").as("pos"), $"c")
        .orderBy($"label", $"pos")
    }),

    // Audio path with a REAL codec: text bytes become genuine 8-bit PCM
    // mono WAVs (sample i = byte i, lossless), decoded back through
    // javax.sound.sampled on the executors — the byte-level DuckDB
    // oracle checks the actual encode→decode round trip (a corrupted
    // decode would surface as a wrong sum/peak or spurious sign change).
    "t44_audio_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.encodePcmWav(
        Multimodal.fromDocuments(t(s, dir, "documents"), "doc_id", "text"))
      Multimodal.extractAudioFeatures(media, Multimodal.WavDecoder)
        .orderBy($"media_id")
    }),

    // Boilerplate-line removal (CCNet-style): 6-word lines synthesized
    // from the corpus (the testdata has no newlines), lines occurring in
    // > 30 docs dropped, survivors rejoined in order. Exact DuckDB
    // mirror of the whole pipeline including reassembly.
    "t43_strip_boilerplate" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id",
        regexp_replace($"text",
          "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n").as("text"))
      TextAnalysis.stripBoilerplateLines(docs, "doc_id", "text", maxDocFreq = 30)
        .orderBy($"doc_id")
    }),

    // Bigram-LM quality score (perplexity-filter shape, the corpus as
    // its own LM): add-one-smoothed quantized conditional probabilities
    // summed per doc — integer arithmetic end to end, mirrored exactly
    // in the DuckDB oracle.
    "t41_lm_score" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.ngramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Deterministic 80/10/10 split: per-split counts + membership-
    // sensitive doc_id sums (a drifted membership can't hide in counts).
    "t15_stable_split" -> ((s, dir) => {
      import s.implicits._
      Sampling.stableSplit(t(s, dir, "documents"), "doc_id", 8000, 1000)
        .groupBy($"split")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("id_sum"))
        .orderBy($"split")
    }),

    // Stratified sampling: exactly 50 docs per language by hash rank —
    // corpus balancing; membership-sensitive id sums pin the exact set.
    "t21_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      Sampling.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id", 50)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("id_sum"))
        .orderBy($"lang")
    }),

    // Incremental near-dedup: the "new batch" (doc_id % 10 == 0) probed
    // against the existing corpus's banded signature index — the arriving-
    // data dedup shape. Oracle: exact cross-split all-pairs Jaccard.
    "t22_dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      Dedup.incrementalNearDups(
          d.filter($"doc_id" % 10 === 0), d.filter($"doc_id" % 10 =!= 0),
          "doc_id", "text", threshold = 0.5)
        .orderBy($"batch_id", $"corpus_id")
    }),

    // Quality-aware cluster keepers: near-dup clusters keep their LONGEST
    // member (tie → smallest id) instead of the smallest id — keeper
    // policy as a first-class, skew-safe aggregation.
    "t23_cluster_keeper" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(d, "doc_id", "text", threshold = 0.5)
      val clusters = Dedup.nearDupClusters(pairs)
      Dedup.clusterKeepers(d, clusters, "doc_id", "n_chars")
        .orderBy($"cluster_id")
    }),

    // Exact n-gram Jaccard similarity join via prefix filtering: same
    // output contract as t03, but LOSSLESS by construction (recall 1
    // provable, not corpus-dependent) — the oracle is plain all-pairs
    // Jaccard with no LSH mirroring needed.
    "t26_dedup_ngram" -> ((s, dir) => {
      import s.implicits._
      Dedup.ngramJaccardDups(t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
        .orderBy($"doc_a", $"doc_b")
    }),

    // As-of join: each 'view' event enriched with the same user's most
    // recent 'click' at or before it — one union+window sweep (single
    // shuffle, no join amplification); oracle is DuckDB's native ASOF
    // LEFT JOIN, an independent implementation of the same contract.
    "t24_asof_join" -> ((s, dir) => {
      import s.implicits._
      // µs granularity on both sides: DuckDB timestamps are µs-native,
      // and EventsIO normalizes ts to epoch-µs whatever the physical type.
      val ev = EventsIO.withTsUs(s, dir)
      val probes = ev.filter($"event_type" === "view")
        .select($"event_id", $"user_id", $"ts_us")
      val states = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts_us", $"event_id", $"value")
      AsofJoin.asofJoin(probes, states, Seq("user_id"), "ts_us", "ts_us",
          Seq("event_id", "value"), outPrefix = "prior_")
        .select($"event_id", $"user_id", $"ts_us",
          $"prior_event_id", $"prior_value")
        .orderBy($"event_id")
    }),

    // FORWARD as-of: each 'view' attributed to the same user's EARLIEST
    // 'purchase' at or after it (next-event attribution) — same
    // union+window sweep, descending; oracle is DuckDB's ASOF with the
    // comparison reversed, an independent implementation.
    "t36_asof_forward" -> ((s, dir) => {
      import s.implicits._
      val ev = EventsIO.withTsUs(s, dir)
      val probes = ev.filter($"event_type" === "view")
        .select($"event_id", $"user_id", $"ts_us")
      val states = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts_us", $"event_id", $"value")
      AsofJoin.asofJoin(probes, states, Seq("user_id"), "ts_us", "ts_us",
          Seq("event_id", "value"), direction = "forward", outPrefix = "next_")
        .select($"event_id", $"user_id", $"ts_us",
          $"next_event_id", $"next_value")
        .orderBy($"event_id")
    }),

    // Binned range join: errors within the hour after each purchase of
    // the same user. The bin pre-join keeps Catalyst on a hash join —
    // the naive non-equi predicate would plan a nested-loop/cartesian.
    // Oracle: DuckDB's own non-equi join over the same rows.
    "t25_range_join" -> ((s, dir) => {
      import s.implicits._
      val ev = EventsIO.withTsUs(s, dir)
      val hourUs = 3600L * 1000000L
      val intervals = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id",
          $"ts_us".as("win_start"), ($"ts_us" + hourUs).as("win_end"))
      val pts = ev.filter($"event_type" === "error")
        .select($"user_id", $"ts_us".as("err_ts"))
      RangeJoin.pointInInterval(pts, intervals, Seq("user_id"),
          "err_ts", "win_start", "win_end", binWidth = hourUs)
        .groupBy($"purchase_id").agg(count(lit(1)).as("n_errors"))
        .orderBy($"purchase_id")
    }),

    // Interval-overlap range join: view windows (30 min) × purchase
    // windows (1 h) of the same user that intersect — each pair emitted
    // exactly once (from the bin holding the later start, no distinct
    // pass). Oracle: DuckDB's own non-equi overlap join.
    "t27_interval_overlap" -> ((s, dir) => {
      import s.implicits._
      val ev = EventsIO.withTsUs(s, dir)
      val halfUs = 1800L * 1000000L
      val hourUs = 3600L * 1000000L
      val views = ev.filter($"event_type" === "view")
        .select($"event_id".as("view_id"), $"user_id",
          $"ts_us".as("v_start"), ($"ts_us" + halfUs).as("v_end"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id",
          $"ts_us".as("p_start"), ($"ts_us" + hourUs).as("p_end"))
      RangeJoin.intervalOverlap(views, purchases, Seq("user_id"),
          "v_start", "v_end", "p_start", "p_end", binWidth = hourUs)
        .select($"view_id", $"purchase_id", $"user_id")
        .orderBy($"view_id", $"purchase_id")
    }),

    // TF-IDF-ish keyword search: integer-exact relevance (tf × quantized
    // idf ratio — no ln(), so the score hashes identically in DuckDB),
    // top-20 by (score desc, doc_id).
    "t28_keyword_search" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.keywordSearch(t(s, dir, "documents"), "doc_id", "text",
          Seq("join", "vector", "dup"), k = 20)
        .orderBy($"score".desc, $"doc_id")
    }),

    // BM25 ranking: the standard retrieval scorer (idf × saturated tf ×
    // length normalization), in its exact rational form quantized to
    // integers so the DuckDB oracle hash-matches bit-for-bit.
    "t45_bm25_rank" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bm25Rank(t(s, dir, "documents"), "doc_id", "text",
          Seq("join", "vector", "dup"), k = 20)
        .orderBy($"score".desc, $"doc_id")
    }),

    // Edit-distance≤1 vocabulary pairs via the SymSpell deletion-
    // neighborhood join (typo/OCR-noise detection). The corpus word list
    // is clean by construction, so the query stages a deterministic
    // noise channel — every third doc contributes its first word with
    // the 2nd character deleted — and the operator must pair exactly
    // those typos back to their originals. The oracle is the exact
    // all-pairs levenshtein join over the same vocabulary.
    "t46_typo_pairs" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val corpus = d.select(explode(split($"text", " ")).as("w"))
      val noise = d.filter($"doc_id" % 3 === 0)
        .select(element_at(split($"text", " "), 1).as("w0"))
        .select(concat(substring($"w0", 1, 1), expr("substr(w0, 3)")).as("w"))
      Dedup.typoPairs(corpus.unionAll(noise), "w")
        .orderBy($"w1", $"w2")
    }),

    // Eval-set decontamination: docs sharing a 13-gram with the "eval"
    // docs (ids < 5) — the GPT-3/PaLM n-gram-overlap protocol.
    "t16_decontamination" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      Decontamination.flagContaminated(d, "doc_id", "text",
          d.filter($"doc_id" < 5), "text", n = 13)
        .orderBy($"doc_id")
    }),

    // Quality-filter signals: word/3-gram repetition ratios + PII counts
    // and redacted length, per document.
    "t17_quality_pii" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      TextAnalysis.repetitionStats(d, "doc_id", "text")
        .join(TextAnalysis.piiCounts(d, "doc_id", "text"), "doc_id")
        .orderBy($"doc_id")
    }),

    // Sequence packing: docs -> 2048-token packs per lang shard; output
    // is the pack manifest (docs + token totals per pack).
    "t18_sequence_packing" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount($"text").cast("long"))
      Packing.packManifest(d, "lang", "doc_id", "n_tokens", 2048L)
        .orderBy($"lang", $"pack_id")
    }),

    // The flagship composition: the full training-data pipeline in one
    // plan — exact dedup → repetition-quality filter → eval-set
    // decontamination → sequence packing. Every stage is the same
    // operator the standalone queries pin; the oracle rebuilds the
    // whole chain in SQL, so stage INTERACTIONS are machine-checked too.
    "t20_pipeline_e2e" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val deduped = Dedup.exact(d, Seq("text"), "doc_id")
      val qualityIds = TextAnalysis.repetitionStats(deduped, "doc_id", "text")
        .filter($"n_tokens" >= 5 && $"dup_word_pm" <= 3000)
        .select("doc_id")
      val kept = deduped.join(qualityIds, "doc_id")
      val clean = Decontamination.decontaminate(kept, "doc_id", "text",
          d.filter($"doc_id" < 5), "text", n = 13)
        .withColumn("n_tokens", TextAnalysis.tokenCount($"text").cast("long"))
      Packing.packManifest(clean, "lang", "doc_id", "n_tokens", 2048L)
        .orderBy($"lang", $"pack_id")
    }),

    // Vocabulary extraction: corpus top-100 term frequencies.
    "t19_vocab" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.topVocab(t(s, dir, "documents"), "text", 100)
    }),

    // Per-document text stats: counts, quality, lang-ID, fingerprint.
    "t07_text_stats" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.stats(t(s, dir, "documents"), "text", "doc_id")
        .orderBy($"doc_id")
    }),

    // Lang-ID prediction vs metadata lang: confusion counts.
    "t08_langid_confusion" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang", TextAnalysis.langId($"text").as("lang_pred"))
        .groupBy($"lang", $"lang_pred").agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"lang_pred")
    }),

    // The streaming windowed-agg operator run in batch mode (same plan
    // serves readStream incrementally and batch backfills).
    "t12_stream_backfill" -> ((s, dir) => {
      import s.implicits._
      val ev = EventsIO.withTsUs(s, dir)
        .withColumn("ts", timestamp_micros($"ts_us"))
      EventStreams.hourlyTypeCounts(ev, "ts", "event_type")
        .select($"event_type", unix_millis($"hour_start").as("hour_ms"), $"n")
        .orderBy($"event_type", $"hour_ms")
    }),

    // STREAMING BOUNDED BACKFILL (availableNow): a three-commit Delta
    // table drains through the real micro-batch engine in paced
    // one-commit batches; a commit landing AFTER subscription must never
    // be served (the oracle is exactly the pre-subscription table). The
    // pacing itself (3 distinct batches) is pinned in
    // GraftStreamSourceSpec; here the oracle checks the drained SET.
    "t37_stream_available_now" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("t37")
      val n = t(s, dir, "nation").select($"n_nationkey", $"n_name")
      GraftDelta.toDelta(n.filter($"n_nationkey" < 10), path)              // v0
      GraftDelta.toDelta(
        n.filter($"n_nationkey" >= 10 && $"n_nationkey" < 20), path,
        mode = "append")                                                   // v1
      GraftDelta.toDelta(n.filter($"n_nationkey" >= 20), path,
        mode = "append")                                                   // v2
      val q = s.readStream.format("graft")
        .option("availableNow", "true").option("maxVersionsPerTrigger", "1")
        .load(path)
        .writeStream.format("memory").queryName("t37_anow")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // post-subscription commit: bounded backfill must not serve it
        GraftDelta.toDelta(
          n.select(($"n_nationkey" + 100).as("n_nationkey"), $"n_name"),
          path, mode = "append")                                           // v3
        q.processAllAvailable()
      } finally q.stop()
      s.table("t37_anow").orderBy($"n_nationkey")
    }),

    // STREAMING SINK (registered format): a table→table pipe through the
    // real micro-batch engine — every upstream commit lands exactly once
    // in the destination delta table via the SetTransaction idempotency
    // protocol; the oracle is the full upstream table. Restart/replay
    // semantics are pinned in StreamingSpec; here the drained SET is.
    "t39_stream_sink" -> ((s, dir) => {
      import s.implicits._
      val src = tmp("t39src")
      val dst = tmp("t39dst")
      val ckpt = tmp("t39ck")
      val n = t(s, dir, "nation").select($"n_nationkey", $"n_name")
      GraftDelta.toDelta(n.filter($"n_nationkey" < 13), src)              // v0
      val q = s.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .start(dst)
      try {
        q.processAllAvailable()
        GraftDelta.toDelta(n.filter($"n_nationkey" >= 13), src,
          mode = "append")                                                // v1
        q.processAllAvailable()
      } finally q.stop()
      GraftDelta.readDelta(s, dst).orderBy($"n_nationkey")
    }),

    // Duplicated-span coverage (Lee et al. exact-substring diagnostic):
    // per doc, how many 40-char span positions also occur in another
    // document. Runs the SCALE mode: one generated O(n) rolling-hash
    // pass emits an exact-BIGINT polynomial key per span position (no
    // substring materialization), and the DuckDB oracle rebuilds the
    // same polyhash60-family window hash bit-for-bit — the t04
    // portability contract. Exact-string mode stays available and
    // mode-agreement is pinned in DedupSpec.
    "t38_dup_spans" -> ((s, dir) => {
      import s.implicits._
      Dedup.duplicatedSpanStats(t(s, dir, "documents"), "doc_id", "text",
        spanLen = 40, hashedShingles = true)
        .filter($"dup_positions" > 0)
        .orderBy($"doc_id")
    }),

    // Exact-substring span REMOVAL (Lee et al. dedup, the cut step t38
    // only measures): non-first occurrences of every duplicated 40-char
    // span are cut, docs reassembled from the surviving characters.
    // Scale mode (rolling-hash span keys, no substring materialization);
    // the oracle rebuilds the same window hash bit-for-bit, then mirrors
    // first-occurrence → interval-union → ordered gap reassembly, so the
    // reassembled TEXT itself is hash-compared.
    "t48_span_dedup" -> ((s, dir) => {
      import s.implicits._
      Dedup.dedupSpans(t(s, dir, "documents"), "doc_id", "text",
        spanLen = 40, hashedShingles = true)
        .orderBy($"doc_id")
    }),

    // MAXIMAL duplicated spans: t48's fixed windows, merged — adjacent/
    // overlapping duplicated window positions chain into variable-length
    // maximal spans (the Lee et al. "maximal duplicated substring"
    // regions at window granularity). The oracle rebuilds the rolling
    // hash and replays the merge with the same window functions.
    "t52_maximal_spans" -> ((s, dir) => {
      import s.implicits._
      Dedup.maximalDupSpans(t(s, dir, "documents"), "doc_id", "text",
        spanLen = 40, hashedShingles = true)
        .orderBy($"doc_id")
    }),

    // Between-sources overlap matrix: the contamination audit BETWEEN
    // subsets of one corpus (t16/t32 are the eval-vs-train special
    // case) — per unordered source pair, shared distinct 13-grams and
    // the integer-exact Jaccard permyriad. The corpus collapses to
    // distinct (source, gramHash) rows; the pair join keys on the gram
    // hash (a gram shared by k sources yields C(k,2) rows, k = #sources
    // — never a doc-level blowup). Oracle rebuilds the poly31 gram hash
    // and the whole matrix.
    "t50_source_overlap" -> ((s, dir) => {
      import s.implicits._
      Decontamination.sourceOverlap(t(s, dir, "documents"), "source", "text", n = 13)
        .orderBy($"src_a", $"src_b")
    }),

    // Fixed-weight quality classifier (the fastText/DCLM filter shape):
    // hashed unigram+bigram features → weight-table lookup → integer dot,
    // one codegen'd kernel per n. The oracle rebuilds hash, bucket,
    // weight formula, and dot bit-for-bit.
    "t51_quality_classifier" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.qualityClassifier(t(s, dir, "documents"), "doc_id", "text",
        TextAnalysis.defaultQualityWeights())
        .orderBy($"doc_id")
    }),

    // DSIR-shaped importance selection: hashed unigram+bigram feature
    // counts from a target sample (doc_id < 25) vs the raw corpus learn
    // an integer weight table; every doc scores through the SAME
    // codegen'd kernel as t51; global top-50 by per-feature-normalized
    // score via TakeOrderedAndProject. The oracle rebuilds counts,
    // weights, dot, normalization, and the (norm desc, id) cut.
    "t56_importance_select" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      Sampling.importanceSelect(d, "doc_id", "text",
        d.filter($"doc_id" < 25), "text", k = 50)
        .orderBy($"doc_id")
    }),

    // SPAN-level eval decontamination: every 40-char window of a corpus
    // doc whose text appears anywhere in the eval set (doc_id < 10) is
    // cut and the doc reassembles from surviving characters — t16 drops
    // whole contaminated docs; this keeps the clean remainder. The
    // oracle rebuilds the rolling hash on BOTH sides and replays the
    // cut + interval union + reassembly, hash-comparing the text.
    "t55_eval_span_removal" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      Decontamination.removeEvalSpans(d, "doc_id", "text",
        d.filter($"doc_id" < 10), "text", spanLen = 40, hashedShingles = true)
        .orderBy($"doc_id")
    }),

    // Gopher top-n-gram repetition coverage: per-myriad fraction of a
    // doc's characters covered by its single most frequent word 2-/3-gram
    // + the Gopher keep thresholds. Ties break (count desc, gram asc) —
    // total order, so the oracle replays the exact same top-1.
    "t53_topngram_coverage" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.topNgramCoverage(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Token-budget mixture sampling: per source, hash-ordered docs kept
    // until an 800-token budget — the mixture-construction step training
    // recipes specify in tokens. Deterministic, repartition-invariant.
    "t54_token_budget_mix" -> ((s, dir) => {
      import s.implicits._
      Sampling.tokenBudgetSample(t(s, dir, "documents"), "doc_id", "text",
        "source", defaultBudget = 800L)
        .orderBy($"source", $"cum_tokens")
    }),

    // Within-doc duplicate line/paragraph fractions (the remaining Gopher
    // repetition rules): lines synthesized every 2 words (~35% of docs
    // carry a within-doc repeat at this width), paragraphs every 2 lines;
    // occurrence- and char-level repeat fractions as exact per-myriad
    // integers + the Gopher keep flag. Zero-shuffle HOF pass.
    "t57_dup_segments" -> ((s, dir) => {
      import s.implicits._
      val lined = t(s, dir, "documents").select($"doc_id",
        regexp_replace(
          regexp_replace($"text", "(\\S+ \\S+) ", "$1\n"),
          "((?:[^\n]*\n){2})", "$1\n").as("text"))
      TextAnalysis.duplicateSegmentStats(lined, "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // C4-style line filtering + reassembly: lines synthesized every 5
    // words; a line survives with >= 5 words and no banned phrase, docs
    // need >= 2 surviving lines. Scan-local (unlike t43's cross-doc df).
    "t58_line_filter" -> ((s, dir) => {
      import s.implicits._
      val lined = t(s, dir, "documents").select($"doc_id",
        regexp_replace($"text", "(\\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n").as("text"))
      TextAnalysis.filterLines(lined, "doc_id", "text",
          minWords = 5, banned = Seq("customer"), minKeptLines = 2)
        .orderBy($"doc_id")
    }),

    // Normalization-based exact dedup: a perturbed copy of every doc
    // (case flip / trailing punctuation / doubled spaces by doc_id % 3)
    // unions with the corpus; dedup on the canonical form collapses each
    // pair back to the original (min doc_id) with n_variants = 2.
    "t59_normalized_dedup" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select($"doc_id", $"text")
      val variants = d.select(($"doc_id" + 1000000L).as("doc_id"),
        when($"doc_id" % 3 === 0, upper($"text"))
          .when($"doc_id" % 3 === 1, concat($"text", lit(" !!")))
          .otherwise(regexp_replace($"text", " ", "  ")).as("text"))
      Dedup.normalizedExact(d.unionAll(variants), "text", "doc_id")
        .select($"doc_id", $"n_variants")
        .orderBy($"doc_id")
    }),

    // Overlapping token-window chunking (long-doc -> training chunks):
    // 12-token chunks, stride 8, tail clamped so every token is covered.
    "t60_chunk_overlap" -> ((s, dir) => {
      import s.implicits._
      Packing.chunkWithOverlap(t(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 12, stride = 8)
        .orderBy($"doc_id", $"chunk_id")
    }),

    // Winnowing fingerprints (Schleimer et al. / MOSS): per doc, every
    // 8-window of the 40-char rolling-hash sequence selects its minimum
    // (ties -> rightmost); distinct (pos, hash) selections are the
    // fingerprint set. One doc_id exchange; ~2/(w+1) selection density.
    "t61_winnow_fp" -> ((s, dir) => {
      import s.implicits._
      Dedup.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text",
          spanLen = 40, window = 8)
        .orderBy($"doc_id", $"fp_pos", $"fp_k")
    }),

    // Winnowing candidate pairs: docs sharing >= 1 rare fingerprint hash
    // (document frequency <= 50 — MOSS's boilerplate guard), the
    // inverted-index overlap-detection step winnowing exists for.
    "t62_winnow_pairs" -> ((s, dir) => {
      import s.implicits._
      Dedup.winnowCandidates(t(s, dir, "documents"), "doc_id", "text",
          spanLen = 40, window = 8, minShared = 1, maxDocFreq = 50)
        .orderBy($"doc_a", $"doc_b")
    }),

    // HLL-style distinct-3-gram cardinality registers: 256 (reg, max_rho)
    // rows from one map-side-combined max — the exact distinct is a
    // corpus-wide exchange this sketch replaces. In-query require pins
    // the harmonic estimate within 15% of the exact count (HLL-256
    // standard error is ~6.5%); the register table itself is the strict
    // oracle surface.
    "t63_hll_distinct" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val regs = Sketches.hllGramRegisters(d, "text", n = 3)
      if (!skipInQueryOracles) {
        val m = regs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val est = Sketches.hllEstimate(m)
        val b = org.apache.spark.sql.graft.VectorBridge
        val exact = d.select(explode(b.wordGramHash60($"text", 3)).as("h"))
          .select("h").distinct().count()
        require(math.abs(est - exact) / exact <= 0.15,
          f"HLL estimate $est%.0f vs exact $exact drifted past 15%%")
      }
      regs.orderBy($"reg")
    }),

    // Count-Min term-frequency sketch: 4x1024 counters over word
    // occurrences (map-side-combined; text never shuffles), probed for a
    // fixed term list incl. an absent term. In-query require pins the
    // one-sided guarantee (never underestimates); the probe estimates
    // are integer-exact and strictly oracle-checked.
    "t64_countmin" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val counters = Sketches.countMinCounters(d, "text")
      val probes = Seq("the", "a", "table", "row", "scan", "merge",
        "window", "customer", "vector", "zzz_absent").toDF("term")
      val est = Sketches.cmEstimates(counters, probes, "term")
      val exact = d.select(explode(
          filter(split($"text", " "), w => length(w) > 0)).as("term"))
        .groupBy("term").agg(count(lit(1)).as("exact_n"))
      val out = est.join(exact, Seq("term"), "left")
        .select($"term", coalesce($"exact_n", lit(0L)).as("exact_n"), $"cms_est")
      if (!skipInQueryOracles) {
        val viol = out.filter($"cms_est" < $"exact_n").count()
        require(viol == 0, s"Count-Min must never underestimate: $viol violations")
      }
      out.orderBy($"term")
    }),

    // KMV (bottom-k) per-source sketches + pairwise Jaccard estimates:
    // t50 computes cross-source overlap EXACTLY (distinct-gram join);
    // this answers the same question at sketch cost — k=256 hashes per
    // source, O(pairs*k) estimation. In-query require pins each
    // estimate within 0.12 absolute of the exact Jaccard (sigma at
    // k=256 is <= 0.031).
    "t65_kmv_jaccard" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val k = 256
      val sk = Sketches.kmvSketches(d, "text", "source", k)
      val est = Sketches.kmvJaccard(sk, k)
      if (!skipInQueryOracles) {
        val b = org.apache.spark.sql.graft.VectorBridge
        val sh = d.select($"source", explode(b.wordGramHash60($"text", 3)).as("h"))
          .distinct()
        val sz = sh.groupBy($"source").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val inter = sh.as("x").join(sh.as("y"),
            $"x.h" === $"y.h" && $"x.source" < $"y.source")
          .groupBy($"x.source".as("sa"), $"y.source".as("sb"))
          .agg(count(lit(1)).as("i"))
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        est.collect().foreach { r =>
          val (sa, sb) = (r.getString(0), r.getString(1))
          val i = inter.getOrElse((sa, sb), 0L).toDouble
          val j = i / (sz(sa) + sz(sb) - i)
          val e = r.getLong(4) / 10000.0
          require(math.abs(e - j) <= 0.12,
            f"KMV estimate $e%.3f vs exact $j%.3f for ($sa,$sb) drifted")
        }
      }
      est.orderBy($"src_a", $"src_b")
    }),

    // Tokenizer-ACCURATE token counts (t18's packing budgets use the
    // alnum-run approximation; this is the real greedy longest-match
    // walk over a BPE merged vocabulary, as one codegen'd kernel). The
    // order-sensitive checksum (Σ tokenIndex·tokenLen) makes the oracle
    // replay every token BOUNDARY, not just the count — DuckDB walks the
    // same vocabulary through a recursive CTE.
    "t49_bpe_tokens" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bpeTokenStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Tokenizer INTERCHANGE (VERDICT r17 #4): the corpus tokenizes under
    // a vocabulary this engine did NOT train — fixed foreign merge rules
    // shipped through a real GPT-2-style merges.txt write → import round
    // trip (rank = line order), then the same codegen'd longest-match
    // walk as t49. The oracle replays the identical rules.
    "t72_bpe_import" -> ((s, dir) => {
      import s.implicits._
      val f = java.nio.file.Files.createTempDirectory("graft_t72")
        .resolve("merges.txt")
      f.getParent.toFile.deleteOnExit()
      java.nio.file.Files.write(f,
        ("#version: 0.2\n" + ForeignMerges.map { case (l, r) => s"$l $r" }
          .mkString("", "\n", "\n"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val imported = TextAnalysis.importMergesTxt(f.toString)
      require(imported.map(m => (m._2, m._3)) == ForeignMerges,
        "merges.txt import drifted from the file's rules")
      TextAnalysis.bpeTokenStats(t(s, dir, "documents"), "doc_id", "text",
          TextAnalysis.vocabFromMerges(imported))
        .orderBy($"doc_id")
    }),

    // BPE merge-rule TRAINING (Sennrich ACL'16) — the step upstream of
    // t49: the 8 most-frequent adjacent symbol pairs, learned round by
    // round from the corpus word-frequency table with a total
    // (count desc, left, right) tie-break. The oracle replays EVERY
    // round — pair counting, winner selection, greedy merge application —
    // as unrolled SQL over a delimiter-wrapped symbol-string encoding.
    "t66_bpe_train" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bpeTrain(t(s, dir, "documents"), "text", BpeTrainMergeCount)
        .orderBy($"merge_rank")
    }),

    // PII redaction (the rewrite t17's pii stats only measure): PII is
    // SEEDED deterministically into the corpus (emails on doc_id%3=0,
    // phones on %4=1, IPv4 on %5=2 — some docs carry several, most
    // none), then emails → <EMAIL>, phones → <PHONE>, IPs → <IP>
    // sequentially with per-type counts. The oracle mirrors seeding,
    // the RE2-safe patterns, and the sequential count/replace chain, so
    // the redacted TEXT itself is hash-compared.
    "t68_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val seeded = t(s, dir, "documents").select($"doc_id", concat($"text",
        when($"doc_id" % 3 === 0,
          concat(lit(" reach user"), $"doc_id", lit("@mail.example.com")))
          .otherwise(lit("")),
        when($"doc_id" % 4 === 1,
          concat(lit(" call +1 (555) 010-"),
            lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when($"doc_id" % 5 === 2,
          concat(lit(" from 10.0."), ($"doc_id" % 256).cast("string"), lit(".7")))
          .otherwise(lit(""))).as("text"))
      TextAnalysis.redactPiiTyped(seeded, "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // BATCHED BPE training (the scale path to 10^4-merge vocabularies):
    // 2 symbol-disjoint merges per pair-count round — the expensive
    // word-table aggregation runs 4 times for 8 rules instead of 8.
    // Disjoint merges commute exactly; the oracle replays each round's
    // top-1 + disjoint-top-1 selection and both replaces.
    "t69_bpe_train_batched" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bpeTrainBatched(t(s, dir, "documents"), "text",
          BpeTrainMergeCount, batch = 2)
        .orderBy($"merge_rank")
    }),

    // RESUMED batched training (the production restart contract, VERDICT
    // r16 #2): the first run learns rules 1-4 into a DELTA merge table
    // (committed through the engine's own transactional writer, one
    // commit per round); the second run reads them back, validates the
    // rank sequence, RE-APPLIES them to a freshly built word table, and
    // trains only the remaining rounds. The output must be bit-identical
    // to one uninterrupted batch=2 training — so the ORACLE IS T69'S
    // VERBATIM: DuckDB replays the one-shot rounds and the hash compare
    // proves resume ≡ one-shot. ANY cut point resumes exactly: the table
    // stores FULL rounds (the learned sequence is numMerges-independent),
    // so a request landing mid-round can't reshape the round it cut.
    "t70_bpe_train_resume" -> ((s, dir) => {
      import s.implicits._
      val mergeTable = tmp("t70_merges")
      val d = t(s, dir, "documents")
      TextAnalysis.bpeTrainMergesBatched(d, "text",
        BpeTrainMergeCount / 2, batch = 2, mergeTablePath = Some(mergeTable))
      TextAnalysis.bpeTrainBatched(d, "text",
          BpeTrainMergeCount, batch = 2, mergeTablePath = Some(mergeTable))
        .orderBy($"merge_rank")
    }),

    // Train-then-apply end to end (the "t49 rerun on the learned
    // vocabulary"): the 8 learned merges become the vocabulary for the
    // SAME codegen'd greedy longest-match walk kernel t49 runs; the
    // oracle replays training AND the per-character walk.
    "t67_bpe_apply" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val vocab = TextAnalysis.bpeTrainMerges(d, "text", BpeTrainMergeCount)
        .map { case (_, l, r, _) => l + r }.distinct.toIndexedSeq
      TextAnalysis.bpeTokenStats(d, "doc_id", "text", vocab)
        .orderBy($"doc_id")
    }),

    // Multimodal: binary content + stubbed decode → feature extraction.
    // Multimodal with a REAL codec: text bytes become genuine one-row
    // grayscale PNGs (pixel i = byte i, lossless), decoded back through
    // javax.imageio on the executors — so the byte-level DuckDB oracle
    // checks an actual encode→decode round trip, not a stub.
    "t09_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.encodeGrayPng(
        Multimodal.fromDocuments(t(s, dir, "documents"), "doc_id", "text"))
      Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
        .select($"media_id", $"n_bytes", $"byte_sum",
          element_at($"hist", 1).as("h0"), element_at($"hist", 2).as("h1"),
          element_at($"hist", 3).as("h2"), element_at($"hist", 4).as("h3"))
        .orderBy($"media_id")
    }),

    // Multimodal: frame-sample + nearest-neighbor resize over DECODED
    // pixels of the real PNGs.
    "t10_media_sample" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.encodeGrayPng(
        Multimodal.fromDocuments(t(s, dir, "documents"), "doc_id", "text"))
      // fused: ONE decode pass feeds both outputs (the separate
      // frameSampleDecoded + resizeDecoded + join shape decoded every
      // image twice — r5 verdict fuse item)
      Multimodal.sampleAndResizeDecoded(media, k = 7, n = 32)
        .select($"media_id", $"orig_px".as("orig_bytes"),
          size($"sampled").cast("long").as("n_sampled"),
          size($"resized").cast("long").as("n_resized"),
          element_at($"sampled", 1).cast("long").as("first_byte"))
        .orderBy($"media_id")
    }),

    // Chunk-level (passage) dedup: repeated 32-word chunks removed
    // everywhere but their corpus-first occurrence, docs reassembled —
    // span dedup à la Lee et al.; exact strings + counts, strict oracle.
    "t29_chunk_dedup" -> ((s, dir) => {
      import s.implicits._
      Dedup.chunkDedup(t(s, dir, "documents"), "doc_id", "text", chunkWords = 32)
        .orderBy($"doc_id")
    }),

    // Temperature-rebalanced (T = 2) language mix: per-lang quota
    // min(n, 4·⌊√n⌋) by hash rank — integer-exact, membership-sensitive
    // id sums pin the exact surviving set.
    // Deterministic global shuffle: a reproducible epoch order that is a
    // pure function of (doc_id, seed) — unlike orderBy(rand(seed)), whose
    // draw depends on row-to-partition placement. Shards are CONTIGUOUS
    // slices of the shuffled order (the sharded-writer contract); the
    // within-shard rank-weighted id sum pins the total order bit-for-bit,
    // computed with a per-shard window (parallel across shards — no
    // global single-partition window in the plan).
    "t35_deterministic_shuffle" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val sh = Sampling.deterministicShuffle(
        t(s, dir, "documents").select($"doc_id"), "doc_id", seed = 42L, shards = 8)
      sh.withColumn("rk", row_number().over(
          Window.partitionBy($"shard").orderBy($"shuffle_key", $"doc_id")))
        .groupBy($"shard").agg(
          count(lit(1)).as("n"),
          sum($"doc_id").as("id_sum"),
          sum($"rk" * $"doc_id").as("order_sum"),
          min($"shuffle_key").as("key_min"),
          max($"shuffle_key").as("key_max"))
        .orderBy($"shard")
    }),

    "t30_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      Sampling.temperatureRebalance(t(s, dir, "documents"), "lang", "doc_id", perSqrt = 4)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("id_sum"))
        .orderBy($"lang")
    }),

    // Semantic dedup (SemDeDup), STRICT: within-cell pairs checked
    // in-query against brute-force all-pairs cosine (≤ 2000 vectors at
    // bench SFs — the all-pairs truth is 4M codegen'd dots, cheap):
    // precision must be 100% (every emitted pair is a true pair) and
    // recall ≥ 50%; the emitted row is a pinned constant.
    "t31_semantic_dedup" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      // nlist scales with the corpus (target ~500 vectors/cell, floor 16
      // = the sf0.01/sf0.1 value): a FIXED cell count at 10x data pushes
      // every cell past the candidate cap and recall collapses — the
      // knob a real deployment turns with corpus size (measured at sf1)
      val nlist = math.max(16, (emb.count() / 250L).toInt)
      val sem = Similarity.semanticNearDups(emb, "vec_id", "embedding",
          threshold = 0.42, nlist = nlist)
        .select($"id_a", $"id_b")
      if (skipInQueryOracles) sem.count() // bench: force the operator, skip the O(N²) truth
      else {
        val q = emb.select($"vec_id".as("id"), Similarity.quantize($"embedding").as("v"))
        val exact = q.as("l").join(q.as("r"), $"l.id" < $"r.id")
          .filter(Similarity.cosineQ($"l.v", $"r.v") >= 0.42)
          .select($"l.id".as("id_a"), $"r.id".as("id_b"))
        val nExact = exact.count()
        val nSem = sem.count()
        val nHit = sem.join(exact, Seq("id_a", "id_b")).count()
        require(nExact > 0, "degenerate fixture: no true near-dup pairs")
        require(nHit == nSem, s"precision violated: $nSem emitted, only $nHit are true pairs")
        val recallPct = nHit * 100.0 / nExact
        require(recallPct >= 50.0, s"SemDeDup recall = $recallPct% < 50%")
      }
      Seq((100L, 50L, 1L)).toDF("precision_pct", "recall_floor_pct", "meets_floor")
    }),

    // Skew-safe join: event_id%3 rows collapse onto user 1 (a viral hot
    // key ~1/3 of the fact table); the salted join must produce EXACTLY
    // the plain join's rows — the oracle IS the plain join.
    // Per-language length percentiles — exact, with dyadic quantile
    // points so the interpolated doubles hash-match the oracle.
    "t34_percentiles" -> ((s, dir) => {
      import s.implicits._
      graft.operators.TextAnalysis.groupPercentiles(
          t(s, dir, "documents"), "lang", "n_chars")
        .orderBy($"lang")
    }),

    "t33_skew_join" -> ((s, dir) => {
      import s.implicits._
      val ev = EventsIO.raw(s, dir)
        .withColumn("user_id", when($"event_id" % 3 === 0, lit(1L)).otherwise($"user_id"))
        .select($"event_id", $"user_id", $"value")
      val dim = t(s, dir, "customer")
        .select($"c_custkey".as("user_id"), $"c_nationkey")
      graft.operators.SkewJoin.skewSafeJoin(ev, dim, Seq("user_id"),
          salts = 8, hotThreshold = 1000L)
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("long")).as("value_c"))
        .orderBy($"c_nationkey")
    }),

    // Bloom-sketch decontamination: the eval side compressed to a 2^15-bit
    // filter, corpus grams tested scan-side with integer arithmetic the
    // oracle reproduces bit-for-bit (false positives included).
    "t32_bloom_decontam" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      Decontamination.bloomFlagContaminated(d, "doc_id", "text",
          d.filter($"doc_id" < 5), "text", n = 13)
        .orderBy($"doc_id")
    })
  )

  private val quantList =
    "[CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT) FOR x IN embedding]"

  /** DuckDB mirror of the polyhash60 pair over a string expression —
    * h2·2³⁰ + h1, the same value `PolyHash60`/`WordGramHash60` emit. */
  private def poly60Sql(e: String): String =
    s"(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(($e)[i]) AS BIGINT) FOR i IN generate_series(1, length($e))]), " +
      s"(a, x) -> (a * 131 + x) % 998244353) * 1073741824 + " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(($e)[i]) AS BIGINT) FOR i IN generate_series(1, length($e))]), " +
      s"(a, x) -> (a * 31 + x) % 1000000007))"

  /** Winnowing selection pipeline shared by the fingerprint (t61) and
    * candidate-pair (t62) oracles: `pos` = the 40-char rolling-hash
    * sequence (same polynomial pair as t38/t48/t52), `fps` = the distinct
    * per-window (min-hash, rightmost-tie) selections over full 8-windows,
    * with short docs contributing their global minimum via the s=1 row. */
  private val winnowFpCte =
    """pos AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS s,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
      |      (a, x) -> (a * 31 + x) % 1000000007)
      |    + 1073741824 * list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
      |      (a, x) -> (a * 131 + x) % 998244353) AS k
      |  FROM (SELECT doc_id, text,
      |          unnest(generate_series(1, length(text) - 39)) AS i
      |        FROM documents WHERE length(text) >= 40)),
      |mm AS (SELECT doc_id, MAX(s) AS m FROM pos GROUP BY doc_id),
      |starts AS (SELECT p.doc_id, p.s AS p FROM pos p JOIN mm USING (doc_id)
      |           WHERE p.s = 1 OR p.s <= mm.m - 7),
      |win AS (SELECT st.doc_id, st.p, po.s, po.k,
      |          row_number() OVER (PARTITION BY st.doc_id, st.p
      |                             ORDER BY po.k ASC, po.s DESC) AS rn
      |        FROM starts st JOIN pos po ON po.doc_id = st.doc_id
      |          AND po.s BETWEEN st.p AND st.p + 7),
      |fps AS (SELECT DISTINCT doc_id, s AS fp_pos, k AS fp_k
      |        FROM win WHERE rn = 1)""".stripMargin

  /** Exact word-3-gram Jaccard pair pipeline shared by the minhash pair
    * (t03) and cluster (t14) oracles: `it` = intersection counts per
    * candidate pair, `sz` = shingle-set sizes. */
  private val minhashPairsCte =
    """w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id,
      |  CASE WHEN len(ws) >= 3
      |   THEN list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN generate_series(1, len(ws)-2)])
      |   ELSE [text] END AS sh FROM w),
      |e AS (SELECT doc_id, unnest(sh) AS s FROM g),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id),
      |it AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |       FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t01_dedup_exact" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_in,
        | CAST(COUNT(DISTINCT text) AS BIGINT) AS n_out FROM documents""".stripMargin,
    "t02_dedup_keyed" ->
      """SELECT doc_id, lang, source FROM (
        | SELECT doc_id, lang, source,
        |  ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        | FROM documents) sub WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "t03_dedup_minhash" ->
      s"""WITH $minhashPairsCte
         |SELECT da AS doc_a, db AS doc_b, CAST(i AS BIGINT) AS inter,
         |       CAST(x.n + y.n - i AS BIGINT) AS uni
         |FROM it JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Rebuilds the SimHash pipeline end-to-end in exact BIGINT arithmetic:
    // word-3-gram shingles → polyhash60 per gram (two prime-modulus
    // rolling hashes, h2·2^30 + h1) → ±1 bit votes over the 60 effective
    // bits → signature → brute-force hamming join ≤ 3. The engine's
    // banded join is provably identical for hamming ≤ 3 (pigeonhole over
    // 4 disjoint 15-bit bands; pinned in DedupSpec), so strict hash
    // equality is the right check, not rows-only.
    "t04_dedup_simhash" ->
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 3
         |   THEN list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN generate_series(1, len(ws)-2)])
         |   ELSE [text] END AS sh FROM w),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM g),
         |gh AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [CAST(ascii(s[i]) AS BIGINT) FOR i IN generate_series(1, length(s))]),
         |    (a, x) -> (a * 31 + x) % 1000000007)
         |  + 1073741824 * list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [CAST(ascii(s[i]) AS BIGINT) FOR i IN generate_series(1, length(s))]),
         |    (a, x) -> (a * 131 + x) % 998244353) AS h FROM e),
         |v AS (SELECT doc_id, b.i AS bit,
         |       SUM(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         |      FROM gh CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i) b
         |      GROUP BY doc_id, b.i),
         |sg AS (SELECT doc_id,
         |        CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS sig
         |       FROM v GROUP BY doc_id)
         |SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
         |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "t14_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |p AS (SELECT da AS a, db AS b
         |      FROM it JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |      WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5),
         |edges AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
         |reach AS (SELECT src, dst FROM edges
         |          UNION
         |          SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src)
         |SELECT CAST(src AS BIGINT) AS doc_id,
         |       CAST(LEAST(src, MIN(dst)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "t47_groupaware_split" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |p AS (SELECT da AS a, db AS b
         |      FROM it JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |      WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5),
         |edges AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
         |reach AS (SELECT src, dst FROM edges
         |          UNION
         |          SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
         |cl AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |       FROM reach GROUP BY src),
         |k AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep
         |      FROM documents d LEFT JOIN cl USING (doc_id)),
         |bk AS (SELECT doc_id, ${Sampling.hashBucketSql("rep", 10000)} AS b FROM k)
         |SELECT CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'eval'
         |            ELSE 'test' END AS split,
         |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM bk GROUP BY split ORDER BY split""".stripMargin,
    "t26_dedup_ngram" ->
      s"""WITH $minhashPairsCte
         |SELECT da AS doc_a, db AS doc_b, CAST(i AS BIGINT) AS inter,
         |       CAST(x.n + y.n - i AS BIGINT) AS uni
         |FROM it JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "t22_dedup_incremental" ->
      s"""WITH $minhashPairsCte
         |SELECT CAST(CASE WHEN da % 10 = 0 THEN da ELSE db END AS BIGINT) AS batch_id,
         |       CAST(CASE WHEN da % 10 = 0 THEN db ELSE da END AS BIGINT) AS corpus_id,
         |       CAST(i AS BIGINT) AS inter,
         |       CAST(x.n + y.n - i AS BIGINT) AS uni
         |FROM it JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
         |  AND ((da % 10 = 0) <> (db % 10 = 0))
         |ORDER BY batch_id, corpus_id""".stripMargin,
    "t23_cluster_keeper" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |p AS (SELECT da AS a, db AS b
         |      FROM it JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |      WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5),
         |edges AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
         |reach AS (SELECT src, dst FROM edges
         |          UNION
         |          SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
         |cl AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |       FROM reach GROUP BY src),
         |jn AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
         |        ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
         |                           ORDER BY d.n_chars DESC, cl.doc_id ASC) AS rn,
         |        COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_docs
         |       FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
         |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
         |       CAST(doc_id AS BIGINT) AS keeper_id,
         |       CAST(n_docs AS BIGINT) AS n_docs
         |FROM jn WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "t24_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type, value
        |            FROM events),
        |probes AS (SELECT event_id, user_id, tus FROM ev WHERE event_type = 'view'),
        |states0 AS (SELECT user_id, tus, event_id, value FROM ev WHERE event_type = 'click'),
        |states AS (SELECT user_id, tus, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, tus
        |                               ORDER BY event_id DESC) AS rn
        |  FROM states0) WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.tus AS ts_us,
        |       s.event_id AS prior_event_id, s.value AS prior_value
        |FROM probes p ASOF LEFT JOIN states s
        |  ON p.user_id = s.user_id AND p.tus >= s.tus
        |ORDER BY p.event_id""".stripMargin,
    "t36_asof_forward" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type, value
        |            FROM events),
        |probes AS (SELECT event_id, user_id, tus FROM ev WHERE event_type = 'view'),
        |states0 AS (SELECT user_id, tus, event_id, value FROM ev WHERE event_type = 'purchase'),
        |states AS (SELECT user_id, tus, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, tus
        |                               ORDER BY event_id ASC) AS rn
        |  FROM states0) WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.tus AS ts_us,
        |       s.event_id AS next_event_id, s.value AS next_value
        |FROM probes p ASOF LEFT JOIN states s
        |  ON p.user_id = s.user_id AND p.tus <= s.tus
        |ORDER BY p.event_id""".stripMargin,
    "t25_range_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
        |            FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, tus AS ws,
        |             tus + 3600000000 AS we
        |      FROM ev WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, tus FROM ev WHERE event_type = 'error')
        |SELECT purchase_id, COUNT(*) AS n_errors
        |FROM p JOIN e ON p.user_id = e.user_id
        |            AND e.tus >= p.ws AND e.tus <= p.we
        |GROUP BY purchase_id
        |ORDER BY purchase_id""".stripMargin,
    "t27_interval_overlap" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
        |            FROM events),
        |v AS (SELECT event_id AS view_id, user_id, tus AS vs,
        |             tus + 1800000000 AS ve
        |      FROM ev WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id, tus AS ps,
        |             tus + 3600000000 AS pe
        |      FROM ev WHERE event_type = 'purchase')
        |SELECT view_id, purchase_id, v.user_id AS user_id
        |FROM v JOIN p ON v.user_id = p.user_id
        |            AND vs <= pe AND ps <= ve
        |ORDER BY view_id, purchase_id""".stripMargin,
    "t28_keyword_search" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |m AS (SELECT doc_id, t FROM tok WHERE t IN ('join', 'vector', 'dup')),
        |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM m GROUP BY 1, 2),
        |dfq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM m GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, CAST(SUM(tf * ((1000000 * n.n) // df)) AS BIGINT) AS score
        |FROM tf JOIN dfq USING (t) CROSS JOIN n
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin,
    "t45_bm25_rank" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '),
        |                  x -> len(x) > 0) AS w FROM documents),
        |d AS (SELECT doc_id, CAST(len(w) AS HUGEINT) AS dl FROM w),
        |st AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |              CAST(SUM(dl) AS HUGEINT) AS s FROM d),
        |tok AS (SELECT doc_id, unnest(w) AS t FROM w),
        |m AS (SELECT doc_id, t FROM tok WHERE t IN ('join', 'vector', 'dup')),
        |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS HUGEINT) AS tf FROM m GROUP BY 1, 2),
        |dfq AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS HUGEINT) AS df FROM m GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         (10000 * (2*st.n - 2*dfq.df + 1) * 22 * tf.tf * st.s)
        |         // ((2*dfq.df + 1) * (10*st.s*tf.tf + 3*st.s + 9*d.dl*st.n)) AS p
        |       FROM tf JOIN dfq USING (t) JOIN d ON tf.doc_id = d.doc_id CROSS JOIN st)
        |SELECT doc_id, CAST(SUM(p) AS BIGINT) AS score
        |FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "t46_typo_pairs" ->
      """WITH corpus AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |noise AS (SELECT substr(w0, 1, 1) || substr(w0, 3) AS w FROM (
        |  SELECT string_split(text, ' ')[1] AS w0 FROM documents WHERE doc_id % 3 = 0)),
        |v AS (SELECT DISTINCT w FROM (SELECT w FROM corpus UNION ALL SELECT w FROM noise)
        |      WHERE len(w) >= 4)
        |SELECT a.w AS w1, b.w AS w2 FROM v a JOIN v b
        |  ON a.w < b.w AND abs(len(a.w) - len(b.w)) <= 1
        |  AND levenshtein(a.w, b.w) <= 1
        |ORDER BY w1, w2""".stripMargin,
    // t06/t13/t31 verify themselves in-query (require on recall/
    // precision vs an in-query brute force); the oracle pins the
    // constants the query may only emit by passing those checks.
    "t06_sim_lsh" ->
      """SELECT CAST(5 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
        | CAST(30 AS BIGINT) AS recall_floor_pct, CAST(1 AS BIGINT) AS meets_floor""".stripMargin,
    "t13_sim_ivf" ->
      """SELECT CAST(5 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
        | CAST(50 AS BIGINT) AS recall_floor_pct, CAST(1 AS BIGINT) AS meets_floor""".stripMargin,
    "t40_sim_ivfpq" ->
      """SELECT CAST(5 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
        | CAST(40 AS BIGINT) AS recall_floor_pct, CAST(1 AS BIGINT) AS meets_floor""".stripMargin,
    // t71 verifies itself in-query (appended-duplicate top-rank require +
    // recall floor vs in-query brute force); the oracle pins the
    // constants the query may only emit by passing those checks.
    "t71_ann_index" ->
      """SELECT CAST(5 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
        | CAST(40 AS BIGINT) AS recall_floor_pct, CAST(5 AS BIGINT) AS dup_hits,
        | CAST(1 AS BIGINT) AS meets_floor""".stripMargin,
    "t42_group_centroids" ->
      s"""WITH q AS (SELECT label, $quantList AS qv FROM embeddings),
         |n AS (SELECT label, COUNT(*) AS n FROM q GROUP BY 1),
         |e AS (SELECT label, g AS pos, qv[g+1] AS x
         |      FROM q, LATERAL UNNEST(generate_series(0, len(qv)-1)) AS i(g)),
         |s AS (SELECT label, pos, SUM(x) AS sm FROM e GROUP BY 1, 2)
         |SELECT s.label, n.n, CAST(s.pos AS BIGINT) AS pos,
         |  CAST(CAST(s.sm AS BIGINT) // n.n AS BIGINT) AS c
         |FROM s JOIN n USING (label)
         |ORDER BY s.label, s.pos""".stripMargin,
    "t44_audio_features" ->
      """SELECT doc_id AS media_id,
        | CAST(length(text) AS BIGINT) AS n_samples,
        | CAST(COALESCE(list_sum([ascii(text[i]) FOR i IN generate_series(1, length(text))]), 0) AS BIGINT) AS sample_sum,
        | CAST(COALESCE(list_max([ascii(text[i]) FOR i IN generate_series(1, length(text))]), 0) AS BIGINT) AS peak,
        | CAST(len(list_filter([CASE WHEN (ascii(text[i]) >= 128) != (ascii(text[i-1]) >= 128)
        |   THEN 1 ELSE 0 END FOR i IN generate_series(2, length(text))], x -> x = 1)) AS BIGINT) AS sign_changes
        |FROM documents ORDER BY media_id""".stripMargin,
    "t43_strip_boilerplate" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '(\S+ \S+ \S+ \S+ \S+ \S+) ',
        |                   '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, g AS pos, l[g+1] AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM src),
        |       LATERAL UNNEST(generate_series(0, len(l)-1)) AS i(g)),
        |nb AS (SELECT DISTINCT doc_id, line FROM lines WHERE len(line) > 0),
        |boiler AS (SELECT line FROM nb GROUP BY line HAVING COUNT(*) > 30),
        |kept AS (SELECT doc_id, pos, line FROM lines ANTI JOIN boiler USING (line)),
        |drp AS (SELECT doc_id, COUNT(*) AS dropped FROM lines
        |        SEMI JOIN boiler USING (line) GROUP BY doc_id),
        |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text,
        |  CAST(COALESCE(p.dropped, 0) AS BIGINT) AS dropped_lines
        |FROM documents d LEFT JOIN reb r USING (doc_id) LEFT JOIN drp p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "t41_lm_score" ->
      """WITH words AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(w) AS t FROM words),
        |c1 AS (SELECT t AS w1, COUNT(*) AS c1 FROM toks GROUP BY 1),
        |v AS (SELECT COUNT(*) AS v FROM c1),
        |bi AS (SELECT doc_id, w[g] AS w1, w[g+1] AS w2
        |       FROM words, LATERAL UNNEST(generate_series(1, len(w)-1)) AS i(g)
        |       WHERE len(w) >= 2),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
        |s AS (SELECT b.doc_id, (10000 * (c2.c2 + 1)) // (c1.c1 + v.v) AS p_q
        |      FROM bi b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        |agg AS (SELECT doc_id, COUNT(*) AS n, SUM(p_q) AS sc FROM s GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a.n, 0) AS BIGINT) AS bigrams,
        |  CAST(COALESCE(a.sc, 0) AS BIGINT) AS lm_score
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "t31_semantic_dedup" ->
      """SELECT CAST(100 AS BIGINT) AS precision_pct,
        | CAST(50 AS BIGINT) AS recall_floor_pct, CAST(1 AS BIGINT) AS meets_floor""".stripMargin,
    "t05_sim_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS qid, $quantList AS qv
         |           FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
         |c AS (SELECT vec_id, $quantList AS cv FROM embeddings),
         |s AS (SELECT qid, vec_id,
         |  CAST(list_sum([qv[i]*cv[i] FOR i IN generate_series(1, len(qv))]) AS DOUBLE)
         |   / (sqrt(CAST(list_sum([qv[i]*qv[i] FOR i IN generate_series(1, len(qv))]) AS DOUBLE))
         |      * sqrt(CAST(list_sum([cv[i]*cv[i] FOR i IN generate_series(1, len(cv))]) AS DOUBLE))) AS cosv
         | FROM c, q WHERE vec_id != qid),
         |r AS (SELECT qid AS query_id, vec_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosv DESC, vec_id ASC) AS BIGINT) AS rank
         | FROM s)
         |SELECT query_id, rank, vec_id FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,
    "t11_dedup_embedding" ->
      s"""WITH q AS (SELECT vec_id AS id, $quantList AS v FROM embeddings),
         |b AS (SELECT id, v, band,
         |  array_to_string([CASE WHEN v[band*8 + i] >= 0 THEN '1' ELSE '0' END
         |                   FOR i IN generate_series(1, 8)], '') AS bh
         | FROM q, (SELECT unnest(generate_series(0, 7)) AS band) bands),
         |p AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.v AS va, r.v AS vb
         |      FROM b l JOIN b r ON l.band = r.band AND l.bh = r.bh AND l.id < r.id)
         |SELECT id_a, id_b FROM p
         |WHERE CAST(list_sum([va[i]*vb[i] FOR i IN generate_series(1, 64)]) AS DOUBLE)
         |  / (sqrt(CAST(list_sum([va[i]*va[i] FOR i IN generate_series(1, 64)]) AS DOUBLE))
         |     * sqrt(CAST(list_sum([vb[i]*vb[i] FOR i IN generate_series(1, 64)]) AS DOUBLE))) >= 0.42
         |ORDER BY id_a, id_b""".stripMargin,
    "t20_pipeline_e2e" ->
      """WITH dd AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |           ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents) z
        |  WHERE rn = 1),
        |qw AS (SELECT doc_id, text, lang, string_split(text, ' ') AS ws FROM dd),
        |q AS (SELECT * FROM qw
        |      WHERE len(ws) >= 5
        |        AND (CASE WHEN len(ws) = 0 THEN 0
        |             ELSE ((len(ws) - len(list_distinct(ws))) * 10000) // len(ws) END) <= 3000),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(ws) >= 13
        |   THEN list_distinct([array_to_string(ws[i:i+12], ' ') FOR i IN generate_series(1, len(ws)-12)])
        |   ELSE [array_to_string(ws, ' ')] END AS sh FROM q),
        |dg AS (SELECT doc_id, unnest(sh) AS gram FROM g),
        |evw AS (SELECT string_split(text, ' ') AS ws FROM documents WHERE doc_id < 5),
        |evg AS (SELECT DISTINCT unnest(CASE WHEN len(ws) >= 13
        |   THEN list_distinct([array_to_string(ws[i:i+12], ' ') FOR i IN generate_series(1, len(ws)-12)])
        |   ELSE [array_to_string(ws, ' ')] END) AS gram FROM evw),
        |bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN evg USING (gram)),
        |clean AS (SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_tokens
        |          FROM q WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
        |c AS (SELECT doc_id, lang, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM clean)
        |SELECT lang, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tok_sum
        |FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin,
    "t19_vocab" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""".stripMargin,
    "t18_sequence_packing" ->
      """WITH w AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, lang, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM w)
        |SELECT lang, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tok_sum
        |FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin,
    "t16_decontamination" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(ws) >= 13
        |   THEN list_distinct([array_to_string(ws[i:i+12], ' ') FOR i IN generate_series(1, len(ws)-12)])
        |   ELSE [array_to_string(ws, ' ')] END AS sh FROM w),
        |dg AS (SELECT doc_id, unnest(sh) AS gram FROM g),
        |ev AS (SELECT DISTINCT gram FROM dg WHERE doc_id < 5)
        |SELECT dg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
        |FROM dg JOIN ev USING (gram)
        |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin,
    "t29_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |n AS (SELECT doc_id, CAST(CEIL(len(ws) / 32.0) AS BIGINT) AS n_chunks FROM w),
        |g AS (SELECT doc_id,
        |  [array_to_string(ws[i*32+1 : i*32+32], ' ')
        |   FOR i IN generate_series(0, CAST(CEIL(len(ws) / 32.0) AS BIGINT) - 1)] AS cs
        |  FROM w),
        |c AS (SELECT doc_id, unnest(cs) AS chunk,
        |        unnest(generate_series(0, len(cs) - 1)) AS chunk_idx FROM g),
        |f AS (SELECT chunk, MIN(doc_id * 1000000 + chunk_idx) AS k FROM c GROUP BY chunk),
        |kept AS (SELECT k // 1000000 AS doc_id, k % 1000000 AS chunk_idx, chunk FROM f),
        |r AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |        string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_kept
        |      FROM kept GROUP BY doc_id)
        |SELECT n.doc_id, n.n_chunks,
        |  COALESCE(r.n_kept, 0) AS n_kept, COALESCE(r.text_kept, '') AS text_kept
        |FROM n LEFT JOIN r ON n.doc_id = r.doc_id ORDER BY n.doc_id""".stripMargin,
    "t33_skew_join" ->
      """WITH ev AS (SELECT event_id,
        |  CASE WHEN event_id % 3 = 0 THEN 1 ELSE user_id END AS user_id, value
        |  FROM events),
        |j AS (SELECT c.c_nationkey, ev.value
        |      FROM ev JOIN customer c ON ev.user_id = c.c_custkey)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM j GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // PERCENTILE_CONT (R-7 linear interpolation) at dyadic points over
    // BIGINT values is exact rational arithmetic → bit-identical doubles
    // across engines.
    "t34_percentiles" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        | quantile_cont(n_chars, 0.25) AS p25,
        | quantile_cont(n_chars, 0.5) AS p50,
        | quantile_cont(n_chars, 0.75) AS p75
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "t30_temperature_mix" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM (SELECT lang, doc_id,
         |        ROW_NUMBER() OVER (PARTITION BY lang
         |          ORDER BY ${Sampling.hashBucketSql("doc_id", 1 << 20)}, doc_id) AS rk,
         |        COUNT(*) OVER (PARTITION BY lang) AS cnt
         |      FROM documents) z
         |WHERE rk <= ${Sampling.temperatureQuotaSql("cnt", 4)}
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "t32_bloom_decontam" -> {
      import graft.operators.Decontamination.{gramHashSql, probeSql}
      val m = 1 << 15
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 13
         |   THEN list_distinct([array_to_string(ws[i:i+12], ' ') FOR i IN generate_series(1, len(ws)-12)])
         |   ELSE [array_to_string(ws, ' ')] END AS sh FROM w),
         |dg AS (SELECT doc_id, unnest(sh) AS gram FROM g),
         |dh AS (SELECT doc_id, ${gramHashSql("gram")} AS gh FROM dg),
         |evpos AS (SELECT DISTINCT p FROM (
         |  SELECT unnest([${probeSql("gh", 0, m)}, ${probeSql("gh", 1, m)},
         |                 ${probeSql("gh", 2, m)}]) AS p
         |  FROM (SELECT DISTINCT gh FROM dh WHERE doc_id < 5))),
         |hits AS (SELECT doc_id FROM dh
         |         WHERE ${probeSql("gh", 0, m)} IN (SELECT p FROM evpos)
         |           AND ${probeSql("gh", 1, m)} IN (SELECT p FROM evpos)
         |           AND ${probeSql("gh", 2, m)} IN (SELECT p FROM evpos))
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged_grams
         |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "t17_quality_pii" ->
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 3
         |   THEN list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN generate_series(1, len(ws)-2)])
         |   ELSE [text] END AS sh FROM w)
         |SELECT w.doc_id,
         | CAST(len(ws) AS BIGINT) AS n_tokens,
         | CAST(CASE WHEN len(ws) = 0 THEN 0
         |  ELSE ((len(ws) - len(list_distinct(ws))) * 10000) // len(ws) END AS BIGINT) AS dup_word_pm,
         | CAST(CASE WHEN len(ws) < 3 THEN 0
         |  ELSE ((len(ws) - 2 - len(sh)) * 10000) // (len(ws) - 2) END AS BIGINT) AS dup_3gram_pm,
         | CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(text, '${TextAnalysis.LongNumberRe}')) AS BIGINT) AS n_long_numbers,
         | CAST(length(regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |   '${TextAnalysis.LongNumberRe}', '<NUMBER>', 'g')) AS BIGINT) AS n_chars_redacted
         |FROM w JOIN g ON w.doc_id = g.doc_id ORDER BY w.doc_id""".stripMargin,
    "t21_stratified_sample" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM (SELECT lang, doc_id,
         |        ROW_NUMBER() OVER (PARTITION BY lang
         |          ORDER BY ${Sampling.hashBucketSql("doc_id", 1 << 20)}, doc_id) AS rk
         |      FROM documents) z
         |WHERE rk <= 50 GROUP BY lang ORDER BY lang""".stripMargin,
    "t35_deterministic_shuffle" ->
      s"""SELECT shard,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
         |  CAST(SUM(rk * doc_id) AS BIGINT) AS order_sum,
         |  CAST(MIN(k) AS BIGINT) AS key_min,
         |  CAST(MAX(k) AS BIGINT) AS key_max
         |FROM (SELECT doc_id, k, (k * 8) >> 31 AS shard,
         |        ROW_NUMBER() OVER (PARTITION BY ((k * 8) >> 31)
         |          ORDER BY k, doc_id) AS rk
         |      FROM (SELECT doc_id, ${Sampling.shuffleKeySql("doc_id", 42L)} AS k
         |            FROM documents))
         |GROUP BY shard ORDER BY shard""".stripMargin,
    "t15_stable_split" ->
      s"""SELECT CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'eval'
         |            ELSE 'test' END AS split,
         |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM (SELECT doc_id, ${Sampling.hashBucketSql("doc_id", 10000)} AS b FROM documents)
         |GROUP BY split ORDER BY split""".stripMargin,
    "t07_text_stats" ->
      s"""SELECT doc_id,
         | CAST(length(text) AS BIGINT) AS n_chars,
         | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         | CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> len(x) > 0)) AS BIGINT) AS n_word_tokens,
         | CAST(len(list_filter(string_split(text, ' '), x -> x IN (${TextAnalysis.EnStopwords.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS n_stopwords,
         | CAST(CASE WHEN len(string_split(text, ' ')) = 0 THEN 0
         |  ELSE (len(list_filter(string_split(text, ' '), x -> x IN (${TextAnalysis.EnStopwords.map("'" + _ + "'").mkString(",")}))) * 10000)
         |        // len(string_split(text, ' ')) END AS BIGINT) AS quality_score,
         | ${langCase("text")} AS lang_pred,
         | CAST(list_sum([ascii(text[i+1]) * ((i % 64) + 1) FOR i IN generate_series(0, length(text)-1)]) % 1000000007 AS BIGINT) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t08_langid_confusion" ->
      s"""SELECT lang, ${langCase("text")} AS lang_pred, COUNT(*) AS n
         |FROM documents GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin,
    "t37_stream_available_now" ->
      """SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""",
    "t39_stream_sink" ->
      """SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""",
    "t38_dup_spans" ->
      """WITH pos AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 31 + x) % 1000000007)
        |    + 1073741824 * list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 131 + x) % 998244353) AS sh
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text) - 39)) AS i
        |        FROM documents WHERE length(text) >= 40)
        |),
        |perdoc AS (SELECT doc_id, sh, COUNT(*) AS c FROM pos GROUP BY 1, 2),
        |dup AS (SELECT sh FROM perdoc GROUP BY sh HAVING COUNT(*) >= 2),
        |dupc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup_positions
        |         FROM perdoc JOIN dup USING (sh) GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(length(d.text) - 39 AS BIGINT) AS n_positions,
        |       dupc.dup_positions AS dup_positions
        |FROM documents d JOIN dupc USING (doc_id)
        |WHERE dupc.dup_positions > 0
        |ORDER BY d.doc_id""".stripMargin,
    "t52_maximal_spans" ->
      """WITH pos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 31 + x) % 1000000007)
        |    + 1073741824 * list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 131 + x) % 998244353) AS k
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text) - 39)) AS i
        |        FROM documents WHERE length(text) >= 40)
        |),
        |dupk AS (SELECT k FROM pos GROUP BY k HAVING COUNT(*) > 1),
        |d AS (SELECT doc_id, s FROM pos JOIN dupk USING (k)),
        |m AS (SELECT doc_id, s,
        |        coalesce(max(s + 40) OVER (PARTITION BY doc_id ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevcov
        |      FROM d),
        |b AS (SELECT doc_id, s, prevcov,
        |        CASE WHEN s > prevcov THEN 1 ELSE 0 END AS brk FROM m),
        |r AS (SELECT doc_id, s, prevcov, brk,
        |        max(CASE WHEN brk = 1 THEN s END)
        |          OVER (PARTITION BY doc_id ORDER BY s) AS spanstart
        |      FROM b),
        |agg AS (SELECT doc_id,
        |        CAST(SUM(brk) AS BIGINT) AS n_spans,
        |        CAST(SUM(s + 40 - greatest(prevcov, s)) AS BIGINT) AS dup_chars,
        |        CAST(MAX(s + 40 - spanstart) AS BIGINT) AS max_span
        |      FROM r GROUP BY doc_id)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS orig_len,
        |       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
        |       CAST(coalesce(a.dup_chars, 0) AS BIGINT) AS dup_chars,
        |       CAST(coalesce(a.max_span, 0) AS BIGINT) AS max_span
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "t48_span_dedup" ->
      """WITH pos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 31 + x) % 1000000007)
        |    + 1073741824 * list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 131 + x) % 998244353) AS k
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text) - 39)) AS i
        |        FROM documents WHERE length(text) >= 40)
        |),
        |cuts AS (
        |  SELECT doc_id, s, s + 40 AS e FROM (
        |    SELECT doc_id, s,
        |           row_number() OVER (PARTITION BY k ORDER BY doc_id, s) AS rn
        |    FROM pos)
        |  WHERE rn > 1),
        |gaps AS (
        |  SELECT doc_id, prevcov AS segstart, s - prevcov AS seglen FROM (
        |    SELECT doc_id, s,
        |           coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1) AS prevcov
        |    FROM cuts)
        |  WHERE s > prevcov),
        |covs AS (SELECT doc_id, max(e) AS cov FROM cuts GROUP BY doc_id),
        |tails AS (
        |  SELECT c.doc_id, c.cov AS segstart, length(d.text) - c.cov + 1 AS seglen
        |  FROM covs c JOIN documents d USING (doc_id)
        |  WHERE c.cov <= length(d.text)),
        |segs AS (SELECT * FROM gaps UNION ALL SELECT * FROM tails),
        |kept AS (
        |  SELECT sg.doc_id,
        |         string_agg(substr(d.text, CAST(sg.segstart AS INT), CAST(sg.seglen AS INT)),
        |                    '' ORDER BY sg.segstart) AS text_kept
        |  FROM segs sg JOIN documents d USING (doc_id) GROUP BY sg.doc_id)
        |SELECT d.doc_id,
        |       CAST(length(d.text) AS BIGINT) AS orig_len,
        |       CAST(length(CASE WHEN c.doc_id IS NULL THEN d.text
        |                        ELSE coalesce(k.text_kept, '') END) AS BIGINT) AS kept_len,
        |       CASE WHEN c.doc_id IS NULL THEN d.text
        |            ELSE coalesce(k.text_kept, '') END AS text_kept
        |FROM documents d
        |LEFT JOIN covs c USING (doc_id)
        |LEFT JOIN kept k USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "t56_importance_select" -> {
      import graft.operators.Decontamination.gramHashSql
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |g AS (
         |  SELECT doc_id, gram FROM (
         |    SELECT doc_id, unnest(ws) AS gram FROM w
         |    UNION ALL
         |    SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
         |      THEN [array_to_string(ws[i:i+1], ' ') FOR i IN generate_series(1, len(ws)-1)]
         |      ELSE [text] END) AS gram FROM w)),
         |hb AS (SELECT doc_id, ${gramHashSql("gram")} % 4096 AS b FROM g),
         |tc AS (SELECT b, COUNT(*) AS c FROM hb WHERE doc_id < 25 GROUP BY b),
         |rc AS (SELECT b, COUNT(*) AS c FROM hb GROUP BY b),
         |wt AS (SELECT rc.b,
         |         LEAST(2147483647, (coalesce(tc.c, 0) + 1) * 1000 // (rc.c + 1)) AS w
         |       FROM rc LEFT JOIN tc USING (b)),
         |sc AS (SELECT hb.doc_id, CAST(SUM(wt.w) AS BIGINT) AS score,
         |              CAST(COUNT(*) AS BIGINT) AS n_feats
         |       FROM hb JOIN wt USING (b) GROUP BY hb.doc_id),
         |nr AS (SELECT doc_id, score, n_feats,
         |              CAST(score * 1000 // n_feats AS BIGINT) AS norm FROM sc)
         |SELECT doc_id, score, n_feats, norm
         |FROM (SELECT * FROM nr ORDER BY norm DESC, doc_id LIMIT 50)
         |ORDER BY doc_id""".stripMargin
    },
    "t55_eval_span_removal" ->
      """WITH pos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 31 + x) % 1000000007)
        |    + 1073741824 * list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(text[j]) AS BIGINT) FOR j IN generate_series(CAST(i AS INT), CAST(i AS INT) + 39)]),
        |      (a, x) -> (a * 131 + x) % 998244353) AS k
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text) - 39)) AS i
        |        FROM documents WHERE length(text) >= 40)
        |),
        |ev AS (SELECT DISTINCT k FROM pos WHERE doc_id < 10),
        |cuts AS (
        |  SELECT p.doc_id, p.s, p.s + 40 AS e FROM pos p JOIN ev USING (k)),
        |gaps AS (
        |  SELECT doc_id, prevcov AS segstart, s - prevcov AS seglen FROM (
        |    SELECT doc_id, s,
        |           coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1) AS prevcov
        |    FROM cuts)
        |  WHERE s > prevcov),
        |covs AS (SELECT doc_id, max(e) AS cov FROM cuts GROUP BY doc_id),
        |tails AS (
        |  SELECT c.doc_id, c.cov AS segstart, length(d.text) - c.cov + 1 AS seglen
        |  FROM covs c JOIN documents d USING (doc_id)
        |  WHERE c.cov <= length(d.text)),
        |segs AS (SELECT * FROM gaps UNION ALL SELECT * FROM tails),
        |kept AS (
        |  SELECT sg.doc_id,
        |         string_agg(substr(d.text, CAST(sg.segstart AS INT), CAST(sg.seglen AS INT)),
        |                    '' ORDER BY sg.segstart) AS text_kept
        |  FROM segs sg JOIN documents d USING (doc_id) GROUP BY sg.doc_id)
        |SELECT d.doc_id,
        |       CAST(length(d.text) AS BIGINT) AS orig_len,
        |       CAST(length(CASE WHEN c.doc_id IS NULL THEN d.text
        |                        ELSE coalesce(k.text_kept, '') END) AS BIGINT) AS kept_len,
        |       CASE WHEN c.doc_id IS NULL THEN d.text
        |            ELSE coalesce(k.text_kept, '') END AS text_kept
        |FROM documents d
        |LEFT JOIN covs c USING (doc_id)
        |LEFT JOIN kept k USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "t53_topngram_coverage" ->
      """WITH w AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS nc,
        |                  string_split(text, ' ') AS ws FROM documents),
        |g2 AS (SELECT doc_id, nc, array_to_string(ws[i:i+1], ' ') AS gram
        |       FROM (SELECT doc_id, nc, ws, unnest(generate_series(1, len(ws)-1)) AS i
        |             FROM w WHERE len(ws) >= 2)),
        |c2 AS (SELECT doc_id, nc, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2, 3),
        |t2 AS (SELECT doc_id, CAST(c * length(gram) * 10000 // nc AS BIGINT) AS pm,
        |              row_number() OVER (PARTITION BY doc_id
        |                ORDER BY c DESC, gram ASC) AS rn FROM c2),
        |g3 AS (SELECT doc_id, nc, array_to_string(ws[i:i+2], ' ') AS gram
        |       FROM (SELECT doc_id, nc, ws, unnest(generate_series(1, len(ws)-2)) AS i
        |             FROM w WHERE len(ws) >= 3)),
        |c3 AS (SELECT doc_id, nc, gram, COUNT(*) AS c FROM g3 GROUP BY 1, 2, 3),
        |t3 AS (SELECT doc_id, CAST(c * length(gram) * 10000 // nc AS BIGINT) AS pm,
        |              row_number() OVER (PARTITION BY doc_id
        |                ORDER BY c DESC, gram ASC) AS rn FROM c3)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
        |       CAST(coalesce(a2.pm, 0) AS BIGINT) AS top2gram_pm,
        |       CAST(coalesce(a3.pm, 0) AS BIGINT) AS top3gram_pm,
        |       CAST(coalesce(a2.pm, 0) <= 2000 AND coalesce(a3.pm, 0) <= 1800 AS INT) AS keep
        |FROM documents d
        |LEFT JOIN (SELECT doc_id, pm FROM t2 WHERE rn = 1) a2 USING (doc_id)
        |LEFT JOIN (SELECT doc_id, pm FROM t3 WHERE rn = 1) a3 USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "t65_kmv_jaccard" ->
      s"""WITH w AS (SELECT source, text, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT source, CASE WHEN len(ws) >= 3
         |        THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |              FOR i IN generate_series(1, len(ws)-2)]
         |        ELSE [text] END AS gs FROM w),
         |sh AS (SELECT DISTINCT source, ${poly60Sql("gram")} AS h
         |       FROM (SELECT source, unnest(gs) AS gram FROM g)),
         |sk AS (SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rank
         |       FROM sh QUALIFY rank <= 256),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |prs AS (SELECT a.source AS src_a, b.source AS src_b
         |        FROM srcs a JOIN srcs b ON a.source < b.source),
         |uni AS (SELECT src_a, src_b, h, COUNT(*) AS cnt2 FROM (
         |          SELECT p.src_a, p.src_b, s.h FROM prs p JOIN sk s ON s.source = p.src_a
         |          UNION ALL
         |          SELECT p.src_a, p.src_b, s.h FROM prs p JOIN sk s ON s.source = p.src_b)
         |        GROUP BY 1, 2, 3),
         |topk AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b
         |                                      ORDER BY h) AS rn
         |         FROM uni QUALIFY rn <= 256)
         |SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS k_used,
         |       CAST(SUM(CASE WHEN cnt2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS inter_k,
         |       CAST(SUM(CASE WHEN cnt2 = 2 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
         |            AS BIGINT) AS jaccard_pm
         |FROM topk GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,
    "t63_hll_distinct" ->
      s"""WITH w AS (SELECT text, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT CASE WHEN len(ws) >= 3
         |        THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |              FOR i IN generate_series(1, len(ws)-2)]
         |        ELSE [text] END AS gs FROM w),
         |e AS (SELECT unnest(gs) AS gram FROM g),
         |h AS (SELECT ${poly60Sql("gram")} AS h FROM e),
         |rr AS (SELECT h & 255 AS reg,
         |         CASE WHEN (h >> 8) = 0 THEN 53
         |              ELSE length(bin((h >> 8) & (-(h >> 8)))) END AS rho FROM h),
         |regs AS (SELECT reg, MAX(rho) AS max_rho FROM rr GROUP BY reg)
         |SELECT CAST(t.r AS BIGINT) AS reg,
         |       CAST(COALESCE(regs.max_rho, 0) AS BIGINT) AS max_rho
         |FROM generate_series(0, 255) AS t(r)
         |LEFT JOIN regs ON regs.reg = t.r
         |ORDER BY reg""".stripMargin,
    "t64_countmin" -> {
      import graft.operators.Sketches.cmPosSql
      val cellCase = (0 until 4).map(j =>
        s"WHEN $j THEN ${cmPosSql("h", j)}").mkString(" ")
      s"""WITH wds AS (SELECT unnest(list_filter(string_split(text, ' '),
         |               x -> len(x) > 0)) AS w FROM documents),
         |wh AS (SELECT w, ${poly60Sql("w")} AS h FROM wds),
         |cells AS (SELECT CAST(j AS BIGINT) AS row,
         |            CASE j $cellCase END AS pos
         |          FROM wh, LATERAL UNNEST(generate_series(0, 3)) AS t(j)),
         |counters AS (SELECT row, pos, COUNT(*) AS n FROM cells GROUP BY 1, 2),
         |probes AS (SELECT unnest(['the','a','table','row','scan','merge',
         |             'window','customer','vector','zzz_absent']) AS term),
         |ph AS (SELECT term, ${poly60Sql("term")} AS h FROM probes),
         |pcells AS (SELECT term, CAST(j AS BIGINT) AS row,
         |             CASE j $cellCase END AS pos
         |           FROM ph, LATERAL UNNEST(generate_series(0, 3)) AS t(j)),
         |est AS (SELECT term, MIN(COALESCE(n, 0)) AS cms_est
         |        FROM pcells LEFT JOIN counters USING (row, pos) GROUP BY term),
         |exact AS (SELECT w AS term, COUNT(*) AS exact_n FROM wds GROUP BY 1)
         |SELECT p.term, CAST(COALESCE(x.exact_n, 0) AS BIGINT) AS exact_n,
         |       CAST(e.cms_est AS BIGINT) AS cms_est
         |FROM probes p JOIN est e USING (term) LEFT JOIN exact x USING (term)
         |ORDER BY term""".stripMargin
    },
    "t61_winnow_fp" ->
      s"""WITH $winnowFpCte
         |SELECT doc_id, fp_pos, fp_k FROM fps
         |ORDER BY doc_id, fp_pos, fp_k""".stripMargin,
    "t62_winnow_pairs" ->
      s"""WITH $winnowFpCte,
         |dfp AS (SELECT DISTINCT doc_id, fp_k FROM fps),
         |rare AS (SELECT fp_k FROM dfp GROUP BY fp_k HAVING COUNT(*) <= 50),
         |kept AS (SELECT doc_id, fp_k FROM dfp SEMI JOIN rare USING (fp_k))
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |       CAST(COUNT(*) AS BIGINT) AS shared_fps
         |FROM kept x JOIN kept y
         |  ON x.fp_k = y.fp_k AND x.doc_id < y.doc_id
         |GROUP BY 1, 2
         |HAVING COUNT(*) >= 1
         |ORDER BY doc_a, doc_b""".stripMargin,
    "t57_dup_segments" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(text, '(\S+ \S+) ', '\1' || chr(10), 'g'),
        |      '((?:[^\n]*\n){2})', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, chr(10)), s -> len(s) > 0) AS ls,
        |    list_filter(string_split(text, chr(10) || chr(10)), s -> len(s) > 0) AS ps
        |  FROM src),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(ls) AS BIGINT) AS nl,
        |    CAST(len(list_distinct(ls)) AS BIGINT) AS dl,
        |    CAST(list_sum(list_transform(ls, s -> length(s))) AS BIGINT) AS lc,
        |    CAST(list_sum(list_transform(list_distinct(ls), s -> length(s))) AS BIGINT) AS ldc,
        |    CAST(len(ps) AS BIGINT) AS np,
        |    CAST(len(list_distinct(ps)) AS BIGINT) AS dp,
        |    CAST(list_sum(list_transform(ps, s -> length(s))) AS BIGINT) AS pc,
        |    CAST(list_sum(list_transform(list_distinct(ps), s -> length(s))) AS BIGINT) AS pdc
        |  FROM segs),
        |pm AS (
        |  SELECT doc_id, nl AS n_lines,
        |    CASE WHEN nl = 0 THEN 0 ELSE (nl - dl) * 10000 // nl END AS dup_line_pm,
        |    CASE WHEN lc = 0 THEN 0 ELSE (lc - ldc) * 10000 // lc END AS dup_line_char_pm,
        |    np AS n_paras,
        |    CASE WHEN np = 0 THEN 0 ELSE (np - dp) * 10000 // np END AS dup_para_pm,
        |    CASE WHEN pc = 0 THEN 0 ELSE (pc - pdc) * 10000 // pc END AS dup_para_char_pm
        |  FROM c)
        |SELECT doc_id, n_lines, CAST(dup_line_pm AS BIGINT) AS dup_line_pm,
        |  CAST(dup_line_char_pm AS BIGINT) AS dup_line_char_pm,
        |  n_paras, CAST(dup_para_pm AS BIGINT) AS dup_para_pm,
        |  CAST(dup_para_char_pm AS BIGINT) AS dup_para_char_pm,
        |  CAST(dup_line_pm <= 3000 AND dup_line_char_pm <= 2000
        |       AND dup_para_pm <= 3000 AND dup_para_char_pm <= 2000 AS INT) AS keep
        |FROM pm ORDER BY doc_id""".stripMargin,
    "t58_line_filter" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '(\S+ \S+ \S+ \S+ \S+) ',
        |                   '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS ls,
        |    list_filter(string_split(text, chr(10)),
        |      l -> len(list_filter(string_split(l, ' '), w -> len(w) > 0)) >= 5
        |           AND strpos(l, 'customer') = 0) AS kept
        |  FROM src)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
        |  CAST(len(kept) AS BIGINT) AS kept_lines,
        |  CAST(len(ls) - len(kept) AS BIGINT) AS dropped_lines
        |FROM f WHERE len(kept) >= 2 ORDER BY doc_id""".stripMargin,
    "t59_normalized_dedup" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    CASE WHEN doc_id % 3 = 0 THEN upper(text)
        |         WHEN doc_id % 3 = 1 THEN text || ' !!'
        |         ELSE regexp_replace(text, ' ', '  ', 'g') END
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^\p{L}\p{N} ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM c)
        |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, COUNT(*) AS n_variants
        |FROM n GROUP BY CASE WHEN norm = '' THEN chr(1) || text ELSE norm END
        |ORDER BY doc_id""".stripMargin,
    "t60_chunk_overlap" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, ws, len(ws) AS n,
        |    CASE WHEN len(ws) <= 12 THEN 0 ELSE (len(ws) - 12 + 7) // 8 END AS maxi
        |  FROM w WHERE len(ws) > 0),
        |c AS (
        |  SELECT doc_id, ws, n, i AS chunk_id, i * 8 AS s
        |  FROM b, LATERAL UNNEST(generate_series(0, maxi)) AS t(i))
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(s + 1 AS BIGINT) AS start_tok,
        |  CAST(least(12, n - s) AS BIGINT) AS n_tok,
        |  array_to_string(ws[s + 1 : s + least(12, n - s)], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "t54_token_budget_mix" -> {
      import graft.operators.Sampling.shuffleKeySql
      s"""WITH w AS (SELECT doc_id, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |             ${shuffleKeySql("doc_id", 7L)} AS h FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)
         |          AS cum_tokens FROM w)
         |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= 800
         |ORDER BY source, cum_tokens""".stripMargin
    },
    "t51_quality_classifier" -> {
      import graft.operators.Decontamination.gramHashSql
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |g AS (
         |  SELECT doc_id, gram FROM (
         |    SELECT doc_id, unnest(ws) AS gram FROM w
         |    UNION ALL
         |    SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
         |      THEN [array_to_string(ws[i:i+1], ' ') FOR i IN generate_series(1, len(ws)-1)]
         |      ELSE [text] END) AS gram FROM w)),
         |h AS (SELECT doc_id, ${gramHashSql("gram")} % 4096 AS b FROM g),
         |sc AS (SELECT doc_id,
         |         CAST(SUM(((b * 2654435761) % 2147483648) % 2001 - 1000) AS BIGINT) AS score,
         |         CAST(COUNT(*) AS BIGINT) AS n_feats
         |       FROM h GROUP BY doc_id)
         |SELECT doc_id, score, n_feats, CAST(score >= 0 AS INT) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin
    },
    "t50_source_overlap" -> {
      import graft.operators.Decontamination.gramHashSql
      s"""WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT source,
         |  CASE WHEN len(ws) >= 13
         |   THEN list_distinct([array_to_string(ws[i:i+12], ' ') FOR i IN generate_series(1, len(ws)-12)])
         |   ELSE [array_to_string(ws, ' ')] END AS sh FROM w),
         |sg AS (SELECT DISTINCT source AS src, ${gramHashSql("gram")} AS g
         |       FROM (SELECT source, unnest(sh) AS gram FROM g)),
         |tot AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_grams FROM sg GROUP BY src),
         |pairs AS (SELECT a.src AS src_a, b.src AS src_b,
         |                 CAST(COUNT(*) AS BIGINT) AS shared_grams
         |          FROM sg a JOIN sg b ON a.g = b.g AND a.src < b.src
         |          GROUP BY 1, 2)
         |SELECT p.src_a, p.src_b, p.shared_grams,
         |       ta.n_grams AS grams_a, tb.n_grams AS grams_b,
         |       CAST(p.shared_grams * 10000 // (ta.n_grams + tb.n_grams - p.shared_grams) AS BIGINT) AS jaccard_pm
         |FROM pairs p
         |JOIN tot ta ON ta.src = p.src_a
         |JOIN tot tb ON tb.src = p.src_b
         |ORDER BY p.src_a, p.src_b""".stripMargin
    },
    "t49_bpe_tokens" -> bpeWalkOracleSql(TextAnalysis.BpeVocab),
    // same per-character walk replay, under the IMPORTED foreign
    // vocabulary — the oracle replays the identical merges.txt rules
    "t72_bpe_import" -> bpeWalkOracleSql(
      TextAnalysis.vocabFromMerges(
        ForeignMerges.zipWithIndex.map { case ((l, r), i) => (i + 1L, l, r) })),
    // BPE training replay: each word encodes as a string of
    // individually chr(31)-wrapped symbols (every symbol carries its OWN
    // delimiter pair, so one `replace` of the wrapped pair pattern is
    // exactly the greedy left-to-right non-overlapping merge — adjacent
    // occurrences never share a delimiter). 8 unrolled rounds of
    // count → top-1 → merge mirror the engine's loop bit-for-bit.
    "t66_bpe_train" -> {
      val unioned = (1 to BpeTrainMergeCount).map(k =>
        s"SELECT $k AS k, l, r, cnt FROM b$k").mkString("\n  UNION ALL ")
      s"""WITH ${bpeTrainCtes(BpeTrainMergeCount)}
         |SELECT CAST(k AS BIGINT) AS merge_rank, l AS lhs, r AS rhs,
         |       cnt AS pair_count
         |FROM ($unioned)
         |ORDER BY merge_rank""".stripMargin
    },
    // Batched-training replay: per round, c{k}1 = the global top pair
    // and c{k}2 = the top pair sharing NO symbol with c{k}1; both apply
    // via the same delimiter-wrapped replace (disjoint rules commute, so
    // nested replaces = rank-order application). A LEFT JOIN ON TRUE
    // keeps the round alive when no disjoint second pair exists; the
    // final row_number over (round, slot) renumbers compactly, exactly
    // like the engine's sequential rank assignment.
    "t69_bpe_train_batched" -> batchedBpeOracleSql,
    // resume ≡ one-shot: t70's Spark side trains through a kill/restart
    // boundary; its contract is bit-equality with the uninterrupted
    // batch=2 training, so the oracle is the same replay
    "t70_bpe_train_resume" -> batchedBpeOracleSql,
    "t68_pii_redact" -> {
      import graft.operators.TextAnalysis.{EmailRe, PhoneRe, Ipv4Re}
      def esc(re: String) = re.replace("'", "''")
      s"""WITH seeded AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0
         |      THEN ' reach user' || doc_id || '@mail.example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 1
         |      THEN ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 2
         |      THEN ' from 10.0.' || (doc_id % 256) || '.7' ELSE '' END AS text
         |  FROM documents),
         |r1 AS (SELECT doc_id,
         |         CAST(len(regexp_extract_all(text, '${esc(EmailRe)}')) AS BIGINT) AS n_emails,
         |         regexp_replace(text, '${esc(EmailRe)}', '<EMAIL>', 'g') AS t1
         |       FROM seeded),
         |r2 AS (SELECT doc_id, n_emails,
         |         CAST(len(regexp_extract_all(t1, '${esc(PhoneRe)}')) AS BIGINT) AS n_phones,
         |         regexp_replace(t1, '${esc(PhoneRe)}', '<PHONE>', 'g') AS t2
         |       FROM r1)
         |SELECT doc_id,
         |  regexp_replace(t2, '${esc(Ipv4Re)}', '<IP>', 'g') AS clean_text,
         |  n_emails, n_phones,
         |  CAST(len(regexp_extract_all(t2, '${esc(Ipv4Re)}')) AS BIGINT) AS n_ips
         |FROM r2 ORDER BY doc_id""".stripMargin
    },
    // Train-then-apply: the same 8 training rounds produce the learned
    // vocabulary, which then drives t49's greedy longest-match recursive
    // walk — the full tokenizer pipeline (learn merges -> tokenize the
    // corpus) replayed end to end in one oracle.
    "t67_bpe_apply" -> {
      val vocab = (1 to BpeTrainMergeCount).map(k =>
        s"SELECT l || r AS v FROM b$k").mkString("\n  UNION ")
      s"""WITH RECURSIVE ${bpeTrainCtes(BpeTrainMergeCount)},
         |vocab AS ($vocab),
         |walk(doc_id, pos, ntok, ck) AS (
         |  SELECT doc_id, CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT w.doc_id,
         |    w.pos + coalesce((SELECT max(length(t.v)) FROM vocab t
         |      WHERE substr(d.text, CAST(w.pos AS INT), length(t.v)) = t.v), 1),
         |    w.ntok + 1,
         |    w.ck + (w.ntok + 1) * coalesce((SELECT max(length(t.v)) FROM vocab t
         |      WHERE substr(d.text, CAST(w.pos AS INT), length(t.v)) = t.v), 1)
         |  FROM walk w JOIN documents d USING (doc_id)
         |  WHERE w.pos <= length(d.text))
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
         |       f.ntok AS bpe_tokens, f.ck AS bpe_checksum
         |FROM documents d
         |JOIN (SELECT doc_id, max(ntok) AS ntok, max(ck) AS ck
         |      FROM walk GROUP BY doc_id) f USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    "t12_stream_backfill" ->
      """SELECT event_type,
        | CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type, hour_ms
        |ORDER BY event_type, hour_ms""".stripMargin,
    "t09_media_features" ->
      """SELECT doc_id AS media_id,
        | CAST(length(text) AS BIGINT) AS n_bytes,
        | CAST(list_sum([ascii(text[i]) FOR i IN generate_series(1, length(text))]) AS BIGINT) AS byte_sum,
        | CAST(len(list_filter([ascii(text[i]) FOR i IN generate_series(1, length(text))], c -> c % 16 = 0)) AS BIGINT) AS h0,
        | CAST(len(list_filter([ascii(text[i]) FOR i IN generate_series(1, length(text))], c -> c % 16 = 1)) AS BIGINT) AS h1,
        | CAST(len(list_filter([ascii(text[i]) FOR i IN generate_series(1, length(text))], c -> c % 16 = 2)) AS BIGINT) AS h2,
        | CAST(len(list_filter([ascii(text[i]) FOR i IN generate_series(1, length(text))], c -> c % 16 = 3)) AS BIGINT) AS h3
        |FROM documents ORDER BY media_id""".stripMargin,
    "t10_media_sample" ->
      """SELECT doc_id AS media_id,
        | CAST(length(text) AS BIGINT) AS orig_bytes,
        | CAST((length(text) + 6) // 7 AS BIGINT) AS n_sampled,
        | CAST(32 AS BIGINT) AS n_resized,
        | CAST(ascii(text) AS BIGINT) AS first_byte
        |FROM documents ORDER BY media_id""".stripMargin
  )

  /** The langId heuristic as a DuckDB CASE chain (must mirror
    * TextAnalysis.langId exactly: first profile hitting the max wins). */
  private def langCase(textCol: String): String = {
    def score(words: Seq[String]) =
      s"len(list_filter(string_split($textCol, ' '), x -> x IN (${words.map("'" + _ + "'").mkString(",")})))"
    val scores = TextAnalysis.LangProfiles.map { case (l, ws) => l -> score(ws) }
    val maxExpr = scores.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    val whens = scores.map { case (l, sc) =>
      s"WHEN $maxExpr > 0 AND $sc = $maxExpr THEN '$l'"
    }.mkString(" ")
    s"(CASE $whens ELSE 'und' END)"
  }
}
