package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY §2-H: scalar function surface (string/date/math/array/map/json).
  * All built-in `org.apache.spark.sql.functions` — fully codegen'd, no UDFs
  * in these paths. */
object Funcs {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** H1 — string toolkit (the Cassandra-column → Solr-field cleanup set). */
  val fnString = Q(
    "fn_string",
    """SELECT c_custkey,
      |  UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
      |  LENGTH(c_name) AS len, SUBSTR(c_name, 1, 8) AS pre,
      |  c_mktsegment || ':' || c_name AS joined,
      |  string_split(c_name, '#')[2] AS cust_num,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS num_str,
      |  regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked,
      |  TRIM('  pad  ') AS trimmed
      |FROM customer ORDER BY c_custkey LIMIT 1000""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up"), lower(col("c_mktsegment")).as("lo"),
        length(col("c_name")).as("len"), substring(col("c_name"), 1, 8).as("pre"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("joined"),
        element_at(split(col("c_name"), "#"), 2).as("cust_num"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("num_str"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("masked"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy("c_custkey").limit(1000)
  }

  /** H2 — date/time toolkit. */
  val fnDate = Q(
    "fn_date",
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS d,
      |  YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
      |  DAY(o_orderdate) AS dom, QUARTER(o_orderdate) AS qtr,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  datediff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS days_since_y2k,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(to_date(col("o_orderdate")), lit("2000-01-01")).as("days_since_y2k"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey").limit(2000)
  }

  /** H3 — math toolkit. Transcendentals rounded to 6 decimals (libm last-bit
    * differences between JVM and C are far inside that). */
  val fnMath = Q(
    "fn_math",
    """SELECT l_orderkey, l_linenumber,
      |  ROUND(l_extendedprice, 1) AS r1,
      |  ABS(l_discount - 0.05) AS dev,
      |  POWER(l_quantity, 2) AS qty_sq,
      |  ROUND(SQRT(l_extendedprice), 6) AS sq,
      |  ROUND(LN(l_extendedprice), 6) AS logn,
      |  ROUND(LOG(l_extendedprice), 6) AS log_10,
      |  CAST(CEIL(l_discount * 10) AS BIGINT) AS ce,
      |  CAST(FLOOR(l_tax * 10) AS BIGINT) AS fl
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, r1, dev, qty_sq, ce, fl
      |LIMIT 2000""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("r1"),
          abs(col("l_discount") - 0.05).as("dev"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("logn"),
          round(log10(col("l_extendedprice")), 6).as("log_10"),
          ceil(col("l_discount") * 10).as("ce"),
          floor(col("l_tax") * 10).as("fl"))
        .orderBy("l_orderkey", "l_linenumber", "r1", "dev", "qty_sq", "ce", "fl")
        .limit(2000)
  }

  /** H4 — array functions incl. higher-order (transform/filter) over
    * tokenized text. */
  val fnArray = Q(
    "fn_array",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  string_split(text, ' ')[1] AS first_tok,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
      |  list_contains(string_split(text, ' '), 'data') AS has_data,
      |  len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long,
      |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |  array_to_string(list_transform(list_sort(list_distinct(string_split(text, ' '))), x -> upper(x)), ',') AS uniq_upper
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = split(col("text"), " ")
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        element_at(toks, 1).as("first_tok"),
        array_join(slice(toks, 1, 3), " ").as("first3"),
        array_contains(toks, "data").as("has_data"),
        size(filter(toks, x => length(x) > 4)).as("n_long"),
        size(array_distinct(toks)).as("n_uniq"),
        array_join(transform(array_sort(array_distinct(toks)), x => upper(x)), ",")
          .as("uniq_upper"))
      .orderBy("doc_id")
  }

  /** H5 — map functions (Solr dynamic-field shape), oracle on DuckDB's
    * native MAP type (extraction there returns a single-element list,
    * hence the `[1]`). */
  val fnMap = Q(
    "fn_map",
    """WITH m AS (SELECT p_partkey,
      |  MAP{'brand': p_brand, 'type': p_type, 'size': CAST(p_size AS VARCHAR)} AS doc
      |  FROM part)
      |SELECT p_partkey, doc['brand'][1] AS brand_field,
      |  CAST(cardinality(doc) AS INT) AS n_fields,
      |  array_to_string(list_sort(map_keys(doc)), ',') AS key_list,
      |  doc['size'][1] AS size_field
      |FROM m ORDER BY p_partkey LIMIT 2000""".stripMargin) { (s, dir) =>
    val m = map_from_entries(array(
      struct(lit("brand").as("key"), col("p_brand").as("value")),
      struct(lit("type").as("key"), col("p_type").as("value")),
      struct(lit("size").as("key"), col("p_size").cast("string").as("value"))))
    t(s, dir, "part")
      .withColumn("doc", m)
      .select(
        col("p_partkey"),
        element_at(col("doc"), "brand").as("brand_field"),
        size(col("doc")).as("n_fields"),
        array_join(array_sort(map_keys(col("doc"))), ",").as("key_list"),
        element_at(col("doc"), "size").as("size_field"))
      .orderBy("p_partkey").limit(2000)
  }

  /** H6 — JSON extraction from the events.props payload. */
  val fnJson = Q(
    "fn_json",
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(k).as("sum_k"), min(k).as("min_k"), max(k).as("max_k"))
        .transform(Parity.sortedSmall(_, col("event_type")))
  }

  /** H3-adjacent — bitwise surface: AND/OR/XOR, shifts, popcount — the
    * primitives behind bitmap indexes, bloom hashing and the Morton
    * (z-order) layout key. Both engines compute on BIGINT two's
    * complement; every output is cast BIGINT (DuckDB's xor() returns the
    * operand width, bit_count an INT). */
  val fnBitwise = Q(
    "fn_bitwise",
    """SELECT o_orderkey,
      |  CAST(o_orderkey & 255 AS BIGINT) AS band,
      |  CAST(o_orderkey | 4096 AS BIGINT) AS bor,
      |  CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS bxor,
      |  CAST(o_orderkey << 3 AS BIGINT) AS shl,
      |  CAST(o_orderkey >> 2 AS BIGINT) AS shr,
      |  CAST(bit_count(o_orderkey) AS BIGINT) AS pop,
      |  CAST(~o_orderkey AS BIGINT) AS bnot
      |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("o_orderkey & 255").cast("long").as("band"),
        expr("o_orderkey | 4096").cast("long").as("bor"),
        expr("o_orderkey ^ o_custkey").cast("long").as("bxor"),
        expr("shiftleft(o_orderkey, 3)").cast("long").as("shl"),
        expr("shiftright(o_orderkey, 2)").cast("long").as("shr"),
        expr("bit_count(o_orderkey)").cast("long").as("pop"),
        expr("~o_orderkey").cast("long").as("bnot"))
      .orderBy("o_orderkey").limit(2000)
  }

  /** H6-adjacent — Spark 4 VariantType: semi-structured JSON parsed ONCE
    * into the binary variant encoding, then field-extracted with typed
    * `variant_get` (decode-once-scan-many — the modern replacement for
    * re-parsing strings per get_json_object call). The oracle runs plain
    * JSON extraction (DuckDB has no variant; the SEMANTICS are identical
    * by design). `try_variant_get` covers the missing-path → NULL
    * contract. */
  val fnVariant = Q(
    "fn_json_variant",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
      |  json_extract_string(props, '$.k') AS k_str,
      |  (json_extract(props, '$.missing') IS NULL) AS missing_is_null
      |FROM events
      |ORDER BY event_id LIMIT 5000""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k_typed"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("try_variant_get(v, '$.missing', 'string')").isNull
          .as("missing_is_null"))
      .orderBy("event_id").limit(5000)
  }

  /** H1-adjacent — the regexp toolkit beyond fn_string's extract/replace:
    * extract-ALL (as a joined list — flat schema for the driver compare),
    * match counting via the extracted list's length (the portable form:
    * DuckDB has no regexp_count), boolean match tests, and a
    * capture-group rewrite. NULLIF('') normalizes the no-match value
    * (Spark regexp_extract returns '', DuckDB '' as well — pinned
    * explicitly so a future engine change surfaces here, not in a hash
    * mismatch). Pure map over the scan; pushed-down doc_id range. */
  val fnRegexpAll = Q(
    "fn_regexp_all",
    """SELECT doc_id,
      |  array_to_string(regexp_extract_all(text, '[a-z]+ing'), ',')
      |    AS ing_words,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
      |  CAST(regexp_matches(text, '^[A-Z]') AS BOOLEAN) AS starts_upper,
      |  NULLIF(regexp_extract(text, '([a-z]+)ing', 1), '') AS first_stem,
      |  CAST(LENGTH(regexp_replace(text, '([aeiou])[a-z]', '\1_', 'g'))
      |    AS BIGINT) AS rewritten_len
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          // DuckDB's array_to_string(empty) is NULL while Spark's
          // array_join(empty) is '' — NULLIF pins the no-match value.
          nullif(
            array_join(expr("regexp_extract_all(text, '[a-z]+ing')"), ","),
            lit("")).as("ing_words"),
          size(expr("regexp_extract_all(text, '[0-9]+')")).cast("long")
            .as("n_nums"),
          col("text").rlike("^[A-Z]").as("starts_upper"),
          nullif(regexp_extract(col("text"), "([a-z]+)ing", 1), lit(""))
            .as("first_stem"),
          length(regexp_replace(col("text"), "([aeiou])[a-z]", "$1_"))
            .cast("long").as("rewritten_len"))
        .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(fnString, fnDate, fnMath, fnArray, fnMap, fnJson,
    fnBitwise, fnVariant, fnRegexpAll)
}
