package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2-J: user-defined scalar / aggregate / generator surface.
  *
  * Policy: built-ins beat UDFs (Catalyst can't see through a UDF — no
  * pushdown, no codegen fusion). Exactly one scalar UDF exists to prove the
  * registration surface; the typed Aggregator is the public API for custom
  * aggregation state (vector centroid); generators are covered by
  * posexplode (no custom Generator Expression needed at this surface).
  */
object Udx {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** J1 — scalar UDF: text normalization (lower, strip non-alnum, collapse
    * whitespace). The oracle mirrors it as a regexp_replace chain — which
    * is also how production code should write it (codegen'd, pushdown-safe). */
  val udfScalar = Q(
    "udf_scalar",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |       ' +', ' ', 'g')) AS norm
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val normalize = udf { text: String =>
      if (text == null) null
      else text.toLowerCase
        .replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ")
        .trim
    }
    t(s, dir, "documents")
      .select(col("doc_id"), normalize(col("text")).as("norm"))
      .orderBy("doc_id")
  }

  /** Typed aggregation buffer for the centroid Aggregator. */
  final case class CentroidBuf(sums: Array[Double], n: Long)

  /** J2 — typed Aggregator: per-label centroid of embedding vectors.
    * This is the `TypedImperativeAggregate`-class capability through the
    * public API: partial buffers merge associatively, so Spark runs it as
    * a two-phase aggregate with map-side combine — the scalable shape. */
  /** Shared mergeable (sums, n) vector-sum core — one implementation for
    * every element-wise mean aggregator (the float centroid here, the
    * double power-iteration mean in ClusterOps). */
  object VecSum {
    def add(b: CentroidBuf, v: Int => Double, len: Int): CentroidBuf = {
      val s = if (b.sums.isEmpty) new Array[Double](len) else b.sums
      var i = 0
      while (i < len) { s(i) += v(i); i += 1 }
      CentroidBuf(s, b.n + 1)
    }
    def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
      if (a.sums.isEmpty) b
      else if (b.sums.isEmpty) a
      else {
        val s = a.sums.clone()
        var i = 0
        while (i < s.length) { s(i) += b.sums(i); i += 1 }
        CentroidBuf(s, a.n + b.n)
      }
  }

  val centroidAgg: Aggregator[Seq[Float], CentroidBuf, Seq[Double]] =
    new Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
      override def zero: CentroidBuf = CentroidBuf(Array.empty, 0L)
      override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf =
        VecSum.add(b, i => v(i).toDouble, v.length)
      override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
        VecSum.merge(a, b)
      override def finish(r: CentroidBuf): Seq[Double] =
        r.sums.toSeq.map { s =>
          BigDecimal(s / r.n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        }
      override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** The declared output renders the centroid vector as a comma-joined
    * string of DECIMAL(18,6) components (raw array columns are not hashable
    * by the driver's comparator; decimal→string prints the full scale
    * identically in both engines). */
  val udafAggregator = Q(
    "udaf_aggregator",
    """SELECT label, array_to_string(list_transform(list(r ORDER BY dim),
      |    x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), ',') AS centroid
      |FROM (
      |  SELECT label, dim, ROUND(AVG(CAST(v AS DOUBLE)), 6) AS r FROM (
      |    SELECT label, generate_subscripts(embedding, 1) AS dim,
      |           unnest(embedding) AS v
      |    FROM embeddings) GROUP BY label, dim)
      |GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
    val centroid = udaf(centroidAgg)
    t(s, dir, "embeddings")
      .groupBy("label")
      .agg(centroid(col("embedding")).as("centroid_arr"))
      .select(col("label"),
        array_join(transform(col("centroid_arr"),
          x => x.cast("decimal(18,6)").cast("string")), ",").as("centroid"))
      .orderBy("label")
  }

  /** J3 — generator (one row → many): positional tokenization. Spark's
    * posexplode covers the Generator surface; pos is shifted to 1-based to
    * match SQL subscripts. */
  val udtfGenerator = Q(
    "udtf_generator",
    """SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |       unnest(string_split(text, ' ')) AS token
      |FROM documents ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("token"))
      .orderBy("doc_id", "pos")
  }

  val all: Seq[Q] = Seq(udfScalar, udafAggregator, udtfGenerator)
}
