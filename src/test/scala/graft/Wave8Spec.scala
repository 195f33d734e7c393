package graft

import graft.operators.{EventsOps2, GraphOps, TextOps2}
import java.security.MessageDigest
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-8 analytics pack (Markov transitions,
  * session paths, trailing EWMA, co-occurrence graph stats, n-gram
  * containment) — driver-side recomputations pin the semantics the
  * DuckDB oracle can't express as a law. */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  test("markov: rows per from_type sum to probability 1; counts conserve") {
    val out = EventsOps2.eventsMarkovTransitions.fn(spark, sfDir).collect()
    out.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(4)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"from=$from probs sum $pSum")
      val nFrom = rs.head.getLong(3)
      assert(rs.map(_.getLong(2)).sum == nFrom)
    }
    val ev = Tables.load(spark, sfDir, "events")
    val totalTransitions = ev.count() -
      ev.select("user_id").distinct().count()
    assert(out.map(_.getLong(2)).sum == totalTransitions)
  }

  test("session paths: <= 3 segments, counts descend, paths are event types") {
    val out = EventsOps2.sessionPathsTopn.fn(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 10)
    val types = Set("click", "error", "purchase", "signup", "view")
    out.foreach { r =>
      val segs = r.getString(0).split(">")
      assert(segs.length >= 1 && segs.length <= 3)
      segs.foreach(t => assert(types(t)))
    }
    val ns = out.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("ewma: matches a driver-side recomputation of the trailing-8 formula") {
    val out = EventsOps2.eventsEwmaTrailing.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    val purchases = Tables.load(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"), $"value")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.sortBy(r => (r._3, r._2)).map(_._4)
      }
    val w = (0 to 7).map(d => 0.25 * math.pow(0.75, d))
    val expected = purchases.flatMap { case (u, xs) =>
      xs.indices.map { i =>
        val terms = (0 to math.min(7, i)).map(d => w(d) * xs(i - d))
        val den = (0 to math.min(7, i)).map(w).sum
        (u, i, math.rint(terms.sum / den * 1e6) / 1e6)
      }
    }
    // Index by (user, order) — event ids differ; compare sorted sequences.
    val gotByUser = out.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(_._2).map(_._3).toSeq
    }
    expected.groupBy(_._1).foreach { case (u, exp) =>
      val es = exp.toSeq.sortBy(_._2).map(_._3)
      val gs = gotByUser(u)
      assert(es.size == gs.size)
      es.zip(gs).foreach { case (e, g) =>
        assert(math.abs(e - g) <= 1e-6, s"user $u")
      }
    }
    // The first purchase of every user is its own EWMA (weights normalize).
    val firstVals = purchases.map { case (u, xs) => u -> xs.head }
    firstVals.foreach { case (u, v) =>
      assert(math.abs(gotByUser(u).head - math.rint(v * 1e6) / 1e6) <= 1e-6)
    }
  }

  /** Driver-side rebuild of the co-occurrence graph (same definition as
    * GraphOps.edges): top-50 df tokens, pairs in >= 4% of docs. */
  private def rebuildGraph(): (Set[(String, String)], Map[String, Int]) = {
    val texts = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val docTokens = texts.map(_._2.split(" ").toSet)
    val df = docTokens.flatten.groupBy(identity).view.mapValues(_.length)
    val nodes = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
      .map(_._1).toSet
    val minCo = math.ceil(0.04 * texts.length).toInt
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Int]
    docTokens.foreach { ts =>
      val in = ts.intersect(nodes).toSeq.sorted
      for (i <- in.indices; j <- i + 1 until in.size)
        pairCounts((in(i), in(j))) =
          pairCounts.getOrElse((in(i), in(j)), 0) + 1
    }
    val edges = pairCounts.filter(_._2 >= minCo).keySet.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length).toMap
    (edges, deg)
  }

  test("triangles: per-node counts match a driver-side graph rebuild") {
    val (edges, _) = rebuildGraph()
    val es = edges
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triPerNode = scala.collection.mutable.Map.empty[String, Long]
    for {
      (a, b) <- es; c <- nodes if b < c
      if es((b, c)) && es((a, c))
    } Seq(a, b, c).foreach(n =>
      triPerNode(n) = triPerNode.getOrElse(n, 0L) + 1)
    val expectedTop = triPerNode.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(20)
    val got = GraphOps.graphTriangleCount.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expectedTop)
  }

  test("degree histogram: sum(degree * n_nodes) = 2 * |edges|") {
    val (edges, deg) = rebuildGraph()
    val out = GraphOps.graphDegreeStats.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map { case (d, n) => d * n }.sum == 2L * edges.size)
    assert(out.map(_._2).sum == deg.size)
  }

  test("hashing features: exact driver-side recompute of the signed buckets") {
    val out = TextOps2.textHashingFeatures.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
    texts.foreach { case (id, text) =>
      text.split(" ").foreach { tok =>
        val h = md5hex(tok)
        def nib(i: Int) = "0123456789abcdef".indexOf(h(i)).toLong
        val bucket = (nib(0) * 16 + nib(1)) % 64
        val sign = if (nib(2) < 8) 1L else -1L
        val k = (id, bucket)
        expected(k) = expected.getOrElse(k, 0L) + sign
      }
    }
    assert(out == expected.filter(_._2 != 0L).toMap)
  }

  test("tfidf cosine: values agree with a driver-side recompute, 42 excluded") {
    val out = TextOps2.searchTfidfCosine.fn(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) != 42L))
    val cosines = out.map(_.getDouble(1)).toSeq
    assert(cosines == cosines.sorted.reverse)
    val texts = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // split(" ", -1): Spark/DuckDB string_split KEEP trailing empty
    // tokens; Java's 1-arg split drops them, silently changing df/weights.
    val tf = texts.map { case (id, t) =>
      id -> t.split(" ", -1).groupBy(identity).view.mapValues(_.length).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size).toMap
    val n = texts.length.toDouble
    def w(id: Long): Map[String, Double] = tf(id).map { case (t, f) =>
      t -> math.rint(f * math.log(n / df(t)) * 1e6) / 1e6
    }
    val wq = w(42L)
    val qn = math.sqrt(wq.values.map(x => x * x).sum)
    out.foreach { r =>
      val (id, cos) = (r.getLong(0), r.getDouble(1))
      val wd = w(id)
      // .toSeq first: wq.keys is a Set and Set.map would collapse equal
      // products before the sum.
      val dot = wq.keys.toSeq.filter(wd.contains).map(t => wq(t) * wd(t)).sum
      val dn = math.sqrt(wd.values.map(x => x * x).sum)
      val exp = dot / (qn * dn)
      assert(math.abs(cos - exp) <= 2e-4, s"doc $id: $cos vs $exp")
      assert(cos > 0.0 && cos <= 1.0 + 1e-6)
    }
  }

  test("containment: pairs verified against a driver-side shingle rebuild") {
    val out = TextOps2.textContainmentNgram.fn(spark, sfDir).collect()
    assert(out.nonEmpty) // the clone-bearing corpus must surface pairs
    val md = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // Same pipeline: >=8 tokens, exact-dup collapse to min doc_id.
    val reps = texts.filter(_._2.split(" ").length >= 8)
      .groupBy(t => md5hex(t._2)).map(_._2.minBy(_._1)).toSeq
    val shingles = reps.map { case (id, text) =>
      val toks = text.split(" ")
      id -> toks.sliding(8).map(w => md5hex(w.mkString(" "))).toSet
    }.toMap
    val dfh = shingles.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val kept = shingles.map { case (id, hs) =>
      id -> hs.filter(h => dfh(h) <= 50)
    }
    out.foreach { r =>
      val (a, b, nShared, cont) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(a < b)
      val inter = kept(a).intersect(kept(b)).size.toLong
      assert(inter == nShared, s"pair ($a,$b)")
      val expCont = math.rint(
        inter.toDouble / math.min(kept(a).size, kept(b).size) * 1e6) / 1e6
      assert(math.abs(cont - expCont) <= 1e-9 && cont >= 0.5)
    }
  }

  test("label propagation: labels are graph nodes; communities respect " +
      "isolated-node identity; deterministic across runs") {
    val out = operators.GraphOps.graphLabelPropagation.fn(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    val nodes = out.map(_.getString(0)).toSet
    // Every final label is itself a node of the graph (labels only ever
    // propagate from initial node-labels).
    out.foreach(r => assert(nodes.contains(r.getString(1))))
    val again = operators.GraphOps.graphLabelPropagation.fn(spark, sfDir)
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      again.map(r => (r.getString(0), r.getString(1))).toSeq)
  }

  test("weighted A-ES sample: keys in (0,1], descending, biased to length") {
    val out = operators.CurationOps2.sampleWeightedAes.fn(spark, sfDir)
      .collect()
    assert(out.length == 20)
    val keys = out.map(_.getDouble(2))
    assert(keys.forall(k => k > 0.0 && k <= 1.0))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    // Length bias: the sampled docs' mean n_chars should exceed the
    // corpus mean (u^(1/w) stochastically dominates for larger w).
    val sampledMean = out.map(_.getLong(1)).sum.toDouble / out.length
    val corpusMean = Tables.load(spark, sfDir, "documents")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head.getDouble(0)
    assert(sampledMean > corpusMean,
      s"no length bias: sampled $sampledMean vs corpus $corpusMean")
  }

  test("regexp toolkit: n_nums counts digits runs; rewrite preserves length") {
    val out = operators.Funcs.fnRegexpAll.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // The ([aeiou])[a-z] -> $1_ rewrite is length-preserving.
      val doc = Tables.load(spark, sfDir, "documents")
        .filter(org.apache.spark.sql.functions.col("doc_id") === r.getLong(0))
        .select("text").head.getString(0)
      assert(r.getLong(5) == doc.length.toLong, s"doc ${r.getLong(0)}")
      assert(r.getLong(2) ==
        "[0-9]+".r.findAllIn(doc).length.toLong)
    }
  }

  test("regression stats: slope/intercept/r2 match a driver-side fit") {
    val out = operators.Aggs.aggRegression.fn(spark, sfDir).head()
    val rows = Tables.load(spark, sfDir, "lineitem")
      .select("l_quantity", "l_extendedprice").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length.toDouble
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxx = rows.map(t => t._1 * t._1).sum
    val syy = rows.map(t => t._2 * t._2).sum
    val sxy = rows.map(t => t._1 * t._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.getDouble(1) - slope) < 1e-3)
    assert(out.getDouble(3) >= 0.0 && out.getDouble(3) <= 1.0)
    assert(out.getLong(0) == rows.length.toLong)
  }
}
