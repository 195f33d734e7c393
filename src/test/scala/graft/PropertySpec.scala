package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 #3: algebraic laws over generated frames. ScalaCheck
  * generators sampled with fixed seeds (deterministic suite; each law
  * round-trips through real Spark jobs, so 5 samples/law keeps it fast). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val smallInts = Gen.listOfN(30, Gen.chooseNum(-50, 50))
  private def samples[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("union row-count additivity") {
    for ((a, b) <- samples(smallInts).zip(samples(smallInts, 5).reverse)) {
      assert(a.toDF("x").union(b.toDF("x")).count() == a.length + b.length)
    }
  }

  test("filter p and not-p partition a table") {
    for (a <- samples(smallInts)) {
      val df = a.toDF("x")
      val p = col("x") > 0
      assert(df.filter(p).count() + df.filter(!p).count() == a.length)
    }
  }

  test("join on unique keys preserves left row count") {
    for (a <- samples(smallInts)) {
      val left = a.distinct.toDF("k")
      val right = a.distinct.map(k => (k, k * 2)).toDF("k", "v")
      assert(left.join(right, "k").count() == a.distinct.length)
    }
  }

  test("dedup idempotence") {
    for (a <- samples(smallInts)) {
      val once = a.toDF("x").dropDuplicates("x")
      assert(once.count() == a.distinct.length)
      assert(once.dropDuplicates("x").count() == a.distinct.length)
    }
  }

  test("cosine(v, v) == 1 for any non-zero vector") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-10f, 10f))
      .suchThat(v => v.exists(x => math.abs(x) > 0.1f))
    for (v <- samples(vecGen)) {
      val sim = Seq((v, v)).toDF("a", "b")
        .select(call_function("cosine_sim", $"a", $"b")).head.getDouble(0)
      assert(math.abs(sim - 1.0) < 1e-9)
    }
  }

  test("minhash similarity increases with true Jaccard on planted pairs") {
    // doc 1 shares nearly all shingles with doc 0; doc 2 shares fewer.
    val base = (1 to 32).map(i => s"t$i")
    val near = base.updated(5, "x5")
    val mid = base.take(20) ++ (1 to 12).map(i => s"m$i")
    val docs = Seq(
      (0L, base.mkString(" ")), (1L, near.mkString(" ")),
      (2L, mid.mkString(" "))).toDF("doc_id", "text")
    val pairs = graft.operators.VectorOps
      .minhashPairs(docs, 32, 8, 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 1L)), "high-jaccard pair must be a candidate")
    pairs.get((0L, 2L)).foreach { j02 => assert(pairs((0L, 1L)) > j02) }
  }
}
