package graft

import graft.operators.GuardOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-18 guardrail pack: the expectation engine
  * must actually catch planted violations of every rule class, and the
  * partial-merge identity must hold structurally. */
class GuardSpec extends SparkSpec {

  test("expectations: clean corpus reports 5 all-pass rules") {
    val out = GuardOps.dataExpectationsCheck.fn(spark, sfDir).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(3) == 0L), "shipped corpus is clean")
    val li = Tables.load(spark, sfDir, "lineitem").count()
    val ord = Tables.load(spark, sfDir, "orders").count()
    assert(out(0).getLong(2) == li && out(1).getLong(2) == ord)
  }

  test("expectations: every rule class catches its planted violation") {
    import spark.implicits._
    // 3 lineitem rows: quantity 99 (range violation), orderkey 7777
    // (orphan), one clean row against order 1.
    val li = Seq(
      (1L, 99.0), (7777L, 5.0), (1L, 5.0))
      .toDF("l_orderkey", "l_quantity")
    // 4 orders: duplicate key 1 (uniqueness), price -3 (range), status
    // 'X' (domain).
    val ord = Seq(
      (1L, 10.0, "O"), (1L, 20.0, "F"), (2L, -3.0, "P"), (3L, 30.0, "X"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val out = GuardOps.expectations(li, ord).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1) == ((3L, 1L)), "quantity range")
    assert(out(2) == ((4L, 1L)), "price positive")
    assert(out(3) == ((4L, 1L)), "key uniqueness")
    assert(out(4) == ((3L, 1L)), "referential orphan")
    assert(out(5) == ((4L, 1L)), "status domain")
  }

  test("partial merge: monthly states cover all orders, months disjoint") {
    val out = GuardOps.aggPartialMerge.fn(spark, sfDir).collect()
    val total = Tables.load(spark, sfDir, "orders").count()
    assert(out.map(_.getLong(1)).sum == total, "every order in some month")
    assert(out.map(_.getDate(0).toString).distinct.length == out.length)
    out.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(4), "min <= max")
      assert(r.getDouble(2) >= r.getLong(1) * r.getDouble(3) - 1e-6,
        "sum >= n*min")
      assert(r.getDouble(2) <= r.getLong(1) * r.getDouble(4) + 1e-6,
        "sum <= n*max")
    }
  }
}
