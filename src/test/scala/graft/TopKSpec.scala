package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the native TopKAgg TypedImperativeAggregate. */
class TopKSpec extends SparkSpec {

  private def ev = Tables.load(spark, sfDir, "events")
    .select(col("event_type"), col("value"))

  test("topk_agg equals the window row_number spelling") {
    // topk_agg is session-registered via GraftExtensions (SparkSpec).
    val native = ev.groupBy("event_type")
      .agg(call_function("topk_agg", col("value"), lit(7)).as("topk"))
      .select(col("event_type"), array_join(
        transform(col("topk"), _.cast("decimal(12,2)").cast("string")), ",")
        .as("top"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val w = Window.partitionBy("event_type").orderBy(col("value").desc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .groupBy("event_type")
      .agg(array_join(transform(
        array_sort(collect_list(col("value")), (a, b) => when(a < b, 1)
          .when(a > b, -1).otherwise(0)),
        _.cast("decimal(12,2)").cast("string")), ",").as("top"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(native == windowed)
  }

  test("topk_agg is partition-layout independent and k-capped") {
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("event_type")
      .agg(call_function("topk_agg", col("value"), lit(5)).as("t"))
      .select(col("event_type"), col("t").cast("string"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(run(ev) == run(ev.repartition(13)))
    val sizes = ev.groupBy("event_type")
      .agg(size(call_function("topk_agg", col("value"), lit(5))).as("n"))
      .collect().map(_.getInt(1))
    assert(sizes.forall(_ == 5))
  }

  test("buffer merge law: merge(a,b) == top-k of the union") {
    val a = new functions.TopKBuf(3)
    val b = new functions.TopKBuf(3)
    Seq(1.0, 9.0, 4.0).foreach(a.add)
    Seq(7.0, 2.0, 8.0, 6.0).foreach(b.add)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val merged = functions.TopKAgg(Literal(1.0), Literal(3)).merge(a, b)
    assert(merged.sortedDesc.toSeq == Seq(9.0, 8.0, 7.0))
  }

  test("group smaller than k returns the whole sorted group") {
    val buf = new functions.TopKBuf(10)
    Seq(3.0, 1.0, 2.0).foreach(buf.add)
    assert(buf.sortedDesc.toSeq == Seq(3.0, 2.0, 1.0))
  }

  // --- topk_row_agg: the row-carrying sibling (round-17) ---

  private def ord = Tables.load(spark, sfDir, "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  test("topk_row_agg equals the window row_number spelling, rows and " +
      "rank order, with the (ord desc, id asc) tiebreak") {
    val native = ord.groupBy("o_custkey")
      .agg(call_function("topk_row_agg", col("o_totalprice"),
        col("o_orderkey"), lit(3)).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_custkey"), col("e.id"), col("e.ord"),
        (col("pos") + 1).as("rn"))
      .orderBy("o_custkey", "rn")
      .collect().map(_.toSeq).toSeq
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("rn").cast("int"))
      .orderBy("o_custkey", "rn")
      .collect().map(_.toSeq).toSeq
    assert(native == windowed)
  }

  test("topk_row_agg is partition-layout independent; declared " +
      "win_topn_agg equals win_rank_topn row-for-row") {
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("o_custkey")
      .agg(call_function("topk_row_agg", col("o_totalprice"),
        col("o_orderkey"), lit(5)).cast("string").as("t"))
      .orderBy("o_custkey").collect().map(_.toSeq).toSeq
    assert(run(ord) == run(ord.repartition(13)))
    val agg = graft.operators.Windows.rankTopNAgg.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val win = graft.operators.Windows.rankTopN.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(agg.nonEmpty && agg == win,
      "the aggregate spelling must reproduce the window spelling exactly")
  }

  test("topk_row buffer: merge law, null-skip, k-cap, serde roundtrip") {
    val a = new functions.TopKRowBuf(3)
    val b = new functions.TopKRowBuf(3)
    Seq((1.0, 10L), (9.0, 20L), (4.0, 30L)).foreach(t => a.add(t._1, t._2))
    Seq((9.0, 5L), (2.0, 40L), (8.0, 50L)).foreach(t => b.add(t._1, t._2))
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = functions.TopKRowAgg(Literal(1.0), Literal(1L), Literal(3))
    val merged = agg.merge(a, b)
    // Union top-3 under (ord desc, id asc): (9,5) before (9,20), then (8,50).
    assert(merged.ranked.map(e =>
        (java.lang.Double.longBitsToDouble(e(0)), e(1))).toSeq ==
      Seq((9.0, 5L), (9.0, 20L), (8.0, 50L)))
    val rt = agg.deserialize(agg.serialize(merged))
    assert(rt.ranked.map(_.toSeq).toSeq == merged.ranked.map(_.toSeq).toSeq)
  }
}
