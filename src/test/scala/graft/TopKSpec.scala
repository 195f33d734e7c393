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
}
