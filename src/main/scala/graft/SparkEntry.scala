package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** BASELINE.md bench-suite aliases: the measured-baseline query keys that
    * name a SURVEY §2 operator differently. Both names are declared (the
    * driver's correctness gate sees all; Bench runs the 20 headline keys). */
  private def aliases: Seq[Q] = Seq(
    Joins.joinSemi.aliased("semi_join_exists"),
    Joins.joinAnti.aliased("anti_join"),
    Joins.joinAsof.aliased("asof_enrich"),
    Windows.rankTopN.aliased("window_rank_topn"),
    Windows.runningSum.aliased("window_running_sum"),
    Aggs.aggRollup.aliased("rollup_agg"),
    Aggs.aggCountDistinct.aliased("distinct_agg"),
    Aggs.aggApproxDistinct.aliased("approx_distinct"),
    Projections.intersectFused.aliased("set_ops"),
    Funcs.fnString.aliased("string_funcs"),
    Funcs.fnDate.aliased("date_funcs"),
    Funcs.fnJson.aliased("json_extract"),
    StreamingBatch.tumbling.aliased("events_sessionize_tumbling"),
    TextOps.tokenizeTfidf.aliased("text_tokenize_tf"),
    TextOps.dedupExact.aliased("exact_dedup"))

  /** Every declared operator, in SURVEY §2 order. */
  def allQs: Seq[Q] =
    Scans.all ++ Projections.all ++ Joins.all ++ Aggs.all ++ Windows.all ++
      Funcs.all ++ Relational.all ++ TextOps.all ++ VectorOps.all ++
      Udx.all ++ DocAssembly.all ++ StreamingBatch.all ++ AnnOps.all ++
      Analytics.all ++ SqlEntry.all ++ TextCluster.all ++ CorpusOps.all ++
      EventsOps.all ++ LayoutOps.all ++ TableOps.all ++ TxLogOps.all ++
      DsirOps.all ++ SketchOps.all ++
      DssOps.all ++ DssOps2.all ++ MiningOps.all ++ ClusterOps.all ++
      RelevanceOps.all ++ CurationOps.all ++ CurationOps2.all ++
      CurationOps3.all ++ RelevanceOps2.all ++ PipelineOps.all ++
      EventsOps2.all ++ GraphOps.all ++ TextOps2.all ++ IndexOps.all ++
      MlOps.all ++ EvalOps.all ++ EvalOps2.all ++ GeoOps.all ++ TokenizerOps.all ++ TsOps.all ++ ClickOps.all ++ GuardOps.all ++ RecOps.all ++ PrivacyOps.all ++ MonitorOps.all ++ DiversifyOps.all ++ RfmOps.all ++ InterpOps.all ++ AbOps.all ++ RecursiveOps.all ++ FunnelOps.all ++ IntervalOps.all ++ ExportOps.all ++ CboOps.all ++ RuntimeFilterOps.all ++ UrlOps.all ++ DppOps.all ++ aliases

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
