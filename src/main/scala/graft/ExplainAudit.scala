package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config(graft.sources.Tables.nanosConf._1, graft.sources.Tables.nanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q109_kmeans_refine", "q110_time_decay", "q111_stratum_topn",
        "q112_equidepth_hist", "q113_cohort_retention", "q114_triangle_census",
        "q115_zipf_slope", "q116_phrase_search", "q117_gap_percentiles",
        "q118_weighted_sample", "q119_rolling_active", "q120_column_profile",
        "q121_ivm_merge", "q122_winsorized_mean", "q123_weekday_profile",
        "q125_cross_source_dups", "q126_heaps_fit", "q127_cheapest_supplier",
        "q128_heavy_hitters", "q129_lead_time", "q130_pareto_share",
        "q131_bootstrap_ci", "q132_mad", "q133_funnel_deadline",
        "q134_embedding_drift", "q135_user_growth")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val cart = p.linesIterator.count(l => l.contains("CartesianProduct"))
      val bnlj = p.linesIterator.count(l => l.contains("BroadcastNestedLoopJoin"))
      val exch = p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
      val scans = p.linesIterator.count(l => l.contains("FileScan"))
      val pushed = p.linesIterator.count(l => l.contains("PushedFilters: ["))
      println(f"[audit] $q%-24s exchanges=$exch%2d scans=$scans%2d cartesian=$cart bnlj=$bnlj")
    }
    spark.stop()
  }
}
