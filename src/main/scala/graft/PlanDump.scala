package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Dev-only: dump the executed plan of one query (post-AQE when an action ran). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      // collect() runs the Dataset's OWN QueryExecution (count() would spawn
      // a fresh one), so AQE finalizes this plan in place
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $q =====")
      println(p)
      for (tok <- Seq("ReusedExchange", "Exchange", "FileScan", "WholeStageCodegen"))
        println(s"[count] $tok = " + tok.r.findAllIn(p).size)
    }
    spark.stop()
  }
}
