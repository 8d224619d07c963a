package graft

import graft.operators.Similarity
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute q40's cost across training stages. */
object TrainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tprof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"), col("label"))
    time("warm scan")(e.count())
    val seeds = time("seeds")(Similarity.trainCentroids(e, 8, 0))
    val c1 = time("iter1")(Similarity.trainCentroids(e, 8, 1))
    val c3 = time("iter3 (total)")(Similarity.trainCentroids(e, 8, 3))
    time("assign full corpus")(
      e.select(Similarity.cellOf(spark, col("v"), c3).as("cell")).agg(sum(col("cell"))).collect())
    time("q40 full")(SparkEntry.queries("q40_ann_ivf")(spark, sfDir).count())
    spark.stop()
  }
}
