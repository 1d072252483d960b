package graft
import org.apache.spark.sql.SparkSession
/** Dumps formatted physical plans of the most expensive bench queries for
  * the scale-review writeup (PLANS.md). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("q_minhash_keep", "q_knn_join", "q_agg_q1", "q_join_inner", "q_sessionize")) {
      println(s"##### $n")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
