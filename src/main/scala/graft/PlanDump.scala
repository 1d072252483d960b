package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("q_minhash_pairs", "q_simhash_pairs", "q_embed_neardup", "q_union")) {
      val df = SparkEntry.queries(n)(spark, dir)
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
