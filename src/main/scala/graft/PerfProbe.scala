package graft
import org.apache.spark.sql.SparkSession
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q_agg_q1", "q_agg_having", "q_minhash_pairs", "q_simhash_pairs",
      "q_embed_neardup", "q_ann_cosine", "q_ann_lsh", "q_window_topn", "q_datetime_agg", "q_join_2key")
    for (round <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"round$round $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
