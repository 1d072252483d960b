package graft
import org.apache.spark.sql.SparkSession
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (r <- 1 to 2; n <- Seq("q_minhash_pairs", "q_minhash_keep", "q_join_left")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"r$r $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
