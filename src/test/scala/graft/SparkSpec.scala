package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per JVM (Test/fork is
  * on, so suites share the forked JVM's session via getOrCreate). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  /** Smallest fixture dir: ~6k lineitem rows, 500 docs/embeddings. */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session alive for other suites in the same forked JVM
    super.afterAll()
  }
}
