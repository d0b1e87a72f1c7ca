package graft
import org.apache.spark.sql.SparkSession

// throwaway dev timing harness (not part of the library surface)
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      SparkEntry.queries(q)(spark, d).count() // warm
      val t0 = System.nanoTime
      SparkEntry.queries(q)(spark, d).count()
      println(f"[devtime] $q ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
