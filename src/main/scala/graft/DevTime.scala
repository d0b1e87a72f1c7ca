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
    args.foreach {
      case "probe" => probe(spark, d)
      case q =>
        SparkEntry.queries(q)(spark, d).count() // warm
        val t0 = System.nanoTime
        SparkEntry.queries(q)(spark, d).count()
        println(f"[devtime] $q ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  // probe harness for dissecting a slow query stage by stage
  def probe(spark: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime
      val n = f
      println(f"[probe] $tag n=$n ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val base = graft.operators.Geo.geohashPts(spark, d)
    time("narrow-map") { base.count() }
    time("narrow-map+agg") {
      base.groupBy(col("geohash5")).agg(count(lit(1))).count()
    }
    val cells = base.groupBy(col("geohash5"))
      .agg(count(lit(1)).as("n_in_cell"))
    time("join-only") { base.join(cells, Seq("geohash5")).count() }
    time("join+project") {
      base.join(cells, Seq("geohash5"))
        .select(col("event_id"), col("geohash8"), col("n_in_cell")).count()
    }
    time("join+sort") {
      base.join(cells, Seq("geohash5"))
        .select(col("event_id"), col("geohash8"), col("n_in_cell"))
        .orderBy(col("event_id")).count()
    }
    time("full") { SparkEntry.queries("geo_geohash")(spark, d).count() }
  }
}
