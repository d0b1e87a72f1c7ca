package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: clone an sf directory and append hub-geometry event
  * traffic — dense (10-min, 1°-cell) clusters whose per-cell event count
  * exceeds the proximity family's K=64 density cap. The driver's uniform
  * synthetic never trips the cap below ≈×4000 (BENCH_NOTES r11), but a
  * real feed is never uniform: ports, airfields, and sensor hubs
  * concentrate traffic exactly like this. The output dir is a drop-in sf
  * dir (all other tables copied), so Verify + devcheck.py run the
  * cross-engine oracle gate AT a geometry where the cap branch engages —
  * the geo_convoys ×100 precedent, for geo_proximity_capped/_overflow.
  *
  * Like ScaleUp, this is NOT correctness test data for the driver's gate;
  * it exists so BENCH_NOTES can cite a cross-engine hash-green run with a
  * nonzero capped-cell count.
  *
  * Hub construction (same residue trick as ProximityCapSpec): with
  * value = 0..v the evPts position formula pins a (user-residue,
  * event-residue) class inside one 1° cell; each hub h gets its own
  * lat/lon residue pair, one 10-min bucket, and a density ramp 66..256 so
  * several cells sit just above and far above the cap.
  *
  * Usage: runMain graft.HubGen <srcDir> <outDir> [nHubs]
  */
object HubGen {
  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val nHubs = if (args.length > 2) args(2).toInt else 48
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = spark.read.parquet(s"$src/events.parquet")
    val maxIds = ev.agg(max("event_id"), max("user_id")).head()
    val (e0, u0) = (maxIds.getLong(0) + 1, maxIds.getLong(1) + 1)

    // hub h: lat residue = (h*3) % 140, lon residue = (h*7 + 1) % 360,
    // density 66 + (h*190)/nHubs (66..256, all ABOVE the cap), bucket
    // tb = h % 12. town t: residues (3t+1, 7t+4), density 8 + t*52/nTowns
    // (8..60, all BELOW the cap) — so the capped query both EXCLUDES
    // cells and still EMITS pairs in the same run. ids are drawn above
    // the corpus max from each residue class (classes are disjoint:
    // 7(h-t) ≡ 3 (mod 360) has no small solution).
    def cellRows(latRes: Int, lonRes: Int, n: Int, tb: Long, tag: String) = {
      val us = Iterator.iterate(u0)(_ + 1)
        .filter(_ * 37 % 140 == latRes).take(n).toSeq
      val es = Iterator.iterate(e0)(_ + 1)
        .filter(_ * 73 % 360 == lonRes).take(n).toSeq
      us.zip(es).zipWithIndex.map { case ((u, e), i) =>
        // value spreads positions inside the cell: lat + v/1000 <= +0.4,
        // lon + v/2000 <= +0.2 — never crosses the 1° boundary
        (e, tb * 600 + 30 + (i % 9).toLong, u, tag, (i % 400).toDouble, "{}")
      }
    }
    val nTowns = nHubs * 5 / 6
    val hubRows = (0 until nHubs).flatMap { h =>
      cellRows(h * 3 % 140, (h * 7 + 1) % 360,
        66 + h * 190 / nHubs, (h % 12).toLong, "hub")
    } ++ (0 until nTowns).flatMap { t =>
      cellRows((t * 3 + 1) % 140, (t * 7 + 4) % 360,
        8 + t * 52 / nTowns, (t % 12).toLong, "town")
    }
    // ts stays TIMESTAMP_NTZ like the driver's own files — the proven
    // both-TZ cross-engine representation (naive micros, epoch() = UTC)
    val hubDf = hubRows
      .toDF("event_id", "ts_raw", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        timestamp_seconds(col("ts_raw")).cast("timestamp_ntz")).drop("ts_raw")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

    ev.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .unionByName(hubDf)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"[hubgen] events done: +${hubRows.size} hub rows over $nHubs hubs")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println("[hubgen] done")
    spark.stop()
  }
}
