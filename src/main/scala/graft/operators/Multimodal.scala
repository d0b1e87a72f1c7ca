package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.F multimodal-column plumbing. Image/audio/video payloads are opaque
  * `binary` columns with typed metadata — modeled here by treating the
  * document text bytes as the payload (no codec libs in this container;
  * the decode step is a clearly-marked deterministic stub, the Spark-side
  * schema/partitioning/batching is real).
  *
  * Mirrors odin_image / the GOES-R NetCDF payload handling
  * (odin_goesr/src/lib.rs:526 read_goesr_data): opaque blob in, typed
  * records out.
  */
object Multimodal {

  private def blobs(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text").cast(BinaryType).as("payload"))

  val defs: Seq[(String, Q)] = Seq(

    // ----- mm_blob_meta: typed metadata over binary payloads -------------
    "mm_blob_meta" -> Q(
      build = (s, d) =>
        blobs(s, d)
          .select(col("doc_id"), col("source"),
            octet_length(col("payload")).cast(LongType).as("n_bytes"),
            sha2(col("payload"), 256).as("sha256"),
            crc32(col("payload")).as("crc"))
          .orderBy(col("doc_id")),
      oracle = None),

    // ----- mm_frame_sample: deterministic frame/chunk sampling -----------
    // "Frames" are 32-byte windows every 64 bytes — the shape of sampling
    // video keyframes / audio windows from a packed payload.
    "mm_frame_sample" -> Q(
      build = (s, d) =>
        blobs(s, d)
          .filter(octet_length(col("payload")) >= 32)
          .select(col("doc_id"),
            posexplode(expr("transform(sequence(0, octet_length(payload) - 32, 64), " +
              "off -> xxhash64(substring(payload, off + 1, 32)))"))
              .as(Seq("frame_idx", "frame_hash")))
          .orderBy(col("doc_id"), col("frame_idx")),
      oracle = None),

    // ----- mm_tile: model-input mosaic tiling plan -----------------------
    // odin_onnx/src/lib.rs:97 fit_mosaic: cover an image with overlapping
    // model-sized tiles. Synthetic dims derive from payload length; the
    // tiling geometry (offsets, counts) is real arithmetic the cluster
    // would ship to the decode stage.
    "mm_tile" -> Q(
      build = (s, d) => {
        val tile = 224
        val overlap = 32 // px overlapped between adjacent tiles
        val step = tile - overlap
        val dims = blobs(s, d)
          .withColumn("img_w", (octet_length(col("payload")) % 1024 + 256).cast(LongType))
          .withColumn("img_h", (octet_length(col("payload")) % 768 + 256).cast(LongType))
        dims
          .withColumn("nx", ceil((col("img_w") - tile).cast(DoubleType) / step).cast(LongType) + 1)
          .withColumn("ny", ceil((col("img_h") - tile).cast(DoubleType) / step).cast(LongType) + 1)
          .select(col("doc_id"), col("img_w"), col("img_h"), col("nx"), col("ny"),
            posexplode(expr(
              s"""flatten(transform(sequence(0, nx - 1), ix ->
                    transform(sequence(0, ny - 1), iy ->
                      struct(least(ix * $step, img_w - $tile) AS x,
                             least(iy * $step, img_h - $tile) AS y))))"""))
              .as(Seq("tile_idx", "tl")))
          .select(col("doc_id"), col("img_w"), col("img_h"),
            col("tile_idx"), col("tl.x").as("tile_x"), col("tl.y").as("tile_y"))
          .orderBy(col("doc_id"), col("tile_idx"))
      },
      oracle = None),

    // ----- mm_feature_stub: batched feature extraction plumbing ----------
    // mapPartitions keeps the batch shape an ML codec would need; the
    // "decode" is a STUB (deterministic byte statistics standing in for a
    // real image/audio decoder, which this container does not ship).
    "mm_feature_stub" -> Q(
      build = (s, d) => {
        val spark = s
        import spark.implicits._
        val src = blobs(s, d).select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
        src.mapPartitions { it =>
          it.map { case (id, bytes) =>
            // STUB codec: replace with real decode when codec libs exist.
            val feat = Array.tabulate(8) { k =>
              var acc = 0L
              var i = k
              while (i < bytes.length) { acc += (bytes(i) & 0xFF); i += 8 }
              acc.toDouble / math.max(1, bytes.length / 8)
            }
            (id, bytes.length, feat)
          }
        }.toDF("doc_id", "n_bytes", "features")
          // Project the feature vector to scalar per-dim columns: the
          // driver's comparator (and any columnar sink) wants flat
          // doubles, and 8 fixed dims are schema-stable.
          .select(col("doc_id") +: col("n_bytes") +:
            (0 until 8).map(k => round(col("features")(k), 6).as(s"f$k")): _*)
          .orderBy(col("doc_id"))
      },
      oracle = None),

    // ----- mm_batch_infer: fixed-batch model-inference plumbing ----------
    // odin_onnx runs the model on FIXED-SIZE batches; mapPartitions with
    // `grouped(32)` reproduces that shape: per executor partition, payloads
    // are buffered to batch tensors, "inferred" together, and re-flattened
    // with their ids. The model call is a STUB (payload hash -> 4-dim
    // logits); the batching, id bookkeeping, and tail-batch handling are
    // the real plumbing an ONNX session needs at scale.
    "mm_batch_infer" -> Q(
      build = (s, d) => {
        val spark = s
        import spark.implicits._
        val batchSize = 32
        blobs(s, d).select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.grouped(batchSize).flatMap { batch =>
              // STUB model: one "session run" per batch of <= 32 payloads
              val logits = batch.map { case (_, bytes) =>
                var h = 1125899906842597L
                var i = 0
                while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xFF); i += 1 }
                Array.tabulate(4)(k => ((h >>> (k * 16)) & 0xFFFF).toDouble / 65535.0)
              }
              batch.zip(logits).zipWithIndex.map { case (((id, bytes), lg), i) =>
                (id, batch.size, i, lg, lg.indexOf(lg.max))
              }
            }
          }
          .toDF("doc_id", "batch_n", "batch_pos", "logits", "pred_class")
          // Flatten the 4-dim logits to scalar columns for the comparator.
          .select(col("doc_id") +: col("batch_n") +: col("batch_pos") +:
            (0 until 4).map(k => round(col("logits")(k), 6).as(s"logit$k")) :+
            col("pred_class"): _*)
          .orderBy(col("doc_id"))
      },
      oracle = None)
  )
}
