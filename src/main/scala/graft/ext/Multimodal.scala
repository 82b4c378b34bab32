package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.8): opaque binary payloads
  * with typed metadata, partition-parallel decode.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): [[fakeDecode]] derives deterministic pseudo-metadata from
  * the bytes. Everything Spark-side — schema, binary column handling,
  * batch shape of the partition-parallel decode — is real and tested; a
  * production build swaps `fakeDecode` for a JNI/library call.
  */
object Multimodal {

  /** Attach a binary payload + byte length + content hash to each doc. */
  def withBinary(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      octet_length(col(textCol).cast("binary")).as("n_bytes"),
      sha2(col(textCol).cast("binary"), 256).as("sha256"))

  final case class DecodedMeta(id: Long, width: Int, height: Int, nFrames: Int, format: String)

  /** STUB decode: pretends the payload is media and emits deterministic
    * pseudo-dimensions from its bytes. Runs via mapPartitions so the
    * "decoder" is instantiated once per partition (the real pattern for
    * a native decoder handle), never per row.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    // ??? real decoder goes here; deterministic fake below
    val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val frames = 1 + math.floorMod(h >> 20, 32).toInt
    val fmt = Seq("png", "jpeg", "webp")(math.floorMod(h >> 25, 3).toInt)
    (w, ht, frames, fmt)
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType)))

  /** Partition-parallel decode of (id, payload) rows. */
  def decode(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        // per-partition decoder init would happen here
        it.map { r =>
          val (w, h, f, fmt) = fakeDecode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), w, h, f, fmt)
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
