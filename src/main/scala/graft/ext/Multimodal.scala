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

  /** STUB feature extractor: fixed-dim pseudo-embedding from payload
    * bytes. The plumbing is the product: batch-iterated mapPartitions
    * (one "model handle" per partition, the Scala analog of a
    * mapInPandas batch UDF), `ArrayType(FloatType)` output schema
    * matching the embeddings table.
    */
  def featureExtract(withPayload: DataFrame, idCol: String,
      dim: Int = 16): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        // per-partition model load would happen here (??? real model)
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val h0 = bytes.foldLeft(0x9e3779b97f4a7c15L)((a, b) => (a ^ (b & 0xffL)) * 0x100000001b3L)
          val vec = Array.tabulate(dim) { i =>
            val h = h0 * (i * 2 + 1)
            (math.floorMod(h, 2000L) - 1000L).toFloat / 1000f
          }
          Row(r.getLong(0), vec.toSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** STUB resize: emits a new payload whose pseudo-dimensions are
    * clamped to (maxW, maxH), preserving the opaque-binary contract
    * (payload in → payload out + typed metadata). Per-row, narrow,
    * no driver involvement.
    */
  def resize(withPayload: DataFrame, idCol: String,
      maxW: Int, maxH: Int): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, _, _) = fakeDecode(bytes)
          val sw = math.min(w, maxW)
          val sh = math.min(h, maxH)
          // ??? real re-encode goes here; fake keeps a byte-bounded slice
          val out = bytes.take(math.max(1, math.min(bytes.length, sw * sh / 64)))
          Row(r.getLong(0), out, sw, sh)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** STUB frame sampler: one output row per sampled frame (every
    * `stride`-th of the decoded n_frames) — the distributed explode
    * shape of video processing: row count multiplies by frames/stride
    * with NO driver materialization, and downstream ops see
    * (id, frame_idx, frame_payload).
    */
  def frameSample(withPayload: DataFrame, idCol: String,
      stride: Int = 4): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_payload", BinaryType)))
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val (_, _, nFrames, _) = fakeDecode(bytes)
          (0 until nFrames by stride).iterator.map { f =>
            // ??? real frame decode; fake tags the payload with the index
            Row(r.getLong(0), f, bytes.take(math.min(bytes.length, 32)) :+ f.toByte)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
