package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.8): opaque binary payloads
  * with typed metadata, partition-parallel decode.
  *
  * PNG, JPEG, GIF, and BMP payloads are decoded FOR REAL via the JDK's
  * `javax.imageio` (no external dependency): [[realDecode]] sniffs the
  * magic bytes and reads true pixel dimensions; WAV/PCM audio decodes
  * for real via `javax.sound.sampled` ([[audioDecode]]); [[resize]] renders an
  * aspect-preserving scaled raster and re-encodes it. Payloads in any
  * other format fall back to [[fakeDecode]], which derives deterministic
  * pseudo-metadata from the bytes — COMPRESSED video/audio codecs aren't
  * in this container, so that half stays an honestly-marked stub. Everything
  * Spark-side — schema, binary column handling, batch shape of the
  * partition-parallel decode — is real and tested either way.
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

  /** STUB decode for formats ImageIO can't read (video/audio/webp):
    * emits deterministic pseudo-dimensions from the bytes. Runs via
    * mapPartitions so the "decoder" is instantiated once per partition
    * (the real pattern for a native decoder handle), never per row.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    // ??? real inter-frame video codec (h264/vp9) goes here — MJPEG-AVI
    // demuxes for real via aviFrames; deterministic fake below
    val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val frames = 1 + math.floorMod(h >> 20, 32).toInt
    val fmt = Seq("png", "jpeg", "webp")(math.floorMod(h >> 25, 3).toInt)
    (w, ht, frames, fmt)
  }

  /** Magic-byte format sniff: the dispatch gate between the real
    * imageio path and the fake fallback. Deliberately header-based (not
    * extension-based) — payloads are opaque binaries.
    */
  def sniffFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) Some("jpeg")
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') Some("gif")
    else if (bytes.length >= 14 && bytes(0) == 'B' && bytes(1) == 'M' &&
      // beyond the 2-byte magic, require the full 14-byte BMP file
      // header with its two reserved words zero (mandated by the spec)
      // — arbitrary "BM"-prefixed payloads no longer sniff as bmp
      (bytes(6) | bytes(7) | bytes(8) | bytes(9)) == 0)
      Some("bmp")
    else None

  /** REAL decode for PNG/JPEG via the JDK's ImageIO: true pixel
    * dimensions, single frame. None for unrecognized or corrupt
    * payloads (callers fall back to [[fakeDecode]]).
    */
  def realDecode(bytes: Array[Byte]): Option[(Int, Int, Int, String)] =
    sniffFormat(bytes).flatMap { fmt =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None else Some((img.getWidth, img.getHeight, 1, fmt))
      } catch { case _: Exception => None }
    }

  /** Real decode when the payload is a recognized image, fake otherwise. */
  def decodeMeta(bytes: Array[Byte]): (Int, Int, Int, String) =
    realDecode(bytes).getOrElse(fakeDecode(bytes))

  /** Deterministic synthetic PNG: a real, ImageIO-decodable payload
    * whose dimensions are a pure function of `seed` — the fixture
    * generator that lets an external oracle adjudicate the REAL decode
    * path (predict dims from the seed, compare against what ImageIO
    * read back out of the actual PNG bytes).
    */
  def syntheticPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17 + seed).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic image in any ImageIO-writable format
    * (gif/bmp/png): same pixel formula as [[syntheticPng]], different
    * container. GIF write quantizes to a palette, which may change
    * pixel VALUES — dimensions (what the decode path reports) are
    * preserved exactly by every container.
    */
  def syntheticImage(w: Int, h: Int, seed: Long, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17 + seed).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Attach REAL synthetic GIF (even ids) / BMP (odd ids) payloads,
    * dimensions id-derived (w = 8 + id mod 24, h = 8 + 5·id mod 24) —
    * the fixture for adjudicating the legacy-container decode paths.
    */
  def withSyntheticMixed(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 8 + math.floorMod(id, 24L).toInt
        val h = 8 + math.floorMod(id * 5, 24L).toInt
        val fmt = if (id % 2 == 0) "gif" else "bmp"
        Row(id, syntheticImage(w, h, id, fmt))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Attach a REAL synthetic PNG payload per row, dimensions derived
    * from the id (w = 16 + id mod 48, h = 16 + 7·id mod 48) so an
    * oracle can predict them. Runs in mapPartitions — the encoder
    * allocation pattern matches a production per-partition codec.
    */
  def withSyntheticPng(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + math.floorMod(id, 48L).toInt
        val h = 16 + math.floorMod(id * 7, 48L).toInt
        Row(id, syntheticPng(w, h, id))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType)))

  /** Partition-parallel decode of (id, payload) rows: real ImageIO for
    * PNG/JPEG, deterministic fake for everything else.
    */
  def decode(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        // per-partition decoder init would happen here
        it.map { r =>
          val (w, h, f, fmt) = decodeMeta(r.getAs[Array[Byte]](1))
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

  /** Aspect-preserving scale-to-fit in pure INTEGER arithmetic, so an
    * external oracle can replay the target dimensions exactly: if the
    * image already fits, unchanged; otherwise the limiting side pins to
    * its max and the other scales by the same integer-truncated ratio.
    */
  def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH <= h.toLong * maxW)
      (math.max(1, (w.toLong * maxH / h).toInt), maxH)
    else (maxW, math.max(1, (h.toLong * maxW / w).toInt))

  /** Resize to fit (maxW, maxH), preserving the opaque-binary contract
    * (payload in → payload out + typed metadata). PNG/JPEG payloads are
    * REALLY rescaled — decoded, redrawn at [[fitDims]], re-encoded as
    * PNG — so re-decoding the output payload yields the new dimensions.
    * Unrecognized payloads keep the deterministic fake (clamped
    * pseudo-dims, byte-bounded slice). Per-row, narrow, no driver
    * involvement.
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
          realDecode(bytes) match {
            case Some((w, h, _, _)) =>
              val (nw, nh) = fitDims(w, h, maxW, maxH)
              if (nw == w && nh == h) Row(r.getLong(0), bytes, w, h)
              else {
                val src = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
                val dst = new java.awt.image.BufferedImage(
                  nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                try g.drawImage(src, 0, 0, nw, nh, null)
                finally g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(dst, "png", bos)
                Row(r.getLong(0), bos.toByteArray, nw, nh)
              }
            case None =>
              val (w, h, _, _) = fakeDecode(bytes)
              val sw = math.min(w, maxW)
              val sh = math.min(h, maxH)
              // fake path keeps a byte-bounded slice as the "payload"
              val out = bytes.take(
                math.max(1, math.min(bytes.length, sw * sh / 64)))
              Row(r.getLong(0), out, sw, sh)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Magic-byte sniff for RIFF/AVI payloads (the video analog of
    * [[sniffFormat]]).
    */
  def sniffAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  /** Deterministic synthetic MJPEG-in-AVI: a REAL RIFF/AVI container
    * (hdrl LIST with a 56-byte avih main header carrying the frame
    * count, movi LIST with one '00dc' chunk per JPEG-compressed frame).
    * Frame f renders at `w = 16 + (seed + 11f) mod 32`,
    * `h = 16 + (7·seed + 5f) mod 32` — JPEG is lossy so pixel VALUES
    * aren't oracle-predictable, but the container walk, frame count,
    * and per-frame decoded dimensions are.
    */
  def syntheticAvi(nFrames: Int, seed: Long): Array[Byte] = {
    val frames = Array.tabulate(nFrames) { f =>
      val w = 16 + math.floorMod(seed + 11L * f, 32L).toInt
      val h = 16 + math.floorMod(7L * seed + 5L * f, 32L).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (x * 31 + y * 17 + seed + f).toInt & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    buildAvi(frames, "00dc")
  }

  /** RIFF/AVI container writer shared by the synthetic builders:
    * hdrl LIST with the 56-byte avih main header (frame count), movi
    * LIST with one `chunkId` chunk per frame payload, even-byte
    * padding per the RIFF spec.
    */
  private def buildAvi(frames: Array[Array[Byte]],
      chunkId: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val hdrlSize = 4 + 8 + 56 // 'hdrl' + avih chunk header + payload
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    fourcc("RIFF"); le32(4 + 8 + hdrlSize + 8 + moviSize); fourcc("AVI ")
    fourcc("LIST"); le32(hdrlSize); fourcc("hdrl")
    fourcc("avih"); le32(56)
    le32(40000); le32(0); le32(0); le32(0) // µs/frame, maxBps, pad, flags
    le32(frames.length)                    // dwTotalFrames
    le32(0); le32(1); le32(0)              // initialFrames, streams, bufSize
    le32(0); le32(0)                       // width, height (per-frame here)
    le32(0); le32(0); le32(0); le32(0)     // reserved
    fourcc("LIST"); le32(moviSize); fourcc("movi")
    frames.foreach { f =>
      fourcc(chunkId); le32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // RIFF chunks pad to even
    }
    out.toByteArray
  }

  /** Keyed LOSSLESS synthetic AVI: '00db' chunks carrying BMP frames
    * whose pixels are a pure function of `key = (vid + f) mod mod` —
    * the same key recurring across videos renders the IDENTICAL frame,
    * the fixture for cross-video duplicate-frame detection. BMP is
    * lossless, so unlike the MJPEG builder an external oracle predicts
    * every decoded pixel (and therefore every dHash bit).
    */
  def syntheticAviBmpKeyed(nFrames: Int, vid: Long, mod: Int): Array[Byte] = {
    val frames = Array.tabulate(nFrames) { f =>
      val key = math.floorMod(vid + f, mod.toLong)
      val w = 8 + (key % 24).toInt
      val h = 8 + (key * 5 % 24).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (x * 31 + y * 17 + key).toInt & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    buildAvi(frames, "00db")
  }

  /** Per-row keyed BMP-in-AVI payloads (`nFrames = 2 + id mod 6`,
    * frame keys `(id + f) mod mod`) — see [[syntheticAviBmpKeyed]].
    */
  def withSyntheticAviKeyed(docs: DataFrame, idCol: String,
      mod: Int): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticAviBmpKeyed(2 + math.floorMod(id, 6L).toInt, id, mod))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** RIFF walk over an AVI payload: collects the '00dc'/'00db' video
    * chunks inside the 'movi' LIST, in container order. Plain-JDK
    * byte-level parsing — the real demux step of MJPEG processing.
    * Empty for malformed containers (callers fall back to the stub).
    */
  def aviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def cc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    try {
      if (!sniffAvi(bytes)) return Seq.empty
      var pos = 12
      while (pos + 8 <= bytes.length) {
        val id = cc(pos)
        val size = le32(pos + 4)
        if (size < 0 || pos + 8 + size > bytes.length) return frames.toSeq
        if (id == "LIST" && size >= 4 && cc(pos + 8) == "movi") {
          var p = pos + 12
          val end = pos + 8 + size
          while (p + 8 <= end) {
            val cid = cc(p)
            val csize = le32(p + 4)
            if (csize < 0 || p + 8 + csize > end) return frames.toSeq
            if (cid == "00dc" || cid == "00db")
              frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + csize)
            p += 8 + csize + (csize & 1)
          }
        }
        pos += 8 + size + (size & 1)
      }
      frames.toSeq
    } catch { case _: Exception => frames.toSeq }
  }

  /** Frame sampler: one output row per sampled frame (every `stride`-th
    * frame) — the distributed explode shape of video processing: row
    * count multiplies by frames/stride with NO driver materialization,
    * and downstream ops see (id, frame_idx, frame_payload).
    *
    * MJPEG-in-AVI payloads demux for REAL ([[aviFrames]] RIFF walk;
    * each sampled frame_payload is the actual embedded JPEG, decodable
    * downstream by [[decodeFrames]]/[[decode]]). Other containers keep
    * the deterministic stub (compressed inter-frame codecs aren't in
    * this container).
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
          val real = aviFrames(bytes)
          if (real.nonEmpty)
            real.indices.by(stride).iterator.map(f =>
              Row(r.getLong(0), f, real(f)))
          else {
            val (_, _, nFrames, _) = fakeDecode(bytes)
            (0 until nFrames by stride).iterator.map { f =>
              // ??? real inter-frame codec; fake tags the payload with the index
              Row(r.getLong(0), f, bytes.take(math.min(bytes.length, 32)) :+ f.toByte)
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Decode sampled frames: (id, frame_idx, width, height, format) via
    * the real ImageIO path ([[decodeMeta]]) — the per-frame half of the
    * video pipeline, same partition-parallel shape as [[decode]].
    */
  def decodeFrames(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType)))
    val rdd = frames.select(col("id").cast("long"), col("frame_idx"),
      col("frame_payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, _, fmt) = decodeMeta(r.getAs[Array[Byte]](2))
          Row(r.getLong(0), r.getInt(1), w, h, fmt)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-row synthetic MJPEG-AVI payloads, frame count id-derived
    * (`2 + id mod 6`) — the fixture for adjudicating the real demux +
    * per-frame decode path.
    */
  def withSyntheticAvi(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticAvi(2 + math.floorMod(id, 6L).toInt, id))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Difference hash (dHash) of a REAL decoded image: 9×8 grid sampled
    * at `(x·w/9, y·h/8)` (integer division), ITU-R 601 integer
    * grayscale `(299r + 587g + 114b)/1000`, one bit per horizontally
    * adjacent comparison — 64 bits as 16 hex chars (row-major, MSB =
    * leftmost comparison). Every step is integer arithmetic on exact
    * decoded pixels, so an oracle that knows the image's pixel formula
    * can replay the hash bit for bit. None for non-image payloads.
    */
  def dHash(bytes: Array[Byte]): Option[String] =
    sniffFormat(bytes).flatMap { _ =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          def gray(gx: Int, gy: Int): Int = {
            val rgb = img.getRGB(gx * w / 9, gy * h / 8) & 0xffffff
            (299 * ((rgb >> 16) & 255) + 587 * ((rgb >> 8) & 255) +
              114 * (rgb & 255)) / 1000
          }
          val sb = new StringBuilder(16)
          var y = 0
          while (y < 8) {
            var byte = 0
            var x = 0
            while (x < 8) {
              if (gray(x, y) > gray(x + 1, y)) byte |= 1 << (7 - x)
              x += 1
            }
            sb.append(f"$byte%02x")
            y += 1
          }
          Some(sb.toString)
        }
      } catch { case _: Exception => None }
    }

  /** Keyed synthetic-PNG fixture for perceptual dedup: ids sharing
    * `id mod mod` render the SAME image (dims and pixels derive from
    * the key), and odd generations (`(id/mod) mod 2 = 1`) additionally
    * brighten the single sampled pixel `(4·w/9, 3·h/8)` by +48/channel
    * — perturbing at most the two dHash bits that compare against that
    * sample. Exact duplicates land at Hamming 0, perturbed twins at
    * ≤ 2, so a Hamming-≤3 matcher must find both — and every pixel is
    * still a pure function of (id, mod), so the oracle replays the
    * whole thing.
    */
  def withSyntheticPngKeyed(docs: DataFrame, idCol: String,
      mod: Int): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val key = math.floorMod(id, mod.toLong)
        val w = 16 + (key % 48).toInt
        val h = 16 + (key * 7 % 48).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (x * 31 + y * 17 + key).toInt & 0xffffff)
            x += 1
          }
          y += 1
        }
        if ((id / mod) % 2 == 1) {
          val px = 4 * w / 9
          val py = 3 * h / 8
          img.setRGB(px, py,
            ((img.getRGB(px, py) & 0xffffff) + 0x303030) & 0xffffff)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Magic-byte sniff for RIFF/WAVE payloads (the audio analog of
    * [[sniffFormat]]).
    */
  def sniffWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Deterministic synthetic 16-bit PCM WAV: `frames` frames of
    * `channels` interleaved samples, where flat sample index j holds
    * `((seed·7919 + j·104729) mod 65536) − 32768` — pure BIGINT
    * arithmetic an external oracle replays with a range() unnest. The
    * payload is a REAL RIFF/WAVE file `javax.sound.sampled` decodes.
    */
  def syntheticWav(sampleRate: Int, channels: Int, frames: Int,
      seed: Long): Array[Byte] = {
    val dataSize = frames * channels * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); le32(36 + dataSize)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16)
    le16(1) // PCM
    le16(channels)
    le32(sampleRate)
    le32(sampleRate * channels * 2) // byte rate
    le16(channels * 2)              // block align
    le16(16)                        // bits per sample
    out.write("data".getBytes); le32(dataSize)
    var j = 0
    val n = frames * channels
    while (j < n) {
      le16((((seed * 7919L + j * 104729L) % 65536L).toInt - 32768) & 0xffff)
      j += 1
    }
    out.toByteArray
  }

  /** Per-row synthetic WAV payloads with id-derived parameters —
    * `rate = 8000 + 1000·(id mod 8)`, `channels = 1 + id mod 2`,
    * `frames = 200 + 13·id mod 800` — so an oracle can predict every
    * decoded field AND every PCM statistic from the id alone.
    */
  def withSyntheticWav(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val rate = 8000 + math.floorMod(id, 8L).toInt * 1000
        val ch = 1 + math.floorMod(id, 2L).toInt
        val frames = 200 + math.floorMod(id * 13, 800L).toInt
        Row(id, syntheticWav(rate, ch, frames, id))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("s_min", LongType),
    StructField("s_max", LongType),
    StructField("s_sumabs", LongType),
    StructField("source", StringType)))

  /** Deterministic synthetic µ-law WAV (fmt code 7, 8-bit log-companded
    * — a REAL compressed-audio codec the JDK ships a decoder for):
    * µ-law byte j is `(seed·7919 + j·104729) mod 256`, so the oracle
    * derives every decoded 16-bit sample through the closed-form G.711
    * expansion ([[ulawToPcm16]]) and adjudicates the decode stats
    * exactly.
    */
  def syntheticUlawWav(sampleRate: Int, channels: Int, frames: Int,
      seed: Long): Array[Byte] = {
    val dataSize = frames * channels
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); le32(36 + dataSize)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16)
    le16(7) // µ-law
    le16(channels)
    le32(sampleRate)
    le32(sampleRate * channels) // byte rate: 1 byte/sample
    le16(channels)              // block align
    le16(8)                     // bits per µ-law code
    out.write("data".getBytes); le32(dataSize)
    var j = 0
    while (j < dataSize) {
      out.write((math.floorMod(seed * 7919L + j * 104729L, 256L)).toInt)
      j += 1
    }
    out.toByteArray
  }

  /** Closed-form G.711 µ-law expansion, verified byte-for-byte against
    * the JDK's ULAW codec (all 256 codes): complement, split into
    * 3-bit exponent + 4-bit mantissa, expand `((2m+33)·2^e − 33)·4`,
    * apply the sign. Pure integer arithmetic — the SQL oracle replays
    * it with div/mod.
    */
  def ulawToPcm16(b: Int): Int = {
    val u = 255 - (b & 0xff)
    val mag = (((2 * (u % 16) + 33) << ((u / 16) % 8)) - 33) * 4
    if (u >= 128) -mag else mag
  }

  /** Closed-form G.711 A-law expansion, verified byte-for-byte against
    * the JDK's ALAW codec (all 256 codes): XOR 0x55, 3-bit exponent +
    * 4-bit mantissa, `(2m+1)·8` in the linear segment (e = 0) else
    * `(2m+33)·2^e·4`, sign POSITIVE when bit 7 survives the XOR (the
    * opposite convention from µ-law's complemented sign).
    */
  def alawToPcm16(b: Int): Int = {
    val u = (b & 0xff) ^ 0x55
    val e = (u / 16) % 8
    val m = u % 16
    val mag = if (e == 0) (2 * m + 1) * 8 else ((2 * m + 33) << e) * 4
    if (u >= 128) mag else -mag
  }

  /** Deterministic synthetic A-law WAV (fmt code 6) — same byte-stream
    * formula as [[syntheticUlawWav]], A-law companding instead.
    */
  def syntheticAlawWav(sampleRate: Int, channels: Int, frames: Int,
      seed: Long): Array[Byte] = {
    val bytes = syntheticUlawWav(sampleRate, channels, frames, seed)
    bytes(20) = 6 // fmt tag µ-law(7) → A-law(6); all else identical
    bytes
  }

  /** REAL WAV decode via the JDK's `javax.sound.sampled` (the
    * ImageIO move for audio — zero new dependencies): true sample rate,
    * channel count, bit depth, frame count, integer-division duration,
    * and exact integer PCM stats (min/max/Σ|s| over all interleaved
    * samples). µ-law/A-law payloads (fmt codes 7/6 — genuinely
    * compressed audio) are transcoded to PCM16 through the JDK's G.711
    * codec before the stats pass, so the same numbers come out of a
    * REAL decompression step. None for non-WAV or corrupt payloads.
    */
  def realAudioDecode(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long, Long, Long, Long, String)] =
    if (!sniffWav(bytes)) None
    else try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val enc = raw.getFormat.getEncoding.toString.toLowerCase
        val compressed = enc == "ulaw" || enc == "alaw"
        val in =
          if (!compressed) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              raw.getFormat.getSampleRate, 16, raw.getFormat.getChannels,
              raw.getFormat.getChannels * 2, raw.getFormat.getSampleRate,
              false), raw)
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val rate = fmt.getSampleRate.toInt
          val ch = fmt.getChannels
          val buf = new Array[Byte](4096)
          var sMin = Long.MaxValue
          var sMax = Long.MinValue
          var sumAbs = 0L
          var nBytes = 0L
          var read = in.read(buf)
          var carry = -1 // low byte waiting for its pair across reads
          while (read > 0) {
            var i = 0
            if (carry >= 0 && read > 0) {
              val s = ((buf(0) << 8) | carry).toShort.toLong
              if (s < sMin) sMin = s
              if (s > sMax) sMax = s
              sumAbs += math.abs(s)
              carry = -1
              i = 1
            }
            while (i + 1 < read) {
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toLong
              if (s < sMin) sMin = s
              if (s > sMax) sMax = s
              sumAbs += math.abs(s)
              i += 2
            }
            if (i < read) carry = buf(i) & 0xff
            nBytes += read
            read = in.read(buf)
          }
          val frames = nBytes / (2L * ch)
          Some((rate, ch, 16, frames, frames * 1000L / rate,
            sMin, sMax, sumAbs, if (compressed) enc else "wav"))
        }
      } finally raw.close() // closes the transcoding wrapper's source too
    } catch { case _: Exception => None }

  /** REAL audio feature extraction over the decoded PCM stream:
    * sample count, exact Σs² (for RMS energy), and zero crossings of
    * CHANNEL 0 (consecutive channel-0 samples with strictly opposite
    * signs — the cheap pitch/noisiness proxy); same JDK decode walk as
    * [[realAudioDecode]], including the G.711 transcode. Integer
    * accumulators stay exact (|s| ≤ 2^15, Σs² < 2^63 up to ~8e12
    * samples); None for payloads the JDK can't decode.
    */
  def realAudioFeatures(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    if (!sniffWav(bytes)) None
    else try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val enc = raw.getFormat.getEncoding.toString.toLowerCase
        val compressed = enc == "ulaw" || enc == "alaw"
        val in =
          if (!compressed) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              raw.getFormat.getSampleRate, 16, raw.getFormat.getChannels,
              raw.getFormat.getChannels * 2, raw.getFormat.getSampleRate,
              false), raw)
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val ch = fmt.getChannels
          val buf = new Array[Byte](4096)
          var n = 0L; var sumSq = 0L; var zc = 0L
          var prev0 = 0L; var havePrev0 = false
          var carry = -1
          def push(s: Long): Unit = {
            sumSq += s * s
            if (n % ch == 0) { // channel-0 sample
              if (havePrev0 &&
                ((prev0 > 0 && s < 0) || (prev0 < 0 && s > 0))) zc += 1
              prev0 = s; havePrev0 = true
            }
            n += 1
          }
          var read = in.read(buf)
          while (read > 0) {
            var i = 0
            if (carry >= 0 && read > 0) {
              push(((buf(0) << 8) | carry).toShort.toLong)
              carry = -1; i = 1
            }
            while (i + 1 < read) {
              push(((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toLong)
              i += 2
            }
            if (i < read) carry = buf(i) & 0xff
            read = in.read(buf)
          }
          Some((n, sumSq, zc))
        }
      } finally raw.close()
    } catch { case _: Exception => None }

  /** Partition-parallel audio FEATURES of (id, payload) rows —
    * [[realAudioFeatures]] over each payload, with RMS assembled as
    * one double sqrt of the exact integer sums. Undecodable payloads
    * produce no row (the features face has no honest fake: a made-up
    * Σs² would poison any downstream energy filter).
    */
  def audioFeatures(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_samples", LongType),
      StructField("sum_sq", LongType),
      StructField("zero_crossings", LongType)))
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload"))
      .rdd.flatMap { r =>
        realAudioFeatures(r.getAs[Array[Byte]](1)).map {
          case (n, sq, zc) => Row(r.getLong(0), n, sq, zc)
        }
      }
    spark.createDataFrame(rdd, schema)
      .withColumn("rms",
        sqrt(col("sum_sq").cast("double") / col("n_samples").cast("double")))
  }

  /** Deterministic fake audio metadata for payloads the JDK can't
    * decode. PCM and G.711 µ-law/A-law WAVs decode for REAL above;
    * perceptual codecs (mp3/aac/opus) aren't in this container —
    * honestly stubbed, like [[fakeDecode]] for non-image payloads.
    */
  def fakeAudioDecode(bytes: Array[Byte]): (Int, Int, Int, Long, Long, Long, Long, Long) = {
    // ??? real perceptual-codec decode goes here; deterministic fake below
    val h = bytes.foldLeft(23L)((acc, b) => acc * 31 + (b & 0xff))
    val rate = 8000 + math.floorMod(h, 8L).toInt * 1000
    val ch = 1 + math.floorMod(h >> 3, 2L).toInt
    val frames = 200 + math.floorMod(h >> 4, 800L)
    (rate, ch, 16, frames, frames * 1000L / rate, -32768L, 32767L,
      frames * ch * 16384L)
  }

  /** Partition-parallel audio decode of (id, payload) rows: real
    * `javax.sound.sampled` for WAV (PCM16 pass-through, µ-law/A-law
    * through the JDK's G.711 decompressor), deterministic fake
    * otherwise — the audio face of [[decode]].
    */
  def audioDecode(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        // per-partition decoder init would happen here
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          realAudioDecode(bytes) match {
            case Some((rate, ch, bits, fr, dur, mn, mx, sa, src)) =>
              Row(r.getLong(0), rate, ch, bits, fr, dur, mn, mx, sa, src)
            case None =>
              val (rate, ch, bits, fr, dur, mn, mx, sa) = fakeAudioDecode(bytes)
              Row(r.getLong(0), rate, ch, bits, fr, dur, mn, mx, sa, "fake")
          }
        }
      }
    spark.createDataFrame(rdd, audioSchema)
  }

  /** Per-row synthetic µ-law WAV payloads with id-derived parameters —
    * same parameter formulas as [[withSyntheticWav]] so the two decode
    * paths share one oracle skeleton; the payload itself is 8-bit
    * log-companded G.711, decompressed for real by the JDK codec.
    */
  def withSyntheticUlawWav(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val rate = 8000 + math.floorMod(id, 8L).toInt * 1000
        val ch = 1 + math.floorMod(id, 2L).toInt
        val frames = 200 + math.floorMod(id * 13, 800L).toInt
        Row(id, syntheticUlawWav(rate, ch, frames, id))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** A-law sibling of [[withSyntheticUlawWav]] — identical parameter
    * and byte formulas, fmt code 6.
    */
  def withSyntheticAlawWav(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val rate = 8000 + math.floorMod(id, 8L).toInt * 1000
        val ch = 1 + math.floorMod(id, 2L).toInt
        val frames = 200 + math.floorMod(id * 13, 800L).toInt
        Row(id, syntheticAlawWav(rate, ch, frames, id))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-payload dHash column: (id, dhash) with null for non-images.
    * Same partition-parallel decode shape as [[decode]].
    */
  def withDHash(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("dhash", StringType)))
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), dHash(r.getAs[Array[Byte]](1)).orNull)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Perceptual near-duplicate image pairs: dHash pairs within
    * `maxHamming` bits. Candidate generation is the pigeonhole band
    * join on the hash's four 16-bit chunks (any pair within distance 3
    * shares at least one of 4 chunks — the SimHash argument at the
    * image level), then the exact Hamming distance verifies via
    * xor + bit_count on the chunk ints. Never an all-pairs join.
    *
    * Scale shape: the shuffle key is (chunk index, chunk value) — 4
    * rows per image, 2 ints each; raw payloads never ship. Verify
    * touches only candidate pairs.
    */
  def phashPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      "4-chunk pigeonhole banding only guarantees recall up to Hamming 3")
    val chunked = hashed.filter(col("dhash").isNotNull).select(
      col("id") +: (0 to 3).map(i =>
        conv(substring(col("dhash"), i * 4 + 1, 4), 16, 10)
          .cast("int").as(s"c$i")): _*)
    val banded = chunked.select(col("id"), col("c0"), col("c1"), col("c2"),
      col("c3"), explode(array((0 to 3).map(i =>
        struct(lit(i).as("bi"), col(s"c$i").as("bv"))): _*)).as("band"))
    val a = banded.as("a")
    val b = banded.as("b")
    val hamming =
      bit_count(col("a.c0").bitwiseXOR(col("b.c0"))) +
        bit_count(col("a.c1").bitwiseXOR(col("b.c1"))) +
        bit_count(col("a.c2").bitwiseXOR(col("b.c2"))) +
        bit_count(col("a.c3").bitwiseXOR(col("b.c3")))
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming.cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- perceptual-codec METADATA (honest extraction, no fake decode)

  /** MPEG-1 Layer III bitrate table (kbps), index 0/15 invalid. */
  private val Mp3BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
      320, 0)
  /** MPEG-1 sample-rate table (Hz), index 3 invalid. */
  private val Mp3SampleRate = Array(44100, 48000, 32000, 0)

  /** Deterministic synthetic MPEG-1 Layer III stream: `nFrames`
    * well-formed frame headers (sync/version/layer/bitrate-idx/
    * samplerate-idx) each followed by the spec-exact frame length of
    * filler (`144000·kbps/rate` bytes incl. header, padding 0). The
    * filler bytes are `(seed·31 + i) mod 251` — never 0xFF, so no
    * false sync. The frames carry NO encoded audio (decode stays an
    * honest stub); what's real is the container-level structure a
    * frame-header walk extracts.
    */
  def syntheticMp3(bitrateIdx: Int, srIdx: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val out = new java.io.ByteArrayOutputStream()
    val frameLen =
      144000 * Mp3BitrateKbps(bitrateIdx) / Mp3SampleRate(srIdx)
    var f = 0
    while (f < nFrames) {
      out.write(0xff)
      out.write(0xfb) // sync 111, MPEG1 (11), Layer III (01), no CRC
      out.write((bitrateIdx << 4) | (srIdx << 2)) // padding 0, priv 0
      out.write(0x00) // stereo
      var i = 4
      while (i < frameLen) {
        out.write(((seed * 31 + i) % 251).toInt)
        i += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** MPEG audio frame-header walk — the metadata a curation pipeline
    * actually filters compressed audio on (bitrate, sample rate,
    * duration), extracted WITHOUT decoding (the Layer III synthesis
    * filterbank stays an honest stub; see [[fakeAudioDecode]]).
    * Returns (bitrate_kbps, sample_rate, n_frames, duration_ms) for
    * MPEG-1 Layer III streams; None when no valid header is found.
    * duration = frames · 1152 samples / rate, integer-exact.
    */
  def mp3Meta(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    var i = 0
    while (i + 4 <= bytes.length &&
        !((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xe0) == 0xe0))
      i += 1
    if (i + 4 > bytes.length) return None
    val b1 = bytes(i + 1) & 0xff
    if (((b1 >> 3) & 3) != 3 || ((b1 >> 1) & 3) != 1) return None
    val b2 = bytes(i + 2) & 0xff
    val (brIdx, srIdx) = ((b2 >> 4) & 0xf, (b2 >> 2) & 3)
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val (br, sr) = (Mp3BitrateKbps(brIdx), Mp3SampleRate(srIdx))
    var (frames, pos) = (0L, i)
    var ok = true
    while (ok && pos + 4 <= bytes.length &&
        (bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xe0) == 0xe0) {
      val fb2 = bytes(pos + 2) & 0xff
      val (fbr, fsr) = ((fb2 >> 4) & 0xf, (fb2 >> 2) & 3)
      if (fbr == 0 || fbr == 15 || fsr == 3) ok = false
      else {
        frames += 1
        pos += 144000 * Mp3BitrateKbps(fbr) / Mp3SampleRate(fsr) +
          ((fb2 >> 1) & 1)
      }
    }
    Some((br, sr, frames, frames * 1152000L / sr))
  }

  /** Per-row synthetic mp3 payloads with id-derived parameters —
    * `bitrateIdx = 1 + id mod 14`, `srIdx = id mod 3`,
    * `frames = 3 + id mod 6` — so the oracle predicts every header
    * field and the frame count from the id alone.
    */
  def withSyntheticMp3(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticMp3(1 + math.floorMod(id, 14L).toInt,
          math.floorMod(id, 3L).toInt,
          3 + math.floorMod(id, 6L).toInt, id))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partition-parallel [[mp3Meta]] over (id, payload) rows. */
  def mp3MetaExtract(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("bitrate_kbps", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType)))
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          mp3Meta(r.getAs[Array[Byte]](1)).map { case (br, sr, nf, dur) =>
            Row(r.getLong(0), br, sr, nf, dur)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Exp-Golomb/bit writer for the synthetic SPS. */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Int, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bit((v >> i) & 1))
    def ue(v: Int): Unit = {
      val x = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(x)
      (0 until len - 1).foreach(_ => bit(0))
      bits(x, len)
    }
    def rbspTrailing(): Unit = { bit(1); while (nBits != 0) bit(0) }
    def toBytes: Array[Byte] = buf.toByteArray
  }

  /** Deterministic synthetic H.264 Annex-B SPS NAL (Baseline,
    * profile_idc 66): start code + NAL header 0x67 + a spec-exact SPS
    * RBSP (Exp-Golomb-coded ids, frame_num/POC config,
    * width/height in macroblocks, frame_mbs_only = 1, no cropping, no
    * VUI). No slice data — inter-frame DECODE stays an honest stub;
    * the SPS structure a dimension/profile filter reads is real.
    */
  def syntheticH264Sps(levelIdc: Int, widthMbs: Int,
      heightMbs: Int): Array[Byte] = {
    val w = new BitWriter
    w.bits(66, 8)       // profile_idc: Baseline
    w.bits(0, 8)        // constraint flags + reserved
    w.bits(levelIdc, 8)
    w.ue(0)             // seq_parameter_set_id
    w.ue(0)             // log2_max_frame_num_minus4
    w.ue(0)             // pic_order_cnt_type
    w.ue(0)             // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)             // max_num_ref_frames
    w.bit(0)            // gaps_in_frame_num_value_allowed
    w.ue(widthMbs - 1)  // pic_width_in_mbs_minus1
    w.ue(heightMbs - 1) // pic_height_in_map_units_minus1
    w.bit(1)            // frame_mbs_only_flag
    w.bit(0)            // direct_8x8_inference
    w.bit(0)            // frame_cropping_flag
    w.bit(0)            // vui_parameters_present
    w.rbspTrailing()
    Array[Byte](0, 0, 0, 1, 0x67.toByte) ++ w.toBytes
  }

  /** H.264 SPS parse — profile/level/dimensions from the sequence
    * parameter set, the fields a video-curation filter reads, WITHOUT
    * decoding any slice (inter-frame decode remains an honest stub).
    * Handles the Annex-B start code, the emulation-prevention
    * de-escape (00 00 03 → 00 00), and Baseline/Main/Extended SPS
    * layouts (profile_idc < 100: no chroma_format block). Returns
    * (profile_idc, level_idc, width_px, height_px).
    */
  def h264SpsMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    // find the start code and an SPS NAL (type 7)
    var i = 0
    var spsAt = -1
    while (spsAt < 0 && i + 4 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 &&
          ((bytes(i + 2) == 1 && (bytes(i + 3) & 0x1f) == 7) ||
            (bytes(i + 2) == 0 && i + 5 < bytes.length &&
              bytes(i + 3) == 1 && (bytes(i + 4) & 0x1f) == 7)))
        spsAt = i + (if (bytes(i + 2) == 1) 4 else 5)
      else i += 1
    }
    if (spsAt < 0) return None
    // de-escape emulation prevention inside the RBSP
    val rbsp = new java.io.ByteArrayOutputStream()
    var j = spsAt
    var zeros = 0
    while (j < bytes.length &&
        !(zeros >= 2 && (bytes(j) == 0 || bytes(j) == 1))) {
      if (zeros >= 2 && bytes(j) == 3) zeros = 0 // drop escape byte
      else {
        rbsp.write(bytes(j))
        zeros = if (bytes(j) == 0) zeros + 1 else 0
      }
      j += 1
    }
    val b = rbsp.toByteArray
    var bitPos = 0
    def u(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        v = (v << 1) |
          ((b(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1; k += 1
      }
      v
    }
    def ue(): Int = {
      var lz = 0
      while (u(1) == 0 && lz < 32) lz += 1
      // lz reaching the cap means an over-wide zero run — no valid SPS
      // field is that wide; at lz == 31, (1 << 31) is already
      // Int.MinValue (negative garbage), and at 32 it wraps to 1 — so
      // malformed starts at 31 (the catch below maps it to None)
      if (lz >= 31) throw new ArrayIndexOutOfBoundsException("exp-golomb run")
      if (lz == 0) 0 else ((1 << lz) | u(lz)) - 1
    }
    try {
      val profile = u(8)
      u(8) // constraints + reserved
      val level = u(8)
      ue() // sps id
      if (profile >= 100) return None // chroma block: out of scope
      ue() // log2_max_frame_num_minus4
      val poc = ue()
      if (poc == 0) { ue(); () } // log2_max_pic_order_cnt_lsb_minus4
      else if (poc == 1) return None // delta-POC list: out of scope
      ue() // max_num_ref_frames
      u(1) // gaps allowed
      val wMbs = ue() + 1
      val hMap = ue() + 1
      val frameMbsOnly = u(1)
      val hMbs = (2 - frameMbsOnly) * hMap
      Some((profile, level, wMbs * 16, hMbs * 16))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Per-row synthetic SPS payloads with id-derived parameters —
    * `level ∈ {10,20,30,31,40,41,42,50}[id mod 8]`,
    * `widthMbs = 2 + id mod 8`, `heightMbs = 2 + id mod 6`.
    */
  def withSyntheticH264(docs: DataFrame, idCol: String): DataFrame = {
    val levels = Array(10, 20, 30, 31, 40, 41, 42, 50)
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticH264Sps(levels(math.floorMod(id, 8L).toInt),
          2 + math.floorMod(id, 8L).toInt, 2 + math.floorMod(id, 6L).toInt))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partition-parallel [[h264SpsMeta]] over (id, payload) rows. */
  def h264MetaExtract(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("profile_idc", IntegerType),
      StructField("level_idc", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val rdd = withPayload.select(col(idCol).cast("long"), col("payload"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          h264SpsMeta(r.getAs[Array[Byte]](1)).map {
            case (p, l, w, h) => Row(r.getLong(0), p, l, w, h)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
