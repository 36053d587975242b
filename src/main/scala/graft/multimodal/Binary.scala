package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video modeled as opaque
  * `binary` columns with typed metadata, processed in batches via
  * mapPartitions (the JVM analogue of the Arrow-batched python UDF path).
  *
  * The actual media decode is STUBBED — codec libraries are not in this
  * container — behind `decodeStub`, a deterministic fake that stands in
  * for "decode bytes -> feature vector". Everything around it (schema,
  * batching, partitioning, the Dataset plumbing) is real and tested.
  */
object Binary {

  final case class Blob(id: Long, bytes: Array[Byte])
  final case class Features(id: Long, n_bytes: Int, first_byte: Int,
      checksum: Long, feature: Array[Float])

  /** STUB decode: byte stats + a tiny deterministic "embedding" derived
    * from byte histogram moments. Replace with a real codec at the same
    * signature — the Spark plumbing does not change. */
  def decodeStub(bytes: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = (checksum + (bytes(i) & 0xff)) % 997; i += 1 }
    val feat = new Array[Float](4)
    i = 0
    while (i < bytes.length) {
      feat(i % 4) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    (checksum, feat)
  }

  /** Batched feature extraction over a binary column. One decode call per
    * row, amortized per partition — at scale, partition sizing
    * (maxPartitionBytes) bounds decode memory, and the stub's signature
    * is where a native decoder (JNI/FFI) plugs in.
    */
  def extractFeatures(blobs: Dataset[Blob]): Dataset[Features] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val (checksum, feat) = decodeStub(b.bytes)
        Features(b.id, b.bytes.length,
          if (b.bytes.isEmpty) -1 else b.bytes(0) & 0xff, checksum, feat)
      }
    }
  }

  final case class FrameRef(id: Long, frame_idx: Int, ts_ms: Long,
      frame_bytes: Int, frame_checksum: Long)

  /** Frame sampling over opaque video/audio blobs: the frame GRID is
    * derived relationally from typed metadata — `explode(sequence)` over
    * ceil(duration/interval) capped at `maxFrames`, so Catalyst prunes
    * and distributes it like any other expression — and ONLY the
    * per-frame decode is procedural (stubbed here: a 16-byte slice at
    * the frame's offset stands in for the decoded frame, same checksum
    * as decodeStub; a real codec plugs into the same mapPartitions
    * signature). All frames of a blob stay in one partition-local pass.
    */
  def sampleFrames(
      media: DataFrame, intervalMs: Long, maxFrames: Int): Dataset[FrameRef] = {
    import media.sparkSession.implicits._
    val grid = media
      .withColumn("n_frames",
        least(ceil(col("duration_ms") / intervalMs), lit(maxFrames)).cast("int"))
      .where(col("n_frames") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("id"), col("bytes"), col("frame_idx"))
      .as[(Long, Array[Byte], Int)]
    grid.mapPartitions { it =>
      it.map { case (id, bytes, idx) =>
        val off = (idx * 16) % math.max(bytes.length, 1)
        val slice = bytes.slice(off, math.min(off + 16, bytes.length))
        val (ck, _) = decodeStub(slice)
        FrameRef(id, idx, idx * intervalMs, slice.length, ck)
      }
    }
  }

  final case class Resized(id: Long, src_side: Int, out_w: Int, out_h: Int,
      checksum: Long)

  /** Nearest-neighbor RESIZE over the opaque byte grid: the blob is
    * viewed as a square row-major "image" of side floor(sqrt(n_bytes))
    * (the decode being the stubbed part — a real codec would supply true
    * dims and pixels at the same signature), and resampled to (w, h) by
    * integer nearest-neighbor index math. The resample arithmetic is
    * REAL — sx = x*side/w, sy = y*side/h, exact integer division — so
    * the op verifies end-to-end; only the bytes-as-pixels view is fake.
    * Returns the resampled grid's checksum (sum of picked bytes mod 997,
    * decodeStub's convention). Blobs smaller than one "pixel" are
    * dropped (no defined grid). */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Option[(Int, Long)] = {
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    val side = math.floor(math.sqrt(bytes.length.toDouble)).toInt
    if (side == 0) None
    else {
      var sum = 0L
      var y = 0
      while (y < h) {
        // Long index math: y*side overflows Int for large targets/blobs
        val sy = y.toLong * side / h
        var x = 0
        while (x < w) {
          val sx = x.toLong * side / w
          sum += (bytes((sy * side + sx).toInt) & 0xff)
          x += 1
        }
        y += 1
      }
      Some((side, sum % 997))
    }
  }

  /** Batched resize over a binary column — same mapPartitions shape as
    * extractFeatures; partition sizing bounds decode memory. */
  def resize(blobs: Dataset[Blob], w: Int, h: Int): Dataset[Resized] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        resizeStub(b.bytes, w, h).map { case (side, ck) =>
          Resized(b.id, side, w, h, ck)
        }
      }
    }
  }

  /** documents.text -> Blob dataset (binary column materialization). */
  def documentBlobs(docs: DataFrame, idCol: String, textCol: String): Dataset[Blob] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("id"), encode(col(textCol), "UTF-8").as("bytes"))
      .as[Blob]
  }

  /** 64-bit average hash (aHash — the classic perceptual image
    * fingerprint: downsample to 8x8, threshold each cell against the
    * mean, pack the bits) over the bytes-as-pixels square view
    * ([[resizeStub]]'s convention: side = floor(sqrt(n_bytes)), the
    * honest stand-in for a real decode; a codec would supply true
    * dims/pixels to the SAME sampling math). Everything is
    * integer-exact — nearest-neighbor cell index (y·side)>>3, byte
    * lookup, and the threshold spelled 64·p > Σp so no division ever
    * happens — which is what makes the signature bit-replayable in SQL
    * and stable across engines. Fully expression-based (no UDF): one
    * hex projection, 64 substr+conv byte reads, 64 conditional bit
    * adds, all inside whole-stage codegen.
    *
    * Returns (id, ahash) for blobs with side >= 8 (smaller blobs have
    * no 8x8 grid). */
  def withAHash(df: DataFrame, idCol: String, bytesCol: String,
                out: String = "ahash"): DataFrame = {
    val base = df.select(col(idCol).as("id"),
        hex(col(bytesCol)).as("hx"),
        floor(sqrt(length(col(bytesCol)).cast("double"))).cast("int")
          .as("side"))
      .where(col("side") >= 8)
    // two-stage projection: pixels once as columns, then sum + bits read
    // the columns — never re-derive the 64 substr/conv chains twice
    val px = base.select(Seq(col("id")) ++ (0 until 64).map { b =>
      val sy = shiftright(lit(b / 8) * col("side"), 3)
      val sx = shiftright(lit(b % 8) * col("side"), 3)
      val idx = sy * col("side") + sx
      conv(col("hx").substr(lit(2) * idx + lit(1), lit(2)), 16, 10)
        .cast("int").as(s"p$b")
    }: _*)
    val total = (0 until 64).map(b => col(s"p$b")).reduce(_ + _)
    val sig = (0 until 64).map { b =>
      when(lit(64) * col(s"p$b") > col("__s"), lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    px.withColumn("__s", total).select(col("id"), sig.as(out))
  }

  /** Perceptual near-dup image pairs: [[withAHash]] signatures through
    * the shared 16-bit chunk banding + hamming verify
    * ([[graft.operators.Dedup.hamming64Pairs]]) — the image analogue of
    * SimHash text dedup, and the standard first pass of multimodal
    * corpus dedup (re-encoded/resized copies of one image land within a
    * few bits). Returns (id1, id2, hamming). */
  def aHashPairs(df: DataFrame, idCol: String, bytesCol: String,
                 maxHamming: Int): DataFrame =
    graft.operators.Dedup.hamming64Pairs(
      withAHash(df, idCol, bytesCol)
        .select(col("id"), col("ahash").as("hash")), maxHamming)
}
