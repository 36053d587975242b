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

  /** documents.text -> Blob dataset (binary column materialization). */
  def documentBlobs(docs: DataFrame, idCol: String, textCol: String): Dataset[Blob] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("id"), encode(col(textCol), "UTF-8").as("bytes"))
      .as[Blob]
  }
}
