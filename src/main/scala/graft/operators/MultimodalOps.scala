package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[decodeStub]]); everything Spark-
  * side — the binary column representation, the metadata schema, the
  * mapPartitions batch shape, partition-preserving execution — is real
  * and tested, and is exactly what a production decode (JNI codec or
  * Arrow-batched Python worker) would plug into.
  */
object MultimodalOps {

  /** Typed metadata a real decoder would emit. */
  case class MediaMeta(docId: Long, byteLen: Long, width: Int, height: Int,
      nFrames: Int, format: String)

  /** DECODE STUB — deterministic fake. A real implementation would parse
    * the container header (JPEG SOF / WAV fmt / MP4 moov); here metadata
    * is derived arithmetically from the payload length so tests are
    * reproducible without codecs.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, n,
      width = (n % 64).toInt + 1,
      height = ((n / 7) % 64).toInt + 1,
      nFrames = (n / 100).toInt + 1,
      format = if (n % 2 == 0) "img" else "audio")
  }

  /** Binary payload table: the documents' text bytes standing in for real
    * media blobs (the testdata ships no binary table; the cast is the
    * only fake part of the schema).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Distributed decode via mapPartitions over the typed Dataset — the
    * per-partition iterator is where a real codec would batch rows
    * (Arrow-style) before calling into native code. No shuffle: decode is
    * partition-local, so it scales with input splits.
    */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    val s = spark
    import s.implicits._
    mediaTable(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
  }

  /** Per-payload features a vision/audio pipeline would batch-extract:
    * a 16-bin byte-value histogram and mean byte — REAL computation over
    * the binary payload (unlike the decode stub, no codec is needed),
    * in the same partition-local mapPartitions batch shape a production
    * extractor (Arrow → native kernel) plugs into.
    */
  case class MediaFeatures(docId: Long, byteLen: Long,
      hist: Array[Long], meanByte: Double)

  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    val s = spark
    import s.implicits._
    mediaTable(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xff
          hist(b >> 4) += 1
          sum += b
          i += 1
        }
        MediaFeatures(id, payload.length.toLong, hist,
          if (payload.length == 0) 0.0 else sum.toDouble / payload.length)
      })
  }

  /** RESIZE STUB — metadata-only: a real implementation rescales pixel
    * buffers; the partition-local transform shape is identical.
    */
  def resizeStub(meta: MediaMeta, targetW: Int, targetH: Int): MediaMeta =
    meta.copy(width = targetW, height = targetH)

  /** Frame sampling: every `stride`-th frame index, always including
    * frame 0 — the deterministic index plan a video decoder would fetch.
    */
  def sampleFrameIndices(nFrames: Int, stride: Int): Seq[Int] =
    0 until nFrames by stride

  /** Rows-only gate entry for the typed mapPartitions feature path:
    * histogram mass must equal byte length (checked in spec; the gate
    * checks determinism via rows>0 + schema). The histogram is emitted
    * as a comma-joined STRING, not array<long>: downstream compare
    * tooling (pandas sort/hash) can't order array cells, and a scalar
    * column keeps the output portable across engines.
    */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{array_join, col}
    extractFeatures(spark, dir).toDF()
      .select(col("docId").as("doc_id"), col("byteLen").as("byte_len"),
        array_join(col("hist").cast("array<string>"), ",").as("hist"),
        col("meanByte").as("mean_byte"))
      .orderBy(col("doc_id"))
  }

  /** SQL-expressible slice of the metadata (oracle-checkable): byte
    * length + the deterministic fake decode fields + frame-sample count
    * (every 4th frame, at least 1).
    */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .select(
        col("doc_id"),
        col("byte_len"),
        expr("byte_len % 64 + 1").as("fake_width"),
        expr("byte_len div 7 % 64 + 1").as("fake_height"),
        expr("byte_len div 100 + 1").as("n_frames"),
        // ceil(n/stride): matches sampleFrameIndices(n, 4).length exactly
        expr("(byte_len div 100 + 1 + 3) div 4").as("sampled_frames"))
      .orderBy(col("doc_id"))
}
