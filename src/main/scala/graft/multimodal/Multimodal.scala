package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing (SURVEY.md §2.8): image/audio/video
 * payloads as opaque `binary` columns + typed metadata, processed
 * per-partition in batches.
 *
 * The Spark side is real — schema, partition-batched iteration,
 * backpressure-friendly batch size, deterministic output — while the
 * actual media decode is a STUB (`decodeStub`): this container has no
 * image/audio libraries, so the decode produces deterministic fake
 * features from the bytes. Swapping `decodeStub` for a real decoder
 * (JNI/FFI or an external service call) changes nothing else: the
 * batching, schema, and partitioning contract stay identical.
 *
 * Scale posture: `mapPartitions` keeps the decode zero-copy within a
 * task and amortizes per-batch setup (model load, codec init) across
 * `batchSize` rows — the Scala analog of mapInPandas' Arrow batches.
 */
object Multimodal {

  /** One media payload row: id + opaque bytes + declared modality. */
  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features: fixed-width vector + scalar metadata. */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      checksum: Long,
      feature: Array[Float] // would be the decoded embedding / resized frame stats
  )

  /**
   * STUB decoder — deterministic fake: checksum is a polynomial hash
   * of the bytes; the "feature" is an 8-dim byte-histogram sketch.
   * A real implementation would decode the image/audio here
   * (one codec/model init per BATCH, not per row — that is the point
   * of the batching contract).
   */
  private[multimodal] def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
      var h = 0L
      val hist = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        h = (h * 31L + b) % 1000000007L
        hist(b % 8) += 1f
        i += 1
      }
      MediaFeatures(r.media_id, r.modality, bytes.length, h, hist)
    }

  /** Partition-batched feature extraction over a binary-column
    * Dataset. `batchSize` bounds per-batch memory (payloads can be
    * MBs each at 100 TB — never materialize a whole partition). */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => decodeStub(batch.toSeq))
    }
  }

  /** One sampled "frame": fixed-width byte slice of the payload. */
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** A stride-resampled payload: the RESIZE stub. */
  final case class Resized(media_id: Long, n_orig: Int, n_resized: Int,
                           resized: Array[Byte])

  /**
   * RESIZE stub: every `stride`-th byte of the first `maxBytes·stride`
   * payload bytes stands in for the 1/stride-downscaled pixel grid —
   * a codec-aware image downscaler (or audio resampler) slots into
   * this exact map-side frame with nothing else changing. Pure
   * per-row map (no shuffle, no batching needed — resize carries no
   * per-batch model/codec amortization the way feature extraction
   * does); output payloads are capped at `maxBytes` so downstream
   * metadata joins stay narrow.
   */
  def resize(media: Dataset[MediaRow], stride: Int = 2,
             maxBytes: Int = 32): Dataset[Resized] = {
    require(stride >= 1, "stride must be >= 1")
    import media.sparkSession.implicits._
    media.map { m =>
      val n = m.payload.length
      val out = Array.newBuilder[Byte]
      var i = 0
      var k = 0
      while (i < n && k < maxBytes) {
        out += m.payload(i)
        i += stride
        k += 1
      }
      val r = out.result()
      Resized(m.media_id, n, r.length, r)
    }
  }

  /**
   * Frame sampling: slice each payload into fixed-width frames and
   * keep every `everyK`-th — the video-frame-sampling contract with a
   * byte-slicing stub standing in for codec-aware extraction. Emits
   * zero-copy slices per partition; output size is bounded by
   * |payload| / everyK regardless of row count.
   */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 1024,
                  everyK: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameSize > 0 && everyK > 0)
    media.flatMap { r =>
      if (r.payload == null) Seq.empty[Frame]
      else {
        val nFrames = (r.payload.length + frameSize - 1) / frameSize
        (0 until nFrames).filter(_ % everyK == 0).map { i =>
          val from = i * frameSize
          val until = math.min(from + frameSize, r.payload.length)
          Frame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }

  /** Adapt any DataFrame with (idCol, binary payloadCol) into the
    * typed media Dataset — the ingest boundary for parquet/object-store
    * payload tables. Lenient like every other ingest path: a
    * non-numeric id try_casts to null, and rows with a null id or null
    * payload are dropped HERE (they cannot be media and would
    * otherwise NPE the primitive-field deserialization mid-job). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              modality: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).try_cast("long").as("media_id"),
        lit(modality).as("modality"),
        col(payloadCol).try_cast("binary").as("payload"))
      .filter(col("media_id").isNotNull && col("payload").isNotNull)
      .as[MediaRow]
  }

  /** Ingest a directory of raw media files via Spark's binaryFile
    * source — the object-store boundary of a multimodal pipeline
    * (image/audio dumps land as files, not parquet). Each file becomes
    * one MediaRow: media_id from `idFromName` (a regex with one
    * capture group applied to the FILE NAME — the common
    * files-named-by-id layout; non-matching or non-numeric names are
    * dropped) or, absent that, a stable hash of the full path
    * (collision odds ~n²/2⁶⁴ — dedupe by path upstream if exactness
    * matters). Payload = file bytes. `pathGlobFilter` selects the
    * modality's extensions; `maxBytes` filters on the source's
    * `length` metadata column BEFORE the content is deserialized, so
    * a stray multi-GB object is skipped rather than poisoning a
    * task. NOTE zero-byte objects do not survive ingest: Spark's
    * split planning drops empty files before any source sees them —
    * an empty payload that must be preserved belongs in a parquet
    * binary column ([[asMedia]]), not a file-per-object dump. */
  def readMediaDir(spark: SparkSession, dir: String, modality: String,
                   glob: Option[String] = None,
                   maxBytes: Option[Long] = None,
                   idFromName: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    val raw = glob.foldLeft(spark.read.format("binaryFile")) {
        (r, g) => r.option("pathGlobFilter", g)
      }
      .load(dir)
    val idCol = idFromName match {
      case Some(re) => regexp_extract(
        element_at(split(col("path"), "/"), -1), re, 1).try_cast("long")
      case None => xxhash64(col("path"))
    }
    maxBytes.foldLeft(raw)((df, mb) => df.filter(col("length") <= mb))
      .select(idCol.as("media_id"),
        lit(modality).as("modality"),
        col("content").as("payload"))
      .filter(col("media_id").isNotNull) // regex misses can't be media ids
      .as[MediaRow]
  }

  /** Materialize (id, payload) rows as one raw FILE per row named
    * `<prefix><id><suffix>` under `dir` — the inverse of
    * [[readMediaDir]] (one-object-per-item export, and the stager for
    * binaryFile fixtures). Writes run DISTRIBUTED via
    * foreachPartition — no driver-side collect however many rows —
    * which requires `dir` to be a filesystem every executor can reach
    * (local mode, NFS, or a fuse-mounted object store; on a real
    * cluster with plain local disks, export to the object store
    * instead). Rows with a null id or payload are dropped — they
    * cannot name or fill a file. */
  def writeMediaFiles(df: DataFrame, idCol: String, payloadCol: String,
                      dir: String, prefix: String = "", suffix: String = ""): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("payload"))
      .filter(col("id").isNotNull && col("payload").isNotNull)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$prefix${r.getLong(0)}$suffix"),
            r.getAs[Array[Byte]](1))
        }
      }
  }

  /** Demo pipeline over the documents table: text bytes stand in for
    * media payloads (deterministic, schema-correct end to end). */
  def documentFeatures(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    extractFeatures(asMedia(docs, "doc_id", "payload", "text/utf-8")).toDF()
  }
}
