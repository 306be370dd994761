package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (binary-payload) column processing — SURVEY §2 q36.
  *
  * Media assets ride as opaque `binary` columns with typed metadata
  * (format/width/height), the layout a 100 TB training-data lake
  * uses: payload bytes stay columnar-compressed in parquet and are
  * only materialized inside the decode stage.
  *
  * The decode stage is a typed `mapPartitions` — the Scala analog of
  * `mapInPandas` batch shape: one kernel invocation stream per
  * partition, no per-row serialization boundary, partitioning
  * preserved. The environment ships no image/audio codecs, so the
  * default kernel is a clearly-marked deterministic fake; real
  * deployments implement [[Multimodal.DecodeKernel]] with an actual
  * decoder and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, fmt: String, width: Int, height: Int, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, fmt: String, width: Int, height: Int,
      octet_len: Long, checksum: Long)

  /** Pluggable per-payload decode/feature kernel. */
  trait DecodeKernel extends Serializable {
    /** (octet length, content checksum) stand-in for real features. */
    def features(payload: Array[Byte]): (Long, Long)
  }

  /** STUB decoder: deterministic byte statistics instead of a real
    * codec (none available in this environment). Replace with a real
    * image/audio decoder in production; the pipeline shape is final. */
  object FakeDecode extends DecodeKernel {
    def features(p: Array[Byte]): (Long, Long) = {
      var s = 0L
      var i = 0
      while (i < p.length) { s += p(i) & 0xff; i += 1 }
      (p.length.toLong, s % 9973)
    }
  }

  /** Run the decode kernel partition-wise over media rows. */
  def decode(rows: Dataset[MediaRow], kernel: DecodeKernel = FakeDecode): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (len, sum) = kernel.features(r.payload)
        MediaFeatures(r.doc_id, r.fmt, r.width, r.height, len, sum)
      }
    }.toDF()
  }

  /** Pluggable payload resize kernel (payload → payload at target
    * dims). */
  trait ResizeKernel extends Serializable {
    def resize(payload: Array[Byte], srcW: Int, srcH: Int, dstW: Int, dstH: Int): Array[Byte]
  }

  /** STUB resize: deterministic proportional byte subsample — the
    * payload shrinks/grows by the pixel-count ratio, standing in for
    * a real scaler. Schema, 1:1 cardinality, metadata update, and
    * partition-wise execution are the real contract. */
  object FakeResize extends ResizeKernel {
    def resize(p: Array[Byte], sw: Int, sh: Int, dw: Int, dh: Int): Array[Byte] = {
      if (p.isEmpty) return p // zero-byte/corrupt media: nothing to scale
      val srcPx = math.max(1L, sw.toLong * sh)
      val outLen = math.min(Int.MaxValue.toLong,
        math.max(1L, p.length * (dw.toLong * dh) / srcPx)).toInt
      Array.tabulate(outLen)(i => p(((i.toLong * p.length) / outLen).toInt))
    }
  }

  /** Resize every payload to (dstW, dstH), partition-wise (1:1, no
    * shuffle; metadata rewritten alongside the bytes). */
  def resize(rows: Dataset[MediaRow], dstW: Int, dstH: Int,
      kernel: ResizeKernel = FakeResize): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map(r => MediaRow(r.doc_id, r.fmt, dstW, dstH,
        kernel.resize(r.payload, r.width, r.height, dstW, dstH)))
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Pluggable video→frames kernel. */
  trait FrameSampleKernel extends Serializable {
    def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** STUB frame sampler: n contiguous byte slices stand in for
    * decoded frames. The 1:N explode shape (one media row fans out to
    * frame rows inside the partition, no shuffle, no driver
    * involvement) is the production contract. */
  object FakeFrameSample extends FrameSampleKernel {
    def frames(p: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val m = math.max(1, math.min(n, p.length))
      (0 until m).map { i =>
        val from = (i.toLong * p.length / m).toInt
        val until = ((i + 1).toLong * p.length / m).toInt
        java.util.Arrays.copyOfRange(p, from, math.max(from + 1, until))
      }
    }
  }

  /** Sample up to `n` frames per media row, partition-wise (1:N). */
  def frameSample(rows: Dataset[MediaRow], n: Int,
      kernel: FrameSampleKernel = FakeFrameSample): Dataset[FrameRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        kernel.frames(r.payload, n).iterator.zipWithIndex
          .map { case (f, i) => FrameRow(r.doc_id, i, f) }
      }
    }
  }
}
