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
}
