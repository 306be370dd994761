package graft.formats

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro binary (schema-less single-record) encode/decode for flat
  * schemas, re-expressing the reference's avro format job
  * (format/src/main/java/com/felixzh/flink/format/avro/Avro2Avro.java:
  * Flink SQL `'format' = 'avro'` over Kafka).
  *
  * This environment ships Avro core but not the spark-avro module
  * (`from_avro`/`to_avro`), so the codec runs partition-wise via
  * `mapPartitions` — the documented last-resort tier (SURVEY §4(d)),
  * justified here because no expression-level path exists. Reader/
  * writer instances are reused across each partition's rows, so the
  * per-row cost is one encoder call, no reflection.
  *
  * Supported field types: long, int, double, float, boolean, string,
  * binary (nullable unions of those).
  */
object AvroBinary {

  /** StructType → Avro record schema (nullable unions). */
  def avroSchema(schema: StructType, name: String = "record0"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(s"unsupported avro field type: $other")
      }
      val typ = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, typ, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Encode `cols` of each row into one Avro binary record column
    * `payload` (plus any `keep` passthrough columns). */
  def encode(df: DataFrame, schema: StructType, keep: Seq[String] = Nil): DataFrame = {
    val schemaJson = avroSchema(schema).toString
    val names = schema.fieldNames
    val outSchema = StructType(
      keep.map(k => df.schema(k)) :+ StructField("payload", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select((keep ++ names).map(col): _*).mapPartitions { rows =>
      val avSchema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](avSchema)
      val bos = new ByteArrayOutputStream()
      var encB: org.apache.avro.io.BinaryEncoder = null // reused per partition
      rows.map { r =>
        bos.reset()
        encB = EncoderFactory.get().binaryEncoder(bos, encB)
        val rec = new GenericData.Record(avSchema)
        names.zipWithIndex.foreach { case (n, i) =>
          rec.put(n, r.get(keep.length + i) match {
            case s: String => new org.apache.avro.util.Utf8(s)
            // Avro BYTES requires a ByteBuffer; Spark Rows carry Array[Byte]
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other
          })
        }
        writer.write(rec, encB)
        encB.flush()
        Row.fromSeq(keep.indices.map(r.get) :+ bos.toByteArray)
      }
    }(enc)
  }

  /** Decode an Avro binary record column back into typed columns. */
  def decode(df: DataFrame, payloadCol: String, schema: StructType): DataFrame = {
    val schemaJson = avroSchema(schema).toString
    val names = schema.fieldNames
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(payloadCol)).mapPartitions { rows =>
      val avSchema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](avSchema)
      var dec: org.apache.avro.io.BinaryDecoder = null // reused per partition
      rows.map { r =>
        dec = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]](0), dec)
        val rec = reader.read(null, dec)
        Row.fromSeq(names.toIndexedSeq.map { n =>
          rec.get(n) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case bb: java.nio.ByteBuffer =>
              val a = new Array[Byte](bb.remaining()); bb.get(a); a
            case other => other
          }
        })
      }
    }(enc)
  }
}
