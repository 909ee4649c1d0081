package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Binary Avro encode/decode with optional Confluent wire framing.
  *
  * The reference serializes through Confluent's `AvroSerializer`, whose
  * wire format prefixes plain Avro binary with a magic byte (0) and a
  * 4-byte big-endian schema id (`pyconnectsource.py:186-196`; SURVEY.md
  * §7.4.1). Offline there is no registry, so the id is caller-supplied
  * and registry HTTP is out of scope — the framing itself round-trips
  * exactly.
  */
object AvroCodec {

  val MagicByte: Byte = 0

  def parseable(json: String): Schema = new Schema.Parser().parse(json)

  /** Scala value (Map/Seq/primitive, as in AvroInference) → Avro datum. */
  def toDatum(value: Any, schema: Schema): Any = value match {
    case m: Map[_, _] =>
      val rec = new GenericData.Record(schema)
      m.asInstanceOf[Map[String, Any]].foreach { case (k, v) =>
        val f = schema.getField(k)
        require(f != null, s"field '$k' not in schema")
        rec.put(k, toDatum(v, f.schema()))
      }
      rec
    case xs: Seq[_] =>
      new GenericData.Array[Any](schema,
        xs.map(x => toDatum(x, schema.getElementType)).asJava)
    case s: String => new org.apache.avro.util.Utf8(s)
    case i: Int => i.toLong
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other =>
      // unions ([null, T]) accept the raw value directly
      other
  }

  /** Avro datum → plain Scala value (inverse of toDatum). */
  def fromDatum(datum: Any): Any = datum match {
    case r: GenericRecord =>
      r.getSchema.getFields.asScala
        .map(f => f.name() -> fromDatum(r.get(f.name()))).toMap
    case u: org.apache.avro.util.Utf8 => u.toString
    case a: java.util.Collection[_] => a.asScala.toSeq.map(fromDatum)
    case b: ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other
  }

  def encode(value: Any, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[Any](schema).write(toDatum(value, schema), encoder)
    encoder.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte], schema: Schema): Any = {
    val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
    fromDatum(new GenericDatumReader[Any](schema).read(null, decoder))
  }

  /** Confluent frame: 0x00 + 4-byte BE schema id + payload. */
  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(5 + payload.length)
      .put(MagicByte).putInt(schemaId).put(payload).array()

  /** Strip a Confluent frame → (schemaId, payload). Poison-pill policy
    * (SURVEY §2-A K14): malformed frames throw; callers choose FAILFAST
    * (propagate) or PERMISSIVE (null row) at the connector level. */
  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    if (bytes.length < 5 || bytes(0) != MagicByte)
      throw new IllegalArgumentException(
        s"not a Confluent-framed Avro message (len=${bytes.length})")
    val buf = ByteBuffer.wrap(bytes)
    buf.get()
    val id = buf.getInt
    val payload = new Array[Byte](bytes.length - 5)
    buf.get(payload)
    (id, payload)
  }

  def encodeFramed(value: Any, schema: Schema, schemaId: Int): Array[Byte] =
    frame(schemaId, encode(value, schema))

  def decodeFramed(bytes: Array[Byte], schema: Schema): Any =
    decode(unframe(bytes)._2, schema)
}
