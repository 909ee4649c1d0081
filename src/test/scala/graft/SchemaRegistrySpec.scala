package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.avro.{AvroCodec, AvroInference, SchemaRegistryHttpClient, SchemaRegistryServer}
import graft.core.InMemoryBroker

/** Confluent Schema Registry REST shim: protocol round-trip, global id
  * dedup, 404 semantics, and frame-decode integration with the broker
  * registry (the full register → frame → resolve → decode path the
  * reference runs over HTTP, `pyconnectsource.py:177-196`). */
class SchemaRegistrySpec extends AnyFunSuite {

  private val schemaA =
    """{"type":"record","name":"A","fields":[{"name":"x","type":"long"}]}"""
  private val schemaB =
    """{"type":"record","name":"B","fields":[{"name":"y","type":"string"}]}"""

  test("register/getById round-trip with global id dedup") {
    val server = new SchemaRegistryServer().start()
    try {
      val client = new SchemaRegistryHttpClient(server.baseUrl)
      val id1 = client.register("topic-value", schemaA)
      val id2 = client.register("topic-value", schemaA) // same schema
      val id3 = client.register("other-value", schemaA) // same schema, other subject
      val id4 = client.register("topic-value", schemaB)
      assert(id1 == id2 && id1 == id3) // Confluent global id space
      assert(id4 != id1)
      assert(client.getById(id1) == schemaA)
      assert(client.getById(id4) == schemaB)
      assert(client.subjects() == Seq("other-value", "topic-value"))
    } finally server.stop()
  }

  test("unknown schema id is a 40403-style failure") {
    val server = new SchemaRegistryServer().start()
    try {
      val client = new SchemaRegistryHttpClient(server.baseUrl)
      val e = intercept[IllegalStateException](client.getById(999))
      assert(e.getMessage.contains("404"))
    } finally server.stop()
  }

  test("REST-registered schema resolves Confluent-framed messages via the broker") {
    val broker = new InMemoryBroker()
    val server = new SchemaRegistryServer(Some(broker)).start()
    try {
      val client = new SchemaRegistryHttpClient(server.baseUrl)
      val record = Map("x" -> 42L)
      val schema = AvroCodec.parseable(AvroInference.toValueSchema(record))
      val id = client.register("nums-value", schema.toString)
      // producer side: frame with the REST-assigned id
      val framed = AvroCodec.encodeFramed(record, schema, id)
      // sink side: resolve the frame's id from the broker registry
      // (exactly what GraftSink.decodeFramed does)
      val (gotId, payload) = AvroCodec.unframe(framed)
      assert(gotId == id)
      val schemaJson = broker.schemaById(gotId)
      assert(schemaJson.contains(schema.toString))
      val decoded = AvroCodec.decode(payload,
        AvroCodec.parseable(schemaJson.get))
      assert(decoded == Map("x" -> 42L))
    } finally server.stop()
  }
}
