package graft.core

import org.apache.avro.Schema

import graft.avro.{AvroCodec, AvroInference}
import graft.config.SourceConfig

/** Source connector — reference parity with `pyconnectsource.py`
  * (SURVEY.md §2-A S1–S13).
  *
  * Lifecycle: on start, fetch the committed offset from the offset topic
  * and `seek` to it (S8/S10); loop `read → produce` (S1/S5); first record
  * triggers one-shot Avro schema inference + serializer install (S6); EOF
  * → `onEof` (default: 100 ms backoff retry, S11); close always performs
  * a final offset commit (S12); the offset value itself is an arbitrary
  * schema-inferred Avro value produced to a dedicated topic (S7).
  */
abstract class GraftSource(val config: SourceConfig, broker: InMemoryBroker)
    extends BaseConnector {

  protected val producer: TransportProducer = broker.producer()
  private val offsetConsumer: TransportConsumer =
    broker.consumer(s"${config.offsetTopic}-reader")

  private var keySchema: Option[Schema] = None
  private var valueSchema: Option[Schema] = None
  private var offsetSchema: Option[Schema] = None
  var produceCount: Long = 0L

  // ---- abstract API (S2/S3/S4) ----------------------------------------
  /** Next record, or None at EOF (the reference's StopIteration). */
  def read(): Option[(Any, Any)]
  def seek(index: Any): Unit
  def getIndex: Any

  /** EOF default: brief backoff then retry — i.e. tail the source
    * (`pyconnectsource.py:198-206`). Override to stop at EOF. */
  protected def onEof(): Option[Status] = { Thread.sleep(100); None }

  // ---- lifecycle -------------------------------------------------------
  override protected def beforeRunLoop(): Unit = {
    lastCommitNanos = System.nanoTime()
    getCommittedOffset.foreach(seek)
  }

  /** Periodic offset commit per `offset_commit_interval` (30 min default)
    * — the reference commits during the run loop, not only on close
    * (`config.py:387-392`; commit sites in `pyconnectsource.py`). */
  private var lastCommitNanos: Long = System.nanoTime()

  override protected def runOnce(): Option[Status] = {
    val intervalNanos = config.base.offsetCommitInterval.toNanos
    if (System.nanoTime() - lastCommitNanos >= intervalNanos) {
      commitOffset()
      lastCommitNanos = System.nanoTime()
    }
    read() match {
      case Some((key, value)) => produce(key, value); None
      case None => onEof()
    }
  }

  /** Lazy one-shot schema inference (`pyconnectsource.py:177-196`). */
  private def createSchemasIfNecessary(key: Any, value: Any): Unit = {
    if (keySchema.isEmpty)
      keySchema = Some(AvroCodec.parseable(AvroInference.toKeySchema(key)))
    if (valueSchema.isEmpty)
      valueSchema = Some(AvroCodec.parseable(AvroInference.toValueSchema(value)))
  }

  protected def produce(key: Any, value: Any): Unit = {
    createSchemasIfNecessary(key, value)
    producer.produce(config.topic,
      AvroCodec.encodeFramed(key, keySchema.get, schemaId(keySchema.get)),
      AvroCodec.encodeFramed(value, valueSchema.get, schemaId(valueSchema.get)))
    produceCount += 1
  }

  /** Offline stand-in for registry ids: stable schema fingerprint,
    * registered with the broker's in-memory registry so sinks can
    * resolve it from the frame. */
  private def schemaId(s: Schema): Int = {
    val id = org.apache.avro.SchemaNormalization
      .parsingFingerprint64(s).toInt & 0x7fffffff
    broker.registerSchema(id, s.toString)
    id
  }

  /** Final commit of the source's own read position to the offset topic
    * (`pyconnectsource.py:216-238`): infer the offset value's schema,
    * produce, flush. */
  protected def commitOffset(): Unit = {
    val idx = getIndex
    if (idx != null) {
      if (offsetSchema.isEmpty)
        offsetSchema = Some(AvroCodec.parseable(AvroInference.toValueSchema(idx)))
      producer.produce(config.offsetTopic, null,
        AvroCodec.encodeFramed(idx, offsetSchema.get,
          schemaId(offsetSchema.get)))
    }
    producer.flush()
  }

  /** Last message of the offset topic (`pyconnectsource.py:96-124`). */
  protected def getCommittedOffset: Option[Any] =
    offsetConsumer.lastMessage(config.offsetTopic).map { msg =>
      val (_, payload) = AvroCodec.unframe(msg.value)
      if (offsetSchema.isEmpty) {
        // schema travels out of band in the reference (registry); here the
        // subclass's index type re-infers it from a sample on first use.
        offsetSchema = Some(AvroCodec.parseable(
          AvroInference.toValueSchema(getIndex)))
      }
      AvroCodec.decode(payload, offsetSchema.get)
    }

  private var closed = false
  override def close(): Unit = if (!closed) {
    closed = true
    commitOffset() // final commit (`pyconnectsource.py:208-214`)
    offsetConsumer.close()
  }
}
