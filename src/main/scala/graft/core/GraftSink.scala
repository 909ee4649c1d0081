package graft.core

import scala.collection.mutable

import graft.avro.AvroCodec
import graft.config.SinkConfig

/** Sink connector — reference parity with `pyconnectsink.py`
  * (SURVEY.md §2-A K1–K16).
  *
  * Contract replicated:
  *  - poll → classify → dispatch (K1/K2);
  *  - offset bookkeeping: next offset = message offset + 1 per
  *    (topic, partition) (K5);
  *  - EOF flags per partition, reset on new data / assignment (K6/K11);
  *  - flush gate `needFlush` — default: every message (K8);
  *  - flush-then-commit ordering, commit SKIPPED if flush crashed (K9) →
  *    at-least-once delivery;
  *  - commit retry with `sinkCommitRetryCount` attempts (K10);
  *  - deserialization-error policy: tolerate transient consume errors,
  *    crash on poison pills (K14) — `failFast` option;
  *  - one final flush on graceful stop, never after a crash (K15);
  *  - close tolerates double-close (K16).
  */
abstract class GraftSink(val config: SinkConfig, broker: InMemoryBroker)
    extends BaseConnector {

  /** Overridable for tests that inject transport errors (the reference's
    * mocked-client seam). */
  protected def makeConsumer(): TransportConsumer =
    broker.consumer(config.groupId)
  protected lazy val consumer: TransportConsumer = makeConsumer()

  private val offsets = mutable.Map[TopicPartition, Long]()
  private val eofReached = mutable.Map[TopicPartition, Boolean]()

  var flushCount: Long = 0L
  var messageCount: Long = 0L

  // ---- abstract API (K4/K8/K9) ----------------------------------------
  /** Per-message user logic (buffer/persist). */
  protected def onMessageReceived(msg: Message): Option[Status]
  /** Persist buffered work; called before the matching commit. */
  protected def onFlush(): Option[Status]
  /** Flush gate — default: every message (`pyconnectsink.py:274-286`). */
  protected def needFlush(): Boolean = true
  /** Idle callback (`pyconnectsink.py:148-154`). */
  protected def onNoMessageReceived(): Option[Status] = None
  protected def onErrorReceived(error: Throwable): Option[Status] = None

  /** Decode a Confluent-framed Avro payload by resolving the frame's
    * schema id against the broker registry (K3's deserializer role). */
  protected def decodeFramed(bytes: Array[Byte]): Any = {
    val (id, payload) = AvroCodec.unframe(bytes)
    val schemaJson = broker.schemaById(id).getOrElse(
      throw new IllegalStateException(s"unknown schema id $id (poison pill)"))
    AvroCodec.decode(payload, AvroCodec.parseable(schemaJson))
  }

  def hasPartitionAssignments: Boolean = consumer.assignment.nonEmpty
  def allPartitionsAtEof: Boolean =
    consumer.assignment.nonEmpty &&
      consumer.assignment.forall(tp => eofReached.getOrElse(tp, false))

  // ---- lifecycle -------------------------------------------------------
  override protected def beforeRunLoop(): Unit =
    consumer.subscribe(config.topics)

  override protected def runOnce(): Option[Status] = {
    val polled = consumer.poll(config.pollTimeout.toMillis)
    flushIfNeeded().orElse(dispatch(polled))
  }

  private def dispatch(polled: Poll): Option[Status] = polled match {
    case Poll.Record(msg) =>
      messageCount += 1
      val tp = TopicPartition(msg.topic, msg.partition)
      eofReached(tp) = false
      val res = onMessageReceived(msg)
      offsets(tp) = msg.offset + 1 // K5: +1 semantics
      res
    case Poll.Eof(tp, nextOffset) =>
      eofReached(tp) = true
      offsets.getOrElseUpdate(tp, nextOffset) // keep offset alive (K6)
      onEofReceived(tp)
    case Poll.NoMessage => onNoMessageReceived()
    case Poll.Failure(e) =>
      if (config.base.kafkaOpts.getOrElse("fail.fast", "true") == "true") {
        recordCrash(e); Some(Status.Crashed)
      } else onErrorReceived(e)
  }

  protected def onEofReceived(tp: TopicPartition): Option[Status] = None

  private def flushIfNeeded(): Option[Status] =
    if (needFlush()) doFlush() else None

  /** K9: user flush, then commit — commit skipped when flush crashed. */
  private def doFlush(): Option[Status] = {
    val res = onFlush()
    flushCount += 1
    if (res.contains(Status.Crashed)) res
    else commitWithRetry().orElse(res)
  }

  /** K10: bounded synchronous commit retry. */
  private def commitWithRetry(): Option[Status] = {
    if (offsets.isEmpty) return None
    var lastError: Throwable = null
    var attempt = 0
    while (attempt <= config.base.sinkCommitRetryCount) {
      try { consumer.commit(offsets.toMap); return None }
      catch { case t: Throwable => lastError = t; attempt += 1 }
    }
    recordCrash(lastError)
    Some(Status.Crashed)
  }

  /** K15: final flush on graceful stop, never when crashed. */
  override protected def afterRunLoop(): Unit =
    if (status == Status.Stopped) { doFlush(); () }

  private var closed = false
  override def close(): Unit = if (!closed) {
    closed = true
    consumer.close()
  }
}
