package graft.core

import scala.collection.mutable

/** Message-plane abstraction. The reference talks to Kafka through
  * confluent-kafka clients; offline this repo has no Kafka broker or
  * client jar, so connectors are written against this seam (exactly the
  * reference's own test strategy — its unit suite mocks the clients,
  * `test/test_pyconnectsink.py:30-32`). `InMemoryBroker` implements
  * partitioned, replayable, committed-offset semantics for tests;
  * `graft.sources.KafkaOptions` builds the real Spark Kafka options for
  * cluster deployments (SURVEY.md §2-A S13/K3 passthrough).
  */
final case class TopicPartition(topic: String, partition: Int)

final case class Message(
    key: Array[Byte], value: Array[Byte],
    topic: String, partition: Int, offset: Long) {
  /** `core.py:15-25` message_repr parity (minus error, carried in Poll). */
  def repr: String =
    s"Message(topic=$topic, partition=$partition, offset=$offset, " +
      s"key=${Option(key).map(_.length).getOrElse(0)}b, " +
      s"value=${Option(value).map(_.length).getOrElse(0)}b)"
}

/** Poll classification (`pyconnectsink.py:20-58`). */
sealed trait Poll
object Poll {
  final case class Record(msg: Message) extends Poll
  case object NoMessage extends Poll
  final case class Eof(tp: TopicPartition, nextOffset: Long) extends Poll
  final case class Failure(error: Throwable) extends Poll
}

trait TransportProducer {
  def produce(topic: String, key: Array[Byte], value: Array[Byte]): Unit
  def flush(): Unit
}

trait TransportConsumer {
  def subscribe(topics: Seq[String]): Unit
  def poll(timeoutMs: Long): Poll
  def commit(offsets: Map[TopicPartition, Long]): Unit
  def committed(tp: TopicPartition): Option[Long]
  def assignment: Seq[TopicPartition]
  /** Read the last record currently in a single-partition topic (the
    * reference's source-offset fetch, `pyconnectsource.py:96-110`). */
  def lastMessage(topic: String): Option[Message]
  def close(): Unit
}

/** Single-process broker with per-partition logs, consumer-group commits,
  * and partition-EOF signalling (enable.partition.eof parity). */
final class InMemoryBroker(numPartitions: Int = 1) {
  private val logs =
    mutable.Map[TopicPartition, mutable.ArrayBuffer[(Array[Byte], Array[Byte])]]()
  private val committedOffsets = mutable.Map[(String, TopicPartition), Long]()
  private val schemas = mutable.Map[Int, String]()

  /** In-memory stand-in for the Confluent schema registry: id ↔ schema
    * JSON, so sinks can resolve the frame's schema id (SURVEY §7.4.1). */
  def registerSchema(id: Int, json: String): Unit =
    synchronized { schemas(id) = json }
  def schemaById(id: Int): Option[String] = synchronized(schemas.get(id))

  private def log(tp: TopicPartition) =
    synchronized(logs.getOrElseUpdate(tp, mutable.ArrayBuffer.empty))

  def partitionsOf(topic: String): Seq[TopicPartition] = synchronized {
    val existing = logs.keys.filter(_.topic == topic).toSeq
    if (existing.nonEmpty) existing.sortBy(_.partition)
    else (0 until numPartitions).map(TopicPartition(topic, _))
  }

  def append(topic: String, key: Array[Byte], value: Array[Byte]): Unit = {
    val partition =
      if (numPartitions == 1) 0
      else math.floorMod(
        Option(key).map(java.util.Arrays.hashCode).getOrElse(0), numPartitions)
    // append must happen inside the broker monitor: a producer flush()
    // racing a consumer poll()/read() would otherwise mutate the
    // ArrayBuffer unsynchronized (resize corruption)
    synchronized { log(TopicPartition(topic, partition)) += ((key, value)) }
  }

  def endOffset(tp: TopicPartition): Long = synchronized(log(tp).length.toLong)

  def read(tp: TopicPartition, offset: Long): Option[Message] = synchronized {
    val l = log(tp)
    if (offset >= 0 && offset < l.length) {
      val (k, v) = l(offset.toInt)
      Some(Message(k, v, tp.topic, tp.partition, offset))
    } else None
  }

  def commit(group: String, tp: TopicPartition, offset: Long): Unit =
    synchronized { committedOffsets((group, tp)) = offset }

  def committed(group: String, tp: TopicPartition): Option[Long] =
    synchronized(committedOffsets.get((group, tp)))

  def producer(): TransportProducer = new TransportProducer {
    private val pending = mutable.ArrayBuffer[(String, Array[Byte], Array[Byte])]()
    // async produce + flush barrier, like the reference's librdkafka
    // producer (`pyconnectsource.py:163-175`, flush at `:236-238`)
    def produce(topic: String, key: Array[Byte], value: Array[Byte]): Unit =
      synchronized(pending += ((topic, key, value)))
    def flush(): Unit = synchronized {
      pending.foreach { case (t, k, v) => append(t, k, v) }
      pending.clear()
    }
  }

  def consumer(group: String): TransportConsumer = new TransportConsumer {
    private var tps: Seq[TopicPartition] = Nil
    private val positions = mutable.Map[TopicPartition, Long]()
    private val eofSignalled = mutable.Set[TopicPartition]()
    private var closed = false

    def subscribe(topics: Seq[String]): Unit = {
      tps = topics.flatMap(partitionsOf)
      tps.foreach { tp =>
        // auto.offset.reset=earliest unless a commit exists (K3 parity)
        positions(tp) = InMemoryBroker.this.committed(group, tp).getOrElse(0L)
      }
    }

    def poll(timeoutMs: Long): Poll = {
      require(!closed, "consumer closed")
      // round-robin across assigned partitions; EOF signalled once per
      // catch-up, re-armed when new data arrives (partition-EOF parity)
      tps.find(tp => read(tp, positions(tp)).isDefined) match {
        case Some(tp) =>
          val msg = read(tp, positions(tp)).get
          positions(tp) += 1
          eofSignalled -= tp
          Poll.Record(msg)
        case None =>
          tps.find(tp => !eofSignalled.contains(tp)) match {
            case Some(tp) =>
              eofSignalled += tp
              Poll.Eof(tp, positions(tp))
            case None => Poll.NoMessage
          }
      }
    }

    def commit(offsets: Map[TopicPartition, Long]): Unit =
      offsets.foreach { case (tp, off) =>
        InMemoryBroker.this.commit(group, tp, off)
      }

    def committed(tp: TopicPartition): Option[Long] =
      InMemoryBroker.this.committed(group, tp)

    def assignment: Seq[TopicPartition] = tps

    def lastMessage(topic: String): Option[Message] = {
      val parts = partitionsOf(topic)
      parts.flatMap(tp => read(tp, endOffset(tp) - 1)).lastOption
    }

    def close(): Unit = closed = true // double-close tolerated
  }
}
