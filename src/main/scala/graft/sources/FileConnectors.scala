package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable

import graft.config.{Parsers, SinkConfig, SourceConfig}
import graft.core._

/** JSON-lines file connectors — reference parity with the example
  * connectors (SURVEY.md §2-A E1/E2).
  *
  * FileSource (`examples/file_source/file_source.py:34-72`): one JSON
  * object `{"key": …, "value": …}` per line; the source offset is the
  * byte position (`file.tell()`), seek() repositions, EOF stops the
  * connector (the example's behavior, vs the framework's default
  * tail-and-retry).
  *
  * FileSink (`examples/file_sink/file_sink.py:34-67`): buffers decoded
  * messages, appends them as JSON lines on flush, stops once every
  * assigned partition reached EOF.
  */
final class FileSource(path: String, config: SourceConfig,
    broker: InMemoryBroker) extends GraftSource(config, broker) {

  private val file = new RandomAccessFile(path, "r")

  def read(): Option[(Any, Any)] = {
    val line = file.readLine()
    if (line == null) None // EOF → StopIteration parity
    else {
      val obj = Parsers.flatJson(line)
      Some((obj.getOrElse("key", null), obj.getOrElse("value", null)))
    }
  }

  def seek(index: Any): Unit = index match {
    case pos: Long => file.seek(pos)
    case pos: Int => file.seek(pos.toLong)
    case other => throw new IllegalArgumentException(s"bad offset: $other")
  }

  def getIndex: Any = file.getFilePointer

  /** The example file source stops at EOF rather than tailing. */
  override protected def onEof(): Option[Status] = Some(Status.Stopped)

  override def close(): Unit = { super.close(); file.close() }
}

final class FileSink(path: String, config: SinkConfig,
    broker: InMemoryBroker) extends GraftSink(config, broker) {

  private val buffer = mutable.ArrayBuffer[String]()
  val flushed = mutable.ArrayBuffer[String]()

  protected def onMessageReceived(msg: Message): Option[Status] = {
    // values are Confluent-framed Avro; decode via the broker registry and
    // render as a JSON line (the reference sink's output format)
    val key = Option(msg.key).map(decodeFramed).orNull
    val value = decodeFramed(msg.value)
    buffer += s"""{"key": ${Json.render(key)}, "value": ${Json.render(value)}}"""
    None
  }

  /** Flush every `flushInterval` messages (the reference test sink's
    * gate, `test/utils.py:280-281`), default every message. */
  protected def onFlush(): Option[Status] = {
    if (buffer.nonEmpty) {
      Files.write(Paths.get(path),
        (buffer.mkString("", "\n", "\n")).getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      flushed ++= buffer
      buffer.clear()
    }
    None
  }

  /** Stop once everything is drained (`examples/file_sink:63-67`). */
  override protected def onNoMessageReceived(): Option[Status] =
    if (hasPartitionAssignments && allPartitionsAtEof) Some(Status.Stopped)
    else None
}

/** Spark Structured Streaming Kafka option builder (SURVEY §2-A S13/K3):
  * maps connector configs onto `readStream`/`writeStream` options with
  * `kafka.`-prefixed client passthrough. Requires the spark-sql-kafka
  * connector jar at deploy time (not shipped in this offline image); the
  * option mapping itself is unit-tested. */
object KafkaOptions {

  def forSink(config: SinkConfig): Map[String, String] = {
    val subscribeKey =
      if (config.isPatternSubscription) "subscribePattern" else "subscribe"
    val poll =
      // poll_timeout −1 = "block forever" (config.py:572) → keep Spark's
      // default; otherwise map onto the consumer poll budget
      if (config.pollTimeoutDisabled) Map.empty[String, String]
      else Map("kafkaConsumer.pollTimeoutMs" ->
        config.pollTimeout.toMillis.toString)
    Map(
      "kafka.bootstrap.servers" -> config.base.bootstrapServers.mkString(","),
      subscribeKey -> config.topics.map(_.stripPrefix("^")).mkString(","),
      "startingOffsets" -> "earliest", // auto.offset.reset=earliest (K3)
      "kafka.group.id" -> config.groupId,
      "failOnDataLoss" -> "true"
    ) ++ poll ++
      config.base.kafkaOpts.map { case (k, v) => s"kafka.$k" -> v } ++
      config.kafkaConsumerOpts.map { case (k, v) => s"kafka.$k" -> v }
  }

  def forSource(config: SourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> config.base.bootstrapServers.mkString(","),
      "topic" -> config.topic
    ) ++ config.base.kafkaOpts.map { case (k, v) => s"kafka.$k" -> v } ++
      config.kafkaProducerOpts.map { case (k, v) => s"kafka.$k" -> v }

  /** Options for reading the reference source's offset topic — group
    * `<offset_topic>_fetcher`, latest offsets (`pyconnectsource.py:66-88`).
    * On Spark, progress normally lives in the checkpoint; this exists for
    * operational parity when inspecting a migrated pipeline's offsets. */
  def forOffsetConsumer(config: SourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> config.base.bootstrapServers.mkString(","),
      "kafka.group.id" -> s"${config.offsetTopic}_fetcher",
      "startingOffsets" -> "latest",
      "subscribe" -> config.offsetTopic
    ) ++ config.base.kafkaOpts.map { case (k, v) => s"kafka.$k" -> v } ++
      config.kafkaConsumerOpts.map { case (k, v) => s"kafka.$k" -> v }
}
