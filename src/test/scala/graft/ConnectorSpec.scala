package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{SinkConfig, SourceConfig}
import graft.core._
import graft.sources.{FileSink, FileSource}

/** Connector state-machine + at-least-once behaviors, ported from the
  * reference's mocked connector tests (SURVEY §5: test_pyconnectsink.py /
  * test_pyconnectsource.py via ConnectTestMixin). */
class ConnectorSpec extends AnyFunSuite {

  private def sinkConfig(topics: String = "t") = SinkConfig.fromMap(Map(
    "bootstrap_servers" -> "localhost:9092",
    "schema_registry" -> "http://localhost:8081",
    "group_id" -> "g", "topics" -> topics))

  private def sourceConfig(topic: String = "t") = SourceConfig.fromMap(Map(
    "bootstrap_servers" -> "localhost:9092",
    "schema_registry" -> "http://localhost:8081",
    "topic" -> topic, "offset_topic" -> s"$topic-offsets"))

  /** List-backed test source (the reference's PyConnectTestSource,
    * test/utils.py:167-241). */
  private class TestSource(records: Seq[(Any, Any)], broker: InMemoryBroker,
      cfg: SourceConfig = sourceConfig())
      extends GraftSource(cfg, broker) {
    private var idx = 0
    var seeked: Option[Any] = None
    def read(): Option[(Any, Any)] =
      if (idx < records.length) { idx += 1; Some(records(idx - 1)) } else None
    def seek(index: Any): Unit = { seeked = Some(index); idx = index match {
      case n: Long => n.toInt
      case n: Int => n
      case _ => 0
    } }
    def getIndex: Any = idx.toLong
    override protected def onEof(): Option[Status] = Some(Status.Stopped)
  }

  /** Buffer/flush recorder sink (the reference's PyConnectTestSink,
    * test/utils.py:244-302). */
  private class TestSink(broker: InMemoryBroker, flushInterval: Int = 1,
      topics: String = "t", cfg: SinkConfig = null)
      extends GraftSink(Option(cfg).getOrElse(sinkConfig(topics)), broker) {
    val received = mutable.ArrayBuffer[Any]()
    val flushedBatches = mutable.ArrayBuffer[Seq[Any]]()
    private val pending = mutable.ArrayBuffer[Any]()
    var failNextFlush = false
    var maxIterations = 200 // reference safety limit (test/utils.py:41-164)

    protected def onMessageReceived(msg: Message): Option[Status] = {
      val v = decodeFramed(msg.value)
      received += v; pending += v; None
    }
    override protected def needFlush(): Boolean =
      received.size % flushInterval == 0
    protected def onFlush(): Option[Status] = {
      if (failNextFlush && pending.nonEmpty) {
        failNextFlush = false; sys.error("flush failed")
      }
      if (pending.nonEmpty) { flushedBatches += pending.toSeq; pending.clear() }
      None
    }
    override protected def onNoMessageReceived(): Option[Status] =
      if (hasPartitionAssignments && allPartitionsAtEof) Some(Status.Stopped)
      else None
    override protected def runOnce(): Option[Status] = {
      maxIterations -= 1
      if (maxIterations < 0) sys.error("loop safety limit hit")
      super.runOnce()
    }
  }

  private def produce(broker: InMemoryBroker, n: Int,
      topic: String = "t"): Seq[String] = {
    new TestSource((0 until n).map(i => (s"k$i", s"v$i")), broker,
      sourceConfig(topic)).run()
    (0 until n).map(i => s"v$i")
  }

  test("source: produces all records then stops at EOF (S1/S11)") {
    val broker = new InMemoryBroker()
    val src = new TestSource(Seq(("k1", "v1"), ("k2", "v2")), broker)
    src.run()
    assert(src.status == Status.Stopped)
    assert(src.produceCount == 2)
    assert(broker.endOffset(TopicPartition("t", 0)) == 2)
  }

  test("source: periodic offset commits during the run loop (F1 interval)") {
    val broker = new InMemoryBroker()
    val cfg = SourceConfig.fromMap(Map(
      "bootstrap_servers" -> "localhost:9092",
      "schema_registry" -> "http://localhost:8081",
      "topic" -> "t", "offset_topic" -> "t-offsets",
      "offset_commit_interval" -> "1ms"))
    val src = new TestSource(
      (0 until 5).map(i => (s"k$i", s"v$i")), broker, cfg) {
      override def read(): Option[(Any, Any)] = {
        Thread.sleep(2) // ensure the 1ms interval elapses between reads
        super.read()
      }
    }
    src.run()
    // offset topic received commits DURING the run, not only the final one
    assert(broker.endOffset(TopicPartition("t-offsets", 0)) > 1)
  }

  test("source: commits offset on close; restart seeks past it (S7/S10)") {
    val broker = new InMemoryBroker()
    val records = Seq[(Any, Any)](("a", "1"), ("b", "2"), ("c", "3"))
    new TestSource(records, broker).run() // commits index 3 on close
    val second = new TestSource(records, broker)
    second.run()
    assert(second.seeked.contains(3L)) // resumed where the first stopped
    assert(second.produceCount == 0)   // nothing re-produced
  }

  test("sink: receives everything, commit-after-flush (K5/K9)") {
    val broker = new InMemoryBroker()
    val expected = produce(broker, 5)
    val sink = new TestSink(broker)
    sink.run()
    assert(sink.status == Status.Stopped)
    assert(sink.received.toSeq == expected)
    assert(broker.committed("g", TopicPartition("t", 0)).contains(5L))
  }

  test("sink: no commit when flush crashes (K9, test_pyconnectsink.py:93-110)") {
    val broker = new InMemoryBroker()
    produce(broker, 3)
    val sink = new TestSink(broker)
    sink.failNextFlush = true
    intercept[RuntimeException](sink.run())
    assert(sink.status == Status.Crashed)
    // the crashed flush happened after 1 message; its offset must NOT be
    // committed (at-least-once: replay on restart)
    assert(broker.committed("g", TopicPartition("t", 0)).isEmpty)
  }

  test("sink: crash then restart replays uncommitted messages (at-least-once)") {
    val broker = new InMemoryBroker()
    val expected = produce(broker, 4)
    val first = new TestSink(broker, flushInterval = 2)
    first.failNextFlush = true
    intercept[RuntimeException](first.run())
    val second = new TestSink(broker, flushInterval = 1)
    second.run()
    // set-equality across the crash, duplicates allowed
    // (test_sink_integration.py:92-107 semantics)
    assert((first.received ++ second.received).toSet == expected.toSet)
    assert(second.received.nonEmpty)
  }

  test("sink: final flush happens exactly once on graceful stop (K15)") {
    val broker = new InMemoryBroker()
    produce(broker, 2)
    val sink = new TestSink(broker, flushInterval = 100) // gate never fires
    sink.run()
    assert(sink.status == Status.Stopped)
    assert(sink.flushedBatches.map(_.size).sum == 2) // drained by final flush
  }

  test("connector: finished connectors cannot be restarted (C2)") {
    val broker = new InMemoryBroker()
    val src = new TestSource(Nil, broker)
    src.run()
    intercept[IllegalArgumentException](src.run())
  }

  test("connector: crash hook can resurrect the loop (C5)") {
    val broker = new InMemoryBroker()
    var crashes = 0
    val src = new TestSource(Seq(("k", "v")), broker) {
      private var thrown = false
      override def read(): Option[(Any, Any)] = {
        if (!thrown) { thrown = true; sys.error("transient") }
        super.read()
      }
      override protected def onCrashDuringRun(): Option[Status] = {
        crashes += 1; Some(Status.Running)
      }
    }
    src.run()
    assert(crashes == 1 && src.status == Status.Stopped)
    assert(src.produceCount == 1)
  }

  test("connector: CRASHED without exception raises NoCrashInfo (C3)") {
    val broker = new InMemoryBroker()
    val src = new TestSource(Nil, broker) {
      override protected def runOnce(): Option[Status] = Some(Status.Crashed)
    }
    intercept[NoCrashInfo](src.run())
  }

  // the reference parametrizes integration tests over 1/2/4 partitions
  // (test/conftest.py:143-166) — same sweep against the in-memory broker
  for (parts <- Seq(1, 2, 4)) {
    test(s"sink drains a $parts-partition topic completely (per-partition EOF)") {
      val broker = new InMemoryBroker(numPartitions = parts)
      val expected = produce(broker, 12)
      val sink = new TestSink(broker)
      sink.run()
      assert(sink.status == Status.Stopped)
      // multiset equality across partitions (order interleaves)
      assert(sink.received.groupBy(identity).view.mapValues(_.size).toMap ==
        expected.groupBy(identity).view.mapValues(_.size).toMap)
      // every partition's offset committed at its end
      (0 until parts).foreach { p =>
        val tp = TopicPartition("t", p)
        assert(broker.committed("g", tp).contains(broker.endOffset(tp)))
      }
    }
  }

  /** Consumer wrapper that yields one Failure before delegating. */
  private class FailingOnce(inner: TransportConsumer) extends TransportConsumer {
    private var failed = false
    def subscribe(topics: Seq[String]): Unit = inner.subscribe(topics)
    def poll(timeoutMs: Long): Poll =
      if (!failed) { failed = true; Poll.Failure(new RuntimeException("transient")) }
      else inner.poll(timeoutMs)
    def commit(o: Map[TopicPartition, Long]): Unit = inner.commit(o)
    def committed(tp: TopicPartition): Option[Long] = inner.committed(tp)
    def assignment: Seq[TopicPartition] = inner.assignment
    def lastMessage(topic: String): Option[Message] = inner.lastMessage(topic)
    def close(): Unit = inner.close()
  }

  test("sink: failfast policy crashes on transport error (K14 default)") {
    val broker = new InMemoryBroker()
    produce(broker, 2)
    val sink = new TestSink(broker) {
      override protected def makeConsumer() =
        new FailingOnce(broker.consumer(config.groupId))
    }
    intercept[RuntimeException](sink.run())
    assert(sink.status == Status.Crashed)
  }

  test("sink: permissive policy tolerates transport errors (K14 option)") {
    val broker = new InMemoryBroker()
    val expected = produce(broker, 2)
    val permissiveCfg = SinkConfig.fromMap(Map(
      "bootstrap_servers" -> "localhost:9092",
      "schema_registry" -> "http://localhost:8081",
      "group_id" -> "g", "topics" -> "t",
      "kafka_opts" -> Map("fail.fast" -> "false")))
    val sink = new TestSink(broker, cfg = permissiveCfg) {
      override protected def makeConsumer() =
        new FailingOnce(broker.consumer("g"))
    }
    sink.run()
    assert(sink.status == Status.Stopped)
    assert(sink.received.toSeq == expected) // error skipped, stream drained
  }

  test("file source → file sink end-to-end round trip (E1/E2)") {
    val broker = new InMemoryBroker()
    val in = Files.createTempFile("graft-src", ".jsonl")
    val out = Files.createTempFile("graft-sink", ".jsonl")
    Files.write(in, Seq(
      """{"key": "k1", "value": {"a": "x", "b": 1}}""",
      """{"key": "k2", "value": {"a": "y", "b": 2}}""").asJava)
    new FileSource(in.toString, sourceConfig("files"), broker).run()
    val sink = new FileSink(out.toString, sinkConfig("files"), broker)
    sink.run()
    val lines = Files.readAllLines(out).asScala
    assert(lines.size == 2)
    assert(lines.head.contains("\"a\": \"x\"") && lines.head.contains("\"b\": 1"))
    assert(sink.status == Status.Stopped)
  }

  test("file source: offset survives restart, no duplicate production (E1)") {
    val broker = new InMemoryBroker()
    val in = Files.createTempFile("graft-src", ".jsonl")
    Files.write(in, Seq(
      """{"key": "k1", "value": "v1"}""",
      """{"key": "k2", "value": "v2"}""").asJava)
    new FileSource(in.toString, sourceConfig("files2"), broker).run()
    assert(broker.endOffset(TopicPartition("files2", 0)) == 2)
    // restart over the same (unchanged) file: seek to EOF, produce nothing
    new FileSource(in.toString, sourceConfig("files2"), broker).run()
    assert(broker.endOffset(TopicPartition("files2", 0)) == 2)
  }

  // ----------------------------------------------------- chaos property

  /** Consumer decorator injecting the chaos the reference exercises via
    * mock call-order assertions (test_pyconnectsink.py): commit
    * failures (transient — absorbed by K10 retry — or persistent →
    * crash) and a mid-run REBALANCE (revoke + reassign ≡ re-subscribe:
    * the in-memory position falls back to the last committed offset,
    * the at-least-once replay hazard). */
  private class ChaosConsumer(inner: TransportConsumer,
      var commitFailures: Int, rebalanceAtPoll: Option[Int],
      topics: Seq[String]) extends TransportConsumer {
    private var polls = 0
    def subscribe(ts: Seq[String]): Unit = inner.subscribe(ts)
    def poll(timeoutMs: Long): Poll = {
      polls += 1
      if (rebalanceAtPoll.contains(polls)) inner.subscribe(topics)
      inner.poll(timeoutMs)
    }
    def commit(offsets: Map[TopicPartition, Long]): Unit = {
      if (commitFailures > 0) {
        commitFailures -= 1; sys.error("commit failed (chaos)")
      }
      inner.commit(offsets)
    }
    def committed(tp: TopicPartition): Option[Long] = inner.committed(tp)
    def assignment: Seq[TopicPartition] = inner.assignment
    def lastMessage(topic: String): Option[Message] =
      inner.lastMessage(topic)
    def close(): Unit = inner.close()
  }

  private class ChaosSink(broker: InMemoryBroker, flushInterval: Int,
      failFlushAtMsg: Option[Int], commitFailures: Int,
      rebalanceAtPoll: Option[Int], flushedUnion: mutable.Set[String])
      extends GraftSink(sinkConfig(), broker) {
    private val pending = mutable.ArrayBuffer[String]()
    private var flushCrashArmed = failFlushAtMsg
    private var seen = 0
    private var iterations = 0
    override protected def makeConsumer(): TransportConsumer =
      new ChaosConsumer(broker.consumer(config.groupId),
        commitFailures, rebalanceAtPoll, config.topics)
    protected def onMessageReceived(msg: Message): Option[Status] = {
      seen += 1; pending += decodeFramed(msg.value).toString; None
    }
    override protected def needFlush(): Boolean =
      seen > 0 && seen % flushInterval == 0
    protected def onFlush(): Option[Status] = {
      if (flushCrashArmed.exists(_ <= seen) && pending.nonEmpty) {
        flushCrashArmed = None; sys.error("flush failed (chaos)")
      }
      // a SUCCESSFUL flush persists: only now may these records be
      // covered by a commit (K9's at-least-once contract)
      flushedUnion ++= pending; pending.clear(); None
    }
    override protected def onNoMessageReceived(): Option[Status] =
      if (hasPartitionAssignments && allPartitionsAtEof)
        Some(Status.Stopped)
      else None
    override protected def runOnce(): Option[Status] = {
      iterations += 1
      if (iterations > 500) sys.error("loop safety limit hit")
      super.runOnce()
    }
  }

  test("CHAOS PROPERTY (round-12, verdict r11): random interleavings " +
      "of produce / flush-crash / commit-failure / mid-run rebalance " +
      "across restarts preserve at-least-once — a committed offset is " +
      "NEVER ahead of the flushed set, and a final clean incarnation " +
      "drains every produced record") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    case class Phase(produceN: Int, flushInterval: Int,
      failFlushAt: Option[Int], commitFailures: Int,
      rebalanceAtPoll: Option[Int])
    val phase: Gen[Phase] = for {
      n <- Gen.choose(0, 5)
      fi <- Gen.choose(1, 3)
      ff <- Gen.option(Gen.choose(1, 5))
      // 0 = healthy, 1 = transient (absorbed by K10 retry),
      // 99 = persistent (this incarnation crashes on commit)
      cf <- Gen.frequency(4 -> Gen.const(0), 2 -> Gen.const(1),
        1 -> Gen.const(99))
      rb <- Gen.option(Gen.choose(1, 8))
    } yield Phase(n, fi, ff, cf, rb)
    val scenario: Gen[List[Phase]] = Gen.choose(1, 4)
      .flatMap(k => Gen.listOfN(k, phase))
    val prop = Prop.forAll(scenario) { phases =>
      val broker = new InMemoryBroker()
      val flushedUnion = mutable.Set[String]()
      var produced = 0
      def committedOffset: Long =
        broker.committed("g", TopicPartition("t", 0)).getOrElse(0L)
      def produceMore(n: Int, tag: Int): Unit = if (n > 0) {
        val cfg = SourceConfig.fromMap(Map(
          "bootstrap_servers" -> "localhost:9092",
          "schema_registry" -> "http://localhost:8081",
          "topic" -> "t", "offset_topic" -> s"t-offsets-$tag"))
        new TestSource((produced until produced + n)
          .map(i => (s"k$i", s"v$i")), broker, cfg).run()
        produced += n
      }
      var invariant = true
      phases.zipWithIndex.foreach { case (ph, i) =>
        produceMore(ph.produceN, i)
        val sink = new ChaosSink(broker, ph.flushInterval,
          ph.failFlushAt, ph.commitFailures, ph.rebalanceAtPoll,
          flushedUnion)
        try sink.run() catch { case _: RuntimeException => () }
        // K9 invariant after EVERY incarnation, crashed or not:
        // committed ⇒ previously flushed
        invariant &&= (0L until committedOffset)
          .forall(o => flushedUnion.contains(s"v$o"))
      }
      // final clean incarnation drains everything that was produced
      produceMore(1, 1000) // ensure at least one record exists overall
      val fin = new ChaosSink(broker, 1, None, 0, None, flushedUnion)
      fin.run()
      invariant &&
        committedOffset == produced.toLong &&
        (0 until produced).forall(i => flushedUnion.contains(s"v$i"))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
