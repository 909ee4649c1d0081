package graft

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.sources.KafkaOptions

/** Config framework parity tests — port of the reference's
  * test_config.py behaviors (env loader, parsers, sanity failures,
  * unknown-key rejection) per SURVEY §5. */
class ConfigSpec extends AnyFunSuite {

  private val minimalSink = Map[String, Any](
    "bootstrap_servers" -> "localhost:9092",
    "schema_registry" -> "http://localhost:8081",
    "group_id" -> "g1",
    "topics" -> "t1, t2")

  test("sink config: defaults and parsing") {
    val c = SinkConfig.fromMap(minimalSink)
    assert(c.base.bootstrapServers == Seq("localhost:9092"))
    assert(c.topics == Seq("t1", "t2"))
    assert(c.pollTimeout == 2.seconds && !c.pollTimeoutDisabled)
    assert(c.base.offsetCommitInterval == 30.minutes)
    assert(c.base.sinkCommitRetryCount == 2)
    assert(c.base.hashSensitiveValues && c.base.unifyLogging)
  }

  test("unknown keys are rejected (config.py:439-440 parity)") {
    val e = intercept[ConfigException] {
      SinkConfig.fromMap(minimalSink + ("bootsrap_servers" -> "x:1"))
    }
    assert(e.getMessage.contains("bootsrap_servers"))
  }

  test("missing required key raises") {
    intercept[ConfigException] {
      SinkConfig.fromMap(minimalSink - "group_id")
    }
  }

  test("duration parser: '1h 30m' and units (config.py:43-70 parity)") {
    assert(Parsers.duration("1h 30m") == 90.minutes)
    assert(Parsers.duration("2w") == 14.days)
    assert(Parsers.duration("500ms") == 500.millis)
    assert(Parsers.duration("1m30s") == 90.seconds)
    intercept[ConfigException](Parsers.duration("xyz"))
    intercept[ConfigException](Parsers.duration("5 parsecs"))
  }

  test("csv line reader: quotes, escapes, strip (config.py:235-280)") {
    assert(Parsers.csvLine("a, b ,c") == Seq("a", "b", "c"))
    assert(Parsers.csvLine("'a,b', c") == Seq("a,b", "c"))
    assert(Parsers.csvLine("\"x, y\", z") == Seq("x, y", "z"))
    assert(Parsers.csvLine("a\\,b, c") == Seq("a,b", "c"))
    intercept[ConfigException](Parsers.csvLine("'unterminated"))
  }

  test("poll_timeout: -1 disables, 0 rejected (config.py:572 sanity)") {
    val c = SinkConfig.fromMap(minimalSink + ("poll_timeout" -> "-1"))
    assert(c.pollTimeoutDisabled)
    intercept[ConfigException] {
      SinkConfig.fromMap(minimalSink + ("poll_timeout" -> "0"))
    }
  }

  test("offset_commit_interval must be positive") {
    intercept[ConfigException] {
      SinkConfig.fromMap(minimalSink + ("offset_commit_interval" -> "0s"))
    }
  }

  test("url/host validation (config.py:73-146)") {
    intercept[ConfigException] {
      SinkConfig.fromMap(minimalSink + ("schema_registry" -> "not a url at all"))
    }
    intercept[ConfigException] {
      SinkConfig.fromMap(minimalSink + ("bootstrap_servers" -> "bad host:xx"))
    }
  }

  test("env loading with prefix, lower-cased (config.py:535-552)") {
    val env = Map(
      "GRAFT_BOOTSTRAP_SERVERS" -> "broker1:9092,broker2:9092",
      "GRAFT_SCHEMA_REGISTRY" -> "http://sr:8081",
      "GRAFT_GROUP_ID" -> "g",
      "GRAFT_TOPICS" -> "^prefix-.*",
      "UNRELATED" -> "ignored")
    val c = SinkConfig.fromEnv(env)
    assert(c.base.bootstrapServers == Seq("broker1:9092", "broker2:9092"))
    assert(c.isPatternSubscription)
  }

  test("json loading (config.py:509-533)") {
    val c = SourceConfig.fromJsonString(
      """{"bootstrap_servers": ["b:9092"], "schema_registry": "http://sr:8081",
        | "topic": "out", "offset_topic": "out-offsets",
        | "offset_commit_interval": "5m",
        | "kafka_opts": {"sasl.password": "hunter2"}}""".stripMargin)
    assert(c.topic == "out" && c.offsetTopic == "out-offsets")
    assert(c.base.offsetCommitInterval == 5.minutes)
    assert(c.base.kafkaOpts == Map("sasl.password" -> "hunter2"))
  }

  test("secret hiding: sensitive keys hashed or masked (core.py:28-56)") {
    val opts = Map("sasl.password" -> "hunter2", "client.id" -> "c1")
    val hashed = Secrets.hideSensitive(opts, hash = true)
    assert(hashed("client.id") == "c1")
    assert(hashed("sasl.password") != "hunter2")
    assert(hashed("sasl.password").matches("[0-9a-f]{64}"))
    // deterministic (same hash for same value — comparability)
    assert(Secrets.hideSensitive(opts, hash = true)("sasl.password") ==
      hashed("sasl.password"))
    val masked = Secrets.hideSensitive(opts, hash = false)
    assert(masked("sasl.password") == "****")
  }

  test("kafka option mapping for Spark readers/writers") {
    val c = SinkConfig.fromMap(minimalSink +
      ("kafka_opts" -> Map("security.protocol" -> "SASL_SSL")))
    val opts = KafkaOptions.forSink(c)
    assert(opts("subscribe") == "t1,t2")
    assert(opts("kafka.bootstrap.servers") == "localhost:9092")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("startingOffsets") == "earliest")
    val p = SinkConfig.fromMap(minimalSink + ("topics" -> "^logs-.*"))
    assert(KafkaOptions.forSink(p).contains("subscribePattern"))
  }

  test("kafka options: poll timeout mapping (config.py:572)") {
    // default 2s → 2000 ms poll budget
    val c = SinkConfig.fromMap(minimalSink)
    assert(KafkaOptions.forSink(c)("kafkaConsumer.pollTimeoutMs") == "2000")
    // -1 = block forever → no override of Spark's default
    val blocked = SinkConfig.fromMap(minimalSink + ("poll_timeout" -> "-1"))
    assert(!KafkaOptions.forSink(blocked).contains("kafkaConsumer.pollTimeoutMs"))
  }

  test("kafka options: source offset consumer (pyconnectsource.py:66-88)") {
    val c = SourceConfig.fromMap(Map[String, Any](
      "bootstrap_servers" -> "b:9092",
      "schema_registry" -> "http://sr:8081",
      "topic" -> "out", "offset_topic" -> "out-offsets",
      "kafka_consumer_opts" -> Map("session.timeout.ms" -> "9000")))
    val opts = KafkaOptions.forOffsetConsumer(c)
    assert(opts("kafka.group.id") == "out-offsets_fetcher")
    assert(opts("startingOffsets") == "latest")
    assert(opts("subscribe") == "out-offsets")
    assert(opts("kafka.session.timeout.ms") == "9000")
  }

  test("kafka option KEYS match the Spark structured-streaming-kafka " +
      "documented vocabulary (drift pin, verdict r6 item 8)") {
    // Key names from the public Spark 4.x "Structured Streaming + Kafka
    // Integration Guide". The connector silently IGNORES unknown
    // options, so a misspelled key would surface only as wrong runtime
    // behavior on a real cluster (no kafka jars ship in this image) —
    // this golden catches drift at test time instead. Client configs
    // must be `kafka.`-prefixed to reach the underlying consumer/
    // producer; everything unprefixed must be a documented
    // connector-level option.
    val readerKeys = Set(
      "assign", "subscribe", "subscribePattern",
      "startingOffsets", "startingOffsetsByTimestamp",
      "startingTimestamp", "endingOffsets", "endingOffsetsByTimestamp",
      "endingTimestamp", "failOnDataLoss",
      "kafkaConsumer.pollTimeoutMs", "fetchOffset.numRetries",
      "fetchOffset.retryIntervalMs", "maxOffsetsPerTrigger",
      "minOffsetsPerTrigger", "maxTriggerDelay", "minPartitions",
      "groupIdPrefix", "includeHeaders")
    val writerKeys = Set("topic", "includeHeaders")
    def pin(opts: Map[String, String], allowed: Set[String],
        ctx: String): Unit = opts.keys.foreach { k =>
      assert(k.startsWith("kafka.") || allowed.contains(k),
        s"$ctx: '$k' is neither kafka.-prefixed client passthrough nor " +
          "a documented Spark Kafka connector option — misspelled keys " +
          "are silently ignored at runtime")
    }
    // exercise every branch: plain + pattern subscription, finite +
    // disabled poll timeout, base/consumer/producer passthrough maps
    val sinkCfgs = Seq(
      SinkConfig.fromMap(minimalSink +
        ("kafka_opts" -> Map("security.protocol" -> "SASL_SSL")) +
        ("kafka_consumer_opts" -> Map("session.timeout.ms" -> "9000"))),
      SinkConfig.fromMap(minimalSink + ("topics" -> "^logs-.*")),
      SinkConfig.fromMap(minimalSink + ("poll_timeout" -> "-1")))
    sinkCfgs.foreach(c =>
      pin(KafkaOptions.forSink(c), readerKeys, "forSink(reader)"))
    val srcCfg = SourceConfig.fromMap(Map[String, Any](
      "bootstrap_servers" -> "b:9092",
      "schema_registry" -> "http://sr:8081",
      "topic" -> "out", "offset_topic" -> "out-offsets",
      "kafka_producer_opts" -> Map("linger.ms" -> "5")))
    pin(KafkaOptions.forSource(srcCfg), writerKeys, "forSource(writer)")
    pin(KafkaOptions.forOffsetConsumer(srcCfg), readerKeys,
      "forOffsetConsumer(reader)")
    // the two non-negotiable passthroughs reach the client layer
    assert(KafkaOptions.forSink(sinkCfgs.head)
      .contains("kafka.bootstrap.servers"))
    assert(KafkaOptions.forSource(srcCfg)
      .contains("kafka.bootstrap.servers"))
  }

  test("kafka_opts as a JSON string (config.py:426 json.loads parser)") {
    val c = SinkConfig.fromMap(minimalSink +
      ("kafka_opts" -> """{"sasl.password": "hunter2", "client.id": "c9"}"""))
    assert(c.base.kafkaOpts ==
      Map("sasl.password" -> "hunter2", "client.id" -> "c9"))
  }

  test("nested yaml: block-mapped kafka_opts (config.py:509-533)") {
    val f = java.nio.file.Files.createTempFile("graft-yaml", ".yaml")
    java.nio.file.Files.writeString(f,
      """# connector config
        |bootstrap_servers: [broker1:9092, broker2:9092]
        |schema_registry: "http://sr:8081"
        |group_id: g2
        |topics: t9
        |kafka_opts:
        |  sasl.password: 'hunter2'   # quoted scalar
        |  security.protocol: SASL_SSL
        |poll_timeout: 5
        |""".stripMargin)
    val c = SinkConfig.fromMap(Loaders.yamlFile(f.toString))
    assert(c.base.bootstrapServers == Seq("broker1:9092", "broker2:9092"))
    assert(c.base.kafkaOpts == Map(
      "sasl.password" -> "hunter2", "security.protocol" -> "SASL_SSL"))
    assert(c.pollTimeout == 5.seconds)
    java.nio.file.Files.delete(f)
  }

  test("nested yaml: deeper nesting and bad indent are hard errors") {
    intercept[ConfigException] {
      Loaders.parseYaml(Seq("a:", "  b:", "    c: 1"))
    }
    intercept[ConfigException] {
      Loaders.parseYaml(Seq("  orphan: 1"))
    }
    intercept[ConfigException] {
      Loaders.parseYaml(Seq("a:"))
    }
  }
}
