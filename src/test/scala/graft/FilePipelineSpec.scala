package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.FileConnectorCli
import graft.streaming.FilePipeline

/** Spark-native streaming file pipeline: drain, checkpoint resume, and
  * the E3 CLI argument surface. */
class FilePipelineSpec extends SparkSpecBase {

  test("single-file mode drains available input and appends JSON lines") {
    val inDir = Files.createTempDirectory("fp-in")
    val out = Files.createTempFile("fp-out", ".jsonl")
    val ckpt = Files.createTempDirectory("fp-ckpt")
    Files.write(inDir.resolve("a.json"),
      Seq("""{"k": "a", "v": 1}""", """{"k": "b", "v": 2}""").asJava)
    FilePipeline.run(spark, inDir.toString, out.toString, ckpt.toString,
      singleFile = true)
    val lines = Files.readAllLines(out).asScala
    assert(lines.size == 2)
    assert(lines.exists(_.contains("\"k\":\"a\"")))
  }

  test("checkpoint resume: restart processes only new files (S7 parity)") {
    val inDir = Files.createTempDirectory("fp2-in")
    val out = Files.createTempFile("fp2-out", ".jsonl")
    val ckpt = Files.createTempDirectory("fp2-ckpt")
    Files.write(inDir.resolve("a.json"), Seq("""{"k": "a", "v": 1}""").asJava)
    FilePipeline.run(spark, inDir.toString, out.toString, ckpt.toString,
      singleFile = true)
    assert(Files.readAllLines(out).size == 1)
    // second run with SAME checkpoint: nothing new → nothing appended
    FilePipeline.run(spark, inDir.toString, out.toString, ckpt.toString,
      singleFile = true)
    assert(Files.readAllLines(out).size == 1)
    // new file arrives → only it is processed
    Files.write(inDir.resolve("b.json"), Seq("""{"k": "b", "v": 2}""").asJava)
    FilePipeline.run(spark, inDir.toString, out.toString, ckpt.toString,
      singleFile = true)
    val lines = Files.readAllLines(out).asScala
    assert(lines.size == 2)
  }

  test("default sink is distributed: executor-written directory, " +
      "exactly-once across restarts, no driver collect") {
    val inDir = Files.createTempDirectory("fpd-in")
    val outDir = Files.createTempDirectory("fpd-out")
    val ckpt = Files.createTempDirectory("fpd-ckpt")
    Files.write(inDir.resolve("a.json"),
      Seq("""{"k": "a", "v": 1}""", """{"k": "b", "v": 2}""").asJava)
    FilePipeline.run(spark, inDir.toString, outDir.toString, ckpt.toString)
    def readOut() = spark.read.json(outDir.toString)
    assert(readOut().count() == 2)
    // the file sink's _spark_metadata commit log exists → the directory
    // was written by the distributed sink, not a driver-side append
    assert(Files.exists(outDir.resolve("_spark_metadata")))
    // restart with same checkpoint: nothing new → nothing duplicated
    FilePipeline.run(spark, inDir.toString, outDir.toString, ckpt.toString)
    assert(readOut().count() == 2)
    // new file arrives → exactly the new rows appear
    Files.write(inDir.resolve("b.json"), Seq("""{"k": "c", "v": 3}""").asJava)
    FilePipeline.run(spark, inDir.toString, outDir.toString, ckpt.toString)
    assert(readOut().count() == 3)
    assert(readOut().where(col("k") === "c").count() == 1)
  }

  test("pipeline applies transforms before the sink") {
    val inDir = Files.createTempDirectory("fp3-in")
    val out = Files.createTempFile("fp3-out", ".jsonl")
    val ckpt = Files.createTempDirectory("fp3-ckpt")
    Files.write(inDir.resolve("a.json"),
      Seq("""{"k": "a", "v": 1}""", """{"k": "b", "v": 2}""").asJava)
    FilePipeline.run(spark, inDir.toString, out.toString, ckpt.toString,
      transform = _.filter(col("v") > 1), singleFile = true)
    val lines = Files.readAllLines(out).asScala
    assert(lines.size == 1 && lines.head.contains("\"k\":\"b\""))
  }

  test("CLI args: modes, config kinds, validation errors (E3)") {
    val a = FileConnectorCli.parseArgs(Array("source", "--file", "x.jsonl",
      "--config", "env", "--loglevel", "WARN"))
    assert(a.mode == "source" && a.config == "env" && a.logLevel == "WARN")
    intercept[IllegalArgumentException](
      FileConnectorCli.parseArgs(Array("source", "--file", "x",
        "--config", "toml")))
    intercept[IllegalArgumentException](
      FileConnectorCli.parseArgs(Array("source", "--file", "x",
        "--config", "json"))) // missing --conf_file
    intercept[IllegalArgumentException](
      FileConnectorCli.parseArgs(Array("--file", "x"))) // no mode
    intercept[IllegalArgumentException](
      FileConnectorCli.parseArgs(Array("source", "--file", "x", "--bogus")))
  }

  test("CLI config loading: env, json, yaml all produce the same config") {
    val env = Map(
      "GRAFT_BOOTSTRAP_SERVERS" -> "b:9092",
      "GRAFT_SCHEMA_REGISTRY" -> "http://sr:8081",
      "GRAFT_TOPIC" -> "t", "GRAFT_OFFSET_TOPIC" -> "t-off")
    val json = Files.createTempFile("cfg", ".json")
    Files.writeString(json,
      """{"bootstrap_servers": "b:9092", "schema_registry": "http://sr:8081",
        |"topic": "t", "offset_topic": "t-off"}""".stripMargin)
    val yaml = Files.createTempFile("cfg", ".yaml")
    Files.writeString(yaml,
      """# connector config
        |bootstrap_servers: b:9092
        |schema_registry: http://sr:8081
        |topic: t
        |offset_topic: t-off""".stripMargin)
    def cfg(kind: String, file: Option[java.nio.file.Path]) =
      graft.config.SourceConfig.fromMap(FileConnectorCli.loadConfigMap(
        FileConnectorCli.Args("source", "x", kind, file.map(_.toString),
          "INFO"), env))
    val fromEnv = cfg("env", None)
    val fromJson = cfg("json", Some(json))
    val fromYaml = cfg("yaml", Some(yaml))
    assert(fromEnv == fromJson && fromJson == fromYaml)
  }
}
