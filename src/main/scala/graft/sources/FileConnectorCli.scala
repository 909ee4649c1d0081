package graft.sources

import graft.config.{Loaders, Parsers, SinkConfig, SourceConfig}
import graft.core.InMemoryBroker

/** CLI entry points for the file connectors — reference parity with the
  * example `main`s (SURVEY §2-A E3: `--config env|yaml|json`,
  * `--conf_file`, `--loglevel`).
  *
  * Usage (spark-submit style):
  *   graft.sources.FileConnectorCli source --file in.jsonl --config env
  *   graft.sources.FileConnectorCli sink --file out.jsonl \
  *     --config json --conf_file cfg.json
  */
object FileConnectorCli {

  final case class Args(
      mode: String, file: String, config: String,
      confFile: Option[String], logLevel: String)

  def parseArgs(argv: Array[String]): Args = {
    var mode = ""
    var file = ""
    var config = "env"
    var confFile: Option[String] = None
    var logLevel = "INFO"
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "source" | "sink" | "pipe" if mode.isEmpty => mode = argv(i)
        case "--file" => i += 1; file = argv(i)
        case "--config" => i += 1
          argv(i) match {
            case m @ ("env" | "yaml" | "json") => config = m
            case other => throw new IllegalArgumentException(
              s"--config must be env|yaml|json, got '$other'")
          }
        case "--conf_file" => i += 1; confFile = Some(argv(i))
        case "--loglevel" => i += 1; logLevel = argv(i)
        case other => throw new IllegalArgumentException(
          s"unknown argument '$other'")
      }
      i += 1
    }
    require(mode.nonEmpty, "first argument must be 'source' or 'sink'")
    require(file.nonEmpty, "--file is required")
    if (config != "env")
      require(confFile.isDefined, s"--config $config requires --conf_file")
    Args(mode, file, config, confFile, logLevel)
  }

  def loadConfigMap(a: Args,
      env: Map[String, String] = sys.env): Map[String, Any] = a.config match {
    case "env" => Loaders.envToMap(env, "GRAFT_")
    case "json" => Parsers.flatJson(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(a.confFile.get)), "UTF-8"))
    case "yaml" => Loaders.yamlFile(a.confFile.get)
  }

  def main(argv: Array[String]): Unit = {
    // F10 parity: the reference CLI configures unified logging first,
    // on stderr, so piped stdout stays machine-readable
    // (config.py:301-306 rationale).
    graft.config.Logging.configureLogging(useStderr = true)
    val a = parseArgs(argv)
    val cfgMap = loadConfigMap(a)
    // single-process broker: the offline transport seam (a Kafka-backed
    // deployment swaps this for the Spark Kafka options, KafkaOptions).
    // Because the broker is in-memory, `source`/`sink` alone only make
    // sense embedded; `pipe` runs source → topic → sink in one process
    // (file is "in>out"), the runnable end-to-end form.
    val broker = new InMemoryBroker()
    a.mode match {
      case "source" =>
        new FileSource(a.file, SourceConfig.fromMap(cfgMap), broker).run()
      case "sink" =>
        new FileSink(a.file, SinkConfig.fromMap(cfgMap), broker).run()
      case "pipe" =>
        val Array(in, out) = a.file.split(">", 2)
        val srcCfg = SourceConfig.fromMap(cfgMap)
        new FileSource(in, srcCfg, broker).run()
        val sinkCfg = SinkConfig.fromMap(Map[String, Any](
          "bootstrap_servers" -> srcCfg.base.bootstrapServers,
          "schema_registry" -> srcCfg.base.schemaRegistry,
          "group_id" -> "cli-pipe", "topics" -> srcCfg.topic))
        new FileSink(out, sinkCfg, broker).run()
        println(s"[graft] piped $in -> ${srcCfg.topic} -> $out")
    }
  }
}
