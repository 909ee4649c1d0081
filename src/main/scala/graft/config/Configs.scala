package graft.config

import scala.concurrent.duration._

/** Config framework — reference parity with pyconnect's `config.py`
  * (SURVEY.md §2-A F1–F9).
  *
  * Semantics replicated from the reference:
  *  - required `bootstrap_servers` + `schema_registry`, validated URLs
  *    (`config.py:73-146`);
  *  - defaults: `offset_commit_interval` 30 min, `sink_commit_retry_count`
  *    2, `hash_sensitive_values` true, `unify_logging` true, empty
  *    `kafka_opts` (`config.py:354-443`);
  *  - unknown keys are a hard error (`config.py:439-440`) — typo safety;
  *  - parsers apply only to string-typed values (`config.py:445-478`);
  *  - sanity checks as plain predicates (`require`), deliberately NOT the
  *    reference's AST-filtered `eval` mechanism (`config.py:149-224`) —
  *    SURVEY §2-A F3 calls for predicate parity, not the eval machinery;
  *  - duration strings like "1h 30m" (`config.py:43-70`);
  *  - quote/escape-aware comma splitting for list values
  *    (`config.py:235-280`);
  *  - env loading with a prefix, lower-cased keys (`config.py:535-552`);
  *  - JSON string/file loading (`config.py:509-533`) via a minimal flat
  *    JSON object parser (offline: no JSON library on the compile path).
  */
final case class ConfigException(message: String)
    extends RuntimeException(message)

object Parsers {

  private val unitMs: Map[String, Long] = Map(
    "us" -> 0L, // sub-ms truncates to 0 ms, kept for input compatibility
    "ms" -> 1L, "s" -> 1000L, "m" -> 60000L, "h" -> 3600000L,
    "d" -> 86400000L, "w" -> 604800000L)

  /** "1h 30m" / "2 w" / "500ms" → FiniteDuration (`config.py:43-70`). */
  def duration(s: String): FiniteDuration = {
    val token = "(\\d+)\\s*(us|ms|s|m|h|d|w)".r
    val trimmed = s.trim
    val matches = token.findAllMatchIn(trimmed).toSeq
    val consumed = matches.map(_.matched.replaceAll("\\s", "")).mkString
    if (matches.isEmpty || consumed != trimmed.replaceAll("\\s", ""))
      throw ConfigException(s"cannot parse duration: '$s'")
    matches.map { m =>
      val n = m.group(1).toLong
      val u = m.group(2)
      if (u == "us") (n / 1000).millis else (n * unitMs(u)).millis
    }.foldLeft(0.millis: FiniteDuration)(_ + _)
  }

  /** Char-by-char CSV-ish splitter with quote/escape/strip — config-string
    * splitting only, NOT a data-plane CSV reader (`config.py:235-280`). */
  def csvLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Option[Char] = None
    var escaped = false
    line.foreach { c =>
      if (escaped) { cur += c; escaped = false }
      else if (c == '\\') escaped = true
      else if (quote.contains(c)) quote = None
      else if (quote.isEmpty && (c == '"' || c == '\'')) quote = Some(c)
      else if (quote.isEmpty && c == ',') { out += cur.result().trim; cur.clear() }
      else cur += c
    }
    if (quote.nonEmpty || escaped)
      throw ConfigException(s"unterminated quote/escape in: '$line'")
    out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }

  def bool(s: String): Boolean = s.trim.toLowerCase match {
    case "true" | "1" | "yes" | "y" => true
    case "false" | "0" | "no" | "n" => false
    case other => throw ConfigException(s"cannot parse boolean: '$other'")
  }

  /** host[:port] validation for bootstrap servers (`config.py:86-109`). */
  private val hostRe =
    "^(?:[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?\\.)*[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?(?::\\d{1,5})?$".r

  def requireHost(s: String): String = {
    if (hostRe.findFirstIn(s).isEmpty)
      throw ConfigException(s"invalid host: '$s'")
    s
  }

  /** URL validation for the schema registry (`config.py:73-85,112-146`). */
  private val urlRe =
    "^(?:[a-z][a-z0-9+.-]*://)?(?:[^@/\\s]+@)?[a-zA-Z0-9.-]+(?::\\d{1,5})?(?:/\\S*)?$".r

  def requireUrl(s: String): String = {
    if (urlRe.findFirstIn(s).isEmpty)
      throw ConfigException(s"invalid url: '$s'")
    s
  }

  /** Minimal flat JSON object parser: string/number/bool/null values and
    * flat arrays of strings/numbers. Enough for connector configs. */
  def flatJson(s: String): Map[String, Any] = {
    var i = 0
    def err(msg: String) = throw ConfigException(s"json: $msg at $i")
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); if (i >= s.length || s(i) != c) err(s"expected '$c'"); i += 1 }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) {
          i += 1
          b += (s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'u' =>
              val h = s.substring(i + 1, i + 5); i += 4
              Integer.parseInt(h, 16).toChar
            case other => other
          })
        } else b += s(i)
        i += 1
      }
      expect('"')
      b.result()
    }
    def value(): Any = {
      ws()
      if (i >= s.length) err("eof")
      s(i) match {
        case '"' => str()
        case '[' =>
          i += 1; ws()
          val items = Seq.newBuilder[Any]
          if (s(i) != ']') {
            items += value(); ws()
            while (s(i) == ',') { i += 1; items += value(); ws() }
          }
          expect(']'); items.result()
        case '{' =>
          i += 1; ws()
          val m = Map.newBuilder[String, Any]
          if (s(i) != '}') {
            val k = str(); expect(':'); m += (k -> value()); ws()
            while (s(i) == ',') {
              i += 1; ws(); val k2 = str(); expect(':'); m += (k2 -> value()); ws()
            }
          }
          expect('}'); m.result()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ =>
          val start = i
          while (i < s.length && "+-.eE0123456789".contains(s(i))) i += 1
          val t = s.substring(start, i)
          if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble
          else t.toLong
      }
    }
    ws()
    value() match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => err("top-level must be an object")
    }
  }
}

/** Mutable pop-style reader so subclasses consume their keys first and the
  * base verifies nothing is left — replicating the reference's
  * unknown-key rejection (`config.py:429-443`). */
final class ConfigReader(input: Map[String, Any]) {
  private var kv: Map[String, Any] = input

  def popString(key: String): Option[String] =
    pop(key).map(_.toString)

  def popRequiredString(key: String): String =
    popString(key).getOrElse(
      throw ConfigException(s"missing required config key: '$key'"))

  def popList(key: String): Option[Seq[String]] = pop(key).map {
    case s: String => Parsers.csvLine(s)
    case xs: Seq[_] => xs.map(_.toString)
    case other => throw ConfigException(s"'$key' is not a list: $other")
  }

  def popBool(key: String, default: Boolean): Boolean = pop(key) match {
    case Some(s: String) => Parsers.bool(s)
    case Some(b: Boolean) => b
    case Some(other) => throw ConfigException(s"'$key' not boolean: $other")
    case None => default
  }

  def popInt(key: String, default: Int): Int = pop(key) match {
    case Some(s: String) => s.trim.toInt
    case Some(n: Long) => n.toInt
    case Some(n: Int) => n
    case Some(other) => throw ConfigException(s"'$key' not an int: $other")
    case None => default
  }

  def popDuration(key: String, default: FiniteDuration): FiniteDuration =
    pop(key) match {
      case Some(s: String) => Parsers.duration(s)
      case Some(n: Long) => n.seconds
      case Some(other) => throw ConfigException(s"'$key' not a duration: $other")
      case None => default
    }

  def popMap(key: String): Map[String, String] = pop(key) match {
    case Some(m: Map[_, _]) =>
      m.map { case (k, v) => k.toString -> v.toString }
    // string form parsed as JSON — `config.py:426` (`"kafka_opts": json.loads`)
    case Some(s: String) =>
      Parsers.flatJson(s).map { case (k, v) => k -> v.toString }
    case Some(other) => throw ConfigException(s"'$key' not a map: $other")
    case None => Map.empty
  }

  private def pop(key: String): Option[Any] = {
    val v = kv.get(key)
    kv -= key
    v.filter(_ != null)
  }

  /** `config.py:439-440`: leftovers are a hard error. */
  def assertConsumed(): Unit =
    if (kv.nonEmpty)
      throw ConfigException(
        s"unknown config keys: ${kv.keys.toSeq.sorted.mkString(", ")}")
}

final case class BaseSettings(
    bootstrapServers: Seq[String],
    schemaRegistry: String,
    offsetCommitInterval: FiniteDuration,
    sinkCommitRetryCount: Int,
    hashSensitiveValues: Boolean,
    unifyLogging: Boolean,
    kafkaOpts: Map[String, String])

object BaseSettings {
  def pop(r: ConfigReader): BaseSettings = {
    val servers = r.popList("bootstrap_servers").getOrElse(
      throw ConfigException("missing required config key: 'bootstrap_servers'"))
    servers.foreach(Parsers.requireHost)
    val registry = Parsers.requireUrl(r.popRequiredString("schema_registry"))
    val interval = r.popDuration("offset_commit_interval", 30.minutes)
    val retries = r.popInt("sink_commit_retry_count", 2)
    val cfg = BaseSettings(
      bootstrapServers = servers,
      schemaRegistry = registry,
      offsetCommitInterval = interval,
      sinkCommitRetryCount = retries,
      hashSensitiveValues = r.popBool("hash_sensitive_values", true),
      unifyLogging = r.popBool("unify_logging", true),
      kafkaOpts = r.popMap("kafka_opts"))
    // sanity pipeline (`config.py:433-434` checks, as plain predicates)
    if (interval <= 0.millis)
      throw ConfigException("offset_commit_interval must be > 0")
    if (retries < 0)
      throw ConfigException("sink_commit_retry_count must be >= 0")
    cfg
  }
}

/** Sink config (`config.py:555-579`): consumer group, topic list (first
  * element may be a ^regex), poll timeout (−1 = no timeout). */
final case class SinkConfig(
    base: BaseSettings,
    groupId: String,
    topics: Seq[String],
    pollTimeout: FiniteDuration,
    pollTimeoutDisabled: Boolean,
    kafkaConsumerOpts: Map[String, String]) {
  def isPatternSubscription: Boolean = topics.exists(_.startsWith("^"))
}

object SinkConfig {
  def fromMap(m: Map[String, Any]): SinkConfig = {
    val r = new ConfigReader(m)
    val groupId = r.popRequiredString("group_id")
    val topics = r.popList("topics").getOrElse(
      throw ConfigException("missing required config key: 'topics'"))
    val rawTimeout = r.popString("poll_timeout")
    val consumerOpts = r.popMap("kafka_consumer_opts")
    val base = BaseSettings.pop(r)
    r.assertConsumed()
    val (timeout, disabled) = rawTimeout match {
      case Some("-1") => (0.seconds, true)
      case Some(s) =>
        val n = s.trim.toLong
        // sanity `config.py:572`: == -1 or > 0
        if (n <= 0) throw ConfigException("poll_timeout must be -1 or > 0")
        (n.seconds, false)
      case None => (2.seconds, false)
    }
    SinkConfig(base, groupId, topics, timeout, disabled, consumerOpts)
  }

  def fromEnv(env: Map[String, String], prefix: String = "GRAFT_"): SinkConfig =
    fromMap(Loaders.envToMap(env, prefix))

  def fromJsonString(json: String): SinkConfig =
    fromMap(Parsers.flatJson(json))
}

/** Source config (`config.py:582-601`): target topic + offset topic. */
final case class SourceConfig(
    base: BaseSettings,
    topic: String,
    offsetTopic: String,
    kafkaConsumerOpts: Map[String, String],
    kafkaProducerOpts: Map[String, String])

object SourceConfig {
  def fromMap(m: Map[String, Any]): SourceConfig = {
    val r = new ConfigReader(m)
    val topic = r.popRequiredString("topic")
    val offsetTopic = r.popRequiredString("offset_topic")
    val consumerOpts = r.popMap("kafka_consumer_opts")
    val producerOpts = r.popMap("kafka_producer_opts")
    val base = BaseSettings.pop(r)
    r.assertConsumed()
    SourceConfig(base, topic, offsetTopic, consumerOpts, producerOpts)
  }

  def fromEnv(env: Map[String, String], prefix: String = "GRAFT_"): SourceConfig =
    fromMap(Loaders.envToMap(env, prefix))

  def fromJsonString(json: String): SourceConfig =
    fromMap(Parsers.flatJson(json))
}

object Loaders {
  /** Env loading (`config.py:535-552`): filter prefix, strip, lower-case. */
  def envToMap(env: Map[String, String], prefix: String): Map[String, Any] =
    env.collect {
      case (k, v) if k.startsWith(prefix) =>
        k.stripPrefix(prefix).toLowerCase -> (v: Any)
    }

  def jsonFile(path: String): Map[String, Any] =
    Parsers.flatJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** YAML subset: `key: value` lines, `#` comments, quoted strings,
    * `[a, b]` inline lists, and ONE level of block nesting for
    * `kafka_opts`-style maps (`config.py:509-517` loads arbitrary YAML via
    * yaml.safe_load; nested `kafka_opts` dicts are the shape its configs
    * actually use — offline container → no YAML library, so this parses
    * that subset directly). */
  def yamlFile(path: String): Map[String, Any] = parseYaml(
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray.map(_.toString).toSeq)

  private def scalar(raw: String): Any =
    if (raw.startsWith("[") && raw.endsWith("]"))
      Parsers.csvLine(raw.substring(1, raw.length - 1)): Any
    else if (raw.startsWith("\"") && raw.endsWith("\"") && raw.length >= 2)
      raw.substring(1, raw.length - 1)
    else if (raw.startsWith("'") && raw.endsWith("'") && raw.length >= 2)
      raw.substring(1, raw.length - 1)
    else raw

  def parseYaml(rawLines: Seq[String]): Map[String, Any] = {
    // (indent, key, rawValue) for each non-blank, non-comment line
    val entries = rawLines.iterator
      .map(l => (l.takeWhile(_ == ' ').length, l.takeWhile(_ != '#').trim))
      .filter(_._2.nonEmpty)
      .map { case (indent, line) =>
        val idx = line.indexOf(':')
        if (idx < 0) throw ConfigException(s"yaml: no ':' in '$line'")
        (indent, line.take(idx).trim, line.drop(idx + 1).trim)
      }
      .toSeq
    val out = Map.newBuilder[String, Any]
    var i = 0
    while (i < entries.length) {
      val (indent, k, raw) = entries(i)
      if (indent > 0)
        throw ConfigException(s"yaml: unexpected indent at '$k'")
      if (raw.isEmpty) {
        // block map: consume following more-indented `key: scalar` lines
        val nested = Map.newBuilder[String, Any]
        var j = i + 1
        while (j < entries.length && entries(j)._1 > 0) {
          val (_, nk, nraw) = entries(j)
          if (nraw.isEmpty)
            throw ConfigException(
              s"yaml: only one nesting level supported (at '$nk')")
          nested += (nk -> scalar(nraw))
          j += 1
        }
        val m = nested.result()
        if (m.isEmpty)
          throw ConfigException(s"yaml: empty value for '$k'")
        out += (k -> m)
        i = j
      } else {
        out += (k -> scalar(raw))
        i += 1
      }
    }
    out.result()
  }
}

/** Secret hiding for config logging (`core.py:28-56`): the sensitive keys
  * are either PBKDF2-hashed (so operators can still compare values across
  * hosts) or masked outright. */
object Secrets {
  val SensitiveKeys: Set[String] = Set(
    "sasl.password", "sasl.username", "ssl.key.password",
    "ssl.keystore.password", "basic.auth.user.info")

  def pbkdf2(value: String, salt: String = "graft"): String = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      value.toCharArray, salt.getBytes("UTF-8"), 1000, 256)
    val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(spec).getEncoded.map("%02x".format(_)).mkString
  }

  def hideSensitive(opts: Map[String, String],
      hash: Boolean): Map[String, String] =
    opts.map { case (k, v) =>
      if (SensitiveKeys.contains(k.toLowerCase))
        k -> (if (hash) pbkdf2(v) else "****")
      else k -> v
    }
}
