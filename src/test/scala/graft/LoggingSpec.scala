package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.config.Logging

/** F10 unified logging — reference parity for the pure pieces
  * (/root/reference/src/pyconnect/config.py:283-351 semantics): falsy
  * parsing, env resolution, the handler format line, serialize mode,
  * the level gate, and the JUL intercept bridge. */
class LoggingSpec extends AnyFunSuite {

  test("truthy: the reference's exact falsy set {0,f,n,false,no}, " +
      "case-insensitive; everything else true") {
    for (f <- Seq("0", "f", "n", "false", "no", "F", "No", "FALSE",
        " false ")) assert(!Logging.truthy(f), f)
    for (t <- Seq("1", "t", "y", "true", "yes", "", "anything"))
      assert(Logging.truthy(t), t)
  }

  test("fromEnv defaults: level DEBUG, colorize OFF, serialize ON " +
      "(the reference's configure_logging defaults)") {
    val cfg = Logging.fromEnv(Map.empty)
    assert(cfg.level == "DEBUG" && !cfg.colorize && cfg.serialize)
    val cfg2 = Logging.fromEnv(Map(
      "GRAFT_LOG_LEVEL" -> "WARNING",
      "GRAFT_LOG_COLORIZE" -> "yes",
      "GRAFT_LOG_SERIALIZE" -> "no"))
    assert(cfg2.level == "WARNING" && cfg2.colorize && !cfg2.serialize)
    assert(cfg2.threshold == 30)
  }

  test("formatLine golden: LEVEL<8 | DD_MM HH:mm:ss | " +
      "thread:name:function:line | 'message'") {
    val at = Instant.parse("2024-03-05T14:07:09Z")
    val got = Logging.formatLine("info", at, "main",
      "graft.core.GraftSink", "poll", 42, "flushed 10 records")
    assert(got == "INFO     | 05_03 14:07:09 | " +
      "main :graft.core.GraftSink:poll:42 | 'flushed 10 records'")
  }

  test("serializeLine golden: one flat JSON object per line, " +
      "deterministic key order, escaped message") {
    val at = Instant.parse("2024-03-05T14:07:09Z")
    val got = Logging.serializeLine("ERROR", at, "worker-1",
      "graft.X", "run", 7, "bad \"value\"\nnext")
    assert(got == """{"level":"ERROR","time":"05_03 14:07:09",""" +
      """"thread":"worker-1","name":"graft.X","function":"run",""" +
      """"line":7,"message":"bad \"value\"\nnext"}""")
  }

  test("level gate: WARNING threshold drops INFO, passes ERROR; " +
      "serialize off emits the human format") {
    val buf = new ByteArrayOutputStream()
    Logging.configureForTest(
      Logging.LogConfig("WARNING", colorize = false,
        serialize = false, useStderr = false),
      new PrintStream(buf, true, "UTF-8"))
    try {
      Logging.info("should be dropped")
      Logging.error("kept")
      val out = buf.toString("UTF-8")
      assert(!out.contains("should be dropped"))
      assert(out.contains("| 'kept'") && out.startsWith("ERROR"))
    } finally Logging.configureForTest(
      Logging.fromEnv(Map.empty), System.out)
  }

  test("JUL intercept bridge: third-party java.util.logging records " +
      "re-emit through the unified sink with mapped levels") {
    val buf = new ByteArrayOutputStream()
    Logging.configureForTest(
      Logging.LogConfig("DEBUG", colorize = false,
        serialize = true, useStderr = false),
      new PrintStream(buf, true, "UTF-8"))
    try {
      val h = new Logging.InterceptHandler
      h.publish(new java.util.logging.LogRecord(
        java.util.logging.Level.WARNING, "jul says hi"))
      h.publish(new java.util.logging.LogRecord(
        java.util.logging.Level.FINE, "jul debug detail"))
      val out = buf.toString("UTF-8")
      assert(out.contains(""""level":"WARNING"""") &&
        out.contains("jul says hi"))
      assert(out.contains(""""level":"DEBUG"""") &&
        out.contains("jul debug detail"))
    } finally Logging.configureForTest(
      Logging.fromEnv(Map.empty), System.out)
  }

  test("JUL intercept bridge substitutes {0}-style parameters and " +
      "forwards the thrown stack trace (advice r11 — Python " +
      "record.getMessage() parity)") {
    val buf = new ByteArrayOutputStream()
    Logging.configureForTest(
      Logging.LogConfig("DEBUG", colorize = false,
        serialize = false, useStderr = false),
      new PrintStream(buf, true, "UTF-8"))
    try {
      val h = new Logging.InterceptHandler
      val rec = new java.util.logging.LogRecord(
        java.util.logging.Level.WARNING, "commit {0} failed after {1}ms")
      rec.setParameters(Array[AnyRef]("tx-7", Integer.valueOf(250)))
      h.publish(rec)
      val rec2 = new java.util.logging.LogRecord(
        java.util.logging.Level.SEVERE, "boom")
      rec2.setThrown(new IllegalStateException("broken pipe"))
      h.publish(rec2)
      val out = buf.toString("UTF-8")
      assert(out.contains("commit tx-7 failed after 250ms"), out)
      assert(out.contains("boom") &&
        out.contains("IllegalStateException") &&
        out.contains("broken pipe"), out)
    } finally Logging.configureForTest(
      Logging.fromEnv(Map.empty), System.out)
  }

  test("unknown level names fall back to INFO and still log — never " +
      "silently dropped at severity 0 (advice r11; the reference " +
      "falls back to the numeric stdlib level)") {
    val buf = new ByteArrayOutputStream()
    Logging.configureForTest(
      Logging.LogConfig("INFO", colorize = false,
        serialize = false, useStderr = false),
      new PrintStream(buf, true, "UTF-8"))
    try {
      Logging.log("NOTICE", "custom-level record")
      val out = buf.toString("UTF-8")
      assert(out.contains("custom-level record"), out)
    } finally Logging.configureForTest(
      Logging.fromEnv(Map.empty), System.out)
  }

  test("julLevelName maps the JUL scale onto the reference levels") {
    import java.util.logging.Level._
    assert(Logging.julLevelName(SEVERE) == "ERROR")
    assert(Logging.julLevelName(WARNING) == "WARNING")
    assert(Logging.julLevelName(INFO) == "INFO")
    assert(Logging.julLevelName(FINE) == "DEBUG")
    assert(Logging.julLevelName(FINEST) == "TRACE")
  }
}
