package graft

import graft.functions.LogFunctions._
import org.apache.spark.sql.functions._

class LogFunctionsSpec extends SparkSpec {

  private def one(raw: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(raw).toDF("x").select(c).head().get(0)
  }

  test("normalizeRaw truncates >4096 chars with .. suffix (ParseBolt.java:62-66)") {
    val long = "a" * 5000
    val got = one(long, normalizeRaw(col("x"))).asInstanceOf[String]
    assert(got.length == 4098 && got.endsWith("..") && got.startsWith("aaaa"))
    assert(one("short", normalizeRaw(col("x"))) == "short")
    assert(one("  padded  ", normalizeRaw(col("x"))) == "padded")
  }

  test("ISO8601 sniff: 3-digit millis parse (LogTypeSniffer.java:20)") {
    val ts = one("2015-07-20T11:35:41.851+02:00 host1 kernel: up",
      parseIsoTs(col("x"))).asInstanceOf[java.sql.Timestamp]
    assert(ts.toInstant.toString == "2015-07-20T09:35:41.851Z")
  }

  test("ISO8601 sniff: >3-digit millis fixup (LogTypeSniffer.java:35-46)") {
    val ts = one("2015-07-20T11:35:42.123456+02:00 host2 app: x",
      parseIsoTs(col("x"))).asInstanceOf[java.sql.Timestamp]
    assert(ts.toInstant.toString == "2015-07-20T09:35:42.123Z")
  }

  test("no timestamp → null from parse, now() fallback from tsOrNow (ParseBolt.java:81-84)") {
    assert(one("no timestamp here", parseIsoTs(col("x"))) == null)
    assert(one("no timestamp here", tsOrNow(col("x"))) != null)
  }

  test("bucket arithmetic = ts - ts % step in epoch seconds") {
    import spark.implicits._
    val got = Seq("2024-01-02T03:04:05.000+00:00").toDF("x")
      .select(graft.functions.LogFunctions.bucket(parseIsoTs(col("x")), 300)).head().getLong(0)
    assert(got == 1704164400L + 245 - 245 % 300)
    assert(got % 300 == 0)
  }

  test("error lexicon contains (ErrorClassifierBolt.java:44)") {
    assert(one("Connection TIMED OUT after 30s", containsErrorWord(col("x"))) == true)
    assert(one("HTTP 404 not found", containsErrorWord(col("x"))) == true)
    assert(one("all good here", containsErrorWord(col("x"))) == false)
  }

  test("duration literals (cli/cloudpelican-lsd.go:723-747)") {
    assert(parseDuration("90") == 90L)
    assert(parseDuration("10s") == 10L)
    assert(parseDuration("5m") == 300L)
    assert(parseDuration("2h") == 7200L)
    assert(parseDuration("1d") == 86400L)
  }
}
