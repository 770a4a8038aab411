package graft

import graft.operators.FilterRegistry
import graft.queries.{Repl, SlackGateway}

class SlackGatewaySpec extends SparkSpec {

  test("+share routes to the channel and is stripped from the command") {
    var seen: String = null
    val r = SlackGateway.handle("count docs +share", "alice", "logging") {
      cmd => seen = cmd; "42\n"
    }
    assert(seen == "count docs")
    assert(r.destination == "#logging")
    assert(r.text == "```42\n```")
  }

  test("unshared responses DM the user; DM-origin shares stay a DM") {
    val dm = SlackGateway.handle("count docs", "bob", "logging")(_ => "1\n")
    assert(dm.destination == "@bob")
    val dmShare = SlackGateway.handle("count docs +share", "bob", "@bob")(_ => "1\n")
    assert(dmShare.destination == "@bob")
  }

  test("output over 12 KiB truncates with the reference marker") {
    val big = (1 to 2000).map(i => s"line-$i-padding-padding-padding").mkString("\n")
    val r = SlackGateway.handle("cat docs", "u", "c")(_ => big)
    assert(r.text.contains(SlackGateway.TruncationMarker))
    // chars excluding newlines stop at the limit plus one line overshoot
    val bodyLines = r.text.stripPrefix("```").stripSuffix("```").linesIterator.toSeq
    assert(bodyLines.last == SlackGateway.TruncationMarker)
    val chars = bodyLines.init.map(_.length.toLong).sum
    assert(chars >= SlackGateway.ResponseCharLimit)
    assert(chars < SlackGateway.ResponseCharLimit + 200,
      s"overshoot beyond one line: $chars")
  }

  test("short output is not truncated") {
    val r = SlackGateway.handle("count docs", "u", "c")(_ => "small\n")
    assert(!r.text.contains(SlackGateway.TruncationMarker))
    assert(r.text == "```small\n```")
  }

  test("gateway executes real console commands through a Repl session") {
    val session = new Repl.Session(spark, sfDir, new FilterRegistry(None))
    val r = SlackGateway.handle("count docs +share", "alice", "ops")(session.exec)
    assert(r.destination == "#ops")
    // count over the sf0.001 documents table: one numeric line + footer
    val body = r.text.stripPrefix("```").stripSuffix("```")
    assert(body.linesIterator.next().trim.forall(_.isDigit))
    assert(body.contains("row(s) shown"))
  }

  test("errors surface as ERR lines, still fenced") {
    val session = new Repl.Session(spark, sfDir, new FilterRegistry(None))
    val r = SlackGateway.handle("select * from nosuch", "alice", "ops")(session.exec)
    assert(r.text.startsWith("```"))
    assert(r.text.contains("ERR"))
  }
}
