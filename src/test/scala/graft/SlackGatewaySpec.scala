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

  // --- the HTTP transport (SlackHttp): a real socket round trip ---

  private def post(port: Int, body: String): (Int, String) = {
    val conn = new java.net.URI(s"http://127.0.0.1:$port/slack/command")
      .toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    val os = conn.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = new String(is.readAllBytes(), "UTF-8")
    (code, text)
  }

  test("SlackHttp: full slash-command round trip over a real socket") {
    val srv = graft.queries.SlackHttp.start(0, token = "s3cret") {
      cmd => s"ran:$cmd\n"
    }
    try {
      val (code, body) = post(srv.port,
        "token=s3cret&user_name=alice&channel_name=ops&text=" +
          java.net.URLEncoder.encode("count docs +share", "UTF-8"))
      assert(code == 200, body)
      assert(body.contains("\"channel\":\"#ops\""), body)
      // +share stripped before execution, output fenced
      assert(body.contains("ran:count docs"), body)
      assert(body.contains("```"), body)
    } finally srv.stop()
  }

  test("SlackHttp: a wrong token is 403 and the command never executes") {
    var executed = false
    val srv = graft.queries.SlackHttp.start(0, token = "s3cret") {
      _ => executed = true; "x"
    }
    try {
      val (code, body) = post(srv.port,
        "token=WRONG&user_name=a&channel_name=c&text=count")
      assert(code == 403, body)
      assert(!executed, "handler ran despite token mismatch")
      val (code2, _) = post(srv.port, "user_name=a&channel_name=c&text=count")
      assert(code2 == 403, "missing token must reject too")
    } finally srv.stop()
  }

  test("SlackHttp: an oversized body is 413 and the command never executes") {
    // the handler must bound its buffering (r13 ADVICE) — a payload
    // past MaxBodyBytes is rejected before the token check or any exec
    var executed = false
    val srv = graft.queries.SlackHttp.start(0, token = "s3cret") {
      _ => executed = true; "x"
    }
    try {
      val big = "token=s3cret&text=" +
        "x" * (graft.queries.SlackHttp.MaxBodyBytes + 1024)
      val (code, body) = post(srv.port, big)
      assert(code == 413, s"$code $body")
      assert(!executed, "handler ran despite oversized body")
      // a normal-sized request still works on the same server
      val (code2, _) = post(srv.port,
        "token=s3cret&user_name=a&channel_name=c&text=count")
      assert(code2 == 200)
    } finally srv.stop()
  }

  test("SlackHttp: form decoding handles URL-encoded fields") {
    assert(graft.queries.SlackHttp.parseForm(
      "a=1&b=x%20y%2Bz&empty=&flag") ==
      Map("a" -> "1", "b" -> "x y+z", "empty" -> "", "flag" -> ""))
  }

  // --- Repl session conveniences (cli/cloudpelican-lsd.go:204-220) ---

  test("Repl session: history / clearhistory / save / clearsession") {
    val dir = java.nio.file.Files.createTempDirectory("replsess")
    val sessFile = dir.resolve("session.txt").toString
    val reg = new FilterRegistry(None)
    val s1 = new Repl.Session(spark, sfDir, reg, sessionPath = Some(sessFile))
    s1.exec("count docs")
    s1.exec("show filters")
    val h = s1.exec("history")
    // numbered from 0, includes the history command itself (the
    // reference appends before dispatch)
    assert(h.linesIterator.toSeq == Seq("0 count docs", "1 show filters", "2 history"), h)
    assert(s1.exec("save") == "Saved session\n")
    // a new session over the same file restores the history
    val s2 = new Repl.Session(spark, sfDir, reg, sessionPath = Some(sessFile))
    assert(s2.exec("history").startsWith("0 count docs"), "history not restored")
    // clearsession wipes history AND temp filters; named filters survive
    reg.create("keepme", "spark")
    reg.createTemp("err.r")
    assert(reg.list().exists(_.temp))
    assert(s2.exec("clearsession") == "Cleared session\n")
    assert(!reg.list().exists(_.temp), "temp filters survived clearsession")
    assert(reg.list().exists(_.name == "keepme"), "named filter must survive")
    assert(s2.exec("history").linesIterator.toSeq == Seq("0 history"))
    // clearhistory empties too
    s2.exec("count docs")
    assert(s2.exec("clearhistory") == "Cleared history\n")
    assert(s2.exec("history").linesIterator.toSeq == Seq("0 history"))
    // without a session file, save reports the missing config loudly
    val s3 = new Repl.Session(spark, sfDir, reg)
    assert(s3.exec("save").startsWith("ERR"))
  }
}
