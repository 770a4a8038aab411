package graft

import graft.operators.FilterRegistry
import org.scalatest.funsuite.AnyFunSuite

class FilterRegistrySpec extends AnyFunSuite {

  test("create / list / drop round-trip with JSON persistence") {
    val path = java.nio.file.Files.createTempDirectory("reg").resolve("filters.json").toString
    val reg = new FilterRegistry(Some(path))
    val f = reg.create("errors", "error", "127.0.0.1:9999")
    assert(f.id.length == 36) // UUID (F12)
    assert(reg.byName("errors").contains(f))
    // fresh instance reloads from disk (BoltDB-equivalent durability)
    val reg2 = new FilterRegistry(Some(path))
    assert(reg2.byName("errors").map(_.regex).contains("error"))
    assert(reg2.drop(f.id))
    assert(new FilterRegistry(Some(path)).list().isEmpty)
  }

  test("persistence round-trips backslash and control characters exactly") {
    val path = java.nio.file.Files.createTempDirectory("reg2").resolve("f.json").toString
    val reg = new FilterRegistry(Some(path))
    val regex = """\\n \d+ x""" // backslash-pair + regex escapes
    reg.create("tricky", regex, "host\twith\ttabs")
    val reloaded = new FilterRegistry(Some(path)).byName("tricky").get
    assert(reloaded.regex == regex, s"got ${reloaded.regex}")
    assert(reloaded.clientHost == "host\twith\ttabs")
  }

  test("name validation (^[a-z0-9_]+$, cli/cloudpelican-lsd.go:393-398)") {
    val reg = new FilterRegistry(None)
    intercept[IllegalArgumentException](reg.create("Bad-Name", ".*"))
    intercept[IllegalArgumentException](reg.create("spaces here", ".*"))
    reg.create("ok_name_42", ".*")
  }

  test("invalid regex rejected at create (supervisor.go:426)") {
    val reg = new FilterRegistry(None)
    intercept[java.util.regex.PatternSyntaxException](reg.create("bad", "(unclosed"))
  }

  test("temp filters expire after 1h (Filter.java:64-75)") {
    var now = 1700000000000L
    val reg = new FilterRegistry(None, clock = () => now)
    val tmp = reg.createTemp("checkout")
    assert(tmp.temp && tmp.name.startsWith("__tmp__"))
    assert(reg.list().exists(_.id == tmp.id))
    now += 3601 * 1000L
    assert(!reg.list().exists(_.id == tmp.id)) // expired + evicted
  }
}
