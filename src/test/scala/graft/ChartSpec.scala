package graft

import graft.queries.Chart
import org.scalatest.funsuite.AnyFunSuite

class ChartSpec extends AnyFunSuite {

  test("single series renders height-scaled columns") {
    val series = Seq(0L -> 1L, 60L -> 5L, 120L -> 10L)
    val out = Chart.render(series, width = 10, height = 5)
    val lines = out.split("\n")
    assert(lines.length == 7) // 5 rows + axis + legend
    // tallest column full height, shortest only bottom row
    val colOf = (i: Int) => lines.take(5).map(_.charAt(i)).mkString
    assert(colOf(2) == "ooooo")
    assert(colOf(0).count(_ == 'o') == 1)
    assert(lines(5) == "---")
    assert(lines(6).contains("max=10"))
  }

  test("error series overdraws regular (reference o vs * glyphs)") {
    val reg = Seq(0L -> 4L, 60L -> 4L)
    val err = Seq(0L -> 8L)
    val out = Chart.render(reg, err, width = 10, height = 4)
    val lines = out.split("\n")
    assert(lines.take(4).map(_.charAt(0)).mkString == "****")
    assert(lines.take(4).map(_.charAt(1)).mkString == "  oo")
  }

  test("bucket squeeze keeps chart within width") {
    val series = (0 until 300).map(i => (i * 60L, (i % 7).toLong))
    val out = Chart.render(series, width = 50, height = 6)
    assert(out.split("\n").head.length <= 50)
  }

  test("empty series") {
    assert(Chart.render(Seq.empty) == "(no data)\n")
  }
}
