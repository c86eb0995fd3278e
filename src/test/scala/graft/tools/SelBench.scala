package graft.tools
import graft.api.{Doc, Sel}
object SelBench {
  def main(args: Array[String]): Unit = {
    // build a ~25-story page like the bench docs
    val rows = (0 until 25).map { i =>
      s"""<tr class="athing" id="$i"><td class="title"><a href="item?id=$i" id="link-$i" class="storylink">Order $i [P]</a><span class="sitebit"><a href="https://c-$i.example/">c-$i.example</a></span></td></tr><tr><td class="subtext"><span class="score">${i*7} points</span></td></tr>"""
    }.mkString
    val html = s"""<html><head><title>News</title><base href="https://news.example/"></head><body><table class="itemlist">$rows</table></body></html>"""
    val doc = Doc.parse(html)
    println("NODES=" + doc.arena.size)
    def run(n: Int): Double = {
      val t0 = System.nanoTime()
      var acc = 0
      (0 until n).foreach { _ =>
        val athing = doc.select("tr.athing:has(a[href][id])")
        val links = athing.select(".title a.storylink")
        acc += links.ids.length + links.attr("href").size
      }
      if (acc < 0) println("?")
      (System.nanoTime() - t0) / 1e3 / n
    }
    run(2000) // warmup
    println(f"SELECT_US_PER_QUERY=${run(5000)}%.1f")
    // decomposed serial select (reference selection/serial: 16.4 µs)
    def runSerial(n: Int): Double = {
      val t0 = System.nanoTime()
      var acc = 0
      (0 until n).foreach { _ =>
        acc += doc.selectSingle("body").select("td.title").select("a[href]").ids.length
      }
      if (acc < 0) println("?")
      (System.nanoTime() - t0) / 1e3 / n
    }
    runSerial(2000)
    println(f"SERIAL_US_PER_QUERY=${runSerial(5000)}%.1f")
    // name-path find (reference selection/find: 7.9 µs)
    def runFind(n: Int): Double = {
      val t0 = System.nanoTime()
      var acc = 0
      (0 until n).foreach(_ => acc += doc.find(Seq("body", "td", "a")).ids.length)
      if (acc < 0) println("?")
      (System.nanoTime() - t0) / 1e3 / n
    }
    runFind(4000)
    println(f"FIND_US_PER_QUERY=${runFind(10000)}%.1f")
    // parse cost
    val t0 = System.nanoTime()
    (0 until 2000).foreach(_ => Doc.parse(html))
    println(f"PARSE_US=${(System.nanoTime() - t0) / 1e3 / 2000}%.1f")
  }
}
