package graft.tools
import graft.sources.HtmlParser
object ParseProf {
  def main(args: Array[String]): Unit = {
    val rows = (0 until 25).map { i =>
      s"""<tr class="athing" id="$i"><td class="title"><a href="item?id=$i" id="link-$i" class="storylink">Order $i [P]</a><span class="sitebit"><a href="https://c-$i.example/">c-$i.example</a></span></td></tr><tr><td class="subtext"><span class="score">${i*7} points</span></td></tr>"""
    }.mkString
    val html = s"""<html><head><title>News</title><base href="https://news.example/"></head><body><table class="itemlist">$rows</table></body></html>"""
    def time(name: String, n: Int)(f: => Unit): Unit = {
      (0 until n/2).foreach(_ => f) // warm
      // min over 5 windows: the host's vCPU capacity swings minute to minute
      val best = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        (0 until n).foreach(_ => f)
        (System.nanoTime()-t0)/1e3/n
      }.min
      println(f"$name=$best%.1f us")
    }
    time("TOKENIZE", 5000)(HtmlParser.tokenize(html))
    time("FULL_PARSE", 5000)(HtmlParser.parseDocument(html))
    val arena = HtmlParser.parseDocument(html)
    time("RENUMBER_CHECK", 5000)(graft.sources.Renumber.preorder(arena))
    time("TO_ARRAYDATA", 5000)(graft.spark.NodeSchema.arenaToArrayData(arena))
    time("COMPUTE_DERIVED", 5000)(arena.computeDerived)
    time("TO_RECS", 5000)(arena.toRecs)
  }
}
