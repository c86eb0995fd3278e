package graft.tools
import graft.sources.HtmlParser

/** r6: decompose Doc.parse (micro_parse) with one methodology. */
object ParseProf2 {
  def main(args: Array[String]): Unit = {
    val rows = (0 until 25).map { i =>
      s"""<tr class="athing" id="$i"><td class="title"><a href="item?id=$i" id="link-$i" class="storylink">Order $i [P]</a><span class="sitebit"><a href="https://c-$i.example/">c-$i.example</a></span></td></tr><tr><td class="subtext"><span class="score">${i*7} points</span></td></tr>"""
    }.mkString
    val html = s"""<html><head><title>News</title><base href="https://news.example/"></head><body><table class="itemlist">$rows</table></body></html>"""
    def time(name: String, n: Int)(f: => Unit): Unit = {
      (0 until n).foreach(_ => f) // warm
      val best = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        (0 until n).foreach(_ => f)
        (System.nanoTime()-t0)/1e3/n
      }.min
      println(f"$name=$best%.1f us")
    }
    time("PARSE_DOC", 4000)(HtmlParser.parseDocument(html))
    time("PARSE_PLUS_RENUMBER", 4000)(graft.sources.Renumber.preorder(HtmlParser.parseDocument(html)))
    time("DOC_PARSE", 4000)(graft.api.Doc.parse(html))
    val a = HtmlParser.parseDocument(html)
    println("IS_PREORDER_FRESH=" + {
      val m = classOf[graft.sources.Renumber.type]
      graft.sources.Renumber.preorder(a) eq a
    })
  }
}
