package graft.tools
import graft.sources.HtmlParser

/** r6: per-doc cost of the q_links/partDocs doc shapes (small pages), pure
  * JVM single-thread — calibrates how much of the Spark wall is engine work. */
object SmallDocProf {
  def main(args: Array[String]): Unit = {
    val hn1 = """<html><head><title>News</title><base href="https://news.example/"></head><body><table class="itemlist"><tr class="athing" id="42"><td class="title"><a href="item?id=42" id="link-42" class="storylink">Order 42 [3-MEDIUM]</a><span class="sitebit"><a href="https://cust-7.example/">cust-7.example</a></span></td></tr><tr><td class="subtext"><span class="score">8 points</span> status <b>O</b></td></tr></table></body></html>"""
    val part1 = """<html><head><title>Part 77</title><base href="https://parts.example/catalog/"></head><body><div id="main" class="part brand-13"><a href="/part/77" class="plink">PROMO BURNISHED COPPER</a><ul class="words"><li>lavender</li><li>powder</li><li>navajo</li><li>thistle</li><li>cream</li></ul><p class="sz">size 7</p></div></body></html>"""
    def time(name: String, n: Int)(f: => Unit): Unit = {
      (0 until n).foreach(_ => f)
      val best = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        (0 until n).foreach(_ => f)
        (System.nanoTime()-t0)/1e3/n
      }.min
      println(f"$name=$best%.2f us")
    }
    for ((nm, html) <- Seq(("hn1", hn1), ("part1", part1))) {
      val arena = graft.sources.Renumber.preorder(HtmlParser.parseDocument(html))
      println(s"${nm}_nodes=" + arena.size)
      time(s"${nm}_tokenize", 20000)(HtmlParser.tokenize(html))
      time(s"${nm}_parse", 20000)(HtmlParser.parseDocument(html))
      time(s"${nm}_to_arraydata", 20000)(graft.spark.NodeSchema.arenaToArrayData(arena))
      val ad = graft.spark.NodeSchema.arenaToArrayData(arena)
      val plan = graft.css.SelectorAst.parse("tr.athing:has(a[href][id])")
      val plan2 = graft.css.SelectorAst.parse("li")
      time(s"${nm}_select_has", 20000) {
        val acc = new graft.spark.ArrayDataAccess(ad)
        graft.css.Engine.select(acc, Seq(0), plan)
      }
      time(s"${nm}_select_li", 20000) {
        val acc = new graft.spark.ArrayDataAccess(ad)
        graft.css.Engine.select(acc, Seq(0), plan2)
      }
    }
  }
}
