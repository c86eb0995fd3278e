package graft.tools
import graft.api.{Doc, Sel}
/** Consumer-style drive of the public API (used by the verify flow). */
object DriveDemo {
  def main(args: Array[String]): Unit = {
    val html = """<html><head><base href="https://news.ycombinator.com/"></head><body>
<table><tr class="athing" id="101"><td class="title"><a href="item?id=101" id="l1" class="storylink">Story One</a></td></tr>
<tr class="athing" id="102"><td class="title"><a href="item?id=102" id="l2" class="storylink">Story &amp; Two</a></td></tr>
<tr><td class="subtext"><span class="sitebit"><a href="from?site=ex.com">ex.com</a></span></td></tr></table>
</body></html>"""
    val doc = Doc.parse(html)
    println("BASE=" + doc.baseUri)
    val rows = doc.select("tr.athing:has(a[href][id])")
    println("ROWS=" + rows.length)
    rows.ids.foreach { r =>
      val links = new Sel(doc, Seq(r)).select(".title a.storylink")
      println(s"row=$r title='${links.text}' href='${links.attr("href").getOrElse("")}'")
    }
    val sel = doc.select("#l1")
    sel.setAttr("href", "https://rewritten.example/1")
    sel.addClass("visited-link")
    println("MUTATED=" + doc.select("#l1").html.get)
    println("FORMATTED=" + doc.select("td.title").first.formattedText)
    println("VALIDATE=" + doc.validate)
    println("TRYSEL=" + doc.trySelect(":+ ^"))
    println("EMPTY_PARSE_NODES=" + Doc.parse("").arena.size)
    println("GARBAGE=" + Doc.parse("<<<>>>&&& <p unclosed").select("p").length)
    println("GARBAGE_HTML=" + Doc.parse("<<<>>>&&& <p unclosed").html)
    // round-3 surfaces: full entity table, SVG foreign content, CDATA
    println("ENTITY=" + Doc.parse("<p>Caf&eacute; &alpha;&ndash;&omega; &notit;</p>").select("p").text)
    val svg = Doc.parse("""<svg viewbox="0 0 2 2"><foreignobject><div id=d>in</div></foreignobject><desc><![CDATA[a < b]]></desc></svg>""")
    println("SVG=" + svg.select("body").innerHtml.getOrElse(""))
    println("SVG_SEL=" + svg.select("foreignObject #d").text)
  }
}
