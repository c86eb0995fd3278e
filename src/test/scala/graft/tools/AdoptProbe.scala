package graft.tools
object AdoptProbe {
  def main(args: Array[String]): Unit = {
    val d = graft.api.Doc.parse("""<p>My favorite search engine is <a href="https://duckduckgo.com"><div>Duck Duck Go</div></a>.</p>""")
    println(d.select("body").html)
  }
}
