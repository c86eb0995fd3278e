package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Doc
import graft.css.SelectorAst
import graft.ops.TreeOps

/**
 * The reference's `Examples.md` compiled as a spec (dom_query builds it as
 * doc-tests via `lib.rs:18`) — each test mirrors one example block's
 * assertions verbatim.
 */
class ExamplesSpec extends AnyFunSuite {

  // Examples.md "Parsing a document" / "Parsing a fragment"
  test("document root is a document; fragment root drops the doctype") {
    val src = """<!DOCTYPE html>
<html><head><title>Test Page</title></head><body></body></html>"""
    val doc = Doc.parse(src)
    assert(doc.arena(0).kind == graft.model.NodeKind.Document)
    assert(doc.arena(doc.arena(0).firstChild).kind == graft.model.NodeKind.Doctype)
    val frag = Doc.fragment(src)
    assert(frag.arena(0).kind != graft.model.NodeKind.Document)
    assert(frag.arena(0).kind == graft.model.NodeKind.Fragment)
    assert(frag.arena(frag.arena(0).firstChild).kind != graft.model.NodeKind.Doctype)
  }

  // Examples.md "Selecting elements"
  test("nth-child text, :has over list items, try_select on no match") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Test Page</title></head><body>
<h1>Test Page</h1>
<ul><li>One</li><li><a href="/2">Two</a></li><li><a href="/3">Three</a></li></ul>
</body></html>""")
    assert(d.select("ul li:nth-child(2)").text == "Two")
    val has = d.select("ul > li:has(a)")
    assert(has.length == 2)
    assert(has.ids.forall(i => d.acc.name(i) == "li"))
    assert(d.trySelect("p").isEmpty)
  }

  // Examples.md "Selecting a single match and multiple matches"
  test("select_single vs select().first vs full selection") {
    val d = Doc.parse("""<!DOCTYPE html>
<html lang="en"><head></head><body>
<ul class="list"><li>1</li><li>2</li><li>3</li></ul>
<ul class="list"><li>4</li><li>5</li><li>6</li></ul>
</body></html>""")
    val single = d.selectSingle(".list")
    assert(single.length == 1)
    assert(single.innerHtml.get.trim == "<li>1</li><li>2</li><li>3</li>")
    val sel = d.select(".list")
    assert(sel.length == 2)
    assert(sel.innerHtml.get.trim == "<li>1</li><li>2</li><li>3</li>")
    assert(sel.first.innerHtml.get.trim == "<li>1</li><li>2</li><li>3</li>")
    val all = sel.ids.map(i =>
      graft.sources.Serializer.toHtml(d.acc, i, includeRoot = false,
        id => d.arena(id).templateContents).trim).mkString
    assert(all == "<li>1</li><li>2</li><li>3</li><li>4</li><li>5</li><li>6</li>")
  }

  // Examples.md "Selecting descendent elements"
  test("chained select and root-anchored descendant selector from a selection") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Test Page</title></head><body>
<h1>Test Page</h1>
<ul class="list-a"><li>One</li><li><a href="/2">Two</a></li><li><a href="/3">Three</a></li></ul>
<ul class="list-b"><li><a href="/4">Four</a></li></ul>
</body></html>""")
    val ul = d.select("ul")
    val lis = ul.select("li")
    assert(lis.ids.forall(i => d.acc.name(i) == "li"))
    // ancestry above the sub-roots may satisfy leading compounds
    assert(ul.select("body ul.list-b li").first.text == "Four")
  }

  // Examples.md "Selecting ancestors"
  test("ancestors with and without a depth limit; is() has no descent") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head>Test</head><body>
<div id="great-ancestor"><div id="grand-parent"><div id="parent">
<div id="child">Child</div></div></div></div>
</body></html>""")
    val child = d.select("#child")
    assert(child.exists)
    val anc = child.ancestors()
    assert(anc.is("html"))
    assert(anc.is("#parent"))
    assert(!anc.is("#child"))
    val anc2 = child.ancestors(2)
    assert(anc2.is("#grand-parent #parent"))
    assert(!anc2.is("#great-ancestor"))
  }

  // Examples.md "Selecting with precompiled matchers"
  test("one compiled plan reused across documents") {
    val plan = SelectorAst.parseCached("title")
    val d1 = Doc.parse("""<!DOCTYPE html><html><head><title>Test Page 1</title></head><body></body></html>""")
    val d2 = Doc.parse("""<!DOCTYPE html><html><head><title>Test Page 2</title></head><body></body></html>""")
    assert(d1.select("title").text == "Test Page 1")
    assert(d2.select("title").text == "Test Page 2")
    assert(graft.css.Engine.select(d1.acc, Seq(0), plan).length == 1)
    assert(d1.selectSingle("title").text == "Test Page 1")
  }

  // Examples.md "Serializing to HTML"
  test("selection html/inner_html and the empty-selection variants") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><title>Test</title></head>
<body><div class="content"><h1>Test Page</h1></div></body></html>""")
    val sel = d.select("div.content")
    assert(sel.html.get == """<div class="content"><h1>Test Page</h1></div>""")
    assert(sel.innerHtml.get == "<h1>Test Page</h1>")
    assert(d.select("div.no-content").html.isEmpty)
    assert(d.select("div.no-content").innerHtml.isEmpty)
  }

  // Examples.md "Accessing descendent text" / "Accessing immediate text"
  test("descendant text vs immediate text") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><title>Test</title></head>
<body><div><h1>Test <span>Page</span></h1></div></body></html>""")
    assert(d.select("body div").first.text == "Test Page")
    assert(d.select("body div h1").first.immediateText == "Test ")
  }

  // Examples.md "Manipulating the attribute of an HTML element"
  test("attribute manipulation keeps stored order through remove+set") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><title>Test</title></head>
<body><input hidden="" id="k" class="important" type="hidden" name="k" data-k="100"></body></html>""")
    val input = d.select("input[name=k]")
    assert(input.attr("data-k").contains("100"))
    input.removeAttr("data-k")
    assert(input.attrOr("data-k", "0") == "0")
    input.removeAttrs(Seq("id", "class"))
    input.setAttr("data-k", "200")
    assert(input.html.get == """<input hidden="" type="hidden" name="k" data-k="200">""")
    assert(input.hasAttr("hidden"))
    assert(!input.hasAttr("title"))
    input.removeAllAttrs()
    assert(input.html.get == "<input>")
  }

  // Examples.md "Manipulating the DOM"
  test("append/set/remove/replace/prepend/before/after over selections") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><title>Test</title></head><body>
<div class="content"></div>
<div class="remove-it">Remove me</div>
<div class="replace-it"><div>Replace me</div></div>
</body></html>""")
    d.select("body .content").appendHtml("""<div class="inner">inner block</div>""")
    assert(d.select("body .content .inner").exists)
    d.select(".inner").setHtml("<p>1,2,3</p>")
    assert(d.select(".inner").html.get == """<div class="inner"><p>1,2,3</p></div>""")
    d.select(".remove-it").remove()
    assert(!d.select(".remove-it").exists)
    val replaceSel = d.select(".replace-it")
    replaceSel.replaceWithHtml("""<div class="replaced">Replaced</div>""")
    assert(replaceSel.text.trim == "Replace me") // detached ids keep content
    assert(d.select(".replaced").text == "Replaced")
    val content = d.selectSingle("body .content")
    content.prependHtml("""<p class="third">3</p>""")
    content.prependHtml("""<p class="first">2</p><p class="second">2</p>""")
    content.select(".first").beforeHtml("""<p class="none">None</p>""")
    content.select(".third").afterHtml("""<p class="fourth">4</p>""")
    assert(d.select(
      """.content > .none + .first + .second + .third + .fourth + div:has-text("1,2,3")""").exists)
    val pSel = content.select("p")
    val totalP = pSel.length
    pSel.setText("test content")
    assert(d.select("""p:has-text("test content")""").length == totalP)
  }

  // Examples.md "Node manipulations"
  test("new_element + set_text + append_child, then the html splice family") {
    val d = Doc.parse("""<!DOCTYPE html>
<html lang="en"><head></head><body>
<div id="main"><p id="first">It's</p></div>
</body></html>""")
    val main = d.selectSingle("#main").ids.head
    val el = d.arena.createElement("p", Seq("id" -> "second"))
    TreeOps.setText(d.arena, el, "test")
    TreeOps.appendChild(d.arena, main, el)
    assert(d.select("""#main #second:has-text("test")""").exists)
    TreeOps.appendHtml(d.arena, main, """<p id="third">Wonderful</p>""")
    assert(d.select("#main #third").text == "Wonderful")
    TreeOps.prependHtml(d.arena, main, """<p id="minus-one">-1</p><p id="zero">0</p>""")
    assert(d.select("#main > #minus-one + #zero + #first + #second + #third").exists)
    TreeOps.setHtml(d.arena, main, """<p id="the-only">Wonderful</p>""")
    assert(d.select("#main #the-only").text == "Wonderful")
    assert(!d.select("#first").exists)
    TreeOps.replaceWithHtml(d.arena, main,
      "<span>Tweedledum</span> and <span>Tweedledee</span>")
    assert(!d.select("#main").exists)
    assert(d.select("span + span").text == "Tweedledee")
    val firstSpan = d.select("body > span").ids.head
    TreeOps.beforeHtml(d.arena, firstSpan, """<div id="main">Main Content</div>""")
    assert(d.select("""body > #main + span:has-text("Tweedledum")""").exists)
    val lastSpan = d.select("body > span").ids.last
    TreeOps.afterHtml(d.arena, lastSpan, """<div id="extra">Extra Content</div>""")
    assert(d.select("""body > span:has-text("Tweedledee") + #extra""").exists)
    assert(d.validate.isEmpty)
  }

  // Examples.md "Renaming selected elements without changing the contents"
  test("rename over a mixed selection list") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><title>Test</title></head><body>
<div class="content"><div>1</div><div>2</div><div>3</div><span>4</span></div>
<body></html>""")
    val sel = d.select("div.content > div, div.content > span")
    assert(sel.length == 4)
    sel.rename("p")
    assert(d.select("div.content > div, div.content > span").length == 0)
    assert(d.select("div.content > p").length == 4)
  }

  // Examples.md "Retrieving The Base URI"
  test("base_uri from document and node level") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><base href="https://www.example.com/"/><title>Test</title></head>
<body><div id="main"></div></body></html>""")
    assert(d.baseUri.contains("https://www.example.com/"))
  }

  // Examples.md "Verifying Selection and Node Matches"
  test("is() with full ancestry and sibling paths") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><title>Test</title></head><body>
<div id="main" dir="ltr"></div>
<div id="extra"></div>
</body></html>""")
    val main = d.selectSingle("#main")
    val extra = d.selectSingle("#extra")
    assert(main.is("div#main"))
    assert(!extra.is("div#main"))
    assert(main.is("html > body > div#main[dir=ltr]"))
    assert(extra.is("html > body > div#main + div"))
  }

  // Examples.md "Fast Finding Child Elements"
  test("find name path over appended children") {
    val d = Doc.parse("""<!DOCTYPE html>
<html><head><title>Test</title></head><body><div id="main"></div></body></html>""")
    val main = d.selectSingle("#main").ids.head
    val totalLinks = 10
    (0 until totalLinks).foreach { i =>
      TreeOps.appendHtml(d.arena, main, s"""<div><a href="/$i">$i link</a></div>""")
    }
    assert(d.select("html body a").length == totalLinks)
    assert(d.find(Seq("div", "a")).length == totalLinks)
  }
}
