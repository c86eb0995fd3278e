package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Doc

/**
 * Selection-level manipulation differentials ported from the reference's
 * `tests/selection-manipulation.rs` cases not already covered elsewhere
 * (file:line cited per test). Fixtures are the reference's `tests/data.rs`
 * constants.
 */
class SelManipSpec extends AnyFunSuite {

  val EmptyBlocks: String =
    """<!DOCTYPE html>
    <html lang="en">
        <head></head>
        <body>
            <div id="main">
                <div id="first"></div>
                <div id="second"></div>
            </div>
        </body>
    </html>"""

  val ReplacementSel: String =
    """<!DOCTYPE html>
    <html lang="en">
        <head></head>
        <body>
            <div class="ad-content">
                <p><span></span></p>
                <p><span></span></p>
            </div>
            <span class="source">example</span>
        </body>
    </html>"""

  val Replacement: String =
    """<!DOCTYPE html>
    <html lang="en">
        <head></head>
        <body>
            <div id="main">
                <p id="before-origin"></p>
                <p id="origin"><span id="inline">Something</span></p>
                <p id="after-origin"><span>About</span><span>Me</span></p>
            </div>
        </body>
    </html>"""

  val Attrs: String =
    """<!DOCTYPE html>
    <html>
        <head></head>
        <body>
            <div id="main">
                <div><font face="Times" size="10" color="green">Lorem</font></div>
                <div><font face="Arial" size="8" color="red">ipsum dolor</font></div>
                <div><font face="Courier" size="5" color="red">sit amet</font></div>
            </div>
        </body>
    </html>"""

  private def squash(s: String): String = s.replaceAll("\\s+", "")

  // selection-manipulation.rs:108-122 test_append_html_multiple
  test("append_html applies the fragment to every selected node") {
    val d = Doc.parse(EmptyBlocks)
    d.select("#main div").appendHtml(
      """<p class="text">Follow <a href="https://example.com">example.com</a></p>""")
    assert(d.select(
      """ #main > div > p > a[href="https://example.com"]:has-text("example.com")""").length == 2)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:125-136
  test("append_html with multiple top-level elements to multiple targets") {
    val d = Doc.parse(EmptyBlocks)
    d.select("#main div").appendHtml("<span>1</span><span>2</span>")
    assert(d.select("div span").length == 4)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:137-150
  test("replace_with_html multiple elements to multiple targets") {
    val d = Doc.parse(EmptyBlocks)
    d.select("#main div").replaceWithHtml("<p>1</p><p>2</p>")
    assert(d.select("""#main > p:has-text("1")""").length == 2)
    assert(d.select("""#main > p:has-text("2")""").length == 2)
    assert(d.select("#main > p").length == 4)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:152-164
  test("prepend_html keeps fragment order across calls and targets") {
    val d = Doc.parse(EmptyBlocks)
    val sel = d.select("#main div")
    sel.prependHtml("""<span class="third">3</span>""")
    sel.prependHtml("""<span class="first">1</span><span class="second">2</span>""")
    assert(d.select("div > .first + .second + .third").length == 2)
  }

  // selection-manipulation.rs:166-178 test_replace_with_selection (same tree)
  test("replace_with_selection copies the source into each target slot") {
    val d = Doc.parse(ReplacementSel)
    val dst = d.select(".ad-content p span")
    val src = d.select("span.source")
    dst.replaceWithSelection(src)
    assert(d.select(".ad-content .source").length == 2)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:180-194 test_append_selection_multiple (same tree)
  test("append_selection copies the source into every target") {
    val d = Doc.parse(ReplacementSel)
    val dst = d.select(".ad-content p")
    val src = d.select("span.source")
    dst.appendSelection(src)
    assert(d.select(".ad-content .source").length == 2)
    assert(d.select(".ad-content span").length == 4)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:196-214 test_replace_with_another_tree_selection
  test("replace_with_selection across trees") {
    val dDst = Doc.parse(ReplacementSel)
    val dSrc = Doc.parse(
      "\n    <span class=\"source\">example</span>\n    <span class=\"source\">example</span>")
    val dst = dDst.select(".ad-content p span")
    val src = dSrc.select("span.source")
    dst.replaceWithSelection(src)
    assert(dDst.select(".ad-content .source").length == 4)
    assert(dDst.validate.isEmpty)
  }

  // selection-manipulation.rs:216-235 test_append_another_tree_selection
  test("append_selection across trees") {
    val dDst = Doc.parse(ReplacementSel)
    val dSrc = Doc.parse(
      "\n    <span class=\"source\">example</span>\n    <span class=\"source\">example</span>")
    val dst = dDst.select(".ad-content p")
    val src = dSrc.select("span.source")
    dst.appendSelection(src)
    assert(dDst.select(".ad-content .source").length == 4)
    assert(dDst.select(".ad-content span").length == 6)
    assert(dDst.validate.isEmpty)
  }

  // selection-manipulation.rs:237-253 — template contents survive the
  // cross-tree copy (C1 copies template_contents subtrees)
  test("append_selection carries template contents across trees") {
    val dDst = Doc.parse(ReplacementSel)
    val srcHtml = """<div class="source"><template><p>inner text</p></template></div>"""
    val dSrc = Doc.parse(srcHtml)
    dDst.select("body").appendSelection(dSrc.select("div.source"))
    assert(squash(dDst.html).contains(squash(srcHtml)))
    assert(dDst.validate.isEmpty)
  }

  // selection-manipulation.rs:255-299 — empty source selections are no-ops
  test("append/replace with an empty cross-tree selection is a no-op") {
    val dDst = Doc.parse(ReplacementSel)
    val dSrc = Doc.parse(
      "\n    <span class=\"source\">example</span>\n    <span class=\"source\">example</span>")
    val src = dSrc.select("span.src")
    assert(!src.exists)
    dDst.select(".ad-content p").appendSelection(src)
    assert(dDst.select(".ad-content span").length == 2)
    dDst.select(".ad-content p span").replaceWithSelection(src)
    assert(dDst.select(".ad-content span").length == 2)
    assert(dDst.validate.isEmpty)
  }

  // selection-manipulation.rs:301-325 test_rename_selection
  test("rename over a selection") {
    val d = Doc.parse(
      """<!DOCTYPE html><html><head><title>Test</title></head><body>
         <div class="content"><div>1</div><div>2</div><div>3</div></div>
         <body></html>""")
    val sel = d.select("div.content > div")
    assert(sel.length == 3)
    sel.rename("p")
    assert(d.select("div.content > div").length == 0)
    assert(d.select("div.content > p").length == 3)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:329-344 test_selection_set_text
  test("set_text over a selection; empty selection is a no-op") {
    val d = Doc.parse(Replacement)
    d.select("div > p").setText("New Text")
    assert(d.select("""p:has-text("New Text")""").length == 3)
    d.select("div > p > span").setText("New Inline Text")
    assert(d.select("""p:has-text("New Inline Text")""").length == 0)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:346-357 test_before_html
  test("before_html inserts the fragment before every selected node") {
    val d = Doc.parse(Replacement)
    d.select("#main > p").beforeHtml("<hr><br>")
    assert(d.select("#main > hr + br + p").length == 3)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:359-370 test_after_html
  test("after_html inserts the fragment after every selected node") {
    val d = Doc.parse(Replacement)
    d.select("#main > p").afterHtml("<br><br>")
    assert(d.select("#main > p + br + br").length == 3)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:372-391 test_prepend_another_tree_selection
  test("prepend_selection across trees keeps source order, lands first") {
    val dDst = Doc.parse(ReplacementSel)
    val dSrc = Doc.parse("""<span class="adv">ad</span>""")
    dDst.select(".ad-content p").prependSelection(dSrc.select("span.adv"))
    assert(dDst.select(".ad-content p > span.adv + span").length == 2)
    assert(dDst.validate.isEmpty)
  }

  // selection-manipulation.rs:393-417 test_selection_strip_elements
  test("strip_elements over a selection removes nested named elements") {
    val d = Doc.parse(
      """<!DOCTYPE html><html lang="en"><head></head><body><ul>
         <li><span><b><i>First</i></b></span></li>
         <li><span><b><i>Second</i></b></span></li>
         <li><span><b><i>Third</i></b></span></li>
         </ul></body>""")
    val sel = d.select("li")
    assert(sel.length == 3)
    assert(sel.select("span b i").length == 3)
    sel.stripElements(Set("span", "i"))
    assert(sel.select("span, i").length == 0)
    assert(sel.select("b").length == 3)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:420-434 test_retain_attrs (+ empty retain list)
  test("retain_attrs over a selection; empty list removes everything") {
    val d = Doc.parse(Attrs)
    val fontSel = d.select("[face][size][color]")
    assert(fontSel.length == 3)
    fontSel.retainAttrs(Set("size"))
    assert(d.select("[face][size][color]").length == 0)
    assert(d.select("[size]").length == 3)
    fontSel.retainAttrs(Set.empty)
    assert(d.select("[size]").length == 0)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:436-451 test_remove_attrs (+ empty list no-op)
  test("remove_attrs over a selection; empty list is a no-op") {
    val d = Doc.parse(Attrs)
    val fontSel = d.select("[face][size][color]")
    assert(fontSel.length == 3)
    fontSel.removeAttrs(Seq("size"))
    assert(d.select("[face][size][color]").length == 0)
    assert(d.select("[face][color]").length == 3)
    fontSel.removeAttrs(Seq.empty)
    assert(d.select("[face][color]").length == 3)
    assert(d.validate.isEmpty)
  }

  // selection-manipulation.rs:505-543 test_select_inject_template
  test("append_html with template keeps document shape") {
    val d = Doc.parse(
      "<!DOCTYPE html>\n    <html>\n      <head></head>\n      <body>\n        <p>before</p>\n      </body>\n    </html>")
    d.trySelect("body").foreach(_.appendHtml(
      "<template>\n        <p>inside</p>\n    </template>\n    <p>after</p>\n    "))
    val expected = "<!DOCTYPE html><html><head></head><body><p>before</p>" +
      "<template><p>inside</p></template><p>after</p></body></html>"
    assert(squash(d.html) == squash(expected))
    assert(d.validate.isEmpty)
  }
}
