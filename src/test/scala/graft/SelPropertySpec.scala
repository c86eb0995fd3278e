package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Doc

/**
 * Selection property-getter differentials ported from the reference's
 * `tests/selection-property.rs` (file:line cited per test). `doc()` is
 * test-pages/page.html, `doc_with_siblings()` is
 * test-pages/tests_with_siblings.html (`tests/data.rs:4-14`).
 */
class SelPropertySpec extends AnyFunSuite {

  private def page: Doc = RealPages.doc("page.html")
  private def siblings: Doc = RealPages.doc("tests_with_siblings.html")

  val Ancestors: String =
    """<!DOCTYPE html>
    <html>
        <head><title>Test</title></head>
        <body>
            <!--Ancestors-->
           <div id="great-ancestor">
               <div id="grand-parent">
                   <div id="parent">
                       <div id="first-child" class="child">Child</div>
                       <div id="second-child" class="child">Child</div>
                   </div>
               </div>
               <div id="grand-parent-sibling"></div>
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

  // selection-property.rs:19-41 attr_exists / attr_or / attr_not_exist
  test("attr existence and attr_or fallbacks") {
    val d = page
    assert(d.select("a").attr("href").isDefined)
    assert(d.select("a").attrOr("fake-attribute", "alternative") == "alternative")
    assert(d.select("zz").attrOr("fake-attribute", "alternative") == "alternative")
    assert(d.select("div.row-fluid").attr("href").isEmpty)
  }

  // selection-property.rs:97-105 test_add_class — whitespace dedup
  test("add_class dedups repeated names") {
    val d = siblings
    val sel = d.select("#main")
    sel.addClass("main main main")
    assert(sel.attr("class").contains("main"))
  }

  // selection-property.rs:108-118 test_add_class_similar — no prefix clashes
  test("add_class with a prefix of an existing class") {
    val d = siblings
    val sel = d.select("#nf5")
    sel.addClass("odd")
    assert(sel.hasClass("odd"))
    assert(sel.hasClass("odder"))
  }

  // selection-property.rs:120-128 test_add_empty_class
  test("add_class with an empty string is a no-op") {
    val d = siblings
    val sel = d.select("#main")
    sel.addClass("")
    assert(sel.attr("class").isEmpty)
  }

  // selection-property.rs:130-139 test_add_classes
  test("add_class with several names adds each") {
    val d = siblings
    val sel = d.select("#main")
    sel.addClass("a b")
    assert(sel.hasClass("a"))
    assert(sel.hasClass("b"))
  }

  // selection-property.rs:141-163 has_class over any node of the selection
  test("has_class checks every node of the selection") {
    val d = page
    assert(d.select("div").hasClass("span12"))
    assert(!d.select("toto").hasClass("toto"))
    assert(d.select(".alert").hasClass("alert-error"))
  }

  // selection-property.rs:165-186 remove_class multi-name + multi-node
  test("remove_class removes several names; similar names survive") {
    val d = siblings
    val sel = d.select("#nf1")
    sel.removeClass("one row")
    assert(sel.hasClass("even"))
    assert(!sel.hasClass("one"))
    assert(!sel.hasClass("row"))

    val d2 = siblings
    val sel2 = d2.select("#nf5, #nf6")
    assert(sel2.length == 2)
    sel2.removeClass("odd")
    assert(sel2.hasClass("odder"))
  }

  // selection-property.rs:188-203 test_has_attr (boolean attribute)
  test("has_attr sees boolean attributes") {
    val d = Doc.parse(
      """<!DOCTYPE html><html><head><title>Test</title></head><body>
         <p hidden>This paragraph should be hidden.</p> <body></html>""")
    val sel = d.select("p")
    assert(sel.hasAttr("hidden"))
    assert(!sel.hasAttr("title"))
  }

  // selection-property.rs:206-231 test_immediate_text over a selection
  test("immediate_text concatenates own text of each selected node") {
    val d = Doc.parse(
      """<!DOCTYPE html><html><head><title>Test</title></head><body><div>
         <h3>Hello <span>World</span>!</h3>
         <h3>Hello <span>World</span>!</h3>
         </div><body></html>""")
    assert(d.select("h3").immediateText == "Hello !Hello !")
  }

  // selection-property.rs:233-247 test_all_attrs — stored order preserved
  test("attrs() returns the first node's attributes in stored order") {
    val d = Doc.parse(Attrs)
    val sel = d.select("""font[face="Arial"][size="8"][color="red"]""")
    assert(sel.attrs == Seq("face" -> "Arial", "size" -> "8", "color" -> "red"))
  }

  // selection-property.rs:249-265 test_remove_all_attrs (+ empty selection)
  test("remove_all_attrs over a selection; empty selection no-op") {
    val d = Doc.parse(Attrs)
    val empty = d.select("""font[face="Verdana"]""")
    assert(!empty.exists)
    empty.removeAllAttrs()
    val sel = d.select("font[face]")
    assert(sel.exists)
    sel.removeAllAttrs()
    assert(!d.select("font[face]").exists)
  }

  // selection-property.rs:267-285 test_selection_query — per-node attr reads
  test("per-node attribute reads keep document order") {
    val d = Doc.parse(Attrs)
    val faces = d.select("font[face]").ids.flatMap(i => Option(d.acc.attr(i, "face")))
    assert(faces == Seq("Times", "Arial", "Courier"))
  }

  // selection-property.rs:287-325 doc html/inner_html roundtrip (comments kept)
  test("document html and inner_html both roundtrip the source") {
    val d = Doc.parse(Ancestors)
    val expected = squash(Ancestors)
    assert(squash(d.html) == expected)
    assert(squash(d.innerHtml) == expected)
  }

  // selection-property.rs:327-337 test_doc_text includes the title text
  test("document text includes head title text") {
    val d = Doc.parse(Ancestors)
    val text = d.text.split("\\s+").filter(_.nonEmpty).mkString(" ")
    assert(text == "Test Child Child")
  }

  // selection-property.rs:339-357 try_html/try_inner_html on empty selection
  test("html and inner_html of an empty selection are None") {
    val d = Doc.parse(Ancestors)
    val sel = d.select("#parent > #third-child")
    assert(sel.html.isEmpty)
    assert(sel.innerHtml.isEmpty)
  }
}
