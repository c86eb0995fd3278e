package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Doc

/** Serialization + text extraction goldens from the reference
  * (tests/node-traversal.rs formatted_text/normalized_char_count suites). */
class TextSpec extends AnyFunSuite {

  // tests/data.rs:108-131
  val DMC = """<!DOCTYPE html>
<html>
    <head></head>
    <body>
        <div id="main">
            <div>
                <p>Listen up y'all, it's time to get down<br>
                'Bout that <b>normalized_char_count</b> in this town<br>
                Traversing nodes with style and grace<br>
                Counting chars at a steady pace</p>
            </div>

            <div>
                <p>No split whitespace, that's old school<br>
                Direct counting's our golden rule<br>
                Skip them nodes that ain't text or element<br>
                That's how we keep our code development!</p>
            </div>
            <pre>
            WORD!
            </pre>
        </div>
    </body>
</html>"""

  // tests/data.rs:133-150
  val MINI_TABLE = """<!DOCTYPE html>
<html>
    <head></head>
    <body>
        <table>
            <tr>
                <td>1</td>
                <td>2</td>
                <td>3</td>
            </tr>
            <tr>
                <td>4</td>
                <td>5</td>
                <td>6</td>
            </tr>
        </table>
    </body>
</html>"""

  test("formatted_text DMC golden (node-traversal.rs:427-443)") {
    val doc = Doc.parse(DMC)
    val expected = """Listen up y'all, it's time to get down
'Bout that normalized_char_count in this town
Traversing nodes with style and grace
Counting chars at a steady pace

No split whitespace, that's old school
Direct counting's our golden rule
Skip them nodes that ain't text or element
That's how we keep our code development!

            WORD!"""
    assert(doc.formattedText == expected)
  }

  test("formatted_text complex inline (node-traversal.rs:446-460)") {
    val contents = "<p>The <code><span>match</span></code> and <code><span>if</span><span> </span>" +
      "<span>let</span></code> expressions can be used for <a>pattern matching</a>. For example, " +
      "<code><span>match</span></code> can be used to double an optional integer value if present, " +
      "and return zero otherwise:<sup><a ><span>&#91;</span>57<span>&#93;</span></a></sup>\n</p>"
    val doc = Doc.parse(contents)
    val expected = "The match and if let expressions can be used for pattern matching. " +
      "For example, match can be used to double an optional integer value if present, " +
      "and return zero otherwise:[57]"
    assert(doc.formattedText == expected)
  }

  test("formatted_text table with nbsp (node-traversal.rs:463-480)") {
    val contents = "<table>\n    <tr>\n        <td><span>\n                " +
      "<span>568 points</span> by <a>sbarre</a> <span><a>" +
      "14 hours ago</a></span> <span></span> | <a>hide</a> | <a>167&nbsp;comments</a>\n" +
      "            </span>\n        </td>\n    </tr>\n</table>"
    val doc = Doc.parse(contents)
    assert(doc.formattedText == "568 points by sbarre 14 hours ago | hide | 167 comments")
  }

  test("formatted_text mini table golden (node-traversal.rs:483-489)") {
    val doc = Doc.parse(MINI_TABLE)
    assert(doc.formattedText == "1 2 3\n4 5 6")
  }

  test("formatted_text div after inline (node-traversal.rs:492-508)") {
    val contents = "<table>\n    <tr>\n        <td>&nbsp;</td>\n        <td>        " +
      "<a>https://example.com</a>\n            <div>\n                " +
      "<p><span></span>         Some text</p>\n            </div>\n        </td>\n    </tr>\n</table>"
    val doc = Doc.parse(contents)
    assert(doc.formattedText == "https://example.com \n\nSome text")
  }

  test("normalized_char_count == split_whitespace join length (node-traversal.rs:395-421)") {
    val contents = """
        <div id="main">
        A           very
                                messy content
            <span>. A something       that</span>
            <p>
            asks to be     normalized     </p>


        </div>
    """
    val doc = Doc.parse(contents)
    val main = doc.select("#main").ids.head
    val expected = doc.arena.textOf(main).split("\\s+").filter(_.nonEmpty).mkString(" ").length
    assert(doc.arena.normalizedCharCount(main) == expected.toLong)
  }

  test("immediate_text vs text (X6/X7, ops.rs:32-99)") {
    val doc = Doc.parse("""<div id="m">own <span>inner</span> tail</div>""")
    val m = doc.select("#m").ids.head
    assert(doc.arena.textOf(m) == "own inner tail")
    assert(doc.arena.immediateTextOf(m) == "own  tail")
  }

  test("html serialization roundtrip basics (S4)") {
    val doc = Doc.parse("""<div id="a" class="x y"><p>hi &amp; low</p><br><img src="i.png"></div>""")
    val html = doc.select("#a").html.get
    assert(html == """<div id="a" class="x y"><p>hi &amp; low</p><br><img src="i.png"></div>""")
    val inner = doc.select("#a").innerHtml.get
    assert(inner == """<p>hi &amp; low</p><br><img src="i.png">""")
    // roundtrip: parse(serialize(x)) == x
    val doc2 = Doc.fragment(html)
    assert(doc2.select("#a").html.get == html)
  }

  test("document html has scaffolding (html-dom.rs)") {
    val doc = Doc.parse("<span>hello</span>")
    assert(doc.html == "<html><head></head><body><span>hello</span></body></html>")
  }

  test("comment + doctype serialization") {
    val doc = Doc.parse("<!DOCTYPE html><html><head></head><body><!--note--><p>x</p></body></html>")
    assert(doc.html == "<!DOCTYPE html><html><head></head><body><!--note--><p>x</p></body></html>")
  }

  test("markdown serialization basics (S5)") {
    val doc = Doc.parse("<h1>Title</h1><p>Some <strong>bold</strong> and <em>it</em>.</p><ul><li>a</li><li>b</li></ul>")
    val md = doc.mdText
    assert(md.contains("# Title"))
    assert(md.contains("Some **bold** and *it*."))
    assert(md.contains("- a"))
    assert(md.contains("- b"))
  }

  test("markdown skips script/style by default (md/constants.rs:5)") {
    val doc = Doc.parse("<p>keep</p><script>var x=1;</script><style>.a{}</style>")
    val md = doc.mdText
    assert(md.contains("keep"))
    assert(!md.contains("var x"))
    assert(!md.contains(".a{}"))
  }
}
