package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Doc
import graft.ops.TreeOps

/**
 * Node-level mutation differentials ported from the reference's
 * `tests/node-manipulation.rs` cases not already covered by MutationSpec
 * (file:line cited per test). Fixtures are the reference's own
 * `tests/data.rs` constants.
 */
class NodeManipSpec extends AnyFunSuite {

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

  // node-manipulation.rs:179-200 test_node_replace_with_by_node_id
  test("replace_with a new node, then re-append the detached original") {
    val d = Doc.parse(Replacement)
    val origin = d.selectSingle("#origin").ids.head
    val p = d.arena.createElement("p", Seq("id" -> "outline"))
    TreeOps.replaceWith(d.arena, origin, p)
    TreeOps.appendChild(d.arena, p, origin)
    assert(d.select("#outline > #origin > #inline").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:322-341 test_node_prepend
  test("prepend_child puts the new node before existing children") {
    val d = Doc.parse(Replacement)
    val origin = d.selectSingle("#origin").ids.head
    val span = d.arena.createElement("span", Seq("id" -> "first"))
    TreeOps.prependChild(d.arena, origin, span)
    assert(d.select("#origin").exists)
    assert(d.select("#origin > #first + #inline").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:345-362 test_node_prepend_html
  test("prepend_html keeps fragment order across repeated calls") {
    val d = Doc.parse(Replacement)
    val origin = d.selectSingle("#origin").ids.head
    TreeOps.prependHtml(d.arena, origin, """<span id="third">3</span>""")
    TreeOps.prependHtml(d.arena, origin,
      """<span id="first">1</span><span id="second">2</span>""")
    assert(d.select("#origin > #first + #second + #third + #inline").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:364-381 test_node_insert_before
  test("insert_before a fresh node") {
    val d = Doc.parse(Replacement)
    val anchor = d.selectSingle("#before-origin").ids.head
    val p = d.arena.createElement("p", Seq("id" -> "before-before-origin"))
    TreeOps.insertBefore(d.arena, anchor, p)
    assert(d.select("#before-before-origin + #before-origin + #origin + #after-origin").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:383-406 test_node_insert_after (+ last_sibling walk)
  test("insert_after and after the last sibling") {
    val d = Doc.parse(Replacement)
    val anchor = d.selectSingle("#after-origin").ids.head
    val p = d.arena.createElement("p", Seq("id" -> "after-after-origin"))
    TreeOps.insertAfter(d.arena, anchor, p)
    var last = anchor
    while (d.arena(last).next != -1) last = d.arena(last).next
    val pl = d.arena.createElement("p", Seq("id" -> "last"))
    TreeOps.insertAfter(d.arena, last, pl)
    assert(d.select(
      "#before-origin + #origin + #after-origin + #after-after-origin + #last").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:408-426 test_node_remove_descendants (attr writes
  // over a descendants iteration keep the tree valid)
  test("attribute writes during a descendants sweep keep links sound") {
    val d = Doc.parse(Ancestors)
    val body = d.selectSingle("body").ids.head
    d.arena.descendants(body).zipWithIndex.foreach { case (id, i) =>
      if (d.arena(id).isElement) TreeOps.setAttr(d.arena, id, "data-descendant", i.toString)
    }
    assert(d.select("[data-descendant]").length >= 6)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:513-528 test_node_after_html
  test("after_html splices a multi-element fragment as following siblings") {
    val d = Doc.parse(Replacement)
    val anchor = d.selectSingle("#after-origin").ids.head
    TreeOps.afterHtml(d.arena, anchor,
      """<p id="after-after-origin"></p><p id="also-after-origin"></p>""")
    assert(d.select(
      "#before-origin + #origin + #after-origin + #after-after-origin + #also-after-origin").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:531-553 test_insert_siblings_before
  test("insert_siblings_before splices a linked chain") {
    val d = Doc.parse(Replacement)
    val anchor = d.selectSingle("#before-origin").ids.head
    val n0 = d.arena.createElement("p", Seq("id" -> "before-0"))
    val n1 = d.arena.createElement("p", Seq("id" -> "before-1"))
    d.arena(n0).next = n1
    d.arena(n1).prev = n0
    TreeOps.insertSiblingsBefore(d.arena, anchor, n0)
    assert(d.select("#before-0 + #before-1 + #before-origin + #origin + #after-origin").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:555-577 test_insert_siblings_after
  test("insert_siblings_after splices a linked chain") {
    val d = Doc.parse(Replacement)
    val anchor = d.selectSingle("#after-origin").ids.head
    val n0 = d.arena.createElement("p", Seq("id" -> "after-0"))
    val n1 = d.arena.createElement("p", Seq("id" -> "after-1"))
    d.arena(n0).next = n1
    d.arena(n1).prev = n0
    TreeOps.insertSiblingsAfter(d.arena, anchor, n0)
    assert(d.select("#before-origin + #origin + #after-origin + #after-0 + #after-1").exists)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:579-600 test_node_add_class / test_node_remove_class
  test("node-level add_class / remove_class") {
    val d = Doc.parse(Ancestors)
    val c = d.selectSingle("#parent .child").ids.head
    TreeOps.addClass(d.arena, c, "blue")
    assert(d.select("#parent .blue.child").length == 1)
    assert(d.validate.isEmpty)

    val d2 = Doc.parse(Ancestors)
    val sel = d2.select("#parent .child")
    assert(sel.length == 2)
    TreeOps.removeClass(d2.arena, sel.ids.head, "child")
    assert(d2.select("#parent .child").length == 1)
  }

  // node-manipulation.rs:616-654 remove_attrs / retain_attrs / remove_all_attrs
  test("node-level attr batch removal variants") {
    val d = Doc.parse(Ancestors)
    val sel = d.select("#parent [class][id]")
    assert(sel.length == 2)
    TreeOps.removeAttrs(d.arena, sel.ids.head, Seq("class", "id"))
    assert(d.select("#parent [class][id]").length == 1)
    assert(d.validate.isEmpty)

    val d2 = Doc.parse(Ancestors)
    val sel2 = d2.select("#parent [class][id]")
    TreeOps.retainAttrs(d2.arena, sel2.ids.head, Set("id"))
    assert(d2.select("#parent [class][id]").length == 1)
    assert(d2.select("#parent [id]").length == 2)
    assert(d2.validate.isEmpty)

    val d3 = Doc.parse(Ancestors)
    val sel3 = d3.select("#parent [class][id]")
    TreeOps.removeAllAttrs(d3.arena, sel3.ids.head)
    assert(d3.select("#parent [class][id]").length == 1)
    assert(d3.validate.isEmpty)
  }

  // node-manipulation.rs:688-710 test_node_wrap_node
  test("wrap_node with a fresh same-tree wrapper") {
    val d = Doc.parse(Ancestors)
    val target = d.select("#first-child").ids.head
    val wrapper = d.arena.createElement("div", Seq("id" -> "wrapper"))
    TreeOps.wrapNode(d.arena, target, wrapper)
    assert(d.select("#parent #wrapper").length == 1)
    assert(d.select("#wrapper > #first-child").length == 1)
    assert(d.select("#parent > *").length == 2)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:712-734 test_node_wrap_node_existing
  test("wrap_node with an existing element moves the target inside it") {
    val d = Doc.parse(Ancestors)
    val target = d.select("#first-child").ids.head
    val wrapper = d.select("#second-child").ids.head
    TreeOps.wrapNode(d.arena, target, wrapper)
    assert(d.select("#parent #second-child").length == 1)
    assert(d.select("#second-child > #first-child").length == 1)
    assert(d.select("#parent > *").length == 1)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:764-780 test_node_unwrap_node
  test("unwrap_node promotes both children and drops the parent") {
    val d = Doc.parse(Ancestors)
    val target = d.select("#first-child").ids.head
    val parent = d.arena(target).parent
    TreeOps.unwrapNode(d.arena, parent)
    assert(d.select("#parent").isEmpty)
    assert(d.select("#grand-parent > #first-child").length == 1)
    assert(d.select("#grand-parent > #second-child").length == 1)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:783-794 test_node_unwrap_node_noop_if_no_parent
  test("unwrap_node on the root is a no-op") {
    val d = Doc.parse(Ancestors)
    TreeOps.unwrapNode(d.arena, 0)
    assert(d.select("html").length == 1)
    assert(d.select("#great-ancestor").length == 1)
    assert(d.validate.isEmpty)
  }

  // node-manipulation.rs:824-846 test_add_meta_element (void serialization)
  test("prepended meta serializes as a void element") {
    val d = Doc.parse(
      "\n<!DOCTYPE html>\n<html>\n    <head>\n        <title>Test</title>\n    </head>\n    <body>\n    </body>\n</html>\n")
    val head = d.selectSingle("head").ids.head
    val meta = d.arena.createElement("meta",
      Seq("name" -> "viewport", "content" -> "width=1120"))
    TreeOps.prependChild(d.arena, head, meta)
    val html = d.html
    assert(html.contains("""<meta name="viewport" content="width=1120">"""))
    assert(!html.contains("</meta>"))
    assert(d.validate.isEmpty)
  }
}
