package graft.sources

import graft.model.{Arena, MutNode, NodeKind, NodeRec}
import scala.collection.mutable

/**
 * Deterministic HTML → arena parser (S1/S2 in SURVEY.md §2.1).
 *
 * The reference parses with html5ever via a `TreeSink` that appends straight
 * into the arena (`src/document.rs:44-55, 258-494`); ids are assigned in parse
 * order so fresh trees are preorder-numbered. We reimplement a pragmatic
 * HTML5-lite tokenizer + tree builder in pure Scala (no external deps are
 * available offline): doctype/comments/void/raw-text elements, implicit
 * html/head/body scaffolding, implied end tags (p/li/dt/dd/tr/td/th/option),
 * tbody insertion, `<template>` contents as a detached Fragment subtree
 * (`document.rs:330-349`), duplicate attributes dropped (first wins,
 * `node_data.rs:244-257`), and adjacent-text merging at parse time
 * (`document.rs:374-396`).
 *
 * Not a port: this is a from-scratch Scala implementation that matches the
 * reference's observable behavior on its test fixtures.
 */
object HtmlParser {

  val VoidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  val RawTextElements: Set[String] = Set("script", "style", "xmp", "iframe", "noembed", "noframes")
  val RcdataElements: Set[String] = Set("title", "textarea")

  /** Start tags that close an open <p> (button scope), per HTML5 spec. */
  private val ClosesP: Set[String] = Set(
    "address", "article", "aside", "blockquote", "center", "details",
    "dialog", "dir", "div", "dl", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hgroup", "hr", "listing", "main", "menu", "nav", "ol", "p",
    "plaintext", "pre", "section", "summary", "table", "ul", "xmp")

  private val HeadContent: Set[String] = Set("title", "base", "link", "meta", "style", "script", "noscript", "template")

  private val TableSections = Set("thead", "tbody", "tfoot")

  // --- Tokenizer -----------------------------------------------------------

  sealed trait Tok
  case class TText(s: String) extends Tok
  case class TStart(name: String, attrs: List[(String, String)], selfClosing: Boolean) extends Tok
  case class TEnd(name: String) extends Tok
  case class TComment(s: String) extends Tok
  case class TDoctype(name: String, publicId: String, systemId: String) extends Tok

  def tokenize(html: String): List[Tok] = {
    val toks = mutable.ListBuffer[Tok]()
    val n = html.length
    var i = 0
    val text = new java.lang.StringBuilder

    def flushText(): Unit =
      if (text.length > 0) { toks += TText(Entities.decode(text.toString)); text.setLength(0) }

    def isNameStart(c: Char) = Character.isLetter(c)

    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        // bulk text scan to the next tag open (char-by-char dominated here)
        val next = html.indexOf('<', i)
        val stop = if (next == -1) n else next
        text.append(html, i, stop)
        i = stop
      } else if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          if (html.regionMatches(i + 2, "--", 0, 2)) {
            flushText()
            val end = html.indexOf("-->", i + 4)
            val stop = if (end == -1) n else end
            toks += TComment(html.substring(i + 4, stop))
            i = if (end == -1) n else end + 3
          } else if (html.regionMatches(true, i + 2, "DOCTYPE", 0, 7)) {
            flushText()
            val end = html.indexOf('>', i + 2)
            val stop = if (end == -1) n else end
            val body = html.substring(i + 9, stop).trim
            toks += parseDoctype(body)
            i = if (end == -1) n else end + 1
          } else { // bogus comment
            flushText()
            val end = html.indexOf('>', i + 2)
            val stop = if (end == -1) n else end
            toks += TComment(html.substring(i + 2, stop))
            i = if (end == -1) n else end + 1
          }
        } else if (c1 == '?') { // bogus comment per HTML5 (reference gets Comment)
          flushText()
          val end = html.indexOf('>', i + 2)
          val stop = if (end == -1) n else end
          toks += TComment("?" + html.substring(i + 2, stop))
          i = if (end == -1) n else end + 1
        } else if (c1 == '/') {
          if (i + 2 < n && isNameStart(html.charAt(i + 2))) {
            flushText()
            var j = i + 2
            while (j < n && html.charAt(j) != '>') j += 1
            val raw = html.substring(i + 2, if (j < n) j else n)
            val name = raw.takeWhile(ch => !Character.isWhitespace(ch)).toLowerCase
            if (name == "br") toks += TStart("br", Nil, selfClosing = false) // spec: </br> acts as <br>
            else toks += TEnd(name)
            i = if (j < n) j + 1 else n
          } else { text.append(c); i += 1 }
        } else if (isNameStart(c1)) {
          flushText()
          val (tok, next) = parseStartTag(html, i)
          toks += tok
          i = next
          tok match {
            case TStart(name, _, false) if RawTextElements(name) || RcdataElements(name) =>
              // consume raw text until the matching close tag — manual
              // case-insensitive scan (a compiled regex per element instance
              // dominated tokenizer cost)
              val rawEnd = findCloseTag(html, i, name)
              val stop = if (rawEnd == -1) n else rawEnd
              val raw = html.substring(i, stop)
              val content = if (RcdataElements(name)) Entities.decode(raw) else raw
              if (content.nonEmpty) toks += TText(content)
              if (rawEnd != -1) {
                val gt = html.indexOf('>', rawEnd)
                toks += TEnd(name)
                i = if (gt == -1) n else gt + 1
              } else i = n
            case _ =>
          }
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    toks.toList
  }

  /** Index of `</name` (case-insensitive, followed by ws/>//) at or after
    * `from`; -1 if absent. */
  private def findCloseTag(html: String, from: Int, name: String): Int = {
    val n = html.length
    var i = from
    while (true) {
      i = html.indexOf('<', i)
      if (i == -1 || i + 1 >= n) return -1
      if (html.charAt(i + 1) == '/' &&
          html.regionMatches(true, i + 2, name, 0, name.length)) {
        val after = i + 2 + name.length
        if (after >= n) return i
        val c = html.charAt(after)
        if (c == '>' || c == '/' || Character.isWhitespace(c)) return i
      }
      i += 1
    }
    -1
  }

  private def parseDoctype(body: String): TDoctype = {
    // loose parse: name [PUBLIC "pub" ["sys"] | SYSTEM "sys"]
    val name = body.takeWhile(!Character.isWhitespace(_)).toLowerCase
    var publicId = ""
    var systemId = ""
    val rest = body.drop(name.length).trim
    def quoted(s: String): (String, String) = {
      if (s.isEmpty) ("", "")
      else {
        val q = s.charAt(0)
        if (q == '"' || q == '\'') {
          val e = s.indexOf(q, 1)
          if (e == -1) (s.substring(1), "") else (s.substring(1, e), s.substring(e + 1).trim)
        } else ("", s)
      }
    }
    if (rest.toUpperCase.startsWith("PUBLIC")) {
      val (p, r2) = quoted(rest.drop(6).trim)
      publicId = p
      val (s, _) = quoted(r2)
      systemId = s
    } else if (rest.toUpperCase.startsWith("SYSTEM")) {
      val (s, _) = quoted(rest.drop(6).trim)
      systemId = s
    }
    TDoctype(name, publicId, systemId)
  }

  private def parseStartTag(html: String, start: Int): (TStart, Int) = {
    val n = html.length
    var i = start + 1
    val nameSb = new java.lang.StringBuilder
    while (i < n && !Character.isWhitespace(html.charAt(i)) && html.charAt(i) != '>' && html.charAt(i) != '/') {
      nameSb.append(Character.toLowerCase(html.charAt(i))); i += 1
    }
    val name = nameSb.toString
    val attrs = mutable.ListBuffer[(String, String)]()
    val seen = mutable.HashSet[String]()
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          i += 1
          if (i < n && html.charAt(i) == '>') { selfClosing = true; i += 1; done = true }
        case _ =>
          val kSb = new java.lang.StringBuilder
          while (i < n && !Character.isWhitespace(html.charAt(i)) &&
                 html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') {
            kSb.append(Character.toLowerCase(html.charAt(i))); i += 1
          }
          val key = kSb.toString
          while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
          var value = ""
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
            if (i < n) {
              val q = html.charAt(i)
              if (q == '"' || q == '\'') {
                i += 1
                val e = html.indexOf(q, i)
                val stop = if (e == -1) n else e
                value = Entities.decode(html.substring(i, stop))
                i = if (e == -1) n else e + 1
              } else {
                val vSb = new java.lang.StringBuilder
                while (i < n && !Character.isWhitespace(html.charAt(i)) && html.charAt(i) != '>') {
                  vSb.append(html.charAt(i)); i += 1
                }
                value = Entities.decode(vSb.toString)
              }
            }
          }
          if (key.nonEmpty && !seen(key)) { seen += key; attrs += (key -> value) }
      }
    }
    (TStart(name, attrs.toList, selfClosing), i)
  }

  // --- Tree builder --------------------------------------------------------

  /** Parse a full document: root = Document node at id 0 (`tree.rs:126-128`). */
  def parseDocument(html: String): Arena = build(html, fragment = false)

  /** Parse a fragment: root = Fragment node; doctype dropped
    * (`document.rs:60-88`, drops DOCTYPE at `:70-71`). Content nodes attach
    * directly under the fragment root (we skip html5ever's html/body
    * scaffolding, which the reference's merge also skips — `ops.rs:443-452`). */
  def parseFragment(html: String): Arena = build(html, fragment = true)

  private def build(html: String, fragment: Boolean): Arena = {
    val arena = new Arena
    val rootKind = if (fragment) NodeKind.Fragment else NodeKind.Document
    arena.create(new MutNode(rootKind))
    val toks = tokenize(html)

    // open element stack: (arenaId, tagName); root is a pseudo entry
    var stack = List[(Int, String)]((0, "#root"))
    if (fragment) {
      // html5ever fragment layout (reference merge skips exactly these 3
      // scaffold nodes: root, stray body, html — ops.rs:443-452): content
      // lives under an <html> element child of the Fragment root, and a
      // detached body occupies arena id 2
      val htmlEl = arena.createElement("html") // id 1
      val p = arena(0)
      arena(htmlEl).parent = 0
      p.firstChild = htmlEl; p.lastChild = htmlEl
      arena.createElement("body") // id 2, detached
      stack = (htmlEl, "#fragment-html") :: stack
    }
    var htmlId = -1
    var headId = -1
    var bodyId = -1
    var headClosed = false
    var bodyStarted = fragment // fragments behave as if in body

    def curParent: Int = stack.head._1

    def appendNode(parentId: Int, node: MutNode): Int = {
      val id = arena.create(node)
      link(parentId, id)
      id
    }

    def link(parentId: Int, id: Int): Unit = {
      val p = arena(parentId)
      val nd = arena(id)
      nd.parent = parentId
      if (p.lastChild == -1) { p.firstChild = id; p.lastChild = id }
      else {
        val last = p.lastChild
        arena(last).next = id
        nd.prev = last
        p.lastChild = id
      }
    }

    def appendText(parentId: Int, s0: String): Unit = {
      val p = arena(parentId)
      // HTML5: a newline immediately after a pre/textarea/listing start tag
      // is dropped
      val s =
        if (p.firstChild == -1 && p.isElement &&
            (p.name == "pre" || p.name == "textarea" || p.name == "listing") &&
            s0.startsWith("\n")) s0.substring(1)
        else s0
      if (s.isEmpty) return
      if (p.lastChild != -1 && arena(p.lastChild).isText) {
        // merge adjacent text (document.rs:374-396, append_to_existing_text :496-510)
        arena(p.lastChild).text = arena(p.lastChild).text + s
      } else appendNode(parentId, new MutNode(NodeKind.Text, text = s))
    }

    def openTags: List[String] = stack.map(_._2)

    def ensureHtml(): Unit = if (!fragment && htmlId == -1) {
      htmlId = arena.createElement("html")
      link(0, htmlId)
      stack = (htmlId, "html") :: stack
    }

    def ensureHead(): Unit = if (!fragment && headId == -1) {
      ensureHtml()
      headId = arena.createElement("head")
      link(htmlId, headId)
    }

    def ensureBody(): Unit = {
      if (fragment) return
      if (bodyId == -1) {
        ensureHtml()
        ensureHead()
        headClosed = true
        // pop anything above html (i.e., head if open)
        stack = stack.dropWhile(e => e._2 != "html" && e._2 != "#root")
        bodyId = arena.createElement("body")
        link(htmlId, bodyId)
        stack = (bodyId, "body") :: stack
      }
      bodyStarted = true
    }

    def popTo(name: String): Unit = {
      // pop until we popped an element with `name`; no-op if absent
      if (!openTags.contains(name)) return
      while (stack.nonEmpty && stack.head._2 != name) stack = stack.tail
      if (stack.nonEmpty && stack.head._2 == name) stack = stack.tail
    }

    def inScope(name: String): Boolean = {
      // approximate button/list-item scope: stop at table boundaries
      var s = stack
      while (s.nonEmpty) {
        val t = s.head._2
        if (t == name) return true
        if (t == "table" || t == "td" || t == "th" || t == "#root" || t == "template") return false
        s = s.tail
      }
      false
    }

    def closeImplied(incoming: String): Unit = {
      incoming match {
        case t if ClosesP(t) => if (inScope("p")) popTo("p")
        case _ =>
      }
      incoming match {
        case "li" =>
          // close open li up to nearest ul/ol
          var s = stack
          var found = false
          while (s.nonEmpty && !found) {
            val t = s.head._2
            if (t == "li") { popTo("li"); found = true }
            else if (t == "ul" || t == "ol" || t == "#root" || t == "table") found = true
            else s = s.tail
          }
        case "dt" | "dd" =>
          var s = stack
          var found = false
          while (s.nonEmpty && !found) {
            val t = s.head._2
            if (t == "dt" || t == "dd") { popTo(t); found = true }
            else if (t == "dl" || t == "#root") found = true
            else s = s.tail
          }
        case "option" => if (stack.head._2 == "option") stack = stack.tail
        case "optgroup" =>
          if (stack.head._2 == "option") stack = stack.tail
          if (stack.head._2 == "optgroup") stack = stack.tail
        case "tr" =>
          if (openTags.contains("tr")) popTo("tr")
          else {
            // close td/th if open without tr (rare)
            if (stack.head._2 == "td" || stack.head._2 == "th") stack = stack.tail
          }
        case "td" | "th" =>
          if (stack.exists(e => e._2 == "td" || e._2 == "th") &&
              !stack.takeWhile(e => e._2 != "td" && e._2 != "th").exists(_._2 == "tr")) {
            val cell = stack.find(e => e._2 == "td" || e._2 == "th").get._2
            popTo(cell)
          }
        case s if TableSections(s) =>
          stack.head._2 match {
            case t if TableSections(t) => stack = stack.tail
            case "tr" => popTo("tr"); if (TableSections(stack.head._2)) stack = stack.tail
            case _ =>
          }
        case "a" => if (openTags.contains("a")) popTo("a") // simplified adoption agency
        case "button" => if (inScope("button")) popTo("button")
        case _ =>
      }
    }

    def tableFixups(incoming: String): Unit = {
      val cur = stack.head._2
      incoming match {
        case "tr" if cur == "table" =>
          val tb = appendNode(curParent, { val m = new MutNode(NodeKind.Element, "tbody"); m.attrs = mutable.LinkedHashMap(); m })
          stack = (tb, "tbody") :: stack
        case "td" | "th" =>
          if (cur == "table") {
            val tb = appendNode(curParent, { val m = new MutNode(NodeKind.Element, "tbody"); m.attrs = mutable.LinkedHashMap(); m })
            stack = (tb, "tbody") :: stack
          }
          if (TableSections(stack.head._2)) {
            val tr = appendNode(curParent, { val m = new MutNode(NodeKind.Element, "tr"); m.attrs = mutable.LinkedHashMap(); m })
            stack = (tr, "tr") :: stack
          }
        case _ =>
      }
    }

    toks.foreach {
      case TDoctype(name, pub, sys) =>
        if (!fragment && htmlId == -1 && bodyId == -1) {
          val m = new MutNode(NodeKind.Doctype, name)
          m.text = if (pub.isEmpty && sys.isEmpty) null else s"$pub|$sys"
          appendNode(0, m)
        } // fragments drop doctype (document.rs:70-71)

      case TComment(s) =>
        val target = if (fragment) curParent
          else if (bodyStarted || htmlId != -1) curParent
          else 0
        appendNode(target, new MutNode(NodeKind.Comment, text = s))

      case TText(s) =>
        // is the insertion point inside the head subtree (e.g. <title> text)?
        def underHead: Boolean = {
          if (headId == -1) return false
          var p = curParent
          while (p != -1) {
            if (p == headId) return true
            p = arena(p).parent
          }
          false
        }
        if (fragment) appendText(curParent, s)
        else if (bodyStarted) appendText(curParent, s)
        else if (underHead) appendText(curParent, s)
        else if (s.forall(Character.isWhitespace)) {
          // before-html/before-head: ignore; in-head: insert into head;
          // after-head: insert under html (spec "insert the character")
          if (headId != -1 && !headClosed && stack.head._1 != htmlId && stack.head._1 != 0) {
            appendText(curParent, s)
          } else if (headClosed && htmlId != -1) appendText(htmlId, s)
          // else ignore
        } else {
          ensureBody()
          appendText(curParent, s)
        }

      case TStart(name, attrs, selfClosing) =>
        name match {
          case "html" if fragment =>
            // merge attrs into the scaffold html (spec: unexpected html tag)
            attrs.foreach { case (k, v) =>
              val h = arena(1)
              if (!h.attrs.contains(k)) h.attrs(k) = v
            }
          case "head" | "body" if fragment =>
            // ignored in a body-context fragment; content flows through
            ()
          case "html" if !fragment =>
            if (htmlId == -1) {
              htmlId = arena.createElement("html", attrs)
              link(0, htmlId)
              stack = (htmlId, "html") :: stack
            } else attrs.foreach { case (k, v) =>
              val h = arena(htmlId)
              if (!h.attrs.contains(k)) h.attrs(k) = v
            }
          case "head" if !fragment =>
            ensureHtml()
            if (headId == -1) {
              headId = arena.createElement("head", attrs)
              link(htmlId, headId)
            }
            stack = (headId, "head") :: stack
          case "body" if !fragment =>
            ensureHtml(); ensureHead(); headClosed = true
            stack = stack.dropWhile(e => e._2 != "html" && e._2 != "#root")
            if (bodyId == -1) {
              bodyId = arena.createElement("body", attrs)
              link(htmlId, bodyId)
            } else attrs.foreach { case (k, v) =>
              val b = arena(bodyId)
              if (!b.attrs.contains(k)) b.attrs(k) = v
            }
            stack = (bodyId, "body") :: stack
            bodyStarted = true
          case _ =>
            if (!fragment && !bodyStarted && HeadContent(name)) {
              ensureHead()
              // insert into head
              val id = arena.createElement(name, attrs)
              link(headId, id)
              if (name == "template") {
                val frag = arena.create(new MutNode(NodeKind.Fragment))
                arena(id).templateContents = frag
                stack = (frag, "template") :: stack
              } else if (!VoidElements(name) && !RawTextElements(name) && !RcdataElements(name)) {
                stack = (id, name) :: stack
              } else if (RawTextElements(name) || RcdataElements(name)) {
                stack = (id, name) :: stack
              }
            } else {
              if (!fragment) ensureBody()
              closeImplied(name)
              tableFixups(name)
              val id = arena.createElement(name, attrs)
              link(curParent, id)
              // foreign content (svg/math subtrees) honors the self-closing
              // flag; HTML elements ignore it per spec
              val inForeign = stack.exists(e => e._2 == "svg" || e._2 == "math")
              if (name == "template") {
                val frag = arena.create(new MutNode(NodeKind.Fragment))
                arena(id).templateContents = frag
                stack = (frag, "template") :: stack
              } else if (!VoidElements(name) && !(selfClosing && inForeign)) {
                stack = (id, name) :: stack
              }
            }
        }

      case TEnd(name) =>
        name match {
          case "html" => // keep scaffolding open; subsequent content still lands in body
            if (!fragment) { /* after-html: ignore */ }
            else popTo(name)
          case "body" =>
            // after-body: leave body on stack bottom so trailing text appends to it
            if (!fragment && bodyId != -1) {
              stack = stack.dropWhile(e => e._1 != bodyId && e._2 != "#root")
            } else if (fragment) popTo(name)
          case "head" =>
            headClosed = true
            if (stack.nonEmpty && stack.head._2 == "head") stack = stack.tail
          case "p" =>
            if (inScope("p")) popTo("p")
            else if (bodyStarted || fragment) {
              // spec: </p> with no open p inserts an empty <p>
              val id = arena.createElement("p")
              link(curParent, id)
            }
          case "template" =>
            // pop to the fragment pseudo-entry
            if (openTags.contains("template")) popTo("template")
          case _ => popTo(name)
        }
    }
    arena
  }

  /** Parse + finalize to immutable records (preorder renumbered). */
  def parseToRecs(html: String, fragment: Boolean = false): Array[NodeRec] = {
    val a = if (fragment) parseFragment(html) else parseDocument(html)
    Renumber.preorder(a).toRecs
  }
}

/**
 * Renumber an arena so that arena index == preorder position. Fresh html5ever
 * parses are naturally preorder-numbered for non-reparented content; our
 * builder can create nodes out of order (implicit scaffolding, foster
 * parenting), so we canonicalize once at ingest — this is what makes
 * `subtree_end` a contiguous range (SURVEY.md §2.4 T4).
 */
object Renumber {
  /** Is arena id order already preorder? True for almost every fresh parse
    * (nodes are appended while descending) — skipping the rebuild then. */
  def isPreorder(a: Arena): Boolean = {
    if (a.size == 0) return false
    var expected = 0
    val stack = new Array[Int](a.size)
    var top = 0
    stack(top) = 0; top += 1
    while (top > 0) {
      top -= 1
      val cur = stack(top)
      if (cur != expected) return false
      expected += 1
      // children (and template contents first) in reverse push order
      var c = a(cur).lastChild
      while (c != -1) { stack(top) = c; top += 1; c = a(c).prev }
      val tc = a(cur).templateContents
      if (tc != -1) { stack(top) = tc; top += 1 }
    }
    expected == a.size
  }

  def preorder(a: Arena): Arena = {
    if (isPreorder(a)) return a
    val order = mutable.ArrayBuffer[Int]()
    val pos = mutable.HashMap[Int, Int]()
    def visit(id: Int): Unit = {
      val stack = mutable.ListBuffer[Int](id)
      while (stack.nonEmpty) {
        val cur = stack.remove(0)
        pos(cur) = order.length
        order += cur
        // push children in order (they'll be visited before later siblings
        // because we prepend)
        val kids = a.childIds(cur)
        stack.prependAll(kids)
        // also walk template contents fragments right after the element
        val tc = a(cur).templateContents
        if (tc != -1) stack.prepend(tc)
      }
    }
    visit(0)
    // any detached nodes (shouldn't exist fresh from parse) appended at end
    (0 until a.size).foreach(i => if (!pos.contains(i)) { pos(i) = order.length; order += i })
    val out = new Arena
    order.foreach { old =>
      val src = a(old)
      val m = src.deepCopyShallow()
      def mp(x: Int) = if (x == -1) -1 else pos(x)
      m.parent = mp(src.parent)
      m.prev = mp(src.prev)
      m.next = mp(src.next)
      m.firstChild = mp(src.firstChild)
      m.lastChild = mp(src.lastChild)
      m.templateContents = mp(src.templateContents)
      out.nodes += m
    }
    out
  }
}

/** Minimal HTML entity decoding (named common set + numeric). */
object Entities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "plusmn" -> "±", "micro" -> "µ", "para" -> "¶",
    "middot" -> "·", "bull" -> "•", "dagger" -> "†",
    "sect" -> "§", "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "shy" -> "­", "larr" -> "←", "rarr" -> "→",
    "uarr" -> "↑", "darr" -> "↓", "minus" -> "−", "ne" -> "≠",
    "le" -> "≤", "ge" -> "≥", "infin" -> "∞", "prime" -> "′",
    "Prime" -> "″", "frac12" -> "½", "frac14" -> "¼", "sup2" -> "²",
    "sup3" -> "³", "ouml" -> "ö", "auml" -> "ä", "uuml" -> "ü",
    "szlig" -> "ß", "eacute" -> "é", "egrave" -> "è", "agrave" -> "à")

  def decode(s: String): String = {
    if (s.indexOf('&') == -1) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi != -1 && semi - i <= 12) {
          val ent = s.substring(i + 1, semi)
          if (ent.startsWith("#x") || ent.startsWith("#X")) {
            try { sb.appendCodePoint(Integer.parseInt(ent.substring(2), 16)); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (ent.startsWith("#")) {
            try { sb.appendCodePoint(Integer.parseInt(ent.substring(1))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else named.get(ent) match {
            case Some(v) => sb.append(v); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape text content for HTML serialization (html5ever rules:
    * `&`, `<`, `>`, and U+00A0 → `&nbsp;`). */
  def escapeText(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case ' ' => sb.append("&nbsp;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Escape attribute values (`&`, `"`, U+00A0). */
  def escapeAttr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '"' => sb.append("&quot;")
      case ' ' => sb.append("&nbsp;")
      case c => sb.append(c)
    }
    sb.toString
  }
}
