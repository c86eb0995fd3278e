package graft.sources

import graft.css.NodeAccess

/**
 * Serialization operators (S4/S5/S6 in SURVEY.md §2.1), implemented over the
 * abstract [[NodeAccess]] view with explicit stacks (no recursion), like the
 * reference (`src/node/serializing.rs:25-86`, `src/node/text_formatting.rs`).
 */
object Serializer {

  private sealed trait Op
  private case class Open(id: Int) extends Op
  private case class Close(name: String) extends Op

  private def childOps(acc: NodeAccess, id: Int): List[Op] = {
    var kids: List[Op] = Nil
    var c = acc.lastChild(id)
    while (c != -1) { kids = Open(c) :: kids; c = acc.prevSibling(c) }
    kids
  }

  /** Serialize to HTML. `includeRoot=true` ≈ `html()`, false ≈ `inner_html()`
    * (reference `node_ref.rs:560-602`). Template contents are serialized
    * inside their host element (serializing.rs:60-63). */
  def toHtml(acc: NodeAccess, root: Int, includeRoot: Boolean,
      templateContents: Int => Int = _ => -1): String = {
    val sb = new java.lang.StringBuilder
    var stack: List[Op] = if (includeRoot) List(Open(root)) else childOps(acc, root)
    while (stack.nonEmpty) {
      val op = stack.head
      stack = stack.tail
      op match {
        case Open(id) =>
          acc.kind(id) match {
            case "element" =>
              val name = acc.name(id)
              sb.append('<').append(name)
              attrSeq(acc, id).foreach { case (k, v) =>
                sb.append(' ').append(k).append("=\"").append(Entities.escapeAttr(v)).append('"')
              }
              sb.append('>')
              if (!HtmlParser.VoidElements(name)) {
                stack = Close(name) :: stack
                var kids = childOps(acc, id)
                val tc = templateContents(id)
                if (tc != -1) kids = Open(tc) :: kids
                stack = kids ::: stack
              }
            case "text" =>
              val t = acc.text(id)
              if (t != null) {
                // raw-text element contents are not escaped (html5ever serializer)
                val p = acc.parent(id)
                val rawParent = p != -1 && acc.isElement(p) &&
                  (HtmlParser.RawTextElements(acc.name(p)) || acc.name(p) == "plaintext")
                sb.append(if (rawParent) t else Entities.escapeText(t))
              }
            case "comment" =>
              sb.append("<!--").append(if (acc.text(id) == null) "" else acc.text(id)).append("-->")
            case "doctype" =>
              sb.append("<!DOCTYPE ").append(acc.name(id)).append('>')
            case "pi" =>
              sb.append("<?").append(if (acc.text(id) == null) "" else acc.text(id)).append('>')
            case _ => // document/fragment: children only
              stack = childOps(acc, id) ::: stack
          }
        case Close(name) =>
          sb.append("</").append(name).append('>')
      }
    }
    sb.toString
  }

  /** Attribute iteration in stored order. NodeAccess has no attr iterator —
    * provided by the concrete views. */
  private def attrSeq(acc: NodeAccess, id: Int): Seq[(String, String)] = acc match {
    case aa: AttrIterable => aa.attrEntries(id)
    case _ => Nil
  }

  /** Whitespace-normalized text with block-element line-break rules —
    * S6/X8, semantics from `src/node/text_formatting.rs:11-144`:
    *  - text runs whitespace-collapsed, word-joined by single spaces
    *  - block elements (article blockquote section div p pre h1-h6 ul ol dl
    *    table) force "\n\n" after (and a "\n" before if text doesn't already
    *    end with a break)
    *  - br/hr/li/tr force "\n"; td/th force a single space
    *  - `<pre>` subtree text is included verbatim
    *  - for includeRoot=false, trailing whitespace is trimmed. */
  def formattedText(acc: NodeAccess, root: Int, includeRoot: Boolean): String = {
    val text = new java.lang.StringBuilder
    var stack: List[Op] = if (includeRoot) List(Open(root)) else childOps(acc, root)

    def endsWith(s: String): Boolean =
      text.length >= s.length && text.substring(text.length - s.length) == s
    def endsWithAny(cs: Char*): Boolean =
      text.length > 0 && cs.contains(text.charAt(text.length - 1))
    def trimRightSpace(): Unit =
      while (text.length > 0 && text.charAt(text.length - 1) == ' ')
        text.setLength(text.length - 1)

    // Rust char::is_whitespace = Unicode White_Space (includes U+00A0);
    // Java Character.isWhitespace does NOT — match the reference exactly.
    def isUws(c: Char): Boolean = Character.isWhitespace(c) || Character.isSpaceChar(c)
    def pushNormalized(newText: String): Unit = {
      val followsNewline = text.length == 0 || endsWithAny('\n', ' ')
      val pushStartWs = !followsNewline && newText.nonEmpty && isUws(newText.charAt(0))
      val pushEndWs = newText.nonEmpty && isUws(newText.charAt(newText.length - 1))
      val words = splitUws(newText)
      val result = new java.lang.StringBuilder
      if (words.nonEmpty) {
        if (pushStartWs) result.append(' ')
        result.append(words.mkString(" "))
      }
      if (result.length == 0 && followsNewline) return
      text.append(result)
      if (pushEndWs && !(text.length > 0 && isUws(text.charAt(text.length - 1))))
        text.append(' ')
    }
    def splitUws(s: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val b = new java.lang.StringBuilder
      s.foreach { c =>
        if (isUws(c)) { if (b.length > 0) { out += b.toString; b.setLength(0) } }
        else b.append(c)
      }
      if (b.length > 0) out += b.toString
      out.toArray
    }

    val lineBreakElems = Set("article", "blockquote", "section", "div", "p", "pre",
      "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "dl", "table")

    def closeAdjust(name: String): Unit = {
      if (text.length == 0 || endsWith("\n\n")) return
      if (lineBreakElems(name)) { trimRightSpace(); text.append("\n\n") }
      else if (name == "br" || name == "hr" || name == "li" || name == "tr") {
        trimRightSpace(); text.append('\n')
      } else if ((name == "td" || name == "th") && !endsWithAny('\n', ' ')) text.append(' ')
    }

    while (stack.nonEmpty) {
      val op = stack.head
      stack = stack.tail
      op match {
        case Open(id) =>
          acc.kind(id) match {
            case "text" => if (acc.text(id) != null) pushNormalized(acc.text(id))
            case "element" =>
              val name = acc.name(id)
              if (!(text.length == 0 || endsWith("\n\n")) && lineBreakElems(name))
                text.append('\n')
              stack = Close(name) :: stack
              if (name == "pre") {
                text.append(graft.css.Engine.subtreeText(acc, id))
              } else {
                stack = childOps(acc, id) ::: stack
              }
            case _ => stack = childOps(acc, id) ::: stack
          }
        case Close(name) => closeAdjust(name)
      }
    }
    var out = text.toString
    if (!includeRoot) {
      var end = out.length
      while (end > 0 && isUws(out.charAt(end - 1))) end -= 1
      out = out.substring(0, end)
    }
    out
  }

  /** Markdown serialization (S5) — lite but faithful for the common shapes:
    * headings, paragraphs, bold/italic/code, links, images, lists, tables,
    * blockquotes, pre/code fences. Default skip list matches the reference
    * (`src/serializing/md/constants.rs:5`): script, style, meta, head. */
  def toMd(acc: NodeAccess, root: Int, includeRoot: Boolean,
      skipTags: Seq[String] = Seq("script", "style", "meta", "head")): String = {
    val skip = skipTags.toSet
    val sb = new StringBuilder

    def inlineText(id: Int): String = {
      val b = new StringBuilder
      def walk(i: Int): Unit = {
        acc.kind(i) match {
          case "text" => if (acc.text(i) != null) b.append(acc.text(i).replaceAll("\\s+", " "))
          case "element" =>
            val nm = acc.name(i)
            if (!skip(nm)) nm match {
              case "strong" | "b" => b.append("**"); walkKids(i); b.append("**")
              case "em" | "i" => b.append('*'); walkKids(i); b.append('*')
              case "code" => b.append('`'); walkKids(i); b.append('`')
              case "del" | "s" => b.append("~~"); walkKids(i); b.append("~~")
              case "br" => b.append("\n")
              case "a" =>
                val href = Option(acc.attr(i, "href")).getOrElse("")
                b.append('[')
                walkKids(i)
                b.append("](").append(href).append(')')
              case "img" =>
                val src = Option(acc.attr(i, "src")).getOrElse("")
                val alt = Option(acc.attr(i, "alt")).getOrElse("")
                b.append("![").append(alt).append("](").append(src).append(')')
              case _ => walkKids(i)
            }
          case _ =>
        }
      }
      def walkKids(i: Int): Unit = {
        var c = acc.firstChild(i)
        while (c != -1) { walk(c); c = acc.nextSibling(c) }
      }
      walk(id)
      b.toString.trim
    }

    def block(id: Int, listDepth: Int, ordered: Boolean): Unit = {
      acc.kind(id) match {
        case "element" =>
          val nm = acc.name(id)
          if (skip(nm)) return
          nm match {
            case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
              pad(); sb.append("#" * (nm.charAt(1) - '0')).append(' ').append(inlineText(id)).append("\n\n")
            case "p" =>
              val t = inlineText(id)
              if (t.nonEmpty) { pad(); sb.append(t).append("\n\n") }
            case "ul" | "ol" =>
              var c = acc.firstChild(id)
              var k = 1
              while (c != -1) {
                if (acc.isElement(c) && acc.name(c) == "li") {
                  sb.append("  " * listDepth)
                  if (nm == "ol") { sb.append(k).append(". ") ; k += 1 }
                  else sb.append("- ")
                  sb.append(inlineLiHead(c)).append('\n')
                  // nested lists inside li
                  var cc = acc.firstChild(c)
                  while (cc != -1) {
                    if (acc.isElement(cc) && (acc.name(cc) == "ul" || acc.name(cc) == "ol"))
                      block(cc, listDepth + 1, acc.name(cc) == "ol")
                    cc = acc.nextSibling(cc)
                  }
                }
                c = acc.nextSibling(c)
              }
              if (listDepth == 0) sb.append('\n')
            case "pre" =>
              pad(); sb.append("```\n").append(graft.css.Engine.subtreeText(acc, id)).append("\n```\n\n")
            case "blockquote" =>
              val t = inlineText(id)
              pad(); t.split('\n').foreach(l => sb.append("> ").append(l).append('\n'))
              sb.append('\n')
            case "table" =>
              val rows = collectRows(id)
              rows.zipWithIndex.foreach { case (cells, ri) =>
                sb.append('|').append(cells.map(c => s" ${inlineText(c)} ").mkString("|")).append("|\n")
                if (ri == 0) sb.append('|').append(cells.map(_ => " --- ").mkString("|")).append("|\n")
              }
              sb.append('\n')
            case "hr" => pad(); sb.append("---\n\n")
            case _ =>
              // container: recurse into children as blocks
              var c = acc.firstChild(id)
              var hadBlock = false
              var inlineBuf = new StringBuilder
              while (c != -1) {
                if (isBlockish(c)) {
                  flushInline(inlineBuf); inlineBuf = new StringBuilder
                  block(c, listDepth, ordered); hadBlock = true
                } else {
                  val t = inlineFragment(c)
                  if (t.nonEmpty) inlineBuf.append(t)
                }
                c = acc.nextSibling(c)
              }
              flushInline(inlineBuf)
              val _ = hadBlock
          }
        case "text" =>
          val t = Option(acc.text(id)).getOrElse("").trim
          if (t.nonEmpty) { pad(); sb.append(t.replaceAll("\\s+", " ")).append("\n\n") }
        case _ =>
          var c = acc.firstChild(id)
          while (c != -1) { block(c, listDepth, ordered); c = acc.nextSibling(c) }
      }
    }

    def pad(): Unit = ()
    def flushInline(b: StringBuilder): Unit = {
      val t = b.toString.trim
      if (t.nonEmpty) sb.append(t).append("\n\n")
    }
    def inlineFragment(i: Int): String = acc.kind(i) match {
      case "text" => Option(acc.text(i)).getOrElse("").replaceAll("\\s+", " ")
      case "element" if !skip(acc.name(i)) => inlineText(i)
      case _ => ""
    }
    def isBlockish(i: Int): Boolean = acc.isElement(i) && Set(
      "h1", "h2", "h3", "h4", "h5", "h6", "p", "div", "ul", "ol", "pre",
      "blockquote", "table", "hr", "section", "article", "header", "footer",
      "main", "nav", "aside", "body", "html", "head", "figure").contains(acc.name(i))
    def inlineLiHead(li: Int): String = {
      val b = new StringBuilder
      var c = acc.firstChild(li)
      while (c != -1) {
        if (!(acc.isElement(c) && (acc.name(c) == "ul" || acc.name(c) == "ol")))
          b.append(inlineFragment(c))
        c = acc.nextSibling(c)
      }
      b.toString.trim
    }
    def collectRows(table: Int): List[List[Int]] = {
      val rows = scala.collection.mutable.ListBuffer[List[Int]]()
      def walk(i: Int): Unit = {
        var c = acc.firstChild(i)
        while (c != -1) {
          if (acc.isElement(c)) acc.name(c) match {
            case "tr" =>
              val cells = scala.collection.mutable.ListBuffer[Int]()
              var cc = acc.firstChild(c)
              while (cc != -1) {
                if (acc.isElement(cc) && (acc.name(cc) == "td" || acc.name(cc) == "th")) cells += cc
                cc = acc.nextSibling(cc)
              }
              rows += cells.toList
            case "thead" | "tbody" | "tfoot" => walk(c)
            case _ =>
          }
          c = acc.nextSibling(c)
        }
      }
      walk(table)
      rows.toList
    }

    if (includeRoot) block(root, 0, ordered = false)
    else {
      var c = acc.firstChild(root)
      while (c != -1) { block(c, 0, ordered = false); c = acc.nextSibling(c) }
    }
    sb.toString.replaceAll("\\n{3,}", "\n\n").replaceAll("\\s+$", "")
  }
}

/** Concrete NodeAccess views that can iterate attributes in stored order. */
trait AttrIterable {
  def attrEntries(id: Int): Seq[(String, String)]
}
