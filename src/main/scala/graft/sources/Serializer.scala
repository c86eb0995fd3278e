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

  /**
   * Markdown serialization (S5) — conventions matched to the reference's own
   * goldens (`src/serializing/md.rs` tests): markdown specials escaped in
   * prose, *italic* / **bold** / ***bold-italic***, inline `code` vs fenced
   * blocks (fenced when the raw code text is multi-line), "- " unordered and
   * "1. " ordered items (all ordered items use 1.), "---" rules,
   * empty-header pipe tables, block separation by exactly one blank line,
   * and includeRoot=true keeping leading/trailing whitespace. Default skip
   * list matches `md/constants.rs:5`: script, style, meta, head.
   */
  def toMd(acc: NodeAccess, root: Int, includeRoot: Boolean,
      skipTags: Seq[String] = Seq("script", "style", "meta", "head")): String = {
    val skip = skipTags.toSet
    val sb = new java.lang.StringBuilder

    val blockTags = Set("h1", "h2", "h3", "h4", "h5", "h6", "p", "div", "ul",
      "ol", "pre", "table", "hr", "blockquote", "section", "article", "header",
      "footer", "nav", "aside", "main", "figure", "body", "html")

    def isUws(c: Char) = Character.isWhitespace(c) || Character.isSpaceChar(c)

    def escapeMd(s: String): String = {
      val b = new java.lang.StringBuilder(s.length)
      s.foreach {
        case c @ ('\\' | '`' | '*' | '_' | '[' | ']' | '(' | ')' | '#' | '.' | '!') =>
          b.append('\\').append(c)
        case c => b.append(c)
      }
      b.toString
    }

    def collapseWs(s: String): String = {
      val b = new java.lang.StringBuilder(s.length)
      var ws = false
      s.foreach { c =>
        if (isUws(c)) ws = true
        else { if (ws && b.length > 0) b.append(' '); ws = false; b.append(c) }
      }
      // keep single boundary spaces for inline joining
      val lead = if (s.nonEmpty && isUws(s.charAt(0))) " " else ""
      val trail = if (s.nonEmpty && isUws(s.charAt(s.length - 1)) && b.length > 0) " " else ""
      lead + b.toString + trail
    }

    def rawText(id: Int): String = graft.css.Engine.subtreeText(acc, id)

    /** render a node's children as inline markdown */
    def inline(id: Int): String = {
      val b = new java.lang.StringBuilder
      var c = acc.firstChild(id)
      while (c != -1) { b.append(inlineNode(c)); c = acc.nextSibling(c) }
      b.toString
    }

    def inlineNode(i: Int): String = acc.kind(i) match {
      case "text" =>
        val t = acc.text(i)
        if (t == null) "" else escapeMd(collapseWs(t))
      case "element" =>
        val nm = acc.name(i)
        if (skip(nm)) ""
        else nm match {
          case "em" | "i" =>
            val in = inline(i).trim
            if (in.isEmpty) "" else s"*$in*"
          case "strong" | "b" =>
            val in = inline(i).trim
            if (in.isEmpty) "" else s"**$in**"
          case "del" | "s" =>
            val in = inline(i).trim
            if (in.isEmpty) "" else s"~~$in~~"
          case "code" =>
            val in = collapseWs(rawText(i)).trim // no escaping inside code
            if (in.isEmpty) "" else s"`$in`"
          case "br" => "\n"
          case "a" =>
            val href = Option(acc.attr(i, "href")).getOrElse("")
            val in = inline(i).trim
            s"[$in]($href)"
          case "img" =>
            val src = Option(acc.attr(i, "src")).getOrElse("")
            val alt = Option(acc.attr(i, "alt")).getOrElse("")
            s"![$alt]($src)"
          case _ => inline(i)
        }
      case _ => ""
    }

    /** bring the buffer to exactly one blank line of separation */
    def blockSep(): Unit = {
      if (sb.length == 0) { sb.append("\n\n"); return }
      while (sb.length > 0 && sb.charAt(sb.length - 1) == ' ')
        sb.setLength(sb.length - 1)
      if (sb.length >= 2 && sb.charAt(sb.length - 1) == '\n' &&
          sb.charAt(sb.length - 2) == '\n') ()
      else if (sb.length >= 1 && sb.charAt(sb.length - 1) == '\n') sb.append('\n')
      else sb.append("\n\n")
    }

    def emitBlock(content: String): Unit = {
      if (content.isEmpty) return
      blockSep()
      sb.append(content)
      blockSep()
    }

    def isBlock(i: Int): Boolean = acc.isElement(i) && blockTags(acc.name(i))

    /** render a container's children: runs of inline nodes become paragraphs,
      * block elements dispatch */
    def container(id: Int): Unit = {
      val para = new java.lang.StringBuilder
      def flush(): Unit = { emitBlock(para.toString.trim); para.setLength(0) }
      var c = acc.firstChild(id)
      while (c != -1) {
        if (acc.isElement(c) && skip(acc.name(c))) ()
        else if (isBlock(c)) { flush(); block(c) }
        else if (acc.isElement(c) && acc.name(c) == "code" &&
                 rawText(c).trim.contains('\n')) {
          // multi-line <code> at block position → fenced block, verbatim
          flush()
          emitBlock("```\n" + rawText(c).trim + "\n```")
        } else para.append(inlineNode(c))
        c = acc.nextSibling(c)
      }
      flush()
    }

    def list(id: Int, ordered: Boolean, depth: Int): Unit = {
      var c = acc.firstChild(id)
      while (c != -1) {
        if (acc.isElement(c)) acc.name(c) match {
          case "li" =>
            if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
            sb.append("  " * depth)
            sb.append(if (ordered) "1. " else "- ")
            // item head: inline content excluding nested lists
            val head = new java.lang.StringBuilder
            var cc = acc.firstChild(c)
            while (cc != -1) {
              if (acc.isElement(cc) && (acc.name(cc) == "ul" || acc.name(cc) == "ol")) ()
              else if (isBlock(cc)) head.append(inline(cc))
              else head.append(inlineNode(cc))
              cc = acc.nextSibling(cc)
            }
            sb.append(head.toString.trim).append('\n')
            // nested lists
            cc = acc.firstChild(c)
            while (cc != -1) {
              if (acc.isElement(cc) && (acc.name(cc) == "ul" || acc.name(cc) == "ol"))
                list(cc, acc.name(cc) == "ol", depth + 1)
              cc = acc.nextSibling(cc)
            }
          case "ul" | "ol" => list(c, acc.name(c) == "ol", depth + 1)
          case _ =>
            // non-li block inside a list breaks the list (md.rs test_bad_ol)
            emitBlock(inline(c).trim)
        }
        c = acc.nextSibling(c)
      }
    }

    def table(id: Int): Unit = {
      val rows = scala.collection.mutable.ListBuffer[List[Int]]()
      def walkRows(i: Int): Unit = {
        var c = acc.firstChild(i)
        while (c != -1) {
          if (acc.isElement(c)) acc.name(c) match {
            case "tr" =>
              val cells = scala.collection.mutable.ListBuffer[Int]()
              var cc = acc.firstChild(c)
              while (cc != -1) {
                if (acc.isElement(cc) && (acc.name(cc) == "td" || acc.name(cc) == "th"))
                  cells += cc
                cc = acc.nextSibling(cc)
              }
              if (cells.nonEmpty) rows += cells.toList
            case "thead" | "tbody" | "tfoot" => walkRows(c)
            case _ =>
          }
          c = acc.nextSibling(c)
        }
      }
      walkRows(id)
      if (rows.isEmpty) return
      val n = rows.map(_.length).max
      blockSep()
      sb.append("|").append("   |" * n).append('\n')
      sb.append("|").append(" - |" * n).append('\n')
      rows.foreach { cells =>
        sb.append("|")
        cells.foreach(c => sb.append(' ').append(inline(c).trim).append(" |"))
        (cells.length until n).foreach(_ => sb.append("   |"))
        sb.append('\n')
      }
      blockSep()
    }

    def block(i: Int): Unit = {
      val nm = acc.name(i)
      nm match {
        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
          emitBlock("#" * (nm.charAt(1) - '0') + " " + inline(i).trim)
        case "hr" => emitBlock("---")
        case "p" => emitBlock(inline(i).trim)
        case "ul" | "ol" =>
          blockSep(); list(i, nm == "ol", 0)
        case "pre" =>
          emitBlock("```\n" + rawText(i).trim + "\n```")
        case "blockquote" =>
          val in = inline(i).trim
          if (in.nonEmpty) emitBlock(in.split('\n').map("> " + _).mkString("\n"))
        case "table" => table(i)
        case _ => container(i) // generic containers recurse
      }
    }

    if (acc.isElement(root) && isBlock(root) && acc.name(root) != "body" &&
        acc.name(root) != "html") block(root)
    else container(root)

    var out = sb.toString
    if (!includeRoot) {
      var s = 0
      var e = out.length
      while (s < e && isUws(out.charAt(s))) s += 1
      while (e > s && isUws(out.charAt(e - 1))) e -= 1
      out = out.substring(s, e)
    }
    out
  }
}

/** Concrete NodeAccess views that can iterate attributes in stored order. */
trait AttrIterable {
  def attrEntries(id: Int): Seq[(String, String)]
}
