package graft.model

import scala.collection.mutable

/**
 * The canonical node record — one element of a document's `nodes` array.
 *
 * A dom_query document is an arena of tree nodes (`Tree { nodes: Vec<TreeNode> }`,
 * reference `src/dom_tree/tree.rs:20-22`); a node's identity is its array index
 * (`src/node.rs:24-27`) and each node carries five intra-tree pointers
 * (`src/node/inner.rs:8-23`). We keep exactly that relational encoding as a
 * Spark `ARRAY<STRUCT<...>>` per document row, plus derived structural columns
 * computed once at ingest so CSS structural pseudo-classes become integer
 * comparisons (SURVEY.md §1.4, §2.2 P7).
 *
 * `-1` encodes "no pointer" (reference `Option<NodeId>` = None).
 *
 * Derived columns (valid for preorder-numbered, freshly-ingested trees):
 *  - depth:              distance from root (root = 0); -1 for detached nodes
 *  - subtree_end:        largest arena index in this node's subtree (inclusive);
 *                        preorder numbering makes subtrees contiguous ranges
 *                        (reference ids are assigned in parse order,
 *                        `src/dom_tree/ops.rs:164-168`)
 *  - elem_pos_in_parent: 1-based position among *element* siblings (for :nth-child
 *                        semantics over elements, reference skips non-elements,
 *                        `src/node/selector.rs:59-67`); 0 for non-elements
 *  - elem_pos_from_end:  1-based position from the end among element siblings
 *  - type_pos_in_parent: 1-based position among element siblings with same tag name
 *  - n_elem_children:    number of element children
 *  - prev_elem_sib / next_elem_sib: nearest element sibling indices (-1 = none)
 */
case class NodeRec(
    kind: String, // document|fragment|doctype|element|text|comment|pi
    name: String, // element tag (lowercase) or doctype name; null otherwise
    attrs: Map[String, String],
    class_list: Seq[String],
    text: String, // text/comment/pi contents; null otherwise
    media_ref: String, // opaque media pointer for interleaved media spans
    parent: Int,
    prev_sibling: Int,
    next_sibling: Int,
    first_child: Int,
    last_child: Int,
    template_contents: Int,
    depth: Int,
    subtree_end: Int,
    elem_pos_in_parent: Int,
    elem_pos_from_end: Int,
    type_pos_in_parent: Int,
    n_elem_children: Int,
    prev_elem_sib: Int,
    next_elem_sib: Int,
    // stored element namespace — "html" | "svg" | "math"; null for
    // non-elements. STATE, not structural inference (reference carries
    // QualName per element, `src/node/node_data.rs:64`, `dom_tree/tree.rs:
    // 41-64`): a reparented foreign subtree keeps its namespace, so
    // serialization/void rules can't silently flip on a legal mutation.
    ns: String = "html"
)

/** Canonical interchange span (BASELINE.json input_hint): one row of the
  * preorder-flattened document. `offset` == preorder position. */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** The canonical input-table row: `docs(doc_id, spans)`. */
case class DocRow(doc_id: String, spans: Seq[Span])

/** Allocation-conscious ASCII-whitespace (space \t \n \r \f — the HTML spec
  * set) string utilities shared by class-list handling and `[attr~=]`
  * matching; `String.split(regex)` compiles a Pattern per call. */
object AsciiWs {
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Non-empty whitespace-separated tokens. */
  def split(s: String): Array[String] = {
    var count = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) { count += 1; while (i < n && !isWs(s.charAt(i))) i += 1 }
    }
    val out = new Array[String](count)
    var k = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val j = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > j) { out(k) = s.substring(j, i); k += 1 }
    }
    out
  }

  /** Does any whitespace-separated token of `s` equal `tok`? (the `[attr~=]`
    * / has-class test without materializing the token array) */
  def containsToken(s: String, tok: String): Boolean = {
    if (tok.isEmpty) return false
    val n = s.length
    val m = tok.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val j = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i - j == m && s.regionMatches(j, tok, 0, m)) return true
    }
    false
  }
}

object NodeKind {
  val Document = "document"
  val Fragment = "fragment"
  val Doctype = "doctype"
  val Element = "element"
  val Text = "text"
  val Comment = "comment"
  val Pi = "pi"
}

/**
 * Mutable arena node — the engine-internal working representation used by the
 * parser, the selector engine and the mutation ops. Mirrors the reference
 * `TreeNode` (`src/node/inner.rs:8-23`): five pointers + tagged payload.
 */
final class MutNode(
    var kind: String,
    var name: String = null,
    var text: String = null,
    var mediaRef: String = null
) {
  var attrs: mutable.LinkedHashMap[String, String] = null // null for non-elements
  /** element namespace ("html" | "svg" | "math"); ignored for non-elements */
  var ns: String = "html"
  var parent: Int = -1
  var prev: Int = -1
  var next: Int = -1
  var firstChild: Int = -1
  var lastChild: Int = -1
  var templateContents: Int = -1

  def isElement: Boolean = kind == NodeKind.Element
  def isText: Boolean = kind == NodeKind.Text

  def attr(key: String): Option[String] =
    if (attrs == null) None else attrs.get(key)

  /** Allocation-free attr lookup for the selector hot path (r6): `attr`
    * builds an Option per call, and [[graft.css.ArenaAccess]] sits under
    * every per-document select/hasAttr check of the micro bench. */
  def attrOrNull(key: String): String =
    if (attrs == null) null else attrs.getOrElse(key, null)

  def classList: Seq[String] = {
    // manual ASCII-whitespace split (space \t \n \r \f, the HTML spec set) -
    // String.split(regex) compiled a Pattern per ELEMENT here (a top leaf of
    // the ingest-conversion profile)
    val s = if (attrs == null) null else attrs.getOrElse("class", null)
    if (s == null) return Nil
    var out: List[String] = Nil
    var i = s.length - 1
    var end = -1
    while (i >= 0) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
      if (ws) {
        if (end != -1) { out = s.substring(i + 1, end) :: out; end = -1 }
      } else if (end == -1) end = i + 1
      i -= 1
    }
    if (end != -1) out = s.substring(0, end) :: out
    out
  }

  def deepCopyShallow(): MutNode = {
    val n = new MutNode(kind, name, text, mediaRef)
    if (attrs != null) n.attrs = attrs.clone()
    n.ns = ns
    n.templateContents = templateContents
    n
  }
}

/**
 * Arena of tree nodes: append-only Vec semantics — node ids are stable, removal
 * only unlinks pointers (reference `src/dom_tree/ops.rs:350-383`, "The node
 * remains in the tree"). All mutation operators live in [[graft.ops.TreeOps]].
 */
final class Arena {
  val nodes = new mutable.ArrayBuffer[MutNode]()

  /** Parse errors recorded by the tree builder (reference `Document.errors`,
    * `src/document.rs:22-32`); empty for programmatically-built arenas. */
  var errors: List[String] = Nil
  /** no-quirks | quirks | limited-quirks (reference `Document.quirks_mode`). */
  var quirksMode: String = "no-quirks"

  def apply(id: Int): MutNode = nodes(id)
  def size: Int = nodes.length
  def isValidId(id: Int): Boolean = id >= 0 && id < nodes.length

  /** Append a node to the arena — id = current length (`ops.rs:164-168`). */
  def create(n: MutNode): Int = { nodes += n; nodes.length - 1 }

  def createElement(name: String, attrs: Seq[(String, String)] = Nil,
      ns: String = "html"): Int = {
    val n = new MutNode(NodeKind.Element, name)
    n.attrs = mutable.LinkedHashMap(attrs: _*)
    n.ns = ns
    create(n)
  }

  def createText(contents: String): Int = create(new MutNode(NodeKind.Text, text = contents))

  def childIds(id: Int): List[Int] = {
    val buf = mutable.ListBuffer[Int]()
    var c = nodes(id).firstChild
    while (c != -1) { buf += c; c = nodes(c).next }
    buf.toList
  }

  def root: Int = 0

  /** First element child of root = the `<html>` node (reference `tree.rs:169-173`). */
  def htmlRoot: Option[Int] = childIds(0).find(nodes(_).isElement)

  /** Preorder walk of the subtree rooted at `id` (inclusive), by pointers —
    * matches reference `DescendantNodes` (`src/node/iters.rs:142-200`). */
  def preorder(id: Int): Iterator[Int] = new Iterator[Int] {
    private var stack = List(id)
    def hasNext: Boolean = stack.nonEmpty
    def next(): Int = {
      val cur = stack.head
      stack = stack.tail
      // push children in reverse so leftmost pops first
      var kids: List[Int] = Nil
      var c = nodes(cur).firstChild
      while (c != -1) { kids = c :: kids; c = nodes(c).next }
      stack = kids reverse_::: stack
      cur
    }
  }

  /** Descendants of `id` (exclusive of `id` itself), document order. */
  def descendants(id: Int): Iterator[Int] = preorder(id).drop(1)

  def ancestors(id: Int, maxDepth: Int = -1): List[Int] = {
    val buf = mutable.ListBuffer[Int]()
    var p = nodes(id).parent
    var d = 0
    while (p != -1 && (maxDepth <= 0 || d < maxDepth)) {
      buf += p; d += 1; p = nodes(p).parent
    }
    buf.toList
  }

  /** Concatenated text of node + descendants, doc order (`ops.rs:32-47`). */
  def textOf(id: Int): String = {
    val sb = new java.lang.StringBuilder
    preorder(id).foreach { i =>
      val n = nodes(i)
      if (n.isText && n.text != null) sb.append(n.text)
    }
    sb.toString
  }

  /** Own + direct-children text only (`ops.rs:85-99`). */
  def immediateTextOf(id: Int): String = {
    val sb = new java.lang.StringBuilder
    val self = nodes(id)
    if (self.isText && self.text != null) sb.append(self.text)
    childIds(id).foreach { c =>
      val n = nodes(c)
      if (n.isText && n.text != null) sb.append(n.text)
    }
    sb.toString
  }

  /** Streaming whitespace-normalized char count, no string materialization
    * (reference `ops.rs:66-82`, helper `dom_tree/helpers.rs:1-13`). */
  def normalizedCharCount(id: Int): Long = {
    var count = 0L
    var lastWasWs = true // leading whitespace is skipped
    preorder(id).foreach { i =>
      val n = nodes(i)
      if (n.isText && n.text != null) {
        n.text.foreach { ch =>
          // Unicode White_Space (Rust char::is_whitespace includes U+00A0)
          if (Character.isWhitespace(ch) || Character.isSpaceChar(ch)) {
            if (!lastWasWs) { count += 1; lastWasWs = true }
          } else { count += 1; lastWasWs = false }
        }
      }
    }
    if (lastWasWs && count > 0) count -= 1 // trailing normalized space doesn't count
    count
  }

  /** Derived structural columns, computed in one pass (shared by the
    * record materializer and the direct Catalyst converter). */
  final class Derived(n: Int) {
    val depth = Array.fill(n)(-1)
    val subtreeEnd = Array.tabulate(n)(identity)
    val elemPos = new Array[Int](n)
    val elemPosEnd = new Array[Int](n)
    val typePos = new Array[Int](n)
    val nElemChildren = new Array[Int](n)
    val prevElem = Array.fill(n)(-1)
    val nextElem = Array.fill(n)(-1)
  }

  def computeDerived: Derived = {
    val n = nodes.length
    val d = new Derived(n)
    import d._

    // depth + subtree_end over every attached tree (root 0 plus any template
    // fragments referenced via templateContents; detached nodes keep -1).
    // Flat int-array DFS (no List/tuple allocation — this pass runs once per
    // parsed document and was ~30% of the ingest-conversion profile): depth
    // comes from the parent's already-filled slot, subtree_end folds
    // bottom-up over the recorded preorder.
    val order = new Array[Int](n)
    val stack = new Array[Int](n)
    def walk(rootId: Int, rootDepth: Int): Unit = {
      var top = 0
      var len = 0
      stack(top) = rootId
      top += 1
      depth(rootId) = rootDepth
      while (top > 0) {
        top -= 1
        val id = stack(top)
        order(len) = id
        len += 1
        // push children in reverse so leftmost pops first
        var c = nodes(id).lastChild
        val dd = depth(id) + 1
        while (c != -1) {
          depth(c) = dd
          stack(top) = c
          top += 1
          c = nodes(c).prev
        }
      }
      // reverse preorder: children are processed before their parent
      var i = len - 1
      while (i >= 0) {
        val id = order(i)
        var m = id
        var c = nodes(id).firstChild
        while (c != -1) {
          if (subtreeEnd(c) > m) m = subtreeEnd(c)
          c = nodes(c).next
        }
        subtreeEnd(id) = m
        i -= 1
      }
    }
    if (n > 0) walk(0, 0)
    // template contents subtrees
    var ti = 0
    while (ti < n) {
      val tc = nodes(ti).templateContents
      if (tc != -1 && depth(tc) == -1) walk(tc, 0)
      ti += 1
    }

    // sibling positions: one firstChild/next pointer walk per parent, no
    // intermediate Lists. type_pos uses ONE arena-wide versioned count map
    // (version = parent id) — O(1) per element with zero per-parent
    // allocation or clear, and no quadratic blowup on wide fan-outs (a
    // 10k-link list is a normal crawled page).
    val typeCount = new java.util.HashMap[String, Array[Int]]()
    var p = 0
    while (p < n) {
      var lastElem = -1
      var nElems = 0
      var c = nodes(p).firstChild
      while (c != -1) {
        if (nodes(c).isElement) {
          if (lastElem != -1) { prevElem(c) = lastElem; nextElem(lastElem) = c }
          lastElem = c
          nElems += 1
          elemPos(c) = nElems
          val e = typeCount.get(nodes(c).name)
          if (e == null) {
            typeCount.put(nodes(c).name, Array(p, 1))
            typePos(c) = 1
          } else if (e(0) != p) {
            e(0) = p; e(1) = 1
            typePos(c) = 1
          } else {
            e(1) += 1
            typePos(c) = e(1)
          }
        }
        c = nodes(c).next
      }
      nElemChildren(p) = nElems
      // elem_pos_from_end from the now-known total
      var e = lastElem
      while (e != -1) {
        elemPosEnd(e) = nElems - elemPos(e) + 1
        e = prevElem(e)
      }
      p += 1
    }
    d
  }

  /** Finalize to the immutable record array with derived structural columns. */
  def toRecs: Array[NodeRec] = {
    val n = nodes.length
    val d = computeDerived
    import d._
    Array.tabulate(n) { i =>
      val nd = nodes(i)
      NodeRec(
        kind = nd.kind,
        name = nd.name,
        // VectorMap preserves attribute insertion order through Spark's map
        // encoder (reference keeps attrs as an ordered Vec<Attr>,
        // node_data.rs:66) — needed for byte-exact HTML serialization.
        attrs =
          if (nd.attrs == null) null
          else scala.collection.immutable.VectorMap(nd.attrs.toSeq: _*),
        class_list = if (nd.isElement) nd.classList else null,
        text = nd.text,
        media_ref = nd.mediaRef,
        parent = nd.parent,
        prev_sibling = nd.prev,
        next_sibling = nd.next,
        first_child = nd.firstChild,
        last_child = nd.lastChild,
        template_contents = nd.templateContents,
        depth = depth(i),
        subtree_end = subtreeEnd(i),
        elem_pos_in_parent = elemPos(i),
        elem_pos_from_end = elemPosEnd(i),
        type_pos_in_parent = typePos(i),
        n_elem_children = nElemChildren(i),
        prev_elem_sib = prevElem(i),
        next_elem_sib = nextElem(i),
        ns = if (nd.isElement) nd.ns else null
      )
    }
  }
}

object Arena {
  /** Rebuild a mutable arena from the immutable record array (for mutation
    * operators running inside expressions over stored node arrays). */
  def fromRecs(recs: Seq[NodeRec]): Arena = {
    val a = new Arena
    recs.foreach { r =>
      val n = new MutNode(r.kind, r.name, r.text, r.media_ref)
      if (r.attrs != null) n.attrs = mutable.LinkedHashMap(r.attrs.toSeq: _*)
      if (r.ns != null) n.ns = r.ns
      n.parent = r.parent
      n.prev = r.prev_sibling
      n.next = r.next_sibling
      n.firstChild = r.first_child
      n.lastChild = r.last_child
      n.templateContents = r.template_contents
      a.nodes += n
    }
    a
  }
}
