package graft.css

/**
 * CSS selector AST + parser (P1 in SURVEY.md §2.2).
 *
 * The reference compiles selector strings with cssparser + the selectors crate
 * (`src/matcher.rs:24-33`) and separately ships a hand-rolled nom grammar for
 * the mini engine (`src/mini_selector/parser.rs:107-148`). We implement one
 * recursive-descent parser covering the union of both surfaces actually used
 * by the reference tests/README: tag/#id/.class/[attr op val], the four
 * combinators + selector lists, structural pseudo-classes, link pseudo-classes,
 * the non-standard text pseudo-classes (:has-text/:contains/:only-text,
 * `src/matcher.rs:190-212`), logical :not/:is/:where/:has, and the inert
 * parse-but-always-false set (`src/matcher.rs:158-188`).
 *
 * Compiled once on the driver, shipped to executors as a plan literal —
 * the reference's "reusable Matcher" prepared-statement pattern
 * (README.md:294-315).
 */
object SelectorAst {

  sealed trait Combinator
  case object Descendant extends Combinator
  case object Child extends Combinator
  case object Adjacent extends Combinator
  case object Sibling extends Combinator

  sealed trait AttrOp
  case object AEquals extends AttrOp // =
  case object AIncludes extends AttrOp // ~=
  case object ADashMatch extends AttrOp // |=
  case object APrefix extends AttrOp // ^=
  case object ASuffix extends AttrOp // $=
  case object ASubstring extends AttrOp // *=

  sealed trait Pred
  case class PId(v: String) extends Pred
  case class PClass(v: String) extends Pred
  case class PAttrExists(key: String) extends Pred
  /** `ci` = the `[attr=v i]` case-insensitivity flag (selectors crate honors
    * it via `AttrSelectorOperation::eval_str`, reference `node/selector.rs:115-130`). */
  case class PAttr(key: String, op: AttrOp, value: String, ci: Boolean = false) extends Pred
  /** nth kinds: pos among element siblings (forward/backward, any/of-type) */
  case class PNth(a: Int, b: Int, fromEnd: Boolean, ofType: Boolean) extends Pred
  case object POnlyChild extends Pred
  case object POnlyOfType extends Pred
  case object PEmpty extends Pred
  case object PRoot extends Pred
  case object PAnyLink extends Pred
  case class PNot(list: List[Complex]) extends Pred
  case class PIs(list: List[Complex]) extends Pred // :is and :where
  case class PHas(list: List[Complex]) extends Pred // relative selectors
  case class PHasText(s: String) extends Pred
  case class PContains(s: String) extends Pred
  case object POnlyText extends Pred
  case object PFalse extends Pred // inert pseudo-classes: parse but never match

  /** One compound step: optional tag + simple predicates.
    * `tagExact` carries the selector's ORIGINAL case when it differs from
    * the lowered `tag` — foreign (SVG/MathML) elements store adjusted
    * camelCase names and match the original selector case, while HTML
    * elements match the lowered form (reference `node/selector.rs:70-88`:
    * `is_html_element_in_html_document` picks which form the selectors
    * crate compares). */
  case class Compound(tag: Option[String], preds: List[Pred],
      tagExact: Option[String] = None)

  /** A complex selector: sequence of (combinator, compound); the first
    * combinator describes the relation to the *scope* (Descendant for
    * plain selectors; Child/Adjacent/Sibling for relative `:has(> a)`). */
  case class Complex(steps: List[(Combinator, Compound)]) {
    /** Right-to-left step order for ascending matching — cached so the
      * per-candidate matcher doesn't allocate a reversed list per node. */
    @transient lazy val stepsReversed: List[(Combinator, Compound)] = steps.reverse
  }

  /** Parse a selector list. Throws IllegalArgumentException on syntax error
    * (reference `select` panics on invalid selector, `document.rs:201-204`;
    * our `trySelect` maps to Option like `try_select`). */
  def parse(input: String): List[Complex] = new SelectorParser(input).parseList()

  /** Parse-once cache — the reference's reusable-Matcher pattern
    * (`matcher.rs:24-33`) applied globally: selector strings are few and
    * static, plans are immutable. */
  private val planCache = new java.util.concurrent.ConcurrentHashMap[String, List[Complex]]()
  def parseCached(input: String): List[Complex] = {
    val hit = planCache.get(input)
    if (hit != null) hit
    else {
      val plan = parse(input) // may throw — never cached
      if (planCache.size < 10000) planCache.put(input, plan)
      plan
    }
  }

  def tryParse(input: String): Option[List[Complex]] =
    try Some(parseCached(input)) catch { case _: IllegalArgumentException => None }
}

private final class SelectorParser(input: String) {
  import SelectorAst._

  private var pos = 0
  private val n = input.length

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid selector '$input' at $pos: $msg")

  private def peek: Char = if (pos < n) input.charAt(pos) else '\u0000'
  private def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  private def skipWs(): Boolean = {
    val start = pos
    while (pos < n && isWs(input.charAt(pos))) pos += 1
    pos > start
  }

  private def isIdentChar(c: Char) =
    Character.isLetterOrDigit(c) || c == '-' || c == '_' ||
      c >= 0x80 // allow non-ascii idents

  private def ident(): String = {
    val start = pos
    while (pos < n && isIdentChar(input.charAt(pos))) pos += 1
    if (pos == start) fail("expected identifier")
    input.substring(start, pos)
  }

  def parseList(): List[Complex] = {
    val out = scala.collection.mutable.ListBuffer[Complex]()
    skipWs()
    out += parseComplex(allowLeadingCombinator = false)
    skipWs()
    while (peek == ',') {
      pos += 1
      skipWs()
      out += parseComplex(allowLeadingCombinator = false)
      skipWs()
    }
    if (pos != n) fail("trailing input")
    out.toList
  }

  private def parseRelativeList(): List[Complex] = {
    val out = scala.collection.mutable.ListBuffer[Complex]()
    skipWs()
    out += parseComplex(allowLeadingCombinator = true)
    skipWs()
    while (peek == ',') {
      pos += 1
      skipWs()
      out += parseComplex(allowLeadingCombinator = true)
      skipWs()
    }
    out.toList
  }

  private def parseComplex(allowLeadingCombinator: Boolean): Complex = {
    val steps = scala.collection.mutable.ListBuffer[(Combinator, Compound)]()
    skipWs()
    var lead: Combinator = Descendant
    if (allowLeadingCombinator && (peek == '>' || peek == '+' || peek == '~')) {
      lead = peek match {
        case '>' => Child
        case '+' => Adjacent
        case '~' => Sibling
      }
      pos += 1
      skipWs()
    }
    steps += ((lead, parseCompound()))
    var done = false
    while (!done) {
      val hadWs = skipWs()
      if (pos >= n || peek == ',' || peek == ')') done = true
      else {
        val comb = peek match {
          case '>' => pos += 1; skipWs(); Child
          case '+' => pos += 1; skipWs(); Adjacent
          case '~' => pos += 1; skipWs(); Sibling
          case _ if hadWs => Descendant
          case _ => fail("expected combinator")
        }
        steps += ((comb, parseCompound()))
      }
    }
    Complex(steps.toList)
  }

  private def parseCompound(): Compound = {
    var tag: Option[String] = None
    var tagExact: Option[String] = None
    val preds = scala.collection.mutable.ListBuffer[Pred]()
    var any = false
    if (peek == '*') { pos += 1; any = true }
    else if (pos < n && isIdentChar(peek) && peek != '-') {
      val raw = ident()
      val low = raw.toLowerCase
      tag = Some(low)
      if (raw != low) tagExact = Some(raw) // foreign-element case preserved
      any = true
    }
    var done = false
    while (!done && pos < n) {
      peek match {
        case '#' => pos += 1; preds += PId(ident()); any = true
        case '.' => pos += 1; preds += PClass(ident()); any = true
        case '[' => preds += parseAttr(); any = true
        case ':' => preds += parsePseudo(); any = true
        case _ => done = true
      }
    }
    if (!any) fail("empty compound selector")
    Compound(tag, preds.toList, tagExact)
  }

  private def parseAttr(): Pred = {
    pos += 1 // '['
    skipWs()
    val key = ident().toLowerCase
    skipWs()
    if (peek == ']') { pos += 1; return PAttrExists(key) }
    def eq2(op: AttrOp): AttrOp = {
      // two-char operators require '=' as the second char ([a~b] is invalid,
      // the reference's selector parse panics on it)
      if (pos + 1 >= n || input.charAt(pos + 1) != '=') fail("expected = in attribute operator")
      pos += 2
      op
    }
    val op: AttrOp = peek match {
      case '=' => pos += 1; AEquals
      case '~' => eq2(AIncludes)
      case '|' => eq2(ADashMatch)
      case '^' => eq2(APrefix)
      case '$' => eq2(ASuffix)
      case '*' => eq2(ASubstring)
      case _ => fail("expected attribute operator")
    }
    skipWs()
    val value = quotedOrIdent()
    skipWs()
    // optional case flag: `i` = ASCII case-insensitive match, `s` = explicit
    // case-sensitive (the default)
    var ci = false
    if (peek == 'i' || peek == 'I') { ci = true; pos += 1; skipWs() }
    else if (peek == 's' || peek == 'S') { pos += 1; skipWs() }
    if (peek != ']') fail("expected ]")
    pos += 1
    PAttr(key, op, value, ci)
  }

  private def quotedOrIdent(): String = {
    if (peek == '"' || peek == '\'') {
      val q = peek
      pos += 1
      val sb = new java.lang.StringBuilder
      while (pos < n && input.charAt(pos) != q) {
        var c = input.charAt(pos)
        if (c == '\\' && pos + 1 < n) { pos += 1; c = input.charAt(pos) }
        sb.append(c)
        pos += 1
      }
      if (pos >= n) fail("unterminated string")
      pos += 1
      sb.toString
    } else ident()
  }

  private def parsePseudo(): Pred = {
    pos += 1 // ':'
    if (peek == ':') fail("pseudo-elements not supported") // ::before etc.
    val name = ident().toLowerCase
    name match {
      case "first-child" => PNth(0, 1, fromEnd = false, ofType = false)
      case "last-child" => PNth(0, 1, fromEnd = true, ofType = false)
      case "first-of-type" => PNth(0, 1, fromEnd = false, ofType = true)
      case "last-of-type" => PNth(0, 1, fromEnd = true, ofType = true)
      case "only-child" => POnlyChild
      case "only-of-type" => POnlyOfType
      case "empty" => PEmpty
      case "root" => PRoot
      case "any-link" | "link" => PAnyLink
      case "only-text" => POnlyText
      case "visited" | "active" | "focus" | "hover" | "enabled" | "disabled" |
          "checked" | "indeterminate" | "fullscreen" | "modal" | "defined" |
          "placeholder-shown" | "read-only" | "read-write" | "default" |
          "first-line" | "first-letter" | "autofill" | "target" =>
        PFalse // inert: parse but never match (matcher.rs:158-188, selector.rs:138-146)
      case "nth-child" => parseNth(fromEnd = false, ofType = false)
      case "nth-last-child" => parseNth(fromEnd = true, ofType = false)
      case "nth-of-type" => parseNth(fromEnd = false, ofType = true)
      case "nth-last-of-type" => parseNth(fromEnd = true, ofType = true)
      case "not" => PNot(parseArgsList())
      case "is" | "where" => PIs(parseArgsList())
      case "has" => PHas(parseArgsRelativeList())
      case "has-text" => PHasText(parseStringArg())
      case "contains" => PContains(parseStringArg())
      case other => fail(s"unsupported pseudo-class :$other")
    }
  }

  private def expect(c: Char): Unit = {
    if (peek != c) fail(s"expected $c")
    pos += 1
  }

  private def parseNth(fromEnd: Boolean, ofType: Boolean): Pred = {
    expect('(')
    skipWs()
    val start = pos
    while (pos < n && input.charAt(pos) != ')') pos += 1
    if (pos >= n) fail("expected )")
    val body = input.substring(start, pos).trim.toLowerCase.replaceAll("\\s+", "")
    pos += 1 // ')'
    val (a, b) = parseAnB(body)
    PNth(a, b, fromEnd, ofType)
  }

  /** Parse the an+b micro-syntax: odd, even, 5, 2n, 2n+1, -n+3, n, +n-2 … */
  private def parseAnB(s: String): (Int, Int) = s match {
    case "odd" => (2, 1)
    case "even" => (2, 0)
    case _ =>
      val idx = s.indexOf('n')
      if (idx == -1) {
        try (0, s.toInt) catch { case _: NumberFormatException => fail(s"bad an+b '$s'") }
      } else {
        val aStr = s.substring(0, idx)
        val a = aStr match {
          case "" | "+" => 1
          case "-" => -1
          case v => try v.toInt catch { case _: NumberFormatException => fail(s"bad an+b '$s'") }
        }
        val rest = s.substring(idx + 1)
        val b = rest match {
          case "" => 0
          case v => try v.toInt catch { case _: NumberFormatException => fail(s"bad an+b '$s'") }
        }
        (a, b)
      }
  }

  private def parseArgsList(): List[Complex] = {
    expect('(')
    val list = parseListUntilParen(relative = false)
    expect(')')
    list
  }

  private def parseArgsRelativeList(): List[Complex] = {
    expect('(')
    val list = parseListUntilParen(relative = true)
    expect(')')
    list
  }

  private def parseListUntilParen(relative: Boolean): List[Complex] = {
    val out = scala.collection.mutable.ListBuffer[Complex]()
    skipWs()
    out += parseComplex(allowLeadingCombinator = relative)
    skipWs()
    while (peek == ',') {
      pos += 1
      skipWs()
      out += parseComplex(allowLeadingCombinator = relative)
      skipWs()
    }
    out.toList
  }

  private def parseStringArg(): String = {
    expect('(')
    skipWs()
    // the reference REQUIRES a quoted string here (`matcher.rs:199-205`
    // expect_string) — :contains(x) unquoted is a selector error
    if (peek != '"' && peek != '\'') fail("expected quoted string argument")
    val v = quotedOrIdent()
    skipWs()
    expect(')')
    v
  }
}
