package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Doc
import graft.sources.Entities

/**
 * Full HTML5 named-character-reference differential (VERDICT r2 ask #4).
 * Expected strings are the WHATWG-spec decodings (cross-checked against
 * CPython's `html.unescape`, an independent implementation of the same
 * public `entities.json` table html5ever compiles in).
 */
class EntitySpec extends AnyFunSuite {

  private def dec(s: String) = Entities.decode(s)
  private def decA(s: String) = Entities.decode(s, inAttr = true)

  test("common named entities outside the old 56-name subset") {
    assert(dec("&alpha; &Ouml; &oacute; &zwnj; &nbsp; done") ==
      "α Ö ó ‌   done")
    assert(dec("&aelig &AElig&gt") == "æ Æ>")
    assert(dec("&fjlig; &ThickSpace; &af; x") == "fj    ⁡ x")
  }

  test("longest-match fallback to legacy prefixes in text") {
    // &notit; -> NOT 'notit;' (no such name) but legacy 'not' + "it;"
    assert(dec("&notit; &notin; &not;in") == "¬it; ∉ ¬in")
    assert(dec("&amp &ampx &prod &prod; x") == "& &x &prod ∏ x")
    assert(dec("&frac34;&frac12&frac12x") == "¾½½x")
  }

  test("31-char names and multi-codepoint values") {
    assert(dec("&CounterClockwiseContourIntegral; &vnsub; &NewLine;|&Tab;|") ==
      "∳ ⊂⃒ \n|\t|")
  }

  test("numeric references: no-semicolon, C1 remap, FFFD replacements") {
    assert(dec("&#151; &#x0; &#65 &#65; &#x1F600; &#xD834; &#1114112;") ==
      "— � A A 😀 � �")
  }

  test("attribute context blocks legacy names before alnum or '='") {
    assert(decA("?a=1&amp=2") == "?a=1&amp=2") // '=' after &amp blocks
    assert(decA("x&ampy") == "x&ampy")         // alnum after &amp blocks
    assert(decA("x&amp.y") == "x&.y")          // other punctuation decodes
    assert(decA("x&amp") == "x&")              // end of value decodes
    assert(decA("&amp;=ok") == "&=ok")         // with semicolon always decodes
    // ...but TEXT context decodes the same inputs
    assert(dec("?a=1&amp=2") == "?a=1&=2")
    assert(dec("x&ampy") == "x&y")
  }

  test("end-to-end: entities in markup reach text/attr nodes decoded") {
    val d = Doc.parse(
      "<p title=\"q&a=1&ampz &Ouml;\">Caf&eacute; &alpha;&ndash;&omega; " +
        "3&nbsp;&frac12; &#x2660;</p>")
    assert(d.select("p").text ==
      "Café α–ω 3 ½ ♠")
    assert(d.select("p").attr("title").contains("q&a=1&ampz Ö"))
  }

  test("rcdata contents decode the full table too") {
    val d = Doc.parse("<html><head><title>A &CenterDot; B &半</title></head></html>")
    assert(d.select("title").text == "A · B &半")
  }

  test("more spec edges: long names need the semicolon, X-hex, legacy mix") {
    // 31-char names have no legacy form — without ';' they stay literal
    assert(dec("&CounterClockwiseContourIntegral x") ==
      "&CounterClockwiseContourIntegral x")
    // legacy 'times' without ';' vs longer semicolon names sharing the prefix
    assert(dec("&times &timesb; &timesbar;") == "× ⊠ ⨱")
    assert(dec("pre&curren;post") == "pre¤post")
    // uppercase X hex and no-semicolon decimal at end of input
    assert(dec("&DoubleRightArrow;&#X27;&#39") == "⇒''")
    assert(dec("&thetasym; &upsih;") == "ϑ ϒ")
  }
}
