package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Doc

/**
 * Markdown serializer differentials — the reference's own `md.rs` test
 * suite (`/root/reference/src/serializing/md.rs`, file:line per test),
 * expected strings verbatim. Complements the md goldens in TextSpec.
 */
class MdSpec extends AnyFunSuite {

  private def md(html: String): String = Doc.parse(html).mdText

  // md.rs:74-79
  test("span italic with backtick escape") {
    assert(md("<span>It`s like <i>that</i></span>") == "It\\`s like *that*")
  }

  // md.rs:190-228 test_list_inline — nested lists indent 4 spaces per level,
  // a nested list inside an item is preceded by a blank line
  test("nested inline lists (4-space nesting)") {
    val contents = "\n        <ol>" +
      "<li>Item 1</li><li>Item 2</li><li>Item 3" +
      "<div><ol><li>Item 3-1</li><li>Item 3-2</li><li>Item 3-3" +
      "<ol><li>Item 3-3-1</li><li>Item 3-3-2</li><li>Item 3-3-3</li></ol>\n" +
      "</li></ol></div>\n            </li></ol>"
    val expected = "1. Item 1\n1. Item 2\n1. Item 3\n\n" +
      "    1. Item 3-1\n    1. Item 3-2\n    1. Item 3-3\n\n" +
      "        1. Item 3-3-1\n        1. Item 3-3-2\n        1. Item 3-3-3"
    assert(md(contents) == expected)
  }

  // md.rs:231-257 test_list_with_paragraphs — continuation paragraphs align
  // under the item text, blank-line separated
  test("list items with paragraphs") {
    val contents = "<ol>\n            <li>\n                <p>Paragraph 1-1</p>\n" +
      "                <p>Paragraph 1-2</p>\n            </li>\n" +
      "            <li><p>Paragraph 2-1</p><p>Paragraph 2-2</p></li>\n" +
      "            <li><p>Paragraph 3-1</p></li>\n        </ol>\n" +
      "        <p>Another Paragraph</p>"
    val expected = "1. Paragraph 1-1\n\n   Paragraph 1-2\n\n" +
      "1. Paragraph 2-1\n\n   Paragraph 2-2\n\n" +
      "1. Paragraph 3-1\n\nAnother Paragraph"
    assert(md(contents) == expected)
  }

  // md.rs:259-273 test_paragraphs
  test("paragraphs with span joins and dot escapes") {
    val contents =
      "<p>To create paragraphs, use a blank line to separate one or more lines of text.</p>\n" +
      "        <p>I really like using <span>Markdown</span><span>  text</span>.</p>\n\n" +
      "        <p>I think I'll use it to format all of my documents from now on.</p>"
    val expected =
      "To create paragraphs, use a blank line to separate one or more lines of text\\.\n\n" +
      "I really like using Markdown text\\.\n\n" +
      "I think I'll use it to format all of my documents from now on\\."
    assert(md(contents) == expected)
  }

  // md.rs:275-315 test_links
  test("links: plain, title, bold outside, markup-inside ignored, no href, quoted title") {
    assert(md("""<p>My favorite search engine is <a href="https://duckduckgo.com">Duck Duck Go</a>.</p>""") ==
      "My favorite search engine is [Duck Duck Go](https://duckduckgo.com)\\.")
    assert(md("""<p>My favorite search engine is <a href="https://duckduckgo.com" title="Duck Duck Go">Duck Duck Go</a>.</p>""") ==
      "My favorite search engine is [Duck Duck Go](https://duckduckgo.com \"Duck Duck Go\")\\.")
    assert(md("""<p>My favorite search engine is <b><a href="https://duckduckgo.com">Duck Duck Go</a></b>.</p>""") ==
      "My favorite search engine is **[Duck Duck Go](https://duckduckgo.com)**\\.")
    // markup inside the link contributes text only
    assert(md("""<p>My favorite search engine is <a href="https://duckduckgo.com"><b>Duck Duck Go</b></a>.</p>""") ==
      "My favorite search engine is [Duck Duck Go](https://duckduckgo.com)\\.")
    // block inside <a>: the adoption agency reparents, link lands in the div
    assert(md("""<p>My favorite search engine is <a href="https://duckduckgo.com"><div>Duck Duck Go</div></a>.</p>""") ==
      "My favorite search engine is\n\n[Duck Duck Go](https://duckduckgo.com)\n\n\\.")
    assert(md("<p>My favorite search engine is <a>Duck Duck Go</a>.</p>") ==
      "My favorite search engine is Duck Duck Go\\.")
    assert(md("""<a href="https://duckduckgo.com" title="My &quot;Search&quot;">Duck Duck Go</a>""") ==
      "[Duck Duck Go](https://duckduckgo.com \"My \\\"Search\\\"\")")
  }

  // md.rs:317-337 test_images
  test("images: plain, title, no alt, no src") {
    assert(md("""<p>Image: <img src="/path/to/img.jpg" alt="Alt text"></p>""") ==
      "Image: ![Alt text](/path/to/img.jpg)")
    assert(md("""<p>Image: <img src="/path/to/img.jpg" alt="Alt text" title="Title"></p>""") ==
      "Image: ![Alt text](/path/to/img.jpg \"Title\")")
    assert(md("""<p>Image: <img src="/path/to/img.jpg"></p>""") ==
      "Image: ![](/path/to/img.jpg)")
    assert(md("""<p>Image:  <img alt="Alt text" title="Title"></p>""") == "Image:")
  }

  // md.rs:340-353 test_pre_code (span-highlighted pre collapses to raw fence)
  test("pre with span highlighting becomes a plain fence") {
    val contents = "<pre>" +
      "<span>fn</span> <span>main</span><span>()</span><span> </span><span>{</span>\n" +
      "<span>    </span><span>println!</span><span>(</span><span>\"Hello, World!\"</span><span>);</span>\n" +
      "<span>}</span></pre>"
    assert(md(contents) == "```\nfn main() {\n    println!(\"Hello, World!\");\n}\n```")
  }

  // md.rs:355-369 — data-lang on the pre node; trailing newline kept
  test("pre with data-lang attribute") {
    val contents = "<pre data-lang=\"rust\">" +
      "<span>fn</span> <span>main</span><span>()</span><span> </span><span>{</span>\n" +
      "<span>    </span><span>println!</span><span>(</span><span>\"Hello, World!\"</span><span>);</span>\n" +
      "<span>}</span>\n</pre>"
    assert(md(contents) == "```rust\nfn main() {\n    println!(\"Hello, World!\");\n}\n\n```")
  }

  // md.rs:371-385 — data-lang on a parent tag
  test("pre with data-lang on the parent") {
    val contents = "<div data-lang=\"rust\"><pre>" +
      "<span>fn</span> <span>main</span><span>()</span><span> </span><span>{</span>\n" +
      "<span>    </span><span>println!</span><span>(</span><span>\"Hello, World!\"</span><span>);</span>\n" +
      "<span>}</span>\n</pre></div>"
    assert(md(contents) == "```rust\nfn main() {\n    println!(\"Hello, World!\");\n}\n\n```")
  }

  // md.rs:387-401 — language-* css class on the child code tag
  test("pre with language css class on child code") {
    val contents = "<pre><code class=\"language-rust something else\">" +
      "<span>fn</span> <span>main</span><span>()</span><span> </span><span>{</span>\n" +
      "<span>    </span><span>println!</span><span>(</span><span>\"Hello, World!\"</span><span>);</span>\n" +
      "<span>}</span>\n</code></pre>"
    assert(md(contents) == "```rust\nfn main() {\n    println!(\"Hello, World!\");\n}\n\n```")
  }

  // md.rs:657-672 test_pre_code_without_new_line — the newline right after
  // <pre> is dropped by the parser (HTML5 rule)
  test("pre leading newline dropped") {
    val contents = "<pre>\n" +
      "<span>fn</span> <span>main</span><span>()</span><span> </span><span>{</span>\n" +
      "<span>    </span><span>println!</span><span>(</span><span>\"Hello, World!\"</span><span>);</span>\n" +
      "<span>}</span></pre>"
    assert(md(contents) == "```\nfn main() {\n    println!(\"Hello, World!\");\n}\n```")
  }

  // md.rs:403-440 test_blockquote
  test("blockquote: simple, multi-paragraph with hard breaks, empty") {
    assert(md("<blockquote><p>Quoted text</p></blockquote>") == "> Quoted text")
    val complex = "<blockquote>\n<p>\nWho has seen the wind?<br>\nNeither I nor you:<br>\n" +
      "But when the leaves hang trembling,<br>\nThe wind is passing through.\n</p>\n<p>\n" +
      "Who has seen the wind?<br>\nNeither you nor I:<br>\n" +
      "But when the trees bow down their heads,<br>\nThe wind is passing by.\n</p>\n" +
      "</blockquote>\n<p><i>Christina Rossetti</i></p>"
    val expected = "> Who has seen the wind?  \n> Neither I nor you:  \n" +
      "> But when the leaves hang trembling,  \n> The wind is passing through\\.\n> \n" +
      "> Who has seen the wind?  \n> Neither you nor I:  \n" +
      "> But when the trees bow down their heads,  \n> The wind is passing by\\.\n\n" +
      "*Christina Rossetti*"
    assert(md(complex) == expected)
    assert(md("<blockquote></blockquote>") == "")
  }

  // md.rs:442-470 test_inline_blockquote
  test("nested blockquote gets double quote markers") {
    val contents = "<blockquote>\n<p>\nWho has seen the wind?<br>\nNeither I nor you:<br>\n" +
      "But when the leaves hang trembling,<br>\nThe wind is passing through.\n</p>\n" +
      "<blockquote>\n<p>\nWho has seen the wind?<br>\nNeither you nor I:<br>\n" +
      "But when the trees bow down their heads,<br>\nThe wind is passing by.\n</p>\n" +
      "</blockquote>\n</blockquote>"
    val expected = "> Who has seen the wind?  \n> Neither I nor you:  \n" +
      "> But when the leaves hang trembling,  \n> The wind is passing through\\.\n> \n" +
      "> > Who has seen the wind?  \n> > Neither you nor I:  \n" +
      "> > But when the trees bow down their heads,  \n> > The wind is passing by\\."
    assert(md(contents) == expected)
  }

  // md.rs:471-496 test_table — th headings drive the separator widths
  test("table with th header row") {
    val contents = "<table>\n    <tr>\n        <th>Column 1</th>\n        <th>Column 2</th>\n" +
      "        <th>Column 3</th>\n    </tr>\n    <tr>\n        <td>R 1, <i>C 1</i></td>\n" +
      "        <td>R 1, <i>C 2</i></td>\n        <td>R 1, <i>C 3</i></td>\n    </tr>\n" +
      "    <tr>\n        <td>R 2, <i>C 1</i></td>\n        <td>R 2, <i>C 2</i></td>\n" +
      "        <td>R 2, <i>C 3</i></td>\n    </tr>\n</table>"
    val expected = "| Column 1 | Column 2 | Column 3 |\n| -------- | -------- | -------- |\n" +
      "| R 1, *C 1* | R 1, *C 2* | R 1, *C 3* |\n| R 2, *C 1* | R 2, *C 2* | R 2, *C 3* |"
    assert(md(contents) == expected)
  }

  // md.rs:498-527 test_table_inside_table — outer wrapper degrades, inner renders
  test("table inside table renders the inner table") {
    val contents = "<table>\n    <tr>\n        <td>\n            <table>\n" +
      "                <tr>\n                    <th>Column 1</th>\n" +
      "                    <th>Column 2</th>\n                    <th>Column 3</th>\n" +
      "                </tr>\n                <tr>\n                    <td>R 1, <i>C 1</i></td>\n" +
      "                    <td>R 1, <i>C 2</i></td>\n                    <td>R 1, <i>C 3</i></td>\n" +
      "                </tr>\n                <tr>\n                    <td>R 2, <i>C 1</i></td>\n" +
      "                    <td>R 2, <i>C 2</i></td>\n                    <td>R 2, <i>C 3</i></td>\n" +
      "                </tr>\n            </table>\n        </td>\n    </tr>\n</table>"
    val expected = "| Column 1 | Column 2 | Column 3 |\n| -------- | -------- | -------- |\n" +
      "| R 1, *C 1* | R 1, *C 2* | R 1, *C 3* |\n| R 2, *C 1* | R 2, *C 2* | R 2, *C 3* |"
    assert(md(contents) == expected)
  }

  // md.rs:529-549 test_table_without_headings
  test("table without headings uses empty header cells") {
    val contents = "<table>\n    <tr>\n        <td>R 1, <i>C 1</i></td>\n" +
      "        <td>R 1, <i>C 2</i></td>\n        <td>R 1, <i>C 3</i></td>\n    </tr>\n" +
      "    <tr>\n        <td>R 2, <i>C 1</i></td>\n        <td>R 2, <i>C 2</i></td>\n" +
      "        <td>R 2, <i>C 3</i></td>\n    </tr>\n</table>"
    val expected = "|   |   |   |\n| - | - | - |\n" +
      "| R 1, *C 1* | R 1, *C 2* | R 1, *C 3* |\n| R 2, *C 1* | R 2, *C 2* | R 2, *C 3* |"
    assert(md(contents) == expected)
  }

  // md.rs:551-569 test_table_skip — ragged rows degrade to hard-break lines
  test("ragged table degrades to text lines") {
    val contents = "<table>\n    <tr>\n        <td>R 1, <i>C 1</i></td>\n" +
      "        <td>R 1, <i>C 2</i></td>\n        <td>R 1, <i>C 3</i></td>\n    </tr>\n" +
      "    <tr>\n        <td>R 2, <i>C 1</i></td>\n        <td>R 2, <i>C 2</i></td>\n    </tr>\n</table>"
    assert(md(contents) == "R 1, *C 1* R 1, *C 2* R 1, *C 3*  \nR 2, *C 1* R 2, *C 2*")
  }

  // md.rs:571-580 test_table_empty
  test("empty table renders nothing") {
    assert(md("<table>\n    <tr></tr>\n    <tr></tr>\n</table>") == "")
  }

  // md.rs:582-596 test_table_with_list — in-cell lists use "+ " and <br>
  test("list inside a table cell") {
    val contents = "<table>\n    <tr>\n        <td>1</td>\n        <td>\n" +
      "            <ul><li>Lemon</li></ul>\n            <ul><li>Lime</li></ul>\n" +
      "            <ul><li>Grapefruit</li></ul>\n            <ul><li>Orange</li></ul>\n" +
      "        </td>\n    </tr>\n</table>"
    assert(md(contents) ==
      "|   |   |\n| - | - |\n| 1 | + Lemon<br>+ Lime<br>+ Grapefruit<br>+ Orange<br> |")
  }

  // md.rs:598-611 test_skip_tags_default
  test("default skip tags drop style subtrees") {
    val contents = "\n        <style>p {color: blue;}</style>\n" +
      "        <p>I really like using <b>Markdown</b>.</p>\n\n" +
      "        <p>I think I'll use it to format all of my documents from now on.</p>"
    assert(md(contents) == "I really like using **Markdown**\\.\n\n" +
      "I think I'll use it to format all of my documents from now on\\.")
  }

  // md.rs:613-630 test_skip_tags — custom skip list over a fragment parse
  test("custom skip tags expose style text, drop divs") {
    val contents = "<style>p {color: blue;}</style>" +
      "<div><h1>Content Heading<h1></div>" +
      "<p>I really like using Markdown.</p>" +
      "<p>I think I'll use it to format all of my documents from now on.</p>"
    val doc = Doc.fragment(contents)
    val got = graft.sources.Serializer.toMd(doc.acc, 0, includeRoot = false,
      skipTags = Seq("div"))
    assert(got == "p \\{color: blue;\\}\n\n" +
      "I really like using Markdown\\.\n\n" +
      "I think I'll use it to format all of my documents from now on\\.")
  }

  // md.rs:632-655 test_linebreak_after_lists
  test("blank line between list and following paragraph") {
    val contents = "Influenced\n        <ul>\n         <li>Idris (programming language)</li>\n" +
      "         <li>Project Verona</li>\n         <li>Spark</li>\n         <li>Swift</li>\n" +
      "         <li>V</li>\n         <li>Zig</li>\n        </ul>\n" +
      "        <p><b>Rust</b> is a general-purpose programming language</p>"
    val expected = "Influenced\n\n- Idris \\(programming language\\)\n- Project Verona\n" +
      "- Spark\n- Swift\n- V\n- Zig\n\n**Rust** is a general-purpose programming language"
    assert(md(contents) == expected)
  }

  // ADVICE r2: Rust char::is_whitespace = Unicode White_Space — U+00A0
  // (&nbsp;) and U+0085 collapse as whitespace in md text normalization;
  // Java \s would preserve them verbatim. A run of nbsp between words
  // becomes one space; leading/trailing nbsp acts as a word boundary.
  test("nbsp and NEL collapse as whitespace in md text (text_utils.rs:6-33)") {
    assert(md("<span>a\u00A0\u00A0b</span>") == "a b")
    assert(md("<span>a\u0085b</span>") == "a b")
    assert(md("<p>\u00A0lead and trail\u00A0</p>") == "lead and trail")
    // U+001C is NOT White_Space in Rust (it IS in Java) — preserved
    assert(md("<span>a\u001Cb</span>") == "a\u001Cb")
  }
}
