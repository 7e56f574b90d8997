package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HtmlExtractText]] vs an INDEPENDENT reference parser (tokenize →
  * event list → assemble; written against the kernel's documented
  * contract, not its code), over both hand-picked grammar corners and a
  * seeded random-HTML property sweep. The DataFrame path is used for the
  * sweep so the comparison exercises the codegen (doGenCode) route, not
  * just nullSafeEval.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  // ---------- independent reference implementation ----------

  private val blockTags = Set("html", "head", "body", "title", "p", "div",
    "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "dl",
    "dt", "dd", "table", "thead", "tbody", "tfoot", "tr", "td", "th",
    "section", "article", "aside", "header", "footer", "main", "nav",
    "blockquote", "pre", "form", "figure", "figcaption")

  private sealed trait Ev
  private case class Txt(cp: Int) extends Ev
  private case object Boundary extends Ev

  /** Contract reimplementation: tokenizes into an event stream first,
    * assembles blocks second — a different shape from the kernel's
    * single-buffer pass.
    */
  private def reference(s: String): (String, Long, Long) = {
    val n = s.length
    val ev = scala.collection.mutable.ArrayBuffer.empty[Ev]
    var tags = 0L
    var i = 0
    def tagNameAt(start: Int, limit: Int): (Boolean, String) = {
      var p = start
      val closing = p < n && s.charAt(p) == '/'
      if (closing) p += 1
      val b = new StringBuilder
      while (p < n && p <= limit && s.charAt(p).isLetterOrDigit &&
          s.charAt(p) < 128) { b.append(s.charAt(p).toLower); p += 1 }
      (closing, b.toString)
    }
    def scanTagEnd(start: Int): Int = { // index of '>' honoring quotes, or n
      var j = start
      var quote: Char = 0
      while (j < n && (quote != 0 || s.charAt(j) != '>')) {
        val q = s.charAt(j)
        if (quote == 0 && (q == '"' || q == '\'')) quote = q
        else if (q == quote) quote = 0
        j += 1
      }
      j
    }
    def findClose(name: String, from: Int): Int = {
      var k = from
      while (k >= 0) {
        k = s.indexOf("</", k)
        if (k < 0) return -1
        val seg = s.substring(math.min(k + 2, n),
          math.min(k + 2 + name.length, n))
        if (seg.equalsIgnoreCase(name)) return k
        k += 1
      }
      -1
    }
    val named = Map("amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"',
      "apos" -> '\'', "nbsp" -> ' ')
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && s.startsWith("<!--", i)) {
        val j = s.indexOf("-->", i + 4)
        tags += 1
        i = if (j < 0) n else j + 3
      } else if (c == '<' && i + 1 < n &&
          (s.charAt(i + 1).isLetter && s.charAt(i + 1) < 128 ||
            "/!?".contains(s.charAt(i + 1)))) {
        val j = scanTagEnd(i + 1)
        tags += 1
        val (closing, name) = tagNameAt(i + 1, j)
        if (!closing && (name == "script" || name == "style")) {
          val k = findClose(name, if (j < n) j + 1 else n)
          if (k < 0) i = n
          else {
            val m = s.indexOf('>', k)
            tags += 1
            i = if (m < 0) n else m + 1
          }
          ev += Boundary
        } else {
          if (blockTags.contains(name)) ev += Boundary
          i = if (j >= n) n else j + 1
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i + 1 && semi <= i + 10)
          Some(s.substring(i + 1, semi)) else None
        val dec: Option[Seq[Int]] = ent.flatMap { e =>
          if (named.contains(e)) Some(Seq(named(e).toInt))
          else if (e.startsWith("#")) {
            val hex = e.length > 1 && (e(1) == 'x' || e(1) == 'X')
            val digits = e.substring(if (hex) 2 else 1)
            val cp = try {
              if (digits.isEmpty) -1
              else Integer.parseInt(digits, if (hex) 16 else 10)
            } catch { case _: NumberFormatException => -1 }
            if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
              Some(Seq(cp))
            else None
          } else None
        }
        dec match {
          case Some(cps) => cps.foreach(cp => ev += Txt(cp)); i = semi + 1
          case None      => ev += Txt('&'.toInt); i += 1
        }
      } else {
        ev += Txt(c.toInt)
        i += 1
      }
    }
    ev += Boundary
    // assemble: split at boundaries, collapse ws (cp <= 32), trim, drop
    // empties, join with \n
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var sawSpace = false
    ev.foreach {
      case Txt(cp) =>
        if (cp <= 32) { if (cur.length > 0) sawSpace = true }
        else {
          if (sawSpace) { cur.append(' '); sawSpace = false }
          cur.appendCodePoint(cp): Unit
        }
      case Boundary =>
        if (cur.length > 0) { blocks += cur.toString; cur.setLength(0) }
        sawSpace = false
    }
    (blocks.mkString("\n"), tags, blocks.size.toLong)
  }

  private def kernel(s: String): (String, Long, Long) = {
    val r = NativeExpressions.htmlExtract(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
  }

  // ---------- hand-picked grammar corners ----------

  private val corners = Seq(
    "",
    "plain text only",
    "   leading and trailing   ",
    "<p>one</p>",
    "<P>UPPER</P><p>lower</p>",
    "a <b>bold</b> run",                       // inline: no boundary
    "x<div>y</div>z",
    "<div class=\"a>b\">quoted gt</div>",      // '>' inside attr value
    "<div data-x='1>2' y=\"3>4\">both</div>",
    "<script>var a = \"<p>not a tag</p>\";</script>after",
    "<SCRIPT>x</SCRIPT>tail",                  // case-insensitive close
    "<style>p { color: red }</style>styled",
    "<script>never closed",                    // unterminated subtree
    "<!-- comment -->kept",
    "<!-- never closed",
    "before<!--a-->after",
    "&amp;&lt;&gt;&quot;&apos;",
    "fish &amp; chips",
    "a&nbsp;&nbsp;b",                          // nbsp collapses
    "A&#66;C and &#x44;E",
    "&#32;spaces&#32;",                        // numeric space is ws
    "&#128512; emoji",                         // astral plane
    "&#55296; surrogate stays",                // D800: invalid, literal
    "&#xZZ; bad hex",
    "&#; empty",
    "&unknown; stays",
    "&toolongentityname; stays",
    "bare & ampersand",
    "& ;",
    "1 < 2 and x<3",                           // literal '<'
    "a < b < c",
    "trailing <",
    "<",
    "<p>unclosed tag at eof <span attr=",
    "<br/>a<br />b<hr>c",
    "<ul><li>one</li><li>two</li></ul>",
    "<?xml version=\"1.0\"?><!DOCTYPE html><p>doc</p>",
    "</p>close first",
    "</ p>odd close",                          // '/' then non-name
    "<h1>t</h1><h2>u</h2>",
    "nested <div><div>deep</div></div> end",
    "<pre>  keep   collapsing  </pre>",        // ws still collapses
    "<td>a</td><td>b</td>",
    "text<style>a{}</style><script>b</script>more")

  test("corner cases: kernel ≡ independent reference") {
    corners.foreach { h =>
      assert(kernel(h) == reference(h), s"input: [$h]")
    }
  }

  test("documented expectations on load-bearing corners") {
    assert(kernel("<p>one</p>") == (("one", 2L, 1L)))
    assert(kernel("a <b>bold</b> run") == (("a bold run", 2L, 1L)))
    assert(kernel("<div class=\"a>b\">quoted gt</div>") ==
      (("quoted gt", 2L, 1L)))
    assert(kernel("<script>var a = \"<p>x</p>\";</script>after") ==
      (("after", 2L, 1L)))
    assert(kernel("<!-- comment -->kept") == (("kept", 1L, 1L)))
    assert(kernel("fish &amp; chips") == (("fish & chips", 0L, 1L)))
    assert(kernel("1 < 2 and x<3") == (("1 < 2 and x<3", 0L, 1L)))
    assert(kernel("<br/>a<br />b<hr>c") == (("a\nb\nc", 3L, 3L)))
    assert(kernel("&unknown; stays") == (("&unknown; stays", 0L, 1L)))
    assert(kernel("") == (("", 0L, 0L)))
  }

  private def meta(html: String): (Option[String], Option[String]) = {
    val r = NativeExpressions.htmlMeta(
      org.apache.spark.unsafe.types.UTF8String.fromString(html))
    (Option(r.getUTF8String(0)).map(_.toString),
      Option(r.getUTF8String(1)).map(_.toString))
  }

  test("htmlMeta: title RCDATA, firsts win, decoys skipped, null paths") {
    assert(meta("""<html lang="EN-us"><title>T</title>""") ==
      ((Some("T"), Some("en-us"))))
    // RCDATA: markup inside title is literal text
    assert(meta("<title>a <b> c</title>")._1 == Some("a <b> c"))
    // entity decode + whitespace collapse + trim
    assert(meta("<title>  A &amp;  B </title>")._1 == Some("A & B"))
    // FIRST title and FIRST html tag win
    assert(meta("<title>one</title><title>two</title>")._1 == Some("one"))
    assert(meta("""<html lang=de><html lang=fr>""")._2 == Some("de"))
    // unterminated title runs to EOF; empty title is "", not null
    assert(meta("<title>to the end")._1 == Some("to the end"))
    assert(meta("<title></title>")._1 == Some(""))
    // decoys inside comment/script are never picked
    assert(meta("""<!-- <title>g</title> --><title>real</title>""")._1 ==
      Some("real"))
    assert(meta("""<script>t="<title>f</title>"</script><title>r</title>""")
      ._1 == Some("r"))
    // absent / empty lang is null; bare and single-quoted forms parse
    assert(meta("<html><title>t</title>") == ((Some("t"), None)))
    assert(meta("""<html lang="">x""")._2 == None)
    assert(meta("<html lang='Pt-BR'>x")._2 == Some("pt-br"))
    assert(meta("no markup at all") == ((None, None)))
  }

  // ---------- seeded random-HTML property sweep (codegen path) ----------

  private def genHtml(rnd: scala.util.Random): String = {
    val words = Seq("alpha", "Beta", "g4mma", "delta", "x", "Y9")
    val inline = Seq("b", "i", "em", "span", "a", "code")
    val block = Seq("p", "div", "h1", "li", "td", "blockquote", "br")
    val entities = Seq("&amp;", "&lt;", "&gt;", "&quot;", "&apos;",
      "&nbsp;", "&#66;", "&#x44;", "&#128512;", "&unknown;", "&#xZZ;",
      "&#;", "&")
    def attrs(): String = rnd.nextInt(4) match {
      case 0 => ""
      case 1 => " class=\"k\""
      case 2 => " data-a=\"x>y\" b='1>2'"
      case _ => " id=q"
    }
    val sb = new StringBuilder
    val pieces = 5 + rnd.nextInt(25)
    for (_ <- 0 until pieces) rnd.nextInt(12) match {
      case 0 | 1 | 2 => sb.append(words(rnd.nextInt(words.size))).append(" ")
      case 3 => sb.append(Seq(" ", "\t", "\n", "  \n ")(rnd.nextInt(4)))
      case 4 => sb.append(entities(rnd.nextInt(entities.size)))
      case 5 =>
        val t = inline(rnd.nextInt(inline.size))
        sb.append(s"<$t${attrs()}>")
          .append(words(rnd.nextInt(words.size)))
          .append(s"</$t>")
      case 6 =>
        val t = block(rnd.nextInt(block.size))
        if (t == "br") sb.append(if (rnd.nextBoolean()) "<br/>" else "<BR>")
        else sb.append(s"<$t${attrs()}>")
          .append(words(rnd.nextInt(words.size)))
          .append(s"</${if (rnd.nextBoolean()) t else t.toUpperCase}>")
      case 7 => sb.append("<!-- hidden ")
        .append(words(rnd.nextInt(words.size))).append(" -->")
      case 8 =>
        val t = if (rnd.nextBoolean()) "script" else "style"
        sb.append(s"<$t>junk <p>pseudo</p> ${words(rnd.nextInt(words.size))}</$t>")
      case 9 => sb.append(Seq("< ", "<3", "1<2 ", "<.", "< ")(rnd.nextInt(5)))
      case 10 => sb.append(s"<${block(rnd.nextInt(block.size))}>")
      case _ => sb.append(s"</${inline(rnd.nextInt(inline.size))}>")
    }
    // occasionally end on an unterminated construct
    rnd.nextInt(6) match {
      case 0 => sb.append("<unclosed attr=")
      case 1 => sb.append("<!-- never closed ")
      case 2 => sb.append("<script>forever")
      case 3 => sb.append("&am")
      case _ => ()
    }
    sb.toString
  }

  test("property sweep: 300 seeded random documents, DataFrame codegen " +
      "path ≡ reference") {
    val rnd = new scala.util.Random(42)
    val inputs = (0 until 300).map(_ => genHtml(rnd))
    val got = inputs.toDF("html")
      .select(NativeExpressions.html_extract_text($"html").as("h"))
      .select($"h.text", $"h.tags_dropped", $"h.blocks_kept")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    inputs.zip(got).foreach { case (in, k) =>
      assert(k == reference(in), s"input: [$in]")
    }
  }
}
