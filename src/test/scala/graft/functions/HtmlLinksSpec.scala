package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HtmlExtractLinks]] grammar corners and [[ResolveUrl]] vs two
  * independent authorities: the RFC 3986 §5.4 normative example set
  * (normal AND abnormal references, verbatim) and `java.net.URI.resolve`
  * on a generated sweep (restricted to the reference shapes where the
  * JDK implements the same RFC semantics).
  */
class HtmlLinksSpec extends SparkSpec {
  import spark.implicits._

  private def links(html: String): Seq[String] = {
    val arr = NativeExpressions.htmlExtractLinks(
      org.apache.spark.unsafe.types.UTF8String.fromString(html))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def resolve(base: String, ref: String): String = {
    val r = NativeExpressions.resolveUrl(
      org.apache.spark.unsafe.types.UTF8String.fromString(base),
      org.apache.spark.unsafe.types.UTF8String.fromString(ref))
    if (r == null) null else r.toString
  }

  test("link harvest: quoting, entities, order, skipped subtrees") {
    assert(links("""<a href="x">t</a>""") == Seq("x"))
    assert(links("""<a href='y'>t</a><a href=bare>u</a>""") ==
      Seq("y", "bare"))
    assert(links("""<A HREF="upper">t</A>""") == Seq("upper"))
    assert(links("""<a class="k" id=z href="third">t</a>""") == Seq("third"))
    assert(links("""<a href="a&amp;b?x=1&amp;y=2">t</a>""") ==
      Seq("a&b?x=1&y=2"))
    assert(links("""<a href=" padded ">t</a>""") == Seq("padded"))
    assert(links("""<a href="">t</a>""") == Seq(""))
    assert(links("""<a name="no-href">t</a>""") == Seq.empty)
    assert(links("""<!-- <a href="ghost">g</a> --><a href="real">r</a>""") ==
      Seq("real"))
    assert(links("""<script>var x = '<a href="fake">';</script>""" +
      """<a href="real">r</a>""") == Seq("real"))
    assert(links("""<a title="a>b" href="after-gt">t</a>""") ==
      Seq("after-gt"))
    assert(links("""<a href="1">x</a> mid <div><a href="2">y</a></div>""") ==
      Seq("1", "2"))
    assert(links("no anchors here") == Seq.empty)
  }

  // RFC 3986 §5.4.1 (normal) + §5.4.2 (abnormal), base and expectations
  // verbatim from the RFC.
  private val rfcBase = "http://a/b/c/d;p?q"
  private val rfcCases = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q#s",
    "g#s" -> "http://a/b/c/g#s",
    "g?y#s" -> "http://a/b/c/g?y#s",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y#s",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g",
    // abnormal
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "g?y/./x" -> "http://a/b/c/g?y/./x",
    "g?y/../x" -> "http://a/b/c/g?y/../x",
    "g#s/./x" -> "http://a/b/c/g#s/./x",
    "g#s/../x" -> "http://a/b/c/g#s/../x",
    "http:g" -> "http:g")

  test("resolveUrl == the RFC 3986 §5.4 normative example set") {
    rfcCases.foreach { case (ref, want) =>
      assert(resolve(rfcBase, ref) == want, s"ref [$ref]")
    }
  }

  test("resolveUrl == java.net.URI.resolve on the shared-semantics sweep") {
    // bases/refs restricted to where java.net.URI (RFC 2396 semantics)
    // agrees with RFC 3986: no empty-path base (3986 §5.3 merge is new),
    // no dot segments in ABSOLUTE-path refs (2396 only normalizes merged
    // relative paths) — those corners are covered by the RFC §5.4 set
    val bases = Seq("http://h/a/b/c?q", "https://h.x:81/p/",
      "http://h/", "https://u@h/deep/er/leaf")
    val refs = Seq("g", "g/h", "./g", "../g", "/abs", "g?x=1",
      "g#f", "g?x#f", "//other/p", "http://abs/p", "a/./b", "a/../b",
      "x;y=1", "g/")
    for (b <- bases; r <- refs
        // ".." climbing past the root: 3986 drops it (§5.4.2 abnormal),
        // 2396-era java.net.URI keeps it — RFC set covers this corner
        if !(r.startsWith("..") && b.count(_ == '/') <= 3)) {
      val want = java.net.URI.create(b).resolve(r).toString
      assert(resolve(b, r) == want, s"base [$b] ref [$r]")
    }
  }

  test("resolveUrl: non-absolute base is null, never a fabricated URL") {
    assert(resolve("/relative/base", "g") == null)
    assert(resolve("", "g") == null)
    // and through the DataFrame codegen path
    val got = Seq(("http://h/p/", "g"), ("notascheme/path", "g"))
      .toDF("base", "ref")
      .select(NativeExpressions.resolve_url($"base", $"ref").as("u"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("http://h/p/g"), None))
  }

  test("extractLinks end to end: harvest + resolve through the codegen path") {
    val html = """<a href="a/b">1</a><a href='//cdn/x'>2</a>""" +
      """<a href="?q=2">3</a><a href="#top">4</a>"""
    val df = Seq((7L, html, "https://site.org/dir/page?old")).toDF(
      "doc_id", "html", "url")
    val got = graft.scale.Curation.extractLinks(df, "doc_id", "html", "url")
      .orderBy("pos")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, "a/b", "https://site.org/dir/a/b"),
      (1L, "//cdn/x", "https://cdn/x"),
      (2L, "?q=2", "https://site.org/dir/page?q=2"),
      (3L, "#top", "https://site.org/dir/page?old#top")))
  }
}
