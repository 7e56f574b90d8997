package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — the derivation
  * step in front of every per-site operator in this repo (q60/q66 source
  * quotas, q106 KL drift, q128 referential audits all key on a `source`
  * column that a real crawl pipeline must COMPUTE from raw URLs). Both
  * steps are narrow codegen'd projections
  * ([[graft.functions.CanonicalUrlParts]],
  * [[graft.functions.RegisteredDomainExpr]]): zero shuffles, zero regex
  * machinery, the public-suffix table on a broadcast — at 100 TB this
  * pins at the parquet scan's speed, and the derived domain column then
  * partitions/quotas exactly like a stored one.
  */
object Urls {

  /** Built-in public-suffix subset: common gTLDs + a few ccTLD
    * second-level registries, enough for tests and small corpora. The
    * REAL public-suffix list (publicsuffix.org, ~9k rules) should be
    * loaded from a file and passed as `suffixes` in production — the
    * kernel semantics (longest label-suffix match, implicit "*" default
    * for unknown TLDs) follow that list's algorithm, so swapping the
    * table in changes no code.
    */
  val DefaultSuffixes: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "ai", "dev", "app", "us", "eu",
    "uk", "co.uk", "ac.uk", "gov.uk", "org.uk",
    "au", "com.au", "org.au", "net.au",
    "jp", "co.jp", "ne.jp", "ac.jp",
    "br", "com.br", "cn", "com.cn", "in", "co.in",
    "de", "fr", "nl", "ru", "se", "ch", "es", "it", "ca")

  /** Canonicalize a URL column and derive host + registered domain:
    * adds `canonical` (the RFC 3986 §6 normal form — lowercase
    * scheme/host, default port and fragment stripped, unreserved
    * percent-escapes decoded and the rest uppercased, empty path → "/"),
    * `host`, and `registered_domain` (longest public suffix + one
    * label). All three are one fused narrow projection over the scan.
    */
  def canonicalize(df: DataFrame, urlCol: String,
      suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    require(suffixes.nonEmpty, "suffix set must be non-empty")
    val set = new java.util.HashSet[String](suffixes.length * 2)
    suffixes.foreach(s => set.add(s.toLowerCase(java.util.Locale.ROOT)))
    val bc = df.sparkSession.sparkContext.broadcast(set)
    df.withColumn("__u",
        graft.functions.NativeExpressions.canonical_url_parts(col(urlCol)))
      .withColumn("canonical", col("__u.canonical"))
      .withColumn("host", col("__u.host"))
      .withColumn("registered_domain",
        graft.functions.NativeExpressions.registered_domain(col("host"), bc))
      .drop("__u")
  }
}
