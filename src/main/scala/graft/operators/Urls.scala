package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/** URL canonicalization for crawl pipelines: the frontier-dedup /
  * per-domain-budget step every web corpus runs before anything else —
  * the same page arrives as `HTTP://Example.COM:80/a?utm_source=x&b=2&a=1#top`
  * and `http://example.com/a?a=1&b=2`, and a crawl that treats those as
  * two URLs double-fetches, double-counts domain quotas, and
  * double-trains. (The reference ETL consumes a structured API and
  * never faces URLs.)
  *
  * Canonical form, applied in order:
  *   1. scheme and host lowercased (path/query case is significant)
  *   2. fragment dropped
  *   3. default port stripped (`:80` for http, `:443` for https)
  *   4. tracking parameters dropped: any key starting `utm_` plus the
  *      click-id family ([[trackingKeys]])
  *   5. remaining query params sorted lexicographically (byte order —
  *      param text is ASCII in practice; order-insensitive equality is
  *      the point)
  *   6. empty path normalized to `/`
  *
  * Scope (documented, not silent): no userinfo handling beyond
  * dropping it with the authority parse, no percent-decoding, no IDN —
  * those vary per consumer; the six rules above are the
  * high-agreement core. Registrable-domain extraction uses the
  * last-two-labels rule with a small built-in table of two-level
  * public suffixes ([[multiPartSuffixes]]) — a full PSL is a data
  * file, not an algorithm change.
  *
  * Everything is a ROW-LOCAL projection of native regexp/array
  * expressions in the Java ∩ RE2 subset — zero exchanges, zero UDFs;
  * a 100 TB canonicalization is scan → project → write at input
  * parallelism, and the downstream frontier dedup keys on the
  * canonical string.
  */
object Urls {

  /** Click-id / referral keys dropped besides the `utm_` prefix family. */
  private[graft] val trackingKeys =
    Seq("fbclid", "gclid", "msclkid", "igshid", "mc_eid", "ref")

  /** Two-level public suffixes for the registrable-domain rule. */
  private[graft] val multiPartSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "co.in", "com.br", "com.mx", "co.nz", "com.sg", "com.cn")

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** (host, port-string) from the authority; userinfo dropped. */
  private def hostPort(url: Column): (Column, Column) = {
    val afterScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = regexp_extract(afterScheme, "^([^/?#]*)", 1)
    val hp = regexp_extract(authority, "([^@]*)$", 1)
    (lower(regexp_extract(hp, "^([^:]*)", 1)),
      regexp_extract(hp, ":([0-9]+)$", 1))
  }

  private def pathOf(url: Column): Column = {
    val afterAuth = regexp_replace(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val p = regexp_extract(afterAuth, "^([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  private def queryOf(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\\?([^#]*)", 1)

  /** Query params surviving the tracking filter, sorted. */
  private def keptParams(query: Column): Column = {
    val raw = filter(split(query, "&"), p => length(p) > 0)
    val kept = filter(raw, { p =>
      val key = lower(substring_index(p, "=", 1))
      !key.startsWith("utm_") && !key.isin(trackingKeys: _*)
    })
    array_sort(kept)
  }

  /** Canonicalize `url` into a struct:
    *   - `canonical_url` (null when the input has no scheme — not a URL)
    *   - `host`, `registrable_domain`
    *   - `n_params_dropped` (tracking params removed)
    */
  def canonicalize(url: Column): Column = {
    val scheme = schemeOf(url)
    val (host, port) = hostPort(url)
    val path = pathOf(url)
    val query = queryOf(url)
    val raw = filter(split(query, "&"), p => length(p) > 0)
    val kept = keptParams(query)
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val queryPart = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    val canon = when(scheme === "", lit(null).cast(StringType))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2).cast(StringType), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3).cast(StringType),
      element_at(labels, -2), element_at(labels, -1))
    val registrable = when(n >= 3 && last2.isin(multiPartSuffixes: _*), last3)
      .otherwise(when(n >= 2, last2).otherwise(host))
    struct(
      canon.as("canonical_url"),
      host.as("host"),
      registrable.as("registrable_domain"),
      (size(raw) - size(kept)).cast(IntegerType).as("n_params_dropped"))
  }

  /** robots.txt line pattern: `Allow:`/`Disallow:` directives, case-
    * insensitive, multiline — matched as whole directives (group
    * parsing happens per element; RE2's extract-all yields one group).
    */
  private[graft] val robotsLineRe = "(?im)^[ \\t]*(?:disallow|allow)[ \\t]*:[ \\t]*\\S*"

  /** Parse robots.txt bodies into one rule row per directive:
    * (domainCol, rule_type 'allow'|'disallow', rule_path, rule_len).
    * Empty-path `Disallow:` lines (the "allow everything" idiom) are
    * dropped — they match nothing by the longest-prefix rule anyway.
    *
    * SCOPE (documented): the whole file is treated as one agent group
    * (the `*` group — per-agent groups and the `*`/`$` wildcards are
    * data-model extensions, not algorithm changes); paths match as
    * LITERAL prefixes.
    */
  def robotsRules(robots: DataFrame, domainCol: String,
      txtCol: String): DataFrame =
    robots.select(col(domainCol),
        explode(regexp_extract_all(col(txtCol), lit(robotsLineRe), lit(0)))
          .as("_line"))
      .select(col(domainCol),
        lower(regexp_extract(col("_line"),
          "(?i)^[ \\t]*(disallow|allow)", 1)).as("rule_type"),
        regexp_extract(col("_line"), ":[ \\t]*(\\S*)$", 1).as("rule_path"))
      .filter(length(col("rule_path")) > 0)
      .withColumn("rule_len", length(col("rule_path")).cast(IntegerType))

  /** Evaluate crawlability: for every URL, the longest-prefix robots
    * rule of its HOST decides (ties → allow, the Google precedence);
    * hosts with no matching rule — or no robots entry at all — are
    * allowed. Output: (idCol, host, path, allowed, rule_type,
    * rule_path) with null rule columns when nothing matched.
    *
    * Scale: rules frames are robots-corpus-sized (thousands of
    * domains × tens of directives) and broadcast; the URL side is one
    * scan projected to (id, host, path) — the decision is a broadcast
    * join + one keyed max_by aggregate per URL.
    */
  def robotsFilter(urls: DataFrame, idCol: String, urlCol: String,
      robots: DataFrame, domainCol: String, txtCol: String): DataFrame = {
    val (host, _) = hostPort(col(urlCol))
    val parsed = urls.select(col(idCol).as("_id"), host.as("host"),
      pathOf(col(urlCol)).as("path"))
    val rules = robotsRules(robots, domainCol, txtCol)
      .withColumnRenamed(domainCol, "host")
    val matched = parsed.join(broadcast(rules), Seq("host"))
      .filter(col("path").startsWith(col("rule_path")))
      .groupBy(col("_id"))
      // longest rule wins; at equal length allow beats disallow
      .agg(max_by(
        struct(col("rule_type"), col("rule_path")),
        struct(col("rule_len"),
          when(col("rule_type") === "allow", 1).otherwise(0))).as("_w"))
      .select(col("_id"), col("_w.rule_type").as("rule_type"),
        col("_w.rule_path").as("rule_path"))
    parsed.join(matched, Seq("_id"), "left")
      .select(col("_id").as(idCol), col("host"), col("path"),
        coalesce(col("rule_type") =!= "disallow", lit(true)).as("allowed"),
        col("rule_type"), col("rule_path"))
  }
}
