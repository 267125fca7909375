package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** URL canonicalization for crawl-corpus dedup: the normalization web
  * pipelines apply before URL-level dedup so that cosmetic variants of
  * one page (scheme/host case, default port, `www.` prefix, tracking
  * params, param order, trailing slash, fragment) collapse to one key.
  *
  * The contract is deliberately SQL-replayable — every step is a plain
  * string operation a DuckDB oracle expresses with regexp/list
  * functions (see q_url_canonicalize):
  *   - scheme lowercased
  *   - host lowercased, `:80` suffix stripped, leading `www.` stripped
  *   - path: trailing slashes stripped (case preserved — paths are
  *     case-sensitive)
  *   - query: params split on `&`, empties and `utm_*`/`fbclid=`/
  *     `gclid=` tracking params dropped, rest sorted bytewise and
  *     re-joined (ASCII inputs: JVM string order == UTF-8 byte order)
  *   - fragment dropped
  *
  * Compiled UDF rather than a `filter`/`array_sort` HOF chain: lambda
  * HOFs run interpreted (measured ~10x slower), and canonicalization
  * sits on the full-corpus hot path of a crawl dedup.
  */
object Url {

  def canonicalize(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0 || !url.substring(0, schemeEnd).forall(_.isLetter))
      return url
    val scheme = url.substring(0, schemeEnd).toLowerCase
    val rest = url.substring(schemeEnd + 3)
    var hostEnd = rest.length
    var i = 0
    while (i < hostEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { hostEnd = i }
      else i += 1
    }
    var host = rest.substring(0, hostEnd).toLowerCase
    if (host.endsWith(":80")) host = host.substring(0, host.length - 3)
    if (host.startsWith("www.")) host = host.substring(4)
    val afterHost = rest.substring(hostEnd)
    val qIdx = afterHost.indexOf('?')
    val hIdx = afterHost.indexOf('#')
    val pathEnd =
      if (qIdx >= 0 && (hIdx < 0 || qIdx < hIdx)) qIdx
      else if (hIdx >= 0) hIdx
      else afterHost.length
    var path = afterHost.substring(0, pathEnd)
    while (path.nonEmpty && path.charAt(path.length - 1) == '/')
      path = path.substring(0, path.length - 1)
    val query =
      if (qIdx < 0) ""
      else {
        val qEnd = if (hIdx > qIdx) hIdx else afterHost.length
        afterHost.substring(qIdx + 1, qEnd)
      }
    val kept = query.split("&").filter { p =>
      p.nonEmpty && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid=")
    }
    java.util.Arrays.sort(kept.asInstanceOf[Array[AnyRef]])
    val qs = kept.mkString("&")
    val sb = new StringBuilder(scheme).append("://").append(host).append(path)
    if (qs.nonEmpty) sb.append('?').append(qs)
    sb.toString
  }

  val canonicalizeUdf: UserDefinedFunction = udf(canonicalize _)
}
