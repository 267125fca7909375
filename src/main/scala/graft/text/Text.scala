package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis building blocks for training-data pipelines, all as
  * codegen-friendly Column expressions (no UDFs in the hot path —
  * higher-order functions stay inside whole-stage codegen).
  */
object Text {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Word n-gram shingles: ["a b c", "b c d", ...]; empty when the doc
    * has fewer than n tokens (guard needed: Spark's `sequence(1, 0)`
    * would count DOWN, not return empty).
    *
    * This HOF form is the composable API; hot paths use
    * [[shingleSetUdf]] instead — HOF lambdas evaluate interpreted and
    * measured ~12x slower than the compiled UDF on a corpus scan
    * (an element_at variant was also tried and was slower still). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** DISTINCT word-n-gram shingle set of raw text, as a compiled Scala
    * UDF. Semantically identical to
    * `array_distinct(shingles(tokens(text), n))` but one JVM call per
    * row instead of per-element interpreted HOF lambdas — measured ~4x
    * faster on a corpus scan (HOF lambdas do not codegen). */
  def shingleSetUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
        if (toks.length < n) Array.empty[String]
        else {
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i <= toks.length - n) {
            val sb = new StringBuilder(toks(i))
            var j = 1
            while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
            seen.add(sb.toString)
            i += 1
          }
          seen.toArray(new Array[String](seen.size))
        }
      }
    }

  /** ALL word-n-gram shingles with repeats kept, compiled — the
    * counting variant of [[shingleSetUdf]] for repetition/boilerplate
    * signals, same ~10x-over-HOF reasoning. */
  def shingleListUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
        if (toks.length < n) Array.empty[String]
        else {
          val out = new Array[String](toks.length - n + 1)
          var i = 0
          while (i <= toks.length - n) {
            val sb = new StringBuilder(toks(i))
            var j = 1
            while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
            out(i) = sb.toString
            i += 1
          }
          out
        }
      }
    }

  /** Full k-permutation MinHash signature in ONE compiled pass over the
    * shingle set: element p is MIN over shingles of md5("p:" + shingle)
    * as lowercase hex — the engine-portable permutation hash (identical
    * to SQL `MIN(md5(p || ':' || shingle))` in Spark and DuckDB, since
    * hex strings compare bytewise in both). Computing all k minima per
    * row removes the explode + k-way aggregate (and its shuffle)
    * entirely from the signature stage. */
  def md5MinhashSigUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (shingles: Seq[String]) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val minima = new Array[String](k)
      val buf = new Array[Char](32) // reused across k * |shingles| digests
      shingles.foreach { sh =>
        var p = 0
        while (p < k) {
          md.reset()
          val h = graft.functions.Hex.bytesToHex(
            md.digest((p.toString + ":" + sh).getBytes("UTF-8")), 16, buf)
          if (minima(p) == null || h < minima(p)) minima(p) = h
          p += 1
        }
      }
      minima
    }

  /** Intra-document repeated-span excision in ONE compiled pass (the
    * q_text_repeat_excise kernel): scanning word n-gram shingles left
    * to right, every occurrence after a shingle's first marks its n
    * positions covered; uncovered words are stitched back in order.
    * Doc-local by construction — map-side only at any corpus scale.
    * Returns (n_words, n_kept, n_excised, clean_text). */
  def repeatExciseUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) (0L, 0L, 0L, "")
      else {
        val ws = text.toLowerCase(java.util.Locale.ROOT).split(" ")
          .filter(_.nonEmpty)
        val len = ws.length
        val covered = new Array[Boolean](len)
        if (len >= n) {
          val seen = new java.util.HashSet[String]()
          var i = 0
          while (i <= len - n) {
            val sb = new StringBuilder(ws(i))
            var j = 1
            while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
            if (!seen.add(sb.toString)) {
              var j2 = i
              while (j2 < i + n) { covered(j2) = true; j2 += 1 }
            }
            i += 1
          }
        }
        val kept = new StringBuilder
        var nKept = 0L
        var i = 0
        while (i < len) {
          if (!covered(i)) {
            if (nKept > 0) kept.append(' ')
            kept.append(ws(i)); nKept += 1
          }
          i += 1
        }
        (len.toLong, nKept, len - nKept, kept.toString)
      }
    }

  /** BPE-ish subword-count proxy: alpha runs + digit runs + leftovers.
    * (A real BPE table is model-specific; this regex split gives the
    * deterministic token-count shape pipelines budget with.) */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Count of tokens that appear in a fixed marker vocabulary. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*))).cast(LongType)

  // Tiny per-language marker vocabularies for the n-gram/stopword
  // language-ID heuristic. Deliberately small and deterministic.
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "est"),
    "zh" -> Seq("de5", "le5", "shi4", "bu4", "wo3", "ni3", "ta1"))

  /** Per-language marker-hit scores, as named columns. Consumers that
    * argmax over these should project them FIRST (a separate select)
    * and fold the CASE over the resulting attributes: folding over the
    * raw markerCount expressions inlines every score into every CASE
    * branch — ~46 interpreted `size(filter(...))` evaluations per row
    * instead of 5 (r14; CollapseProject will not re-inline a non-cheap
    * alias referenced more than once, so the two-step projection keeps
    * each score computed exactly once). */
  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, ms) => lang -> markerCount(toks, ms) }

  /** All [[langMarkers]] hit counts in ONE compiled pass over the raw
    * text (r14): HOF filter lambdas run interpreted (~10x slower than
    * compiled code in hot paths — CLAUDE.md lore), and the two-step
    * langScores form still walks the token array once per language.
    * This UDF lowercases, splits and counts every language's markers
    * in a single token walk. Empty tokens are never markers, so the
    * usual `x <> ''` filter is unnecessary; counts are multiplicity-
    * preserving, identical to `size(filter(toks, isin(markers)))`. */
  val langScoresUdf: org.apache.spark.sql.expressions.UserDefinedFunction = {
    val sets: Array[Set[String]] = langMarkers.map(_._2.toSet).toArray
    udf { (text: String) =>
      val c = new Array[Long](sets.length)
      if (text != null) {
        val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ")
        var j = 0
        while (j < toks.length) {
          var i = 0
          while (i < sets.length) {
            if (sets(i).contains(toks(j))) c(i) += 1
            i += 1
          }
          j += 1
        }
      }
      c
    }
  }

  /** Argmax over already-projected score COLUMNS (one per language,
    * in [[langMarkers]] order) with the fixed first-listed-wins
    * tie-break — the cheap second step of the two-step language ID. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val (firstLang, firstScore) = scores.head
    scores.tail.foldLeft((lit(firstLang), firstScore)) {
      case ((accLang, accScore), (lang, score)) =>
        (when(score > accScore, lit(lang)).otherwise(accLang),
          when(score > accScore, score).otherwise(accScore))
    }._1
  }

  /** Language-ID: argmax of marker-vocab hit counts with a fixed
    * tie-break order (first language listed wins ties). Single-column
    * form — prefer langScores + langIdFromScores over a projection
    * boundary in per-row hot paths (see [[langScores]]). */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> markerCount(toks, ms) }
    // fold from the last language to the first: earlier langs win ties
    // because the comparison is strict `>` on already-chosen best.
    val (firstLang, firstScore) = scores.head
    val (bestLang, _) = scores.tail.foldLeft((lit(firstLang), firstScore)) {
      case ((accLang, accScore), (lang, score)) =>
        (when(score > accScore, lit(lang)).otherwise(accLang),
          when(score > accScore, score).otherwise(accScore))
    }
    bestLang
  }

  /** Quality-scoring feature columns (length / punctuation / stopword
    * ratios) — the standard pre-training quality heuristics. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast(LongType)
    val stop = markerCount(toks, langMarkers.head._2)
    Seq(
      "n_chars" -> length(text).cast(LongType),
      "n_tokens" -> nTok,
      "n_distinct_tokens" -> size(array_distinct(toks)).cast(LongType),
      "n_punct" -> length(regexp_replace(text, "[a-z0-9 ]", "")).cast(LongType),
      "avg_token_len" ->
        (aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
          .cast("double") / nTok.cast("double")),
      "stopword_ratio" -> (stop.cast("double") / nTok.cast("double")),
      "distinct_ratio" ->
        (size(array_distinct(toks)).cast("double") / nTok.cast("double")))
  }
}
