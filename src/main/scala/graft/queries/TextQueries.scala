package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.{Q, Tables}
import graft.text.Text

/** Wave 4a — text analysis over `documents`: tokenization + counts,
  * quality scoring, language ID, document fingerprinting, exact dedup.
  */
object TextQueries {

  private val toks = Text.tokens(col("text"))

  val textTokens: Q = Q(
    "q_text_tokens",
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
      |  FROM documents)
      |SELECT token, COUNT(*) AS n FROM tok
      |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin) { (s, d) =>
    // split+explode then a codegen'd filter — NOT filter() inside the
    // array (HOF lambdas run interpreted; see Text.shingleSetUdf note)
    Tables.load(s, d, "documents")
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(50)
      .orderBy(col("n").desc, col("token").asc)
  }

  /** Token counting both ways (the budgeting pair): whitespace tokens
    * and BPE-ish subword tokens ([[Text.regexTokens]] — alpha/digit
    * runs, the deterministic stand-in for a model-specific BPE table). */
  val textTokenCounts: Q = Q(
    "q_text_token_counts",
    """SELECT doc_id,
      |  len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS n_ws_tokens,
      |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n_subword_tokens
      |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(Text.regexTokens(col("text"))).cast("long").as("n_subword_tokens"))
      .orderBy("doc_id")
  }

  val textQuality: Q = Q(
    "q_text_quality",
    """WITH t AS (SELECT doc_id, text,
      |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |           FROM documents)
      |SELECT doc_id,
      |  LENGTH(text) AS n_chars,
      |  len(toks) AS n_tokens,
      |  len(list_distinct(toks)) AS n_distinct_tokens,
      |  LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
      |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
      |    / len(toks) AS avg_token_len,
      |  CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','a'))) AS DOUBLE)
      |    / len(toks) AS stopword_ratio,
      |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val feats = Text.qualityFeatures(col("text"))
    Tables.load(s, d, "documents")
      .select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .withColumn("n_tokens", col("n_tokens").cast(LongType))
      .orderBy("doc_id")
  }

  val textLangId: Q = Q(
    "q_text_langid", {
      // mirror Text.langId exactly: per-language marker counts, argmax
      // with first-listed-language-wins tie-break.
      val markerSql = Text.langMarkers.map { case (lang, ms) =>
        s"len(list_filter(toks, t -> t IN (${ms.map(m => s"'$m'").mkString(",")}))) AS s_$lang"
      }.mkString(",\n  ")
      val langs = Text.langMarkers.map(_._1)
      val pick = langs.tail.foldLeft((s"'${langs.head}'", s"s_${langs.head}")) {
        case ((accLang, accScore), lang) =>
          (s"CASE WHEN s_$lang > $accScore THEN '$lang' ELSE $accLang END",
            s"CASE WHEN s_$lang > $accScore THEN s_$lang ELSE $accScore END")
      }._1
      s"""WITH t AS (SELECT doc_id, lang,
         |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         |           FROM documents),
         |sc AS (SELECT doc_id, lang AS labeled_lang,
         |  $markerSql
         |FROM t)
         |SELECT doc_id, labeled_lang, $pick AS predicted_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        Text.langId(toks).as("predicted_lang"))
      .orderBy("doc_id")
  }

  /** Content fingerprint: md5 whole-doc + md5 of the sorted 3-gram
    * shingle set (a rolling-window fingerprint that survives reordering
    * of duplicated spans). */
  val docFingerprint: Q = Q(
    "q_doc_fingerprint",
    """WITH t AS (SELECT doc_id, text,
      |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |           FROM documents)
      |SELECT doc_id,
      |  md5(text) AS fp_exact,
      |  md5(array_to_string(list_sort(list_distinct(
      |    list_transform(range(1, greatest(len(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))), '|')) AS fp_shingle
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sh = Text.shingles(toks, 3)
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_exact"),
        md5(concat_ws("|", array_sort(array_distinct(sh)))).as("fp_shingle"))
      .orderBy("doc_id")
  }

  /** Exact dedup: group by content hash, keep lowest doc_id
    * (hash-groupBy — one shuffle on the 128-bit fingerprint). */
  val dedupExact: Q = Q(
    "q_dedup_exact",
    """SELECT md5(text) AS fp, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
      |FROM documents GROUP BY fp ORDER BY fp""".stripMargin) { (s, d) =>
    Tables.load(s, d, "documents")
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy("fp")
  }

  /** Generator op (UDTF analog of the reference's script decode, R5/
    * `u_udtf_explode_scripts`): one doc row -> N (position, token) rows
    * via a typed flatMap on the Dataset. */
  val explodeTokensTyped: Q = Q(
    "q_udtf_explode_tokens",
    """WITH t AS (SELECT doc_id,
      |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |           FROM documents)
      |SELECT doc_id, i AS pos, toks[i] AS token
      |FROM t, (SELECT unnest(range(1, 100000)) AS i) p
      |WHERE i <= len(toks) AND doc_id < 100
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    val spark = s
    import spark.implicits._
    Tables.load(s, d, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), toks.as("toks"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, ts) =>
        ts.iterator.zipWithIndex.map { case (t, i) => (id, (i + 1).toLong, t) }
      }
      .toDF("doc_id", "pos", "token")
      .orderBy("doc_id", "pos")
  }

  /** Winnowing fingerprints ([[graft.text.Winnow]] — the rolling-hash
    * document fingerprinting of the north star): per-doc count plus the
    * first/last selected hash. No SQL oracle (the rolling hash has no
    * DuckDB equivalent); the substring-match guarantee is
    * property-tested in WinnowSpec. */
  val docWinnow: Q = graft.Q.noOracle("q_doc_winnow") { (s, d) =>
    val fps = graft.text.Winnow.fingerprintUdf(k = 5, w = 4)(col("text"))
    Tables.load(s, d, "documents")
      .select(col("doc_id"), fps.as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        element_at(col("fps"), 1).as("fp_first"),
        element_at(col("fps"), -1).as("fp_last"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(
    textTokens, textTokenCounts, textQuality, textLangId, docFingerprint,
    docWinnow, dedupExact, explodeTokensTyped)
}
