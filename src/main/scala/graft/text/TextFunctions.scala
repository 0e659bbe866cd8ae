package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline work over the
  * `documents` table ([EXT] surface, SURVEY.md §2.3 F4). Everything here
  * is built from codegen'd `org.apache.spark.sql.functions` higher-order
  * functions — no UDFs in the hot path, so whole-stage codegen stays
  * intact and the expressions push through Catalyst unchanged.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Characters excluding whitespace — with tokenCount gives mean token
    * length without emitting rounding-sensitive doubles. */
  def alphaLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", ""))

  /** Canonical whitespace-collapsed lowercase form (normalized dedup key). */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Bag-of-words fingerprint: md5 of the sorted distinct vocabulary —
    * documents with identical vocabulary (reordered/duplicated words)
    * collide. Cross-engine stable (md5 of the same string). */
  def vocabFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))

  /** 64-bit content fingerprint (xxhash64 of the normalized text) — the
    * cheap exact-dup key for 100 TB scale: 8 bytes per doc shuffled
    * instead of the text itself. */
  def fingerprint64(c: Column): Column = xxhash64(normalized(c))

  /** How many tokens appear in `words` (used for stopword ratios and the
    * language-ID profiles). Integer-valued → oracle-safe. */
  def vocabHits(c: Column, words: Seq[String]): Column = {
    val litArr = array(words.map(lit): _*)
    size(filter(tokens(c), t => array_contains(litArr, t)))
  }

  /** Tiny per-language function-word profiles for the n-gram/stopword
    * language-ID heuristic. Public common knowledge lists. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "un", "una", "es", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这")
  )

  /** Heuristic language ID: argmax of profile hits (ties → first profile
    * in declaration order), 'und' when nothing matches. Pure built-ins:
    * the argmax is a fold over (lang, hits) pairs. */
  def langId(c: Column): Column = {
    val scored = langProfiles.map { case (lang, words) =>
      struct(vocabHits(c, words).as("hits"), lit(lang).as("lang"))
    }
    // reduce: keep the struct with strictly greater hits (stable ties)
    val best = scored.reduce { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // ------------------------------------------------------------------
  // JVM fast paths (used on rows-only hot paths — interpreted HOF
  // lambdas over 5 language profiles × every token measured ~6 s at
  // bench scale; a per-partition closure does the same work in ~0.3 s).
  // Semantics match the Column forms above.
  // ------------------------------------------------------------------

  private lazy val profileSets: Seq[(String, Set[String])] =
    langProfiles.map { case (l, ws) => (l, ws.toSet) }

  def langIdLocal(text: String): String = {
    val toks = text.trim.split("\\s+")
    var bestLang = "und"; var bestHits = 0
    for ((lang, set) <- profileSets) {
      var hits = 0
      var i = 0
      while (i < toks.length) { if (set.contains(toks(i))) hits += 1; i += 1 }
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
    }
    bestLang
  }

  private lazy val allStopwords: Set[String] =
    langProfiles.flatMap(_._2).toSet

  def qualityScoreLocal(text: String): Double = {
    val toks = text.trim.split("\\s+")
    val nTok = toks.length.toDouble
    val alpha = toks.iterator.map(_.length).sum.toDouble
    val meanTokLen = alpha / math.max(nTok, 1.0)
    val lenScore = math.min(nTok / 50.0, 1.0)
    val tokLenScore = if (meanTokLen >= 2.0 && meanTokLen <= 12.0) 1.0 else 0.3
    var hits = 0
    var i = 0
    while (i < toks.length) { if (allStopwords.contains(toks(i))) hits += 1; i += 1 }
    val stopScore = math.min(hits / math.max(nTok * 0.05, 1.0), 1.0)
    math.rint((lenScore * 0.4 + tokLenScore * 0.3 + stopScore * 0.3) * 1e6) / 1e6
  }

  /** Composite quality score in [0,1]: token-length sanity, stopword
    * presence, and length band — the usual cheap pretraining-quality
    * gates. Returns double; used in rows-only queries and tests. */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val meanTokLen = alphaLen(c).cast("double") / greatest(nTok, lit(1.0))
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val tokLenScore =
      when(meanTokLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    val stopScore = least(
      vocabHits(c, langProfiles.flatMap(_._2)).cast("double") /
        greatest(nTok * 0.05, lit(1.0)),
      lit(1.0))
    round(lenScore * 0.4 + tokLenScore * 0.3 + stopScore * 0.3, 6)
  }
}
