package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines. All of
  * them are pure `org.apache.spark.sql.functions` compositions (higher-order
  * array functions) so they stay inside whole-stage codegen — no Scala UDF in
  * the hot path. Inputs are a text column; at 100 TB these run as a narrow
  * map over the parquet scan with zero shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization. Empty string → empty array (not [""]). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation clusters + digit
    * runs counted separately (a cheap proxy for LLM tokenizer counts: ~1
    * token per short word, more for long words).
    */
  def subwordCountEstimate(text: Column): Column =
    // ceil(len/4) per word approximates BPE fragmentation of long words;
    // one native pass (see TokenLenStats), bit-compatible with the
    // aggregate() fold it replaces
    element_at(graft.functions.KFunctions.token_len_stats(tokens(text)), 2)

  /** Word-level n-gram shingles: contiguous n-token windows joined by a
    * single space — the native [[graft.functions.WordShingles]] kernel (one
    * pass, no interpreted HOFs; both dedup families pay this per document).
    *
    * Historical perf note kept because the trap generalizes: a composable
    * HOF formulation must zip SHIFTED SLICES, never
    * `transform(seq, i => element_at(tokens(text), i))` — a lambda that
    * references an outer expression re-evaluates it per element, turning
    * tokenization into O(tokens²) per document.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.KFunctions.word_shingles(tokens(text), n)

  /** Character n-grams of the raw string (for language ID / fingerprints) —
    * the same native windowing kernel as [[shingles]], empty separator.
    */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.KFunctions.char_ngrams(split(lower(text), ""), n)

  // Stopword profiles for the n-gram/stopword language-ID heuristic.
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "que", "est"),
    "es" -> Seq("el", "la", "los", "las", "que", "de", "un", "una", "es", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "den"),
    // zh is NOT profile-scored: unsegmented Chinese never matches whitespace
    // tokens, so langId scores it via the CJK-character kernel instead; the
    // entry stays only to document the language set
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "人", "这", "他"))

  /** Heuristic language ID: score = fraction of tokens hitting each
    * language's stopword profile, plus a CJK-character test for zh; argmax
    * wins, 'und' (undetermined) when nothing scores. Deterministic, pure
    * column expressions.
    */
  def langId(text: Column): Column = {
    val t = tokens(lower(text))
    val n = greatest(size(t), lit(1))
    // native set-membership counter: the filter+isin HOF evaluated an
    // interpreted lambda per token PER PROFILE (4 profiles × every doc)
    def score(lang: String): Column =
      graft.functions.KFunctions.string_in_set_count(t, profiles(lang))
        .cast("double") / n
    // native CJK char counter (one walk of the UTF-8 bytes; counts identical
    // to the per-char string-range comparison it replaces)
    val cjk = graft.functions.KFunctions.cjk_count(text)
      .cast("double") / greatest(length(text), lit(1))
    val scored = map(
      lit("en"), score("en"), lit("fr"), score("fr"), lit("es"), score("es"),
      lit("de"), score("de"), lit("zh"), cjk * 10)
    // argmax over the small fixed map
    val entries = map_entries(scored)
    val best = array_max(transform(entries, e =>
      struct(e.getField("value").as("v"), e.getField("key").as("k"))))
    when(best.getField("v") > 0, best.getField("k")).otherwise(lit("und"))
  }

  /** Quality signals (length, punctuation/digit/stopword ratios, mean word
    * length) and a composite score in [0,1] — the usual cheap pre-filters for
    * LLM training corpora.
    */
  def qualitySignals(text: Column): Column = {
    val t = tokens(text)
    val nTok = greatest(size(t), lit(1))
    val len = greatest(length(text), lit(1))
    val punct = (length(text) - length(regexp_replace(text, "\\p{Punct}", "")))
      .cast("double") / len
    val digits = (length(text) - length(regexp_replace(text, "[0-9]", "")))
      .cast("double") / len
    val stop = graft.functions.KFunctions.string_in_set_count(
      transform(t, w => lower(w)), profiles("en")).cast("double") / nTok
    val meanWordLen = element_at(graft.functions.KFunctions.token_len_stats(t), 1)
      .cast("double") / nTok
    struct(
      size(t).as("n_tokens"),
      length(text).as("n_chars"),
      punct.as("punct_ratio"),
      digits.as("digit_ratio"),
      stop.as("stopword_ratio"),
      meanWordLen.as("mean_word_len"))
  }

  /** Composite quality score: penalize too-short docs, punctuation/digit
    * noise; reward a natural stopword rate. Deterministic arithmetic only.
    */
  def qualityScore(text: Column): Column = {
    val s = qualitySignals(text)
    val lenScore = least(s.getField("n_tokens").cast("double") / 64.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - s.getField("punct_ratio") * 5, lit(0.0))
    val digitScore = greatest(lit(1.0) - s.getField("digit_ratio") * 5, lit(0.0))
    val stopScore = least(s.getField("stopword_ratio") * 4, lit(1.0))
    round((lenScore * 0.4 + punctScore * 0.2 + digitScore * 0.2 + stopScore * 0.2), 6)
  }

  /** 64-bit document fingerprint: xxhash64 of the normalized token stream.
    * Whitespace/case-insensitive exact-dup key (a rolling-hash analog with
    * Spark's codegen'd xxhash64).
    */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", transform(tokens(text), w => lower(w))))

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the standard
    * filters for boilerplate- and spam-heavy web text in LLM training
    * pipelines. All native one-pass kernels ([[graft.functions.DupArrayStats]],
    * [[graft.functions.NgramRepeatStats]]): a narrow map over the scan, zero
    * shuffle at any corpus size.
    *
    *  - `dup_line_frac` / `dup_line_char_frac`: fraction of (trimmed,
    *    non-empty) lines belonging to a group of ≥2 identical lines, by count
    *    and by character mass;
    *  - `dup_para_frac`: same by paragraph (split on blank lines);
    *  - `top{2,3,4}gram_char_frac`: character mass of the most
    *    repetition-heavy word n-gram over the whitespace-normalized length;
    *  - `dup{5,10}gram_char_frac`: character mass of all word n-grams
    *    occurring ≥2×, same denominator. Overlapping occurrences count
    *    per-occurrence, so degenerate single-token floods can exceed 1 — the
    *    signal is thresholded upstream, not interpreted as a proportion.
    */
  def repetitionSignals(text: Column): Column = {
    import graft.functions.KFunctions.{dup_array_stats, ngram_repeat_stats, token_len_stats}
    val lines = dup_array_stats(split(text, "\n"))
    val paras = dup_array_stats(split(text, "\n{2,}"))
    val t = tokens(text)
    // whitespace-normalized doc length: tokens single-space-joined
    val normLen = greatest(
      element_at(token_len_stats(t), 1) + greatest(size(t) - 1, lit(0)),
      lit(1)).cast("double")
    def frac(num: Column, den: Column): Column = num.cast("double") / den
    def ngramFrac(n: Int, field: Int): Column =
      frac(element_at(ngram_repeat_stats(t, n), field), normLen)
    struct(
      element_at(lines, 1).as("n_lines"),
      frac(element_at(lines, 2), greatest(element_at(lines, 1), lit(1L))).as("dup_line_frac"),
      frac(element_at(lines, 4), greatest(element_at(lines, 3), lit(1L))).as("dup_line_char_frac"),
      frac(element_at(paras, 2), greatest(element_at(paras, 1), lit(1L))).as("dup_para_frac"),
      ngramFrac(2, 1).as("top_2gram_char_frac"),
      ngramFrac(3, 1).as("top_3gram_char_frac"),
      ngramFrac(4, 1).as("top_4gram_char_frac"),
      ngramFrac(5, 2).as("dup_5gram_char_frac"),
      ngramFrac(10, 2).as("dup_10gram_char_frac"))
  }
}
