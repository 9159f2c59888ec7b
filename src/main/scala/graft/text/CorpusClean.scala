package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level cleaning operators for LLM training pipelines — the C4
  * recipe family (Raffel et al. 2020 §2.2): boilerplate removal at line
  * granularity across the WHOLE corpus, not per document.
  */
object CorpusClean {

  /** Pack documents into training shards by token budget: within each group
    * (e.g. `source`), documents are taken in deterministic id order and
    * assigned greedily-contiguously — a document starts a new shard when the
    * running token total would place its FIRST token past the budget, so
    * every shard except a group's last holds ≥ budget tokens' worth of
    * starts and assignment is a pure prefix-sum (`shard = floor(
    * (cumsum - own) / budget)`), reproducible anywhere.
    *
    * Scale shape: one window per group ordered by id — the shuffle key is
    * `groupCols`, and each group streams through a single task in order. A
    * pathologically dominant group serializes into one task (the inherent
    * cost of an order-dependent prefix sum); split such groups upstream by
    * adding a coarse hash of the id to `groupCols` if per-group ordering is
    * not required across the whole group.
    */
  def packShards(docs: DataFrame, tokensPerShard: Long,
                 idCol: String = "doc_id", textCol: String = "text",
                 groupCols: Seq[String] = Seq("source")): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select((groupCols :+ idCol).map(col) :+
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"): _*)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        floor((col("cum_tokens") - col("n_tokens")) / tokensPerShard))
  }

  /** Thresholds for [[filterCorpus]] — the usual C4/Gopher-style keep/drop
    * knobs. `None` disables a rule. Note the top-n-gram rules count the most
    * repetition-heavy gram even at count 1 (Gopher semantics), so on very
    * short documents a unique gram can exceed the threshold — pair them with
    * `minTokens`, which fires first and gives the honest reason.
    */
  final case class FilterConfig(
      minTokens: Option[Long] = Some(8L),
      maxTokens: Option[Long] = None,
      minStopwordRatio: Option[Double] = None,
      maxDupLineCharFrac: Option[Double] = Some(0.3),
      maxTop2gramCharFrac: Option[Double] = Some(0.2),
      keepLangs: Option[Set[String]] = None)

  /** Composite document filter: evaluates the quality + repetition (+
    * language) signals and emits `(idCol, keep, reason)` — `reason` is the
    * FIRST failing rule in the fixed order below (null when kept), so
    * downstream drop-reports are deterministic. One narrow map over the
    * scan; every signal is a native kernel, zero shuffle.
    */
  def filterCorpus(docs: DataFrame, cfg: FilterConfig = FilterConfig(),
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val q = TextFunctions.qualitySignals(col(textCol))
    val r = TextFunctions.repetitionSignals(col(textCol))
    val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      cfg.minTokens.map(v => "too_short" -> (q.getField("n_tokens") < v)),
      cfg.maxTokens.map(v => "too_long" -> (q.getField("n_tokens") > v)),
      cfg.minStopwordRatio.map(v =>
        "low_stopword" -> (q.getField("stopword_ratio") < v)),
      cfg.maxDupLineCharFrac.map(v =>
        "dup_lines" -> (r.getField("dup_line_char_frac") > v)),
      cfg.maxTop2gramCharFrac.map(v =>
        "repetitive_ngrams" -> (r.getField("top_2gram_char_frac") > v)),
      cfg.keepLangs.map(ls =>
        "non_target_lang" -> !TextFunctions.langId(col(textCol)).isin(ls.toSeq: _*))
    ).flatten
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((name, cond), acc) => when(cond, lit(name)).otherwise(acc)
    }
    docs.select(col(idCol), reason.as("reason"))
      .withColumn("keep", col("reason").isNull)
      .select(idCol, "keep", "reason")
  }

  /** GPT-style sequence packing map: concatenate each group's documents in
    * deterministic id order and chunk the token stream into fixed
    * `tokensPerSeq` context windows. Emits per-document bookkeeping — the
    * loader-side map of which training windows hold (parts of) which
    * document: `(groupCols…, id, n_tokens, start_offset, seq_first,
    * seq_last, n_seqs)`. Documents FLOW ACROSS window boundaries (that is
    * the point: zero padding in every window except each group's last),
    * which is exactly what [[packShards]] must never do — shards are
    * document-granular, sequences are token-granular; the two compose
    * (pack shards for storage, sequences for the training run).
    *
    * A zero-token document reports the window at its stream position
    * (n_seqs 1), so every doc row stays joinable to a window; null-text
    * rows carry null spans (they have no position in the stream — same
    * null symmetry as the oracle's SQL arithmetic).
    *
    * Scale shape: identical to [[packShards]] — one window per group
    * ordered by id, shuffle key `groupCols`, everything else a pure prefix
    * sum; the same dominant-group caveat applies.
    */
  def packSequences(docs: DataFrame, tokensPerSeq: Long,
                    idCol: String = "doc_id", textCol: String = "text",
                    groupCols: Seq[String] = Seq("source")): DataFrame = {
    require(tokensPerSeq > 0, "tokensPerSeq must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select((groupCols :+ idCol).map(col) :+
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"): _*)
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_first", floor(col("start_offset") / tokensPerSeq))
      .withColumn("seq_last", when(col("n_tokens") > 0,
          floor((col("start_offset") + col("n_tokens") - 1) / tokensPerSeq))
        .otherwise(col("seq_first")))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  /** Overlapping-window document chunking — the retrieval/embedding
    * preprocessing map (each document split into fixed-size windows that
    * overlap by `overlapChars`, so no boundary-straddling passage is lost
    * to a hard cut). The counterpart of [[packSequences]]: packing fills
    * training windows ACROSS documents; chunking splits WITHIN a document
    * and never mixes two documents in one chunk.
    *
    * Character-addressed and closed-form: chunk `i` starts at
    * `i * (chunkChars - overlapChars)`; a document of length `L` has
    * `ceil((L - chunkChars) / stride) + 1` chunks (1 when `L <= chunkChars`,
    * including `L == 0`), so the final chunk always reaches the document's
    * last character and only the final chunk may be short. Null text emits
    * one row with null chunk fields — the same null symmetry as
    * [[packSequences]], keeping every doc joinable to its chunk set.
    *
    * Scale shape: `sequence` + `explode` on a narrow projection — zero
    * shuffle, embarrassingly parallel, output bounded by
    * `corpus_chars * chunkChars / stride`.
    */
  def chunkDocuments(docs: DataFrame, chunkChars: Int, overlapChars: Int = 0,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(chunkChars > 0, "chunkChars must be positive")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      "overlapChars must be in [0, chunkChars)")
    val stride = chunkChars - overlapChars
    val len = length(col(textCol))
    val nChunks = when(len <= chunkChars, lit(1L)).otherwise(
      ceil((len - lit(chunkChars)).cast("double") / lit(stride.toDouble))
        .cast("long") + 1L)
    val start = col("chunk_idx") * stride
    docs.select(col(idCol), col(textCol), nChunks.as("n_chunks"))
      // sequence null-propagates, so a null n_chunks (null text) reaches
      // explode_outer as a null array → one null-span row
      .withColumn("chunk_idx",
        explode_outer(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col(idCol), col("n_chunks"), col("chunk_idx"),
        start.as("chunk_start"),
        col(textCol).substr((start + 1).cast("int"), lit(chunkChars))
          .as("chunk"))
  }

  /** Token-addressed [[chunkDocuments]]: windows of `chunkTokens` whitespace
    * tokens with `overlapTokens` overlap — the budget an embedding model
    * actually enforces is tokens, not characters. Same closed-form start
    * arithmetic and null symmetry; a zero-token document (empty or
    * whitespace-only) emits one empty chunk. Chunk text re-serializes its
    * token slice with single spaces (tokenizer-normalized — intra-document
    * whitespace runs are NOT preserved; use [[chunkDocuments]] when exact
    * byte spans matter). Offsets (`chunk_start`) are token offsets. Narrow
    * map, zero shuffle, same scale shape as the character form.
    */
  def chunkByTokens(docs: DataFrame, chunkTokens: Int, overlapTokens: Int = 0,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlapTokens must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    // tokenize ONCE, then derive counts from the projected column — without
    // the staging projection the tokenizer expression appears 4× and
    // interpreted (non-codegen) evaluation re-splits the document each time
    val nToks = size(col("toks")).cast("long")
    val nChunks = when(nToks <= chunkTokens, lit(1L)).otherwise(
      ceil((nToks - lit(chunkTokens)).cast("double") / lit(stride.toDouble))
        .cast("long") + 1L)
    val start = col("chunk_idx") * stride
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), nToks.as("n_tokens"),
        nChunks.as("n_chunks"))
      .withColumn("chunk_idx",
        explode_outer(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col(idCol), col("n_tokens"), col("n_chunks"), col("chunk_idx"),
        start.as("chunk_start"),
        array_join(slice(col("toks"), (start + 1).cast("int"),
          lit(chunkTokens)), " ").as("chunk"))
  }

  /** Text normalization: strip C0 control characters (except \t \n \r) and
    * canonically compose to Unicode NFC (decomposed e + U+0301 → é) — the
    * usual first cleaning pass over scraped text. Control-strip runs first
    * (a control char between base and combining mark would block
    * composition); NFC is the native [[graft.functions.NfcNormalize]] kernel
    * with an already-normalized fast path. Narrow map, zero shuffle.
    */
  def normalizeText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.KFunctions.nfc_normalize(
      regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))

  /** HTML → text extraction — the crawl-curation stage upstream of every
    * line-level operator here (C4/RefinedWeb strip markup before line
    * dedup), reduced to deterministic, dialect-neutral regex passes that
    * run identically under Java regex (Spark) and RE2 (DuckDB and the
    * linear-time engines a 100 TB extraction wants — no lookaround, no
    * backreferences, so no catastrophic backtracking class):
    *
    *  1. `<script>`/`<style>` blocks and `<!-- comments -->` are removed
    *     whole — their content is never prose (and may contain stray `<`
    *     that would otherwise corrupt tag stripping);
    *  2. block-level closers and `<br>` become newlines, so downstream
    *     line-granular curation (lineDedup, filterCorpus) sees the page's
    *     real line structure instead of one run-on line;
    *  3. remaining tags strip to spaces;
    *  4. the named entities that dominate real crawls decode
    *     (`&nbsp; &lt; &gt; &quot; &#39; &apos;` and — LAST, so
    *     `&amp;lt;` single-decodes — `&amp;`); rarer entities pass
    *     through verbatim;
    *  5. whitespace collapses (horizontal runs → one space, newline runs →
    *     one newline), trimmed.
    *
    * A pure narrow map — zero shuffle. Documented limits of the regex
    * grade: attribute values containing a raw `>` truncate that tag's
    * strip, and CDATA is not special-cased; a DOM-grade extractor slots in
    * at this same Column signature.
    */
  def extractHtmlText(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // the name must end at '>', whitespace, or '/' — an explicit
    // alternation rather than \b, because '-' is a non-word char: \b after
    // 'p' would let '</p-card>'-style hyphenated custom elements
    // prefix-match and fabricate line breaks (and RE2 has no lookahead to
    // express "not followed by [\w-]")
    val withBreaks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table)(>|[ \\t/][^>]*>)", "\n")
    val noTags = regexp_replace(withBreaks, "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    val hsp = regexp_replace(decoded, "[ \\t\\r\\f\\x0B]+", " ")
    val nl = regexp_replace(hsp, " ?\\n ?", "\n")
    // trim() strips spaces only — edge newlines need their own pass
    trim(regexp_replace(regexp_replace(nl, "\\n+", "\n"), "^\\n+|\\n+$", ""))
  }

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val UrlRe = "https?://[^ \\t\\n\\r]+"
  val DigitRunRe = "[0-9][0-9 ()+.-]{6,}[0-9]"

  /** PII scrubbing: replace email addresses, URLs, and long digit runs
    * (phone/account-number shaped) with fixed placeholder tokens, and count
    * each replacement. The patterns are deliberately dialect-neutral regex
    * (no lookaround, no shorthand classes beyond `\s`) so the exact same
    * expressions run under Java regex (Spark) and RE2 (DuckDB, and the
    * linear-time engines a 100 TB scrub would want — catastrophic
    * backtracking is a real outage class at that scale). Pure narrow map,
    * zero shuffle. Redaction order is fixed (email → url → digits): a URL
    * containing an email-shaped userinfo is redacted as the email first,
    * deterministically.
    */
  def redactPii(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    def nMatches(c: org.apache.spark.sql.Column, re: String) =
      size(split(c, re)) - 1 // split-based count: identical in any dialect
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, UrlRe, "<URL>")
    val t3 = regexp_replace(t2, DigitRunRe, "<NUMBER>")
    docs.select(col(idCol),
      t3.as("text_redacted"),
      nMatches(t0, EmailRe).cast("long").as("n_emails"),
      nMatches(t1, UrlRe).cast("long").as("n_urls"),
      nMatches(t2, DigitRunRe).cast("long").as("n_numbers"))
  }

  /** All URL occurrences in a text column (same pattern [[redactPii]]
    * replaces): `array<string>`, empty when none.
    */
  def extractUrls(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** All `href="..."` targets of an HTML column, in document order —
    * the crawl-graph edge extractor ([[graft.operators.PageRank]] ranks
    * the domain graph built from these). Raw attribute values (no
    * normalization — that's [[normalizeUrl]] / [[urlDomain]]'s job);
    * `array<string>`, empty when none. The character-class pattern is
    * dialect-neutral and backtracking-free (RE2-safe, like the
    * [[extractHtmlText]] family).
    */
  def extractHrefs(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))

  /** Canonical form of a URL column for dedup/grouping (Common-Crawl-style
    * curation keys on the normalized URL, per-domain caps on its host):
    * scheme and host lowercased, default ports stripped, fragment dropped,
    * tracking query parameters (utm_*, fbclid, gclid, msclkid) removed —
    * remaining params keep their original order (reordering changes
    * semantics on some sites) — and a bare trailing slash on the path
    * trimmed. Declarative `parse_url`/regexp composition: a narrow map,
    * codegen-friendly, no UDF.
    */
  def normalizeUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(afterScheme, "^([^/?#]*)", 1)
    val host = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = when(port === "", lit("")).otherwise(
      when(scheme === "http" && port === "80", lit(""))
        .when(scheme === "https" && port === "443", lit(""))
        .otherwise(concat(lit(":"), port)))
    val rest = regexp_replace(afterScheme, "^[^/?#]*", "") // /path?query#frag
    val path0 = regexp_extract(rest, "^([^?#]*)", 1)
    val path = when(path0 === "" || path0 === "/", lit(""))
      .otherwise(regexp_replace(path0, "/$", ""))
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    val keptParams = filter(split(query, "&"), p =>
      !p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)") && p =!= "")
    val queryOut = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    when(scheme === "", u) // not a URL-shaped string: leave untouched
      .otherwise(concat(scheme, lit("://"), host, keepPort, path, queryOut))
  }

  /** Registrable host key for per-domain caps: normalized host with a
    * leading `www.` stripped.
    *
    * Computed by direct host extraction rather than through
    * [[normalizeUrl]]: the host group `[^/:?#]*` stops at the port colon
    * and at the path, so of normalizeUrl's whole pipeline (≈14 regex
    * evaluations for port/path/query/fragment/tracking-param handling)
    * only scheme-gated host lowercasing is observable here — one extract +
    * one replace, value-identical (domain-stability across normalizeUrl is
    * spec-pinned in DataOpsSpec/UrlCurationSpec; this was ~60% of the
    * crawl-graph entries' edge-derivation CPU).
    */
  def urlDomain(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val host = lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
    when(host === "", lit(null).cast("string"))
      .otherwise(regexp_replace(host, "^www\\.", ""))
  }

  /** C4-style global line deduplication: every distinct (trimmed) line keeps
    * its FIRST corpus-wide occurrence — ordered by (doc id, line index) — and
    * every later occurrence is dropped; documents are reassembled in original
    * line order. Blank lines are layout, not content: dropped before
    * counting. Output: `(idCol, text_clean, n_kept, n_dropped)`, one row per
    * input document (a fully-boilerplate doc comes back with empty
    * `text_clean`).
    *
    * Scale shape: the dedup is `groupBy(line).agg(min(doc, idx))` + a
    * semi-join back — NOT a window `row_number() over (partition by line)`.
    * Partial aggregation collapses a line duplicated across millions of docs
    * map-side, so the shuffle carries each distinct line ~once per input
    * partition and no executor ever buffers a duplicate group in memory
    * (WindowExec would buffer the largest group's rows — the exact skew that
    * boilerplate lines produce). Reassembly is a per-document
    * `collect_list` bounded by document size; per-doc line totals are a
    * narrow map on the original text (never a third corpus explode+shuffle).
    */
  def globalLineDedup(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val lines = docs.select(col(idCol), posexplode(split(col(textCol), "\n")))
      .withColumn("ln", trim(col("col")))
      .where(col("ln") =!= "")
      .select(col(idCol), col("pos").as("idx"), col("ln"))
    val winners = lines.groupBy("ln")
      .agg(min(struct(col(idCol), col("idx"))).as("w"))
      .select(col("ln"), col("w")(idCol).as(idCol), col("w.idx").as("idx"))
    val kept = lines.join(winners, Seq("ln", idCol, "idx"), "left_semi")
    val reassembled = kept.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("idx"), col("ln")))).as("ls"))
      .select(col(idCol),
        array_join(transform(col("ls"), e => e.getField("ln")), "\n").as("text_clean"),
        size(col("ls")).as("n_kept"))
    // per-doc non-blank line count as a narrow map — the exploded `lines`
    // subtree already feeds two shuffles; counting through it again would
    // re-explode the whole corpus a third time for a scalar per doc
    val nLines = size(filter(transform(split(col(textCol), "\n"), l => trim(l)),
      l => l =!= ""))
    docs.select(col(idCol), nLines.cast("long").as("n_lines"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0)).cast("long").as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0)))
          .cast("long").as("n_dropped"))
  }

  /** URL-level deduplication (the RefinedWeb/Common-Crawl curation step that
    * runs BEFORE content dedup: one surviving document per canonical URL).
    * The key is [[normalizeUrl]] — case, default ports, fragments, and
    * tracking params collapse, so the same page fetched under cosmetic URL
    * variants dedups. Winner per URL = the longest document (`lenCol` desc),
    * id ascending as the deterministic tiebreak. Rows whose `urlCol` is not
    * URL-shaped (normalizeUrl leaves them untouched) dedup under that
    * literal string; NULL urls are never grouped — they all survive.
    *
    * Output: the surviving input rows plus a `url_norm` column.
    *
    * Scale shape: `groupBy(url_norm).agg(min(struct(-len, id)))` — partial
    * aggregation collapses a hot URL map-side, and the shuffle carries only
    * (url ~tens of bytes, len, id) per distinct URL, never document text.
    * The winner set joins back as an id semi-join (winner ids are unique, a
    * doc has one URL). Never a window over the URL key: a crawl's hottest
    * URL would be the skewed group a WindowExec task must buffer.
    */
  def urlDedup(docs: DataFrame, urlCol: String, lenCol: String = "n_chars",
               idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.withColumn("url_norm", normalizeUrl(col(urlCol)))
    val nullUrl = keyed.where(col("url_norm").isNull)
    // null-safe length key: a null field sorts FIRST in struct ordering, so
    // a bare -len would crown a null-length doc over every real one —
    // coalesce to MaxValue ranks null lengths last, matching domainCap's
    // len desc (nulls last) ordering
    val winners = keyed.where(col("url_norm").isNotNull)
      .groupBy("url_norm")
      .agg(min(struct(
        coalesce(-col(lenCol).cast("long"), lit(Long.MaxValue)).as("neg_len"),
        col(idCol).as("id"))).as("w"))
      .select(col("w.id").as(idCol))
    keyed.join(winners, Seq(idCol), "left_semi").unionByName(nullUrl)
  }

  /** Per-domain document cap (the C4/anti-skew quota: no single registrable
    * domain may dominate the corpus). Keeps at most `cap` documents per
    * [[urlDomain]] key, preferring the longest (`lenCol` desc, id asc
    * tiebreak). Rows without a parseable domain (urlDomain = NULL) are NOT
    * one shared quota group — they bypass the cap untouched.
    *
    * Output: the surviving input rows plus a `domain` column.
    *
    * Scale shape: `row_number` over (domain → len desc, id) — Spark's
    * WindowGroupLimit pushes a map-side per-partition top-`cap` below the
    * exchange, so a mega-domain contributes at most `cap` rows per input
    * partition to the shuffle and no task buffers an unbounded group.
    */
  def domainCap(docs: DataFrame, urlCol: String, cap: Int,
                lenCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, "cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val keyed = docs.withColumn("domain", urlDomain(col(urlCol)))
    val noDomain = keyed.where(col("domain").isNull)
    val w = Window.partitionBy("domain")
      .orderBy(col(lenCol).desc, col(idCol).asc_nulls_last)
    keyed.where(col("domain").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
      .unionByName(noDomain)
  }

  /** URL blocklist annotation — the UT1/Dolma-style curation gate that drops
    * documents fetched from known-bad sites (adult/malware/spam domain lists
    * plus hand-curated exact URLs; the reference pipelines apply these
    * BEFORE any content-quality pass so blocked pages never cost downstream
    * compute). The blocklist DataFrame carries `(kind, pattern)` rows:
    *
    *  - `kind = "domain"`: blocks the host itself AND every subdomain —
    *    pattern `example.com` blocks `example.com`, `www.example.com`,
    *    `a.b.example.com`. Matching is label-aligned (a suffix-CHAIN
    *    equi-join, never a string `endsWith` — `notexample.com` does not
    *    match `example.com`).
    *  - `kind = "url"`: blocks the exact canonical URL ([[normalizeUrl]]
    *    applied to both sides' conventions: patterns are expected already
    *    canonical, the document side is normalized here).
    *
    * Output: input rows + `url_norm` + `blocked_kind`/`blocked_by` (the
    * matched pattern; both NULL = kept). When a document matches several
    * patterns the winner is deterministic: an exact-URL match beats any
    * domain match, then the LONGEST (most specific) pattern, then
    * lexicographically smallest. Rows whose URL is not URL-shaped or NULL
    * have no host: only exact-URL patterns can block them.
    *
    * Scale shape: the corpus side ships only narrow keys — a per-doc host
    * suffix chain (≤ label count, single digits) and the canonical URL —
    * through two equi-joins against the blocklist, which is broadcast under
    * the same measured-count gate as [[graft.text.Sampling.decontaminate]]
    * (UT1-scale lists are a few million rows — tens of MB — but an
    * unconditional hint on an unexpectedly huge list is a driver OOM, so
    * gate on the measured count; above the gate both joins fall back to
    * shuffles of key-sized rows). Winner selection is a partial-aggregating
    * `groupBy(id).min(struct)` at matched-doc scale, attached back as an
    * id-keyed left join — document text never shuffles.
    */
  def urlBlocklist(docs: DataFrame, urlCol: String, blocklist: DataFrame,
                   idCol: String = "doc_id",
                   broadcastMaxPatterns: Long = 20000000L): DataFrame = {
    val keyed = docs.withColumn("url_norm", normalizeUrl(col(urlCol)))
    val host = regexp_extract(col("url_norm"), "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)
    val bl = blocklist.select(col("kind").cast("string"),
      col("pattern").cast("string")).where(col("pattern").isNotNull)
    val gate = bl.count() <= broadcastMaxPatterns
    def side(df: DataFrame) = if (gate) broadcast(df) else df
    val blDomains = bl.where(col("kind") === "domain")
      .select(col("pattern")).distinct()
    val blUrls = bl.where(col("kind") === "url")
      .select(col("pattern")).distinct()
    // label-aligned suffix chain: host "a.b.c" → ["a.b.c", "b.c", "c"]
    val labels = split(host, "\\.")
    val suffixes = keyed
      .where(host =!= "")
      .select(col(idCol),
        explode(transform(sequence(lit(0), size(labels) - 1),
          i => array_join(slice(labels, i + 1, size(labels) - i), "."))).as("sfx"))
    val domainHits = suffixes
      .join(side(blDomains), col("sfx") === col("pattern"))
      .select(col(idCol), lit("domain").as("blocked_kind"), col("pattern"))
    val urlHits = keyed
      .select(col(idCol), col("url_norm"))
      .join(side(blUrls), col("url_norm") === col("pattern"))
      .select(col(idCol), lit("url").as("blocked_kind"), col("pattern"))
    val winners = urlHits.unionByName(domainHits)
      .groupBy(idCol)
      .agg(min(struct(
        when(col("blocked_kind") === "url", 0).otherwise(1).as("rank"),
        (-length(col("pattern"))).as("neg_len"),
        col("pattern").as("pattern"),
        col("blocked_kind").as("kind"))).as("w"))
      .select(col(idCol), col("w.kind").as("blocked_kind"),
        col("w.pattern").as("blocked_by"))
    keyed.join(winners, Seq(idCol), "left")
  }

  /** Survivors-only form of [[urlBlocklist]]: drops blocked rows, keeps
    * everything else unchanged (no `blocked_by` attribution). A PURE NARROW
    * MAP — the patterns are collected once (under a measured-count gate
    * that fails loudly, never silently truncates) and baked into the
    * codegen'd [[graft.functions.StringInSetCount]] membership kernel, so
    * there is no join and no aggregation at all. That makes it the
    * ingest-time gate a STREAMING crawl pipeline wants: it runs under
    * Structured Streaming as-is, spec-pinned batch≡stream. Matching
    * semantics are identical to [[urlBlocklist]]'s keep/drop verdict
    * (label-aligned domain suffixes + exact canonical URLs); rows without a
    * host (null / non-URL strings) can only match url-kind patterns.
    *
    * The driver-side pattern set rides the serialized expression to every
    * task (~tens of MB at the default cap) — for lists beyond the cap use
    * the batch annotating form, whose blocklist side stays distributed.
    */
  def urlBlocklistFilter(docs: DataFrame, urlCol: String, blocklist: DataFrame,
                         maxPatterns: Long = 1000000L): DataFrame = {
    val bl = blocklist.select(col("kind").cast("string"),
      col("pattern").cast("string")).where(col("pattern").isNotNull)
    val n = bl.count()
    require(n <= maxPatterns,
      s"blocklist has $n rows > maxPatterns=$maxPatterns — an in-expression " +
        "set of that size belongs in the distributed-join form (urlBlocklist)")
    val collected = bl.distinct().collect()
    val domains = collected.filter(_.getString(0) == "domain").map(_.getString(1)).toSeq
    val urls = collected.filter(_.getString(0) == "url").map(_.getString(1)).toSeq
    val urlNorm = normalizeUrl(col(urlCol))
    val host = regexp_extract(urlNorm, "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)
    val labels = split(host, "\\.")
    val sfxs = when(host =!= "",
      transform(sequence(lit(0), size(labels) - 1),
        i => array_join(slice(labels, i + 1, size(labels) - i), ".")))
      .otherwise(array().cast("array<string>"))
    val domHit =
      if (domains.isEmpty) lit(false)
      else graft.functions.KFunctions.string_in_set_count(sfxs, domains) > 0
    val urlHit =
      if (urls.isEmpty) lit(false)
      else graft.functions.KFunctions.string_in_set_count(
        array(urlNorm), urls) > 0
    // null url → both probes null/false → kept, matching the annotating form
    docs.where(!(coalesce(domHit, lit(false)) || coalesce(urlHit, lit(false))))
  }
}
