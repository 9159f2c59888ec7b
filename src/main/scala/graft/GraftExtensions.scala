package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.KFunctions
import graft.text.TextFunctions

/** SQL surface for the graft function library: every native codegen kernel
  * and the composed text operators become plain SQL functions, so
  * `spark.sql("SELECT graft_fingerprint(text) ...")` works anywhere the
  * DataFrame API does.
  *
  * Two entry points, one registry:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (the standard Catalyst extension mechanism — survives thrift-server /
  *    spark-submit deployments where user code never touches the builder);
  *  - [[GraftExtensions.register]] on an already-built session (shells,
  *    tests, notebooks).
  *
  * Scalar shape arguments (k, n, partition counts, stopword lists) must be
  * constant-foldable: they size code-generated kernels, so a per-row value
  * has no meaning — the builder rejects non-literals at analysis time
  * rather than silently evaluating row zero.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  /** Register the whole registry on an existing session (idempotent —
    * re-registration overwrites with identical builders).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder)
    }

  private def c(e: Expression): Column = ColumnBridge.column(e)
  // eager conversion: SQL builders must return plain Catalyst trees (the
  // lazy ColumnNodeExpression wrapper never resolves under the SQL analyzer)
  private def x(col: Column): Expression = ColumnBridge.resolvedExpression(col)

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def intLit(fn: String, e: Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"$fn: shape argument must be a constant INT (got ${e.sql})")
    val v = e.eval()
    // a foldable NULL (CAST(NULL AS INT)) would unbox to 0 — a silent k=0
    require(v != null, s"$fn: shape argument must be a non-NULL constant INT")
    v.asInstanceOf[Int]
  }

  private def strLit(fn: String, e: Expression): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: expected a constant STRING argument (got ${e.sql})")
    val v = e.eval()
    // String.valueOf(null) is the 4-char string "null" — reject instead
    require(v != null, s"$fn: expected a non-NULL constant STRING argument")
    String.valueOf(v)
  }

  private type Builder = Seq[Expression] => Expression

  private def f1(fn: String)(b: Column => Column): (String, Builder) =
    fn -> { args => arity(fn, args, 1); x(b(c(args.head))) }
  private def f2(fn: String)(b: (Column, Column) => Column): (String, Builder) =
    fn -> { args => arity(fn, args, 2); x(b(c(args.head), c(args(1)))) }
  private def fInt(fn: String)(b: (Column, Int) => Column): (String, Builder) =
    fn -> { args => arity(fn, args, 2); x(b(c(args.head), intLit(fn, args(1)))) }
  private def fStr(fn: String)(b: (Column, String) => Column): (String, Builder) =
    fn -> { args => arity(fn, args, 2); x(b(c(args.head), strLit(fn, args(1)))) }
  private def fIntStr(fn: String)(b: (Column, Int, String) => Column): (String, Builder) =
    fn -> { args => arity(fn, args, 3);
      x(b(c(args.head), intLit(fn, args(1)), strLit(fn, args(2)))) }

  private[graft] val all: Seq[(String, Builder)] = Seq(
    // native codegen kernels
    f1("graft_murmur2")(KFunctions.kafka_murmur2),
    fInt("graft_kafka_partition")(KFunctions.kafka_partition),
    f2("graft_dot")(KFunctions.array_dot),
    fInt("graft_minhash")((sh, k) => KFunctions.minhash_sig(sh, k)),
    f2("graft_eq_count")(KFunctions.array_eq_count),
    f1("graft_simhash")(graft.dedup.Dedup.simhash),
    fInt("graft_word_shingles")((t, n) => KFunctions.word_shingles(t, n)),
    fInt("graft_char_ngrams")((ch, n) => KFunctions.char_ngrams(ch, n)),
    fStr("graft_stopword_count")((arr, csv) =>
      KFunctions.string_in_set_count(arr, csv.split(',').toSeq)),
    f1("graft_cjk_count")(KFunctions.cjk_count),
    f1("graft_token_len_stats")(KFunctions.token_len_stats),
    f1("graft_dup_array_stats")(KFunctions.dup_array_stats),
    fInt("graft_ngram_repeat_stats")((t, n) => KFunctions.ngram_repeat_stats(t, n)),
    f1("graft_nfc")(KFunctions.nfc_normalize),
    f1("graft_sorted_id_pairs")(KFunctions.sorted_id_pairs),
    // kafka wire helpers
    fStr("graft_header_value")((h, k) => KFunctions.header_value(h, k)),
    f1("graft_long_to_bytes_le")(KFunctions.long_to_bytes_le),
    f1("graft_bytes_to_long_le")(KFunctions.bytes_to_long_le),
    // composed text operators (shingles here tokenizes internally)
    fInt("graft_shingles")((t, n) => TextFunctions.shingles(t, n)),
    f1("graft_tokens")(TextFunctions.tokens),
    f1("graft_token_count")(TextFunctions.tokenCount),
    f1("graft_subword_count")(TextFunctions.subwordCountEstimate),
    f1("graft_lang_id")(TextFunctions.langId),
    f1("graft_quality_signals")(TextFunctions.qualitySignals),
    f1("graft_quality_score")(TextFunctions.qualityScore),
    f1("graft_fingerprint")(TextFunctions.fingerprint),
    f1("graft_repetition_signals")(TextFunctions.repetitionSignals),
    f1("graft_normalize_url")(graft.text.CorpusClean.normalizeUrl),
    f1("graft_url_domain")(graft.text.CorpusClean.urlDomain),
    f1("graft_extract_urls")(graft.text.CorpusClean.extractUrls),
    f1("graft_html_text")(graft.text.CorpusClean.extractHtmlText),
    f2("graft_phash")(graft.multimodal.Multimodal.phash),
    fIntStr("graft_hash_embedding")((t, d, s) =>
      graft.ann.Retrieval.hashEmbedding(t, d, s)),
    f2("graft_inner_product")(graft.ann.Retrieval.innerProduct))
}
