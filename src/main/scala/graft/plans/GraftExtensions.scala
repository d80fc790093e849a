package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{GroupConcat, JsonArrayAgg, JsonFunctions}
import graft.functions.JsonFunctions._

/** SparkSessionExtensions injector — the engine's function registry
  * hook (the analog of funcexp's static `FuncExp::FuncExp()`
  * registration, `utils/funcexp/funcexp.cpp:~80`): every session
  * built through `GraftSession` (or any session configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions`) gets the
  * MySQL-compat JSON expression family and the GROUP_CONCAT /
  * JSON_ARRAYAGG aggregates as first-class SQL functions, no
  * per-session register() calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))

    // DISTINCT-over-window rewrite (reference wf DISTINCT variants;
    // Spark rejects them at analysis) — must run as a RESOLUTION rule
    // so the rewrite lands before checkAnalysis. See WindowDistinct.
    ext.injectResolutionRule(_ => WindowDistinctRewrite)

    // Admission control (ResourceManager refusal analog) — prices the
    // PRUNED plan, so it must run with the optimizer, after partition
    // pruning. No-op unless spark.graft.admission.* is set.
    ext.injectOptimizerRule(s => ResourceGovernor.AdmissionRule(s))

    inject("json_merge_patch", es => JsonMergePatch(es(0), es(1)))
    inject("json_insert", es => JsonModify(es(0), es(1), es(2), ModifyMode.Insert))
    inject("json_replace", es => JsonModify(es(0), es(1), es(2), ModifyMode.Replace))
    inject("json_set", es => JsonModify(es(0), es(1), es(2), ModifyMode.Set))
    inject("json_remove", es => JsonRemove(es(0), es(1)))
    inject("json_depth", es => JsonDepth(es.head))
    inject("json_contains_doc", es => JsonContains(es(0), es(1)))
    inject("json_type", es => JsonTypeMySql(es.head))
    inject("json_valid", es => JsonValid(es.head))
    inject("json_quote", es => JsonQuote(es.head))
    inject("json_unquote", es => JsonUnquote(es.head))

    def sep(e: Expression): String =
      e.eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    inject("group_concat", es => GroupConcat(es(0), es(1), sep(es(2))))
    inject("group_concat_distinct", es => GroupConcat(es(0), es(1), sep(es(2)), distinct = true))
    inject("group_concat_desc", es => GroupConcat(es(0), es(1), sep(es(2)), ascending = false))
    inject("group_concat_maxlen", es => GroupConcat(es(0), es(1), sep(es(2)),
      maxLen = es(3).eval(null).asInstanceOf[Int]))
    inject("json_arrayagg", es => JsonArrayAgg(es(0), es(1)))

    inject("heavy_hitters", es => graft.functions.SpaceSavingTopK(es(0),
      es.lift(1).map(_.eval(null).asInstanceOf[Int]).getOrElse(64)))
    inject("top_k_per_group", es => graft.functions.TopKPerGroup(es(0), es(1),
      es.lift(2).map(_.eval(null).asInstanceOf[Int]).getOrElse(10)))

    inject("inet_aton", es => graft.functions.NetFunctions.InetAton(es.head))
    inject("inet_ntoa", es => graft.functions.NetFunctions.InetNtoa(es.head))

    // native scan-hot kernels (codegen'd; replace interpreted array-HOF folds)
    inject("vec_dot", es => graft.functions.VectorFunctions.VecDot(es(0), es(1)))
    inject("token_fingerprint",
      es => graft.functions.TextNativeFunctions.TokenFingerprint(es.head))
    inject("token_fingerprint_md5",
      es => graft.functions.TextNativeFunctions.TokenFingerprintMd5(es.head))
    inject("bpe_token_count",
      es => graft.functions.TextNativeFunctions.BpeTokenCount(es.head))
    inject("ahash64",
      es => graft.functions.MediaFunctions.AHash64(es.head))
    inject("reencode_noise",
      es => graft.functions.MediaFunctions.ReencodeNoise(es.head))
    inject("simhash64",
      es => graft.functions.TextNativeFunctions.SimHash64(es.head))
    inject("simhash64_md5",
      es => graft.functions.TextNativeFunctions.SimHash64Md5(es.head))
    inject("minhash64", es => graft.functions.TextNativeFunctions.MinHash64(es.head,
      es.lift(1).map(_.eval(null).asInstanceOf[Int]).getOrElse(3)))
    inject("shingle_set", es => graft.functions.TextNativeFunctions.ShingleSet(es.head,
      es.lift(1).map(_.eval(null).asInstanceOf[Int]).getOrElse(3)))
    inject("unicode_normalize",
      es => graft.functions.TextNativeFunctions.UnicodeNormalize(es(0),
        es.lift(1).map(e => sep(e).toUpperCase(java.util.Locale.ROOT)).getOrElse("NFC")))
    inject("bucket_rank", es => graft.sources.ZOrder.BucketRank(es.head,
      es(1).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()))
  }
}
