package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Language-ID operator checks (r17). The driver gates (q328–q330)
  * pin the ARITHMETIC against DuckDB on the shared-vocabulary
  * synthetic corpus; discrimination itself is pinned here on a
  * planted fixture whose two "languages" have disjoint character
  * distributions — the classifier must separate them perfectly. */
class LangIdSpec extends SparkSuite {
  import spark.implicits._

  // two synthetic languages with disjoint alphabets: every trigram of
  // a probe doc hashes into buckets only its own language's training
  // mass touched, so the naive-Bayes argmax is forced
  private val trainRows = Seq(
    ("aa", "alpha banana salad nana anna banal"),
    ("aa", "ban ana anabanana salbanananaban"),
    ("zz", "zyxzyx wxyz zyzzyva xyzzy zyx"),
    ("zz", "xyzzy wvwxyz zyxwv zyzzyx wxyzzy"))
  private val probeRows = Seq(
    (1L, "banana salad anna"),
    (2L, "zyx xyzzy wxyz"),
    (3L, "anabanana banal nana"),
    (4L, "zyzzyva wvwxyz zyx"))

  test("langIdPredict: perfect separation on disjoint alphabets, " +
      "scores strictly favor the right language") {
    val train = trainRows.toDF("lang", "text")
    val probe = probeRows.toDF("doc_id", "text")
    val out = TextAnalysis.langIdPredict(train, "lang", probe,
        "doc_id", "text", k = 3, buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "aa", 2L -> "zz", 3L -> "aa", 4L -> "zz"))
  }

  test("langIdModel: dense langs×buckets frame; unseen buckets carry " +
      "the smoothed default; per-lang mass sums to the gram count") {
    val train = trainRows.toDF("lang", "text")
    val m = TextAnalysis.langIdModel(train, "lang", "text",
      k = 3, buckets = 64).collect()
    assert(m.length == 2 * 64, "dense: every (lang, bucket) present")
    // smoothed default = floor(1e6 * ln(1/(n_L + 64))) for untouched
    // buckets — recompute n_L from the fixture and check one default
    val texts = trainRows.filter(_._1 == "aa").map(_._2.trim)
    val nAA = texts.map(t => t.length - 2).sum
    val defaultLp = math.floor(math.log(1.0 / (nAA + 64)) * 1e6).toLong
    val aa = m.filter(_.getString(0) == "aa")
    assert(aa.count(_.getLong(2) == defaultLp) > 0,
      "at least one untouched bucket carries the smoothed default")
  }

  test("langIdPredictWith ≡ train-in-query; short docs (< k chars) " +
      "drop; argmax tie-break is the lexicographically smallest lang") {
    val train = trainRows.toDF("lang", "text")
    val model = TextAnalysis.langIdModel(train, "lang", "text",
      k = 3, buckets = 1024)
    val probe = (probeRows :+ (9L, "ab")).toDF("doc_id", "text")
    val a = TextAnalysis.langIdPredictWith(model, probe, "doc_id",
      "text", k = 3, buckets = 1024).orderBy("doc_id").collect()
    val b = TextAnalysis.langIdPredict(train, "lang", probe, "doc_id",
      "text", k = 3, buckets = 1024).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(!a.exists(_.getLong(0) == 9L), "2-char doc has no trigram")
    // tie-break: symmetric training mass, a probe gram that neither
    // language saw scores the same under both (both models have the
    // same total mass) -> smallest lang must win
    val symTrain = Seq(("bb", "qqq"), ("ee", "qqq")).toDF("lang", "text")
    val tied = TextAnalysis.langIdPredict(symTrain, "lang",
        Seq((7L, "mmm")).toDF("doc_id", "text"), "doc_id", "text",
        k = 3, buckets = 1024)
      .collect().head
    assert(tied.getString(1) == "bb")
  }
}
