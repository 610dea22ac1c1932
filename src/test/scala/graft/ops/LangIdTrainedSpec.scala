package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained one-vs-rest language ID (TextOps.trainLangIdOneVsRest +
  * langIdTrained): must beat the 8-marker-per-language heuristic
  * ([[TextOps.langId]]) on held-out documents whose vocabulary the
  * heuristic has never seen, and stay deterministic on ties / empty
  * text.
  */
class LangIdTrainedSpec extends AnyFunSuite with SparkSuiteBase {

  import spark.implicits._

  // Five languages with DISJOINT non-marker vocabularies (ASCII-safe;
  // the zh vocab is romanized, so it shares no token with any marker
  // set) plus a shared domain vocabulary every language uses. The
  // heuristic can only ever recognize the "en" marker tokens below; a
  // trained model sees the whole vocabulary.
  private val langVocab: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "quickly", "house", "river", "bright", "evening",
      "window", "stone"),
    "de" -> Seq("haus", "wasser", "schnell", "buch", "stadt", "baum",
      "licht", "nacht"),
    "es" -> Seq("perro", "casa", "libro", "ciudad", "agua", "rapido",
      "noche", "arbol"),
    "fr" -> Seq("maison", "chien", "livre", "ville", "eau", "vite",
      "nuit", "arbre"),
    "zh" -> Seq("shui", "shan", "feng", "huo", "tian", "yue", "ming",
      "xing"))
  private val shared =
    Seq("data", "table", "row", "batch", "query", "scan")
  private val langs = langVocab.keys.toSeq.sorted

  /** Deterministic doc: interleave language vocab (rotated by doc index)
    * with shared tokens — every doc has both discriminative and
    * non-discriminative tokens.
    */
  private def mkDoc(lang: String, i: Int): String = {
    val v = langVocab(lang)
    val picks = (0 until 6).map(j => v((i + j * (i % 3 + 1)) % v.size))
    val noise = (0 until 4).map(j => shared((i + j) % shared.size))
    picks.zipAll(noise, "", "").flatMap { case (a, b) => Seq(a, b) }
      .filter(_.nonEmpty).mkString(" ")
  }

  private lazy val corpus = {
    val rows = for {
      lang <- langs
      i <- 0 until 40
    } yield (langs.indexOf(lang) * 1000 + i, mkDoc(lang, i), lang, i)
    rows.toDF("doc_id", "text", "lang", "idx")
  }

  test("trained one-vs-rest beats the marker heuristic on held-out docs") {
    val train = corpus.filter($"idx" % 2 === 0)
    val test = corpus.filter($"idx" % 2 === 1)
    val models = TextOps.trainLangIdOneVsRest(train, "text", "lang",
      langs, nBuckets = 4096, epochs = 5, lr = 2.0)
    val pred = TextOps.langIdTrained(test, "doc_id", "text", models)
      .join(test.select($"doc_id", $"lang"), Seq("doc_id"))
    val n = pred.count().toDouble
    assert(n === 100.0)
    val trainedAcc = pred.filter($"pred_lang" === $"lang").count() / n
    val heurAcc = test
      .select($"lang", TextOps.langId($"text").as("pred"))
      .filter($"pred" === $"lang").count() / n
    // the heuristic can at best recognize "en" (1/5 of the held-out
    // set); the trained model must be near-perfect on this clean split
    assert(trainedAcc >= 0.95,
      s"trained accuracy $trainedAcc should be >= 0.95")
    assert(trainedAcc > heurAcc,
      s"trained $trainedAcc must beat heuristic $heurAcc")
    assert(heurAcc <= 0.25)
  }

  test("single-epoch closed form: argmax over per-class mean-slot logits") {
    // epoch 1 from zero init: every class's residual is (1/2 - y), so
    // the class gradient differs only through y — a doc's OWN class
    // must end with the largest logit when vocabularies are disjoint
    val models = TextOps.trainLangIdOneVsRest(corpus, "text", "lang",
      langs, nBuckets = 4096, epochs = 1, lr = 1.0)
    assert(models.map(_._1) === langs)
    assert(models.forall(_._2.length === 4096))
    val scored = TextOps.langIdTrained(corpus, "doc_id", "text", models)
      .join(corpus.select($"doc_id", $"lang"), Seq("doc_id"))
    val acc = scored.filter($"pred_lang" === $"lang").count() /
      corpus.count().toDouble
    assert(acc >= 0.9, s"single-epoch accuracy $acc should be >= 0.9")
  }

  test("empty / null / whitespace text predicts 'und'; ties break to " +
    "lexicographically smallest language") {
    val models = TextOps.trainLangIdOneVsRest(corpus, "text", "lang",
      langs, nBuckets = 4096, epochs = 1, lr = 1.0)
    val odd = Seq((1, ""), (2, "   "), (3, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.langIdTrained(odd, "doc_id", "text", models)
      .select($"doc_id", $"pred_lang").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "und", 2 -> "und", 3 -> "und"))

    // a token none of the training docs contain hashes to an untouched
    // bucket in EVERY table -> all logits identical (0.0) -> the tie
    // must break to the lexicographically smallest language, "de"
    val tie = Seq((9, "zzzznovelzzzz")).toDF("doc_id", "text")
    val tieOut = TextOps.langIdTrained(tie, "doc_id", "text", models)
      .collect().head
    assert(tieOut.getAs[String]("pred_lang") === "de")
  }

  test("scoring plan is shuffle-free (row-local broadcast expressions)") {
    val models = TextOps.trainLangIdOneVsRest(corpus, "text", "lang",
      langs, nBuckets = 4096, epochs = 1, lr = 1.0)
    val plan = TextOps.langIdTrained(corpus, "doc_id", "text", models)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must not shuffle, got:\n$plan")
  }
}
