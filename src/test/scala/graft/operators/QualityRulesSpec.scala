package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class QualityRulesSpec extends SparkSpec {

  private def flags(text: String): Map[String, Boolean] = {
    val s = spark
    import s.implicits._
    val row = QualityRules.ruleFlags(Seq((1L, text)).toDF("id", "text"), "text")
      .select((QualityRules.RuleCols :+ "pass").map(col): _*)
      .head()
    (QualityRules.RuleCols :+ "pass").zipWithIndex
      .map { case (n, i) => n -> row.getBoolean(i) }.toMap
  }

  private val good =
    "the quick brown fox jumps over a lazy dog and then runs " +
      "of to the nearby field in search or pursuit is what it does " +
      "every single morning before anyone else wakes up at dawn light"

  test("a well-formed document passes every rule") {
    val f = flags(good)
    assert(f.values.forall(identity), f.toString)
  }

  test("each rule fails on its own violation") {
    // too short
    assert(!flags("the a dog")("ok_words"))
    // no two distinct stopwords
    assert(!flags(Seq.fill(30)("lorem ipsum dolor").mkString(" "))("ok_stop"))
    // one word repeated: unique ratio below 30%
    val rep = flags("the a " + Seq.fill(40)("word").mkString(" "))
    assert(!rep("ok_unique") && rep("ok_words"), rep.toString)
    // mean word length above 10
    assert(!flags(Seq.fill(25)("incomprehensibilities").mkString(" "))("ok_wordlen"))
    // digit-only words: alpha ratio below 80%
    assert(!flags((1 to 30).map(_.toString).mkString("the a ", " ", ""))("ok_alpha"))
    // symbol-laden: more than one '#'/'...' per 10 words
    assert(!flags(good + " " + Seq.fill(8)("# ... #").mkString(" "))("ok_symbol"))
    // pass is the conjunction
    assert(!flags("the a dog")("pass"))
  }

  test("applyRules keeps the original schema and only passing docs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, good, "web"), (2L, "the a dog", "web")).toDF("id", "text", "src")
    val out = QualityRules.applyRules(df, "text")
    assert(out.columns.toSeq == Seq("id", "text", "src"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("corpus frequency score: exact ppm, rare-word docs rank below common-word docs") {
    val s = spark
    import s.implicits._
    // corpus of 10 words total: "a" x6 spread over docs, singletons elsewhere
    val df = Seq(
      (1L, "a a a"),        // all common
      (2L, "a a rare1"),    // mixed
      (3L, "rare2 rare3 rare4 a")  // mostly rare
    ).toDF("doc_id", "text")
    val out = QualityRules.corpusFrequencyScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // counts: a=6, each rare=1, total=10
    assert(out(1L) == ((3L, 18L, (18L * 1000000L) / (3L * 10L))))
    assert(out(2L) == ((3L, 13L, (13L * 1000000L) / (3L * 10L))))
    assert(out(3L) == ((4L, 9L, (9L * 1000000L) / (4L * 10L))))
    assert(out(3L)._3 < out(2L)._3 && out(2L)._3 < out(1L)._3)
  }

  test("bigram LM score: exact ppm values, boilerplate up, gibberish down") {
    val s = spark
    import s.implicits._
    // corpus: "a b" occurs 3× of the 4 bigrams starting with 'a';
    // "a x" once. doc 1 is pure boilerplate, doc 3 the rare sequence.
    val df = Seq(
      (1L, "a b a b"),   // bigrams: (a b),(b a),(a b)
      (2L, "a b"),       // (a b)
      (3L, "a x")        // (a x)
    ).toDF("doc_id", "text")
    val out = QualityRules.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // counts: C(a b)=3, C(b a)=1, C(a x)=1; prefixes: C(a·)=4, C(b·)=1
    val pAB = 3L * 1000000L / 4L  // 750000
    val pBA = 1L * 1000000L / 1L  // 1000000
    val pAX = 1L * 1000000L / 4L  // 250000
    assert(out(1L) == ((3L, (pAB + pBA + pAB) / 3L)))
    assert(out(2L) == ((1L, pAB)))
    assert(out(3L) == ((1L, pAX)))
    assert(out(3L)._2 < out(2L)._2) // rare continuation scores lower
    // docs without bigrams are absent, not scored 0
    val single = QualityRules.bigramLmScore(
      Seq((9L, "lonely")).toDF("doc_id", "text"), "doc_id", "text")
    assert(single.count() == 0)
  }

  test("frozen-LM scoring: self-score equals in-corpus score; unseen text scores 0") {
    val s = spark
    import s.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val self = QualityRules.bigramLmScore(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val against = QualityRules.bigramLmScoreAgainst(
        QualityRules.bigramLm(corpus, "text"), corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(self.nonEmpty && self == against)
    // a doc of entirely-unseen bigrams scores 0, not null and not absent
    val alien = Seq((777L, "zzq1 zzq2 zzq3")).toDF("doc_id", "text")
    val out = QualityRules.bigramLmScoreAgainst(
      QualityRules.bigramLm(corpus, "text"), alien, "doc_id", "text").collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L && out.head.getLong(2) == 0L)
  }

  test("bigram LM score plan: aggregations + hash joins, no window, no cartesian") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = QualityRules.bigramLmScore(df, "doc_id", "text")
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("rule evaluation is a narrow plan: no exchange, stays in codegen") {
    // a file-backed relation (local Seqs constant-fold to LocalTableScan)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = QualityRules.applyRules(df, "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"rule filter shuffled:\n$p")
    assert(p.contains("*("), s"rule filter fell out of codegen:\n$p")
  }
}
