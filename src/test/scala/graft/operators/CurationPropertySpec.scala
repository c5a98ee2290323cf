package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.SparkSpec

/** Property tests for the curation operators: invariants that must hold
  * for ANY input shape, not just the fixtures.
  */
class CurationPropertySpec extends SparkSpec {

  private def passed(p: Prop, checks: Int): Boolean =
    check(Parameters.default.withMinSuccessfulTests(checks), p).passed

  test("property: chunks tile the token stream for any (n, size, overlap)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(0, 200)
      size <- Gen.choose(1, 50)
      overlap <- Gen.choose(0, size - 1)
    } yield (n, size, overlap)
    val prop = Prop.forAll(gen) { case (n, size, overlap) =>
      val text = (1 to n).map("t" + _).mkString(" ")
      val out = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", size, overlap)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
      val stride = size - overlap
      val shapeOk = out.zipWithIndex.forall { case ((idx, txt, nt), i) =>
        val ts = if (txt.isEmpty) Array.empty[String] else txt.split(" ")
        idx == i.toLong && ts.length == nt
      }
      val toks = out.flatMap { case (idx, txt, _) =>
        val ts = if (txt.isEmpty) Array.empty[String] else txt.split(" ")
        ts.zipWithIndex.map { case (t, o) => (idx * stride + o, t) }
      }
      // every token position covered with the right token; last chunk
      // reaches the end; no chunk exceeds size
      val expected = (0 until n).map(p => p.toLong -> s"t${p + 1}").toMap
      val covered = toks.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.distinct).toMap
      shapeOk && out.forall(_._3 <= size) &&
        expected.forall { case (p, t) => covered.get(p).exists(_ == Seq(t)) } &&
        (n == 0 || out.last._1 * stride + out.last._3 == n)
    }
    assert(passed(prop, 30))
  }

  test("property: resizeFit output fits the box and preserves aspect within rounding") {
    import spark.implicits._
    val gen = for {
      w <- Gen.choose(1L, 4000L)
      h <- Gen.choose(1L, 4000L)
    } yield (w, h)
    val prop = Prop.forAll(gen) { case (w, h) =>
      val r = Seq((w, h)).toDF("w", "h")
        .select(Multimodal.resizeFit(col("w"), col("h"), 224, 168).as("r"))
        .select("r.out_w", "r.out_h").collect().head
      val (ow, oh) = (r.getLong(0), r.getLong(1))
      val fits = ow <= 224 && oh <= 168 && ow >= 1 && oh >= 1
      // one side is exactly at its bound; the other floors w.r.t. the
      // true scale, so aspect error is bounded by one pixel
      val binding = ow == 224 || oh == 168
      val aspectOk =
        if (ow == 224) math.abs(oh - h.toDouble * 224 / w) <= 1.0
        else math.abs(ow - w.toDouble * 168 / h) <= 1.0
      fits && binding && aspectOk
    }
    assert(passed(prop, 50))
  }

  test("property: mixture never exceeds the budget and is subset-monotone in budget") {
    import spark.implicits._
    val gen = Gen.listOfN(25, for {
      id <- Gen.choose(0L, 60L); tok <- Gen.choose(1L, 30L)
    } yield (id, tok))
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.distinctBy(_._1)
        .map { case (id, tok) => (id, s"s${id % 3}", tok) }
        .toDF("doc_id", "source", "n_tokens")
      def kept(b: Long) = Sampling.mixtureByTokenBudget(df, "source", "doc_id", "n_tokens",
          _ => lit(b)).collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
      val small = kept(40L)
      val large = kept(90L)
      small.forall(_._3 <= 40L) &&
        small.map(t => (t._1, t._2)).toSet.subsetOf(large.map(t => (t._1, t._2)).toSet)
    }
    assert(passed(prop, 15))
  }

  test("property: interleave keys are exactly cum*1000 DIV weight, monotone per source") {
    import spark.implicits._
    val gen = Gen.listOfN(25, for {
      id <- Gen.choose(0L, 60L); tok <- Gen.choose(1L, 30L)
    } yield (id, tok))
    val prop = Prop.forAll(gen, Gen.choose(1L, 5L), Gen.choose(1L, 5L)) { (rows, wa, wb) =>
      val df = rows.distinctBy(_._1)
        .map { case (id, tok) => (id, if (id % 2 == 0) "a" else "b", tok) }
        .toDF("doc_id", "source", "n_tokens")
      val w = (src: org.apache.spark.sql.Column) =>
        when(src === "a", lit(wa)).otherwise(lit(wb))
      val out = Sampling.interleaveByWeight(df, "source", "doc_id", "n_tokens", w)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      // re-derive per-source cumsum in the hash order independently
      def ord(id: Long) = Math.floorMod(Math.floorMod(id * 37L + 7L, 1000000007L), 1000000L)
      out.groupBy(_._1).forall { case (src, docs) =>
        val weight = if (src == "a") wa else wb
        val sorted = docs.sortBy(d => (ord(d._2), d._2))
        val cums = sorted.map(_._3).scanLeft(0L)(_ + _).tail
        sorted.map(_._4).sameElements(cums.map(c => c * 1000L / weight)) &&
          sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1))
      }
    }
    assert(passed(prop, 15))
  }
}
