package graft.functions

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Property tests pinning the codegen kernels to independent
  * straight-from-the-definition reference implementations on random
  * inputs. The DuckDB oracles exercise the kernels only on the shapes
  * real testdata produces; these cover the rest of the input space
  * (empty docs, runs of spaces, unicode-free ragged tokens, arbitrary
  * float vectors including negatives and zeros).
  */
class KernelsSpec extends SparkSpec {

  private val P = TextFunctions.P

  private def refCharHash(s: String): Long =
    s.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % P)

  private def refShingles(text: String, n: Int): Seq[String] = {
    val w = text.split(" ", -1).toSeq
    if (w.length < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def refSimhash(tokens: Seq[String]): Long = {
    val hs = tokens.map(refCharHash)
    (0 until 32).map { j =>
      val bitSum = hs.map(h => ((h >> j) & 1L) * 2 - 1).sum
      if (bitSum > 0) 1L << j else 0L
    }.sum
  }

  private def refMinhash(tokens: Seq[String], k: Int): Seq[Option[Long]] =
    if (tokens.isEmpty) Seq.fill(k)(None)
    else (0 until k).map { i =>
      Some(tokens.map(s => ((37L + 101L * i) * refCharHash(s) + 7L + 139L * i) % P).min)
    }

  private def arr(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t): Any).toArray)

  private val word = Gen.stringOfN(3, Gen.alphaNumChar)
  private val text = Gen.listOf(Gen.oneOf(word, Gen.const(""))).map(_.mkString(" "))
  private val params = Parameters.default.withMinSuccessfulTests(200)

  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("shingles kernel matches sliding-window definition") {
    holds(Prop.forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val got = Kernels.shinglesEval(UTF8String.fromString(t), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      got == refShingles(t, n)
    })
  }

  private def refShingleKey(s: String): Long = {
    val h2 = s.foldLeft(11L)((h, c) => (h * 37 + c.toLong) % Kernels.P2)
    refCharHash(s) * Kernels.P2 + h2
  }

  test("shingle-hash kernel == packed double hash of each shingle string") {
    holds(Prop.forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val got = Kernels.shingleHashesEval(UTF8String.fromString(t), n)
        .toLongArray().toSeq
      got == refShingles(t, n).map(refShingleKey)
    })
  }

  test("simhash kernel matches per-bit definition") {
    holds(Prop.forAll(Gen.listOf(word)) { tokens =>
      Kernels.simhash32Eval(arr(tokens)) == refSimhash(tokens)
    })
  }

  private def refSimhash63(tokens: Seq[String]): Long = {
    val hs = tokens.map(refCharHash)
    (0 until 63).map { j =>
      val bitSum = hs.map { h =>
        val v = ((37L + 101L * j) * h + 7L + 139L * j) % P
        if (v * 2 < P) 1 else -1
      }.sum
      if (bitSum > 0) 1L << j else 0L
    }.sum
  }

  test("simhash63 kernel matches the affine-sign per-bit definition") {
    holds(Prop.forAll(Gen.listOf(word)) { tokens =>
      Kernels.simhash63Eval(arr(tokens)) == refSimhash63(tokens)
    })
  }

  test("minhash kernel matches min-over-affine definition; distinct is a no-op") {
    holds(Prop.forAll(Gen.listOf(word), Gen.choose(1, 8)) { (tokens, k) =>
      val got = Kernels.minhashSigEval(arr(tokens), k)
        .toObjectArray(org.apache.spark.sql.types.LongType)
        .map(Option(_).map(_.asInstanceOf[Long])).toSeq
      got == refMinhash(tokens, k) &&
        got == refMinhash(tokens.distinct, k)
    })
  }

  test("dot/norm kernels match left-to-right double folds exactly") {
    val vec = Gen.listOfN(16, Gen.choose(-8f, 8f))
    holds(Prop.forAll(vec, vec) { (a, b) =>
      val (aa, bb) = (new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val refDot = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      val refNorm = a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      // exact bit equality — same fold order is the contract
      java.lang.Double.doubleToLongBits(Kernels.vecDotEval(aa, bb)) ==
        java.lang.Double.doubleToLongBits(refDot) &&
        java.lang.Double.doubleToLongBits(Kernels.vecNorm2Eval(aa)) ==
          java.lang.Double.doubleToLongBits(refNorm)
    })
  }

  test("ivf assign/scores kernels match per-centroid dot folds; ties break to lowest index") {
    val vec = Gen.listOfN(8, Gen.choose(-4f, 4f))
    val cents = Gen.listOfN(5, vec)
    holds(Prop.forAll(vec, cents) { (v, cs) =>
      val va = new GenericArrayData(v.toArray)
      val m = cs.map(_.toArray).toArray
      val refScores = cs.map(c =>
        v.zip(c).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble))
      val got = Kernels.ivfScoresEval(va, m)
      val scoresMatch = refScores.indices.forall(i =>
        java.lang.Double.doubleToLongBits(got.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(refScores(i)))
      scoresMatch && Kernels.ivfAssignEval(va, m) == refScores.indexOf(refScores.max)
    })
    // explicit tie: identical centroids → index 0 wins
    val zeros = new GenericArrayData(Array(1f, 2f))
    assert(Kernels.ivfAssignEval(zeros, Array(Array(3f, 4f), Array(3f, 4f))) == 0)
  }

  test("lsh signature kernel matches hyperplane-sum definition") {
    val vec = Gen.listOfN(8, Gen.choose(-4f, 4f))
    holds(Prop.forAll(vec, Gen.oneOf(4, 8, 16)) { (v, planes) =>
      val ref = (0 until planes).map { p =>
        val s = v.zipWithIndex.foldLeft(0.0) { case (acc, (x, d)) =>
          val m = (1103515245L * p + 12345L) * (d + 1) + 2654435761L
          val sign = if ((m % 2147483647L) % 2 == 0) 1.0 else -1.0
          acc + x.toDouble * sign
        }
        if (s > 0) 1L << p else 0L
      }.sum
      Kernels.lshSigEval(new GenericArrayData(v.toArray), planes) == ref
    })
  }
}
