package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016, the
  * standard LLM token-count basis) as codegen Catalyst expressions.
  *
  * The merge table ships as a resource in the public `merges.txt`
  * format (one "left right" pair per line, rank = line order, optional
  * `#version` header) — the same file layout every BPE ecosystem reads
  * — or loads from any path, so a user can drop in their model's real
  * merge table. The default table is trained offline on the engine's
  * own document corpus with the textbook pair-count loop.
  *
  * Tokenization rule, pinned identically in the Scala kernel, the
  * ScalaTest reference, and the DuckDB oracle CTEs:
  *
  *   1. pre-tokenize on whitespace runs (words never span spaces);
  *   2. a word starts as its Unicode CODEPOINTS (not UTF-16 units —
  *      beyond-BMP text must count the same everywhere);
  *   3. repeatedly find the adjacent pair with the LOWEST merge rank
  *      (leftmost occurrence on ties) and merge that one occurrence;
  *   4. stop when no adjacent pair is in the table.
  *
  * Characters outside the merge alphabet simply stay single-codepoint
  * tokens — unknown scripts degrade to per-codepoint counts instead of
  * failing, which is the honest budget behavior for CJK against an
  * English merge table.
  *
  * Why an expression and not a UDF: token counting sits under every
  * chunk/pack/mixture budget — it must stay inside whole-stage codegen
  * with zero SerDe, like the other kernels in [[Kernels]]. The rank
  * map rides along as a reference object (a few KB), the same
  * mechanism as the IVF centroid matrix.
  */
object Bpe {

  import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}

  /** merge ranks keyed "left right"; java.util.HashMap: serializable,
    * null-on-miss (no Option boxing in the hot loop).
    */
  type Ranks = java.util.HashMap[String, Integer]

  /** parse merges.txt content: skip blank lines and the `#version`
    * header; rank = order of appearance. Only `#version` is reserved —
    * a merge whose LEFT token starts with '#' (e.g. "# 0000" learned
    * from structured ids) is data, so a skip-all-#-lines rule would
    * silently drop trained merges.
    */
  def parseMerges(lines: Iterator[String]): Ranks = {
    val m = new java.util.HashMap[String, Integer]()
    var rank = 0
    lines.foreach { line =>
      val t = line.trim
      if (t.nonEmpty && !t.startsWith("#version")) {
        m.put(t, rank)
        rank += 1
      }
    }
    m
  }

  def loadResource(path: String): Ranks = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"merge table resource not found: $path")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parseMerges(src.getLines()) finally src.close()
  }

  def loadFile(path: String): Ranks = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseMerges(src.getLines()) finally src.close()
  }

  /** the shipped default table (64 merges trained on the documents
    * corpus); loaded once per JVM.
    */
  lazy val defaultRanks: Ranks = loadResource("/graft/bpe_merges.txt")

  /** ordered merge list back out of a ranks map — the form the DuckDB
    * oracle inlines as a MAP literal.
    */
  def orderedMerges(ranks: Ranks): Seq[String] = {
    import scala.jdk.CollectionConverters._
    ranks.asScala.toSeq.sortBy(_._2.intValue).map(_._1)
  }

  /** BPE pieces of ONE word (codepoint init + rank-greedy merge loop).
    * Shared by count and pieces eval so the rule can't fork.
    */
  private def mergeWord(word: String, ranks: Ranks): scala.collection.mutable.ArrayBuffer[String] = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      toks += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    var done = toks.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.get(toks(j) + " " + toks(j + 1))
        if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestI = j }
        j += 1
      }
      if (bestI < 0) done = true
      else {
        toks(bestI) = toks(bestI) + toks(bestI + 1)
        toks.remove(bestI + 1)
        if (toks.length < 2) done = true
      }
    }
    toks
  }

  private val Whitespace = "\\s+".r

  def countEval(text: UTF8String, ranks: Ranks): Long = {
    var n = 0L
    Whitespace.split(text.toString).foreach { w =>
      if (w.nonEmpty) n += mergeWord(w, ranks).length
    }
    n
  }

  def piecesEval(text: UTF8String, ranks: Ranks): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    Whitespace.split(text.toString).foreach { w =>
      if (w.nonEmpty) mergeWord(w, ranks).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray)
  }

  /** the SentencePiece word-boundary convention: each word's FIRST
    * piece carries a leading ▁ (U+2581), so any piece-slice
    * detokenizes losslessly — `concat.replace('▁',' ').trim` rebuilds
    * the text with whitespace runs normalized, even when the slice
    * starts mid-word. The marker is applied AFTER merging; it never
    * participates in rank lookups.
    */
  def markedPiecesEval(text: UTF8String, ranks: Ranks): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    Whitespace.split(text.toString).foreach { w =>
      if (w.nonEmpty) {
        val ps = mergeWord(w, ranks)
        var i = 0
        while (i < ps.length) {
          out += UTF8String.fromString(if (i == 0) "▁" + ps(0) else ps(i))
          i += 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** BPE token count of `text` under the default shipped merge table. */
  def tokenCount(text: Column): Column = tokenCount(text, defaultRanks)

  def tokenCount(text: Column, ranks: Ranks): Column =
    toColumn(BpeCountK(toExpression(text), ranks))

  /** the subword pieces themselves (word-major order) — the lossless
    * companion: `concat_ws("", pieces)` == text with whitespace runs
    * collapsed away.
    */
  def pieces(text: Column): Column = pieces(text, defaultRanks)

  def pieces(text: Column, ranks: Ranks): Column =
    toColumn(BpePiecesK(toExpression(text), ranks))

  /** pieces with the ▁ word-boundary marker — the detokenizable form. */
  def markedPieces(text: Column): Column = markedPieces(text, defaultRanks)

  def markedPieces(text: Column, ranks: Ranks): Column =
    toColumn(BpeMarkedPiecesK(toExpression(text), ranks))

  /** Deterministic id space derived from the table ALONE (no corpus
    * pass, no stored vocab file): a single-codepoint piece's id is its
    * Unicode codepoint; a merged piece's id is 0x110000 (one past the
    * codepoint space, so the ranges can never collide) + the rank of
    * the lowest-rank merge whose concatenation equals the piece. Any
    * engine holding the same merges.txt derives the identical ids.
    */
  type IdMap = java.util.HashMap[String, java.lang.Long]

  def idMapOf(ranks: Ranks): IdMap = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    ranks.forEach { (k: String, r: Integer) =>
      val sp = k.indexOf(' ')
      if (sp > 0) {
        val tok = k.substring(0, sp) + k.substring(sp + 1)
        val id = 0x110000L + r.longValue
        val prev = m.get(tok)
        if (prev == null || id < prev.longValue) m.put(tok, java.lang.Long.valueOf(id))
      }
    }
    m
  }

  def idsEval(text: UTF8String, ranks: Ranks, ids: IdMap): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    Whitespace.split(text.toString).foreach { w =>
      if (w.nonEmpty) mergeWord(w, ranks).foreach { p =>
        out += (if (p.codePointCount(0, p.length) == 1) p.codePointAt(0).toLong
          else {
            val v = ids.get(p)
            if (v == null) -1L else v.longValue // unreachable for table-formed pieces
          })
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** token IDS of `text` — what a trainer actually consumes. */
  def pieceIds(text: Column): Column = pieceIds(text, defaultRanks)

  def pieceIds(text: Column, ranks: Ranks): Column =
    toColumn(BpeIdsK(toExpression(text), ranks))

  /** Inverse of [[markedPieces]]: concatenate and turn each ▁ marker
    * back into a word boundary. Round-trip invariant (spec- and
    * oracle-pinned): `detokenize(markedPieces(text)) == text` for any
    * single-space-tokenized text — the property that makes the marked
    * form safe to ship as the training artifact. Pure built-ins
    * (array_join + replace + substring), fully codegen.
    */
  def detokenize(pieces: Column): Column = {
    import org.apache.spark.sql.functions.{array_join, translate, trim}
    // trim, NOT substr(2): dropping one leading character is only right
    // when the slice starts at a word boundary — a mid-word slice
    // (["ing", "▁cat"], exactly what chunkBpe emits) has no leading
    // marker and substr would eat its first content codepoint. trim
    // strips the boundary-marker space when present and nothing
    // otherwise; the round-trip invariant (single-space-tokenized text
    // has no edge whitespace) is unchanged. Same recipe as chunkBpe.
    trim(translate(array_join(pieces, ""), "▁", " "))
  }

  /** Train a merge table from a corpus — the textbook BPE learner
    * (Sennrich et al. 2016) split Spark-style: the 100 TB part (word
    * frequency counting) is ONE distributed groupBy whose output is
    * vocabulary-sized, and the merge loop runs driver-side over that
    * bounded table — the same bounded-model contract as the IVF
    * centroid collect. Deterministic end to end: vocabulary truncation
    * orders by (count DESC, word ASC), each round merges ALL
    * occurrences of the most frequent pair, ties broken by the
    * lexicographically smallest pair — byte-identical to the offline
    * trainer that produced the shipped resource table (pinned in
    * BpeSpec), so retraining on the same corpus reproduces it.
    *
    * Returns merges in rank order ("left right" lines — write them out
    * as a merges.txt); feed to [[parseMerges]]/[[tokenCount]].
    */
  def train(df: org.apache.spark.sql.DataFrame, textCol: String,
            numMerges: Int, maxVocab: Int = 1000000): Seq[String] = {
    import org.apache.spark.sql.functions._
    val wordCounts = df
      .select(explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // driver-side loop over the bounded vocab, symbols = codepoints
    var vocab: Map[Vector[String], Long] = wordCounts.groupMapReduce { case (w, _) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }(_._2)(_ + _)
    val merges = Seq.newBuilder[String]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairs.update(k, pairs.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val best = pairs.minByOption { case ((a, b), c) => (-c, a, b) }
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += s"$a $b"
          vocab = vocab.groupMapReduce { case (syms, _) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result()
          }(_._2)(_ + _)
          round += 1
        case _ => done = true // no pair left worth merging
      }
    }
    merges.result()
  }
}

case class BpeCountK(child: Expression, ranks: Bpe.Ranks) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Bpe.countEval(input.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countEval($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeCountK = copy(child = newChild)
  override def prettyName: String = "graft_bpe_count"
}

case class BpePiecesK(child: Expression, ranks: Bpe.Ranks) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Bpe.piecesEval(input.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.piecesEval($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpePiecesK = copy(child = newChild)
  override def prettyName: String = "graft_bpe_pieces"
}

case class BpeIdsK(child: Expression, ranks: Bpe.Ranks) extends UnaryExpression {
  // derived once per expression instance; rides into codegen as a
  // reference object exactly like the ranks table itself
  @transient private lazy val ids: Bpe.IdMap = Bpe.idMapOf(ranks)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Bpe.idsEval(input.asInstanceOf[UTF8String], ranks, ids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rref = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[String, Integer]].getName)
    val iref = ctx.addReferenceObj("bpeIds", ids, classOf[java.util.HashMap[String, java.lang.Long]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.idsEval($c, $rref, $iref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeIdsK = copy(child = newChild)
  override def prettyName: String = "graft_bpe_ids"
}

case class BpeMarkedPiecesK(child: Expression, ranks: Bpe.Ranks) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Bpe.markedPiecesEval(input.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.markedPiecesEval($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMarkedPiecesK = copy(child = newChild)
  override def prettyName: String = "graft_bpe_marked_pieces"
}
