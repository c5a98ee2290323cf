package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: fixed token-window
  * chunks with overlap — the preprocessing step between curation and
  * tokenization (context-window packing, RAG indexing).
  *
  * Pure narrow projection + Generate: tokens split once, chunk starts
  * enumerated with `sequence`, each chunk sliced out of the token
  * array — all whole-stage-codegen builtins, no UDFs, NO shuffle. At
  * 100 TB this is a map-only pass whose output partitioning follows the
  * input, so a downstream `groupBy(doc)` still needs one shuffle but
  * chunking itself never moves data.
  *
  * Chunk layout is the standard stride walk: chunk i covers tokens
  * `[i·stride, i·stride + chunkSize)` with `stride = chunkSize −
  * overlap`; the last chunk is the first one whose window reaches the
  * end of the document (no degenerate tail chunk fully contained in its
  * predecessor). Empty documents produce one empty chunk, so every
  * input row survives (curation accounting stays row-preserving).
  */
object Chunking {

  /** Explode `textCol` into overlapping token-window chunks.
    *
    * Output: idCol, `chunk_idx` (0-based), `chunk_text`, `n_tokens`.
    * All arithmetic is integer, so chunk boundaries are engine-exact
    * (an external SQL oracle re-derives identical chunks).
    */
  /** The chunk texts of one string column as `array<string>` — the
    * pure-expression form for pipeline stages (explode downstream).
    * Null text is treated as empty (one empty chunk), so the operator
    * is row-preserving on dirty input.
    */
  def chunkTexts(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = filter(split(coalesce(text, lit("")), " "), t => t =!= "")
    val n = size(toks).cast("long")
    val k = when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + stride - 1) / stride).cast("long") + 1)
    transform(sequence(lit(0L), k - 1), i =>
      array_join(slice(toks, (i * stride + 1).cast("int"), lit(chunkSize)), " "))
  }

  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= "")
    val n = size(toks).cast("long")
    // number of chunks: 1 while the doc fits one window, else the
    // stride walk until a window reaches the end (ceil division)
    // floor of a small-integer ratio is exact in double (the true ratio
    // can never sit within one ulp of the next integer)
    val k = when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + stride - 1) / stride).cast("long") + 1)
    df.select(col(idCol), toks.as("toks"), n.as("n"), k.as("k"))
      .select(col(idCol), col("toks"), col("n"),
        explode(sequence(lit(0L), col("k") - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        array_join(slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_idx") * stride).as("n_tokens"))
  }

  /** [[chunk]] measured in SUBWORD tokens: the window walk runs over
    * the document's BPE pieces, so `chunkSize`/`overlap` are real
    * model-context tokens and a boundary may fall MID-WORD — exactly
    * how context windows are cut for training. Pieces carry the
    * SentencePiece ▁ word-boundary marker, so each chunk detokenizes
    * losslessly (`concat → ▁→space → trim`) even when it starts inside
    * a word. Same narrow Generate plan as [[chunk]] — the tokenizer is
    * one codegen kernel call per row, still zero shuffles.
    */
  def chunkBpe(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int,
      ranks: graft.functions.Bpe.Ranks = graft.functions.Bpe.defaultRanks): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val pieces = graft.functions.Bpe.markedPieces(coalesce(col(textCol), lit("")), ranks)
    val n = size(pieces).cast("long")
    val k = when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + stride - 1) / stride).cast("long") + 1)
    df.select(col(idCol), pieces.as("ps"), n.as("n"), k.as("k"))
      .select(col(idCol), col("ps"), col("n"),
        explode(sequence(lit(0L), col("k") - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        trim(translate(
          array_join(slice(col("ps"), (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize)), ""),
          "▁", " ")).as("chunk_text"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_idx") * stride).as("n_tokens"))
  }
}
