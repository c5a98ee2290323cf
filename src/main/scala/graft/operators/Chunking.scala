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

  /** Content-defined chunking (CDC): chunk boundaries chosen by the
    * CONTENT, not by position — the rsync/LBFS idea (Muthitacharoen et
    * al., SOSP '01) on word streams. A cut falls after word `i` iff the
    * mixed hash of the TRAILING 3-gram (words i−2..i) ≡ `avgWords−1
    * (mod avgWords)`, so boundaries survive insertions and deletions:
    * editing one sentence shifts every fixed-window chunk after it, but
    * reshapes only the couple of CDC chunks whose gear windows overlap
    * the edit — the property that makes CHUNK-level exact dedup catch
    * partial duplication (boilerplate + small edits) that
    * document-level hashing misses.
    *
    * The gear rolls over a 3-word window, not a single word, for two
    * reasons: (a) a small vocabulary still yields a rich gear space
    * (|V|³ windows), and (b) the packed polynomial key's LOW BITS are
    * structurally biased (31/37-polynomials collapse into small
    * subgroups mod 2^k — measured cut rate 0.0 on one synthetic vocab),
    * so the key is diffused through a 33/17/7 xorshift before the mod:
    * integer-only, overflow-free, and expressible identically in SQL
    * (measured cut rate 0.064 ≈ 1/16 on the corpus at avgWords=16).
    *
    * Chunk sizes are geometric with mean ≈ `avgWords`; the stateless
    * rule has no min/max clamps — those need a sequential scan, and the
    * dedup use case tolerates size variance. Same execution shape as
    * [[chunk]]: split + higher-order expressions + one Generate, a pure
    * map with NO shuffle at any corpus size; gram hashes ride the
    * shared codegen kernel ([[graft.functions.Kernels.shingleHashes]]).
    *
    * Output: idCol, `chunk_idx` (0-based), `chunk_text`
    * (single-space-normalized words), `n_words`, `chunk_fp`
    * ([[graft.functions.TextFunctions.fingerprint]] of the chunk).
    * Docs shorter than 3 words form one chunk;
    * empty/whitespace-only docs yield no chunks.
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                avgWords: Int = 32): DataFrame = {
    require(avgWords >= 2, s"cdcChunks: avgWords must be >= 2, got $avgWords")
    // ONE codegen kernel call per row (split → gear hash → mix → cuts →
    // spans → per-chunk fingerprint in a single JVM loop): the previous
    // 6-deep higher-order-function chain computed the same thing through
    // interpreted lambdas — measured 1.1 s single-task at sf0.1 vs
    // ~0.15 s for the kernel. Bit-identical output (parity-pinned in
    // ChunkingKernelSpec; the HOF form is kept below as the reference).
    df.select(col(idCol),
        posexplode(graft.functions.Kernels.cdcChunkStructs(
          coalesce(col(textCol), lit("")), avgWords)).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c.chunk_text").as("chunk_text"), col("__c.n_words").as("n_words"),
        col("__c.chunk_fp").as("chunk_fp"))
  }

  /** The pure-`Column` higher-order-function form [[cdcChunks]] had
    * before the kernel — kept as the parity reference the kernel is
    * spec-pinned against (ChunkingKernelSpec), same discipline as
    * [[Similarity.ivfCentroidsDistributed]].
    */
  private[graft] def cdcChunksExpr(df: DataFrame, idCol: String, textCol: String,
                                   avgWords: Int = 32): DataFrame = {
    require(avgWords >= 2, s"cdcChunks: avgWords must be >= 2, got $avgWords")
    val d = lit(avgWords.toLong)
    def mix(h: Column): Column = {
      val a = h.bitwiseXOR(shiftright(h, 33))
      val b = a.bitwiseXOR(shiftright(a, 17))
      b.bitwiseXOR(shiftright(b, 7))
    }
    val base = df
      .select(col(idCol),
        filter(split(coalesce(col(textCol), lit("")), " "), w => w =!= "").as("__ws"))
      .filter(size(col("__ws")) > 0)
      // re-join so the kernel's split matches the normalized words;
      // __hs(j) is the packed key of words j..j+2 (1-based)
      .withColumn("__hs",
        graft.functions.Kernels.shingleHashes(array_join(col("__ws"), " "), 3))
    // cut AFTER 1-based word position i (i >= 3) when the mixed hash of
    // the trailing 3-gram (at index i-2) lands on D-1. Iterate the HASH
    // ARRAY with an indexed transform (hash h at 0-based j ↦ cut at
    // j+3), never element_at(__hs, i) inside a lambda: projection
    // collapse inlines __hs into the lambda body, re-running the whole
    // shingle kernel PER POSITION — measured 65 s for 5 000 docs at
    // sf0.1 (O(n²·chars) per doc) vs 0.4 s for this form. A transform's
    // collection argument is evaluated once; only the lambda variable
    // is per-element. Empty-array cast keeps the n<3 branch typed.
    val cuts = when(size(col("__ws")) >= 3,
      filter(
        transform(col("__hs"), (h, j) =>
          when(pmod(mix(h), d) === d - 1L, j + 3).otherwise(lit(null).cast("int"))),
        x => x.isNotNull))
      .otherwise(array().cast("array<int>"))
    val withChunks = base.withColumn("__cuts", cuts).withColumn("__chunks", {
      val starts = concat(array(lit(1)), transform(col("__cuts"), c => c + 1))
      val ends = concat(col("__cuts"), array(size(col("__ws"))))
      // a trailing cut at the last word yields an empty (start>end) pair
      filter(
        zip_with(starts, ends, (a, b) =>
          when(a <= b, struct(
            array_join(slice(col("__ws"), a, b - a + 1), " ").as("chunk_text"),
            (b - a + 1).cast("long").as("n_words")))),
        s => s.isNotNull)
    })
    withChunks
      .select(col(idCol), posexplode(col("__chunks")).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c.chunk_text").as("chunk_text"), col("__c.n_words").as("n_words"),
        graft.functions.TextFunctions.fingerprint(col("__c.chunk_text")).as("chunk_fp"))
  }

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

  /** Explode `textCol` into overlapping token-window chunks.
    *
    * Output: idCol, `chunk_idx` (0-based), `chunk_text`, `n_tokens`.
    * All arithmetic is integer, so chunk boundaries are engine-exact
    * (an external SQL oracle re-derives identical chunks).
    */
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
