package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The CDX index as a SERVING artifact — the composition of
  * [[Multimodal.warcCdx]] (the rows), the SURT urlkey
  * ([[graft.functions.WebFunctions.surtKey]] — host labels reversed,
  * so one domain family's captures are CONTIGUOUS in key order) and
  * [[Layout.sorted]] (range partition + in-file sort on that key).
  *
  * This is the wayback/pywb lookup shape: a replay request asks for
  * one URL (or one domain family's prefix) out of a 100 TB archive,
  * and the answer must come from 1-of-N index files, not a full scan.
  * Range partitioning on the SURT key gives every file a compact,
  * non-overlapping key range (parquet footer min/max prove it —
  * [[Layout.fileRanges]] is the audit); the in-file sort extends the
  * same pruning to row groups inside the file. `CdxLayoutSpec` pins
  * both properties plus the 1-of-N prefix-lookup guarantee.
  */
object CdxIndex {

  /** Write a SURT-keyed serving index for a CDX row set: adds the
    * `urlkey` column and lays the files out range-partitioned +
    * sorted on it. `numFiles` sizes the artifact — pick it so one
    * file's rows fit a replay server's open-and-scan budget (the key
    * ranges stay balanced regardless: range partitioning samples the
    * key distribution).
    */
  def write(cdx: DataFrame, path: String, numFiles: Int): Unit =
    Layout.writeSorted(
      cdx.withColumn("urlkey", graft.functions.WebFunctions.surtKey(col("url"))),
      path, numFiles, col("urlkey"))

  /** Domain-family (or exact-URL-prefix) lookup over a written index:
    * a `startsWith` predicate on the SURT key. Spark pushes the
    * prefix filter to the parquet scan, and because the writer
    * clustered on the key, footer min/max skip every file (and row
    * group) whose range misses the prefix — the lookup touches
    * 1-of-N files, the property `CdxLayoutSpec` proves through the
    * [[Layout.fileRanges]] audit.
    *
    * SURT prefixes to pass: `com,site3)` for one host,
    * `com,site3,` for its subdomain family, `com,site3)/p/` for a
    * path subtree.
    */
  def lookupPrefix(spark: SparkSession, path: String, surtPrefix: String): DataFrame =
    spark.read.parquet(path).where(col("urlkey").startsWith(surtPrefix))

  /** The audit half of the lookup guarantee: which of the written
    * files COULD hold keys with this prefix, by footer-range
    * intersection ([lo, hi] ∩ [prefix, prefix∙∞)). A healthy layout
    * returns 1 (or the few straddling a partition boundary) of N —
    * this is what "prunes to 1-of-N" means, measured from the same
    * min/max stats the scan skips on.
    */
  def filesForPrefix(spark: SparkSession, path: String, surtPrefix: String): DataFrame = {
    val hiBound = surtPrefix + "￿"
    Layout.fileRanges(spark.read.parquet(path), "urlkey")
      .where(col("hi") >= surtPrefix && col("lo") <= hiBound)
  }

  /** One ranged read out of an archive file — the replay fetch a
    * member-bearing CDX row ([[Multimodal.warcCdxMembers]]) points
    * at: `length` bytes at `offset`, nothing else. Driver/server
    * side by design: a point lookup is one request, not a Spark job.
    * Compose with [[WebArchive.archiveDict]] (fetched once per
    * archive file, from its head) and [[WebArchive.decodeMember]]
    * to decode the record. */
  def readRange(path: String, offset: Long, length: Long): Array[Byte] = {
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path), java.nio.file.StandardOpenOption.READ)
    try {
      val buf = java.nio.ByteBuffer.allocate(length.toInt)
      var pos = offset
      while (buf.hasRemaining) {
        val n = ch.read(buf, pos)
        if (n < 0) throw new java.io.EOFException(s"$path: range $offset+$length past EOF")
        pos += n
      }
      buf.array()
    } finally ch.close()
  }
}
