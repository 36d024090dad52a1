package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Content-defined chunking (CDC) at token granularity — the
  * shift-resistant segmentation used by dedup pipelines (FastCDC /
  * LBFS-style anchoring, here on the token stream instead of raw
  * bytes): a token is an ANCHOR iff its portable 60-bit hash ≡ 0
  * (mod `divisor`), and every anchor closes a chunk. Because the
  * boundary decision depends only on the token itself, inserting or
  * deleting text perturbs chunk boundaries only LOCALLY — unlike
  * fixed-width windows, where one leading word shifts every downstream
  * chunk. Chunks therefore re-align across edited copies of a
  * document, which is what makes cross-document chunk-level dedup
  * work on near-identical shards.
  *
  * Expected chunk length is `divisor` tokens (geometric, tail
  * included); there is deliberately no min/max clamp — a clamp
  * reintroduces positional state and breaks the local-realignment
  * property that is the whole point.
  *
  * Scale shape: chunking is ONE narrow map stage (tokenize → anchor
  * filter → boundary slice, all codegen HOFs — no shuffle, no UDF, no
  * per-row state off the JVM stack); chunk-level dedup adds one
  * map-combined shuffle on the 8-byte chunk hash. Nothing is ever
  * pairwise.
  */
object Cdc {

  /** 1-based token positions whose token hashes to an anchor */
  private def anchorIdxs(toks: Column, divisor: Int): Column =
    filter(sequence(lit(1), size(toks)),
      i => Dedup.PortableTokenHash(get(toks, i - 1)) % divisor === 0)

  /** chunk boundaries: 0, each anchor position, n — strictly
    * increasing (array_distinct drops the duplicate when the final
    * token is itself an anchor)
    */
  private def boundaries(toks: Column, divisor: Int): Column =
    array_distinct(concat(array(lit(0)), anchorIdxs(toks, divisor),
      array(size(toks))))

  /** Per-chunk rows: (`idCol`, chunk_idx, n_tok, chunk_hash) —
    * chunk_hash is the portable 60-bit hash of the space-joined chunk
    * text, the cross-engine chunk identity used by [[dupChunkStats]].
    * Map-only; output is ~tokens/divisor rows per document.
    */
  def cdcChunks(df: DataFrame, textCol: String, idCol: String,
      divisor: Int = 8): DataFrame = {
    require(divisor >= 2, "divisor must be >= 2")
    // staged projections: the anchor scan (one md5 per token) runs once
    // per row — Catalyst keeps the intermediate alias because it is
    // expensive and referenced per chunk (CollapseProject's cheap-expr
    // guard), so the chunk transform only slices and hashes each chunk
    val chunks = transform(
      sequence(lit(1), size(col("__b")) - 1),
      j => struct((get(col("__b"), j) - get(col("__b"), j - 1)).as("n_tok"),
        Dedup.PortableTokenHash(concat_ws(" ",
          slice(col("__t"), get(col("__b"), j - 1) + 1,
            get(col("__b"), j) - get(col("__b"), j - 1)))).as("chunk_hash")))
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        boundaries(col("__t"), divisor).as("__b"))
      .select(col(idCol), posexplode(chunks))
      .toDF(idCol, "chunk_idx", "c")
      .select(col(idCol), col("chunk_idx"),
        col("c.n_tok").as("n_tok"), col("c.chunk_hash").as("chunk_hash"))
  }

  /** Per-document chunk-dedup signal: of the doc's `n_chunks` DISTINCT
    * chunk hashes, how many (`dup_chunks`) also occur in at least one
    * OTHER document, and the fraction (`dup_frac`, rounded to 1e-6). High
    * fractions flag shards assembled from recycled spans (mirrors,
    * boilerplate quilts) that whole-document dedup cannot see.
    *
    * One chunk-hash shuffle (map-combined distinct-doc count per hash)
    * + a hash-key join back + a doc-key aggregate — linear in chunks.
    */
  def dupChunkStats(df: DataFrame, textCol: String, idCol: String,
      divisor: Int = 8): DataFrame = {
    val chunks = cdcChunks(df, textCol, idCol, divisor)
      .select(col(idCol), col("chunk_hash")).distinct()
    val shared = chunks.groupBy("chunk_hash")
      .agg(count(lit(1)).as("__nd"))
    chunks.join(shared, "chunk_hash")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("dup_chunks"))
      .withColumn("dup_frac",
        round(col("dup_chunks").cast(DoubleType) /
          col("n_chunks").cast(DoubleType), 6))
  }
}
