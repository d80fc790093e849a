package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the context-window splitter of a training /
  * RAG pipeline: each document becomes ⌈(n − overlap) / stride⌉
  * token-bounded chunks of ≤ `chunkTokens` tokens, consecutive
  * chunks sharing `overlap` tokens.
  *
  * Scale shape: entirely per-row — tokenize, compute the chunk count
  * arithmetically, explode a `sequence`, slice the token array per
  * chunk. No shuffle, no state, codegen end to end; a 100 TB corpus
  * chunks inside the scan pipeline at full width. Chunk text is the
  * space-rejoin of the token slice (the tokenizer's whitespace
  * classes collapse — the contract a token-budgeted consumer wants;
  * byte-exact spans would carry (start_char, end_char) offsets
  * instead, same plan shape).
  */
object Chunking {

  /** (doc_id, chunk_idx, start_tok, n_tok, chunk_text) rows;
    * zero-token docs yield no chunks. */
  def chunk(docs: DataFrame, chunkTokens: Int, overlap: Int = 0,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens, "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = docs.select(col(id), TextAnalysis.tokens(col(text)).as("_toks"))
      .select(col(id), col("_toks"), size(col("_toks")).cast("long").as("_n"))
    // chunks beyond the first cover the tokens past chunkTokens in
    // stride steps: 1 + ceil(max(0, n - chunkTokens) / stride)
    val extra = greatest(lit(0L), col("_n") - chunkTokens)
    val nChunks = when(col("_n") === 0, lit(0L))
      .otherwise(lit(1L) + floor((extra + (stride - 1)) / lit(stride.toDouble)).cast("long"))
    toks
      .filter(col("_n") > 0) // before explode: sequence(0, -1) descends
      .withColumn("_ci", explode(sequence(lit(0L), nChunks - 1)))
      .select(col(id),
        col("_ci").as("chunk_idx"),
        (col("_ci") * stride).as("start_tok"),
        least(lit(chunkTokens.toLong), col("_n") - col("_ci") * stride).as("n_tok"),
        array_join(slice(col("_toks"), (col("_ci") * stride + 1).cast("int"),
          lit(chunkTokens)), " ").as("chunk_text"))
  }
}
