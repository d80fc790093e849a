package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal}

/** Perceptual-hash near-dup over multimodal payloads: the image-dedup
  * tier of a training-data pipeline (same-media-different-encoding
  * collapses that byte-exact dedup misses). The decode is the
  * documented stub (payload = UTF-8 bytes standing in for pixels);
  * the fingerprint arithmetic, banding join, and oracle replay are
  * real. Candidate generation reuses the SimHash pigeonhole banding
  * (`Dedup.bandedHashPairs`) — per-band buckets, never all-pairs, so
  * the shape survives a 100 TB media corpus.
  */
object MmPhashQueries {
  import Q._

  private val NoiseVariantOffset = 100000L

  val queries: Map[String, QFn] = Map(
    "q_mm_phash" -> ((s, dir) => {
      // Per-payload 64-bit aHash fingerprint — the persisted column an
      // incremental media-dedup pass banding-joins against. One native
      // kernel call per row inside whole-stage codegen.
      val media = Multimodal.attachPayload(t(s, dir, "documents"))
      media.select(col("doc_id"),
          length(col("payload")).cast("int").as("n_bytes"),
          Multimodal.aHash(col("payload")).as("ahash"))
        .filter(col("n_bytes") >= 64)
        .orderBy(col("doc_id"))
    }),
    "q_mm_phash_dups" -> ((s, dir) => {
      // Re-encode detection end-to-end: corpus = originals ∪ noised
      // re-encodes (deterministic +3-mod-256 on every 50th byte),
      // banded pairs at hamming ≤ 6. Oracle = DuckDB all-pairs replay
      // of the identical integer pipeline — recall of the banding is
      // proven by the hash match.
      val media = Multimodal.attachPayload(t(s, dir, "documents"))
      val bs = media.select(col("doc_id"), col("payload"))
        .filter(length(col("payload")) >= 64)
      val variants = bs.select(
        (col("doc_id") + NoiseVariantOffset).as("doc_id"),
        Multimodal.reencodeNoise(col("payload")).as("payload"))
      val un = bs.unionByName(variants)
      val hashed = un.select(col("doc_id"),
        Multimodal.aHash(col("payload")).as("ahash"))
      Dedup.bandedHashPairs(hashed, "doc_id", "ahash", maxDist = 6)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  private val bytesCte =
    """raw AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    CAST(octet_length(encode(text)) AS INT) AS n
      |  FROM documents),
      |bs AS (
      |  SELECT doc_id, n,
      |    list_transform(range(1, n + 1),
      |      i -> ('0x' || substr(hx, CAST(2*i-1 AS INT), 2))::INT) AS b
      |  FROM raw WHERE n >= 64)""".stripMargin

  /** cells → hugeint bit sum → wrap-cast to signed BIGINT (DuckDB
    * checks << 63 overflow on BIGINT; HUGEINT shift + explicit 2^64
    * wrap reproduces the JVM's two's-complement hash). */
  private def hashCtes(src: String) =
    s"""cells AS (
      |  SELECT id, list_transform(range(0, 64), i ->
      |    CAST(list_sum(b[CAST((i*n)//64 + 1 AS INT):CAST(((i+1)*n)//64 AS INT)]) AS BIGINT)
      |      // (((i+1)*n)//64 - (i*n)//64)) AS cs
      |  FROM $src),
      |hs AS (
      |  SELECT id,
      |    CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616
      |      ELSE s END AS BIGINT) AS ahash
      |  FROM (
      |    SELECT id, list_sum(list_transform(range(0, 64),
      |      i -> CASE WHEN 64 * cs[CAST(i + 1 AS INT)] > list_sum(cs)
      |        THEN (1::HUGEINT << CAST(i AS INT)) ELSE 0::HUGEINT END)) AS s
      |    FROM cells))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_mm_phash" ->
      s"""WITH $bytesCte,
        |un AS (SELECT doc_id AS id, b, n FROM bs),
        |${hashCtes("un")}
        |SELECT h.id AS doc_id, u.n AS n_bytes, h.ahash
        |FROM hs h JOIN un u ON h.id = u.id
        |ORDER BY doc_id""".stripMargin,
    "q_mm_phash_dups" ->
      s"""WITH $bytesCte,
        |un AS (
        |  SELECT doc_id AS id, b, n FROM bs
        |  UNION ALL
        |  SELECT doc_id + 100000 AS id,
        |    list_transform(range(1, n + 1),
        |      i -> CASE WHEN (i - 1) % 50 = 0 THEN (b[CAST(i AS INT)] + 3) % 256
        |        ELSE b[CAST(i AS INT)] END) AS b,
        |    n
        |  FROM bs),
        |${hashCtes("un")}
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
        |FROM hs a JOIN hs b ON a.id < b.id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
        |ORDER BY id_a, id_b""".stripMargin
  )
}
