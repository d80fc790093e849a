package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the driver-side-computable pipeline
  * arithmetic: chunk counting/coverage, sampling thresholds, and the
  * Morton interleave — pure-function invariants over generated
  * inputs (no SparkSession). */
object PipelineProps extends Properties("PipelineArithmetic") {

  // ---- chunk arithmetic (mirrors Chunking.chunk's Column math) ----
  private def nChunks(n: Long, chunkTokens: Int, stride: Int): Long =
    if (n == 0) 0L
    else 1L + math.ceil(math.max(0L, n - chunkTokens).toDouble / stride).toLong

  private val genChunkCase = for {
    n <- Gen.choose(0L, 100000L)
    ct <- Gen.choose(1, 4096)
    ov <- Gen.choose(0, ct - 1)
  } yield (n, ct, ov)

  property("chunks cover all tokens: last chunk reaches n, none starts past n") =
    forAll(genChunkCase) { case (n, ct, ov) =>
      val stride = ct - ov
      val k = nChunks(n, ct, stride)
      n == 0 && k == 0 || {
        val lastStart = (k - 1) * stride
        val lastEnd = math.min(lastStart + ct, n)
        lastStart < n && lastEnd == n &&
          (k == 1 || (k - 2) * stride + ct < n) // k-1 chunks would NOT cover
      }
    }

  property("zero-overlap chunks partition the tokens exactly") =
    forAll(Gen.choose(1L, 100000L), Gen.choose(1, 4096)) { (n, ct) =>
      val k = nChunks(n, ct, ct)
      val sizes = (0L until k).map(i => math.min(ct.toLong, n - i * ct))
      sizes.sum == n && sizes.forall(s => s >= 1 && s <= ct)
    }

  // ---- sampling threshold (mirrors Sampling.hexThreshold) ----
  property("hexThreshold is monotone and 8 hex chars") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (tl, th) = (graft.llm.Sampling.hexThreshold(lo), graft.llm.Sampling.hexThreshold(hi))
      tl.length == 8 && th.length == 8 && tl <= th
    }

  property("hexThreshold endpoints: 0 keeps nothing, 1 keeps everything") = {
    val z = graft.llm.Sampling.hexThreshold(0.0)
    val o = graft.llm.Sampling.hexThreshold(1.0)
    // md5 prefixes are lowercase hex in [00000000, ffffffff]
    z == "00000000" && o >= "ffffffff"
  }

  // ---- Morton interleave bijectivity (mirrors ZOrder.interleave) ----
  private def interleaveModel(ranks: Seq[Long], bits: Int): Long = {
    val n = ranks.size
    (for { i <- 0 until bits; j <- 0 until n } yield
      (((ranks(j) >> i) & 1L) << (i * n + j))).sum
  }
  private def deinterleave(z: Long, n: Int, bits: Int): Seq[Long] =
    (0 until n).map(j => (0 until bits).map(i => ((z >> (i * n + j)) & 1L) << i).sum)

  property("interleave is a bijection on rank tuples") =
    forAll(Gen.choose(2, 3), Gen.choose(1, 15)) { (n, bits) =>
      forAll(Gen.listOfN(n, Gen.choose(0L, (1L << bits) - 1))) { ranks =>
        deinterleave(interleaveModel(ranks, bits), n, bits) == ranks
      }
    }

  property("interleave preserves per-dimension order at fixed other dims") =
    forAll(Gen.choose(1, 15)) { bits =>
      forAll(Gen.choose(0L, (1L << bits) - 1), Gen.choose(0L, (1L << bits) - 1),
        Gen.choose(0L, (1L << bits) - 1)) { (a, b, other) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        interleaveModel(Seq(lo, other), bits) <= interleaveModel(Seq(hi, other), bits)
      }
    }
}
