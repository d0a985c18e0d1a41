package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, stride: Int) =
    Chunker.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), size, stride)
      .select("chunk_idx", "n_tokens", "first_token", "last_token")
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq

  test("window grid: short docs one chunk, exact fit one chunk, tail covered") {
    // 3 tokens < size → one short chunk
    assert(chunks("a bb ccc", 4, 2) === Seq((0L, 3L, "a", "ccc")))
    // exactly size tokens → one full chunk
    assert(chunks("a b c d", 4, 2) === Seq((0L, 4L, "a", "d")))
    // 5 tokens, size 4, stride 2 → starts 0 and 2; tail chunk short
    assert(chunks("a b c d e", 4, 2) ===
      Seq((0L, 4L, "a", "d"), (1L, 3L, "c", "e")))
    // empty doc → no chunks
    assert(chunks("   ", 4, 2).isEmpty)
  }

  test("overlap: consecutive chunks share exactly size - stride tokens") {
    val docs = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunker.chunkTokens(docs, col("doc_id"), col("text"), 32, 16)
      .select("chunk_idx", "n_tokens", "first_token", "last_token")
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
    // starts 0,16,32,48,64 + tail: ceil((100-32)/16)=5 → 6 chunks
    assert(got.size === 6)
    assert(got.head === ((0L, 32L, "t1", "t32")))
    assert(got(1) === ((1L, 32L, "t17", "t48"))) // 16-token overlap with chunk 0
    assert(got.last === ((5L, 20L, "t81", "t100"))) // tail covers the end
  }

  test("len_checksum is the position-weighted token-length sum") {
    val got = Chunker.chunkTokens(
        Seq((1L, "ab c dddd")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 8, 4)
      .select("len_checksum").as[Long].head()
    // 1*2 + 2*1 + 3*4 = 16
    assert(got === 16L)
  }

  test("grid coverage invariants hold across token counts and (size, stride) shapes") {
    // docs of every length 0..70 in ONE frame; tokens are "p<idx>" so
    // boundary tokens identify their positions exactly
    val docs = (0 to 70).map(n => (n.toLong, (0 until n).map(i => s"p$i").mkString(" ")))
      .toDF("doc_id", "text")
    for ((size, stride) <- Seq((32, 16), (16, 8), (8, 8), (5, 2))) {
      val got = Chunker.chunkTokens(docs, col("doc_id"), col("text"), size, stride)
        .select("doc_id", "chunk_idx", "n_tokens", "first_token", "last_token")
        .as[(Long, Long, Long, String, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      for (n <- 0 to 70) {
        val chunks = got.getOrElse(n.toLong, Array.empty)
        if (n == 0) assert(chunks.isEmpty, s"empty doc must yield no chunks (n=$n)")
        else {
          val expectChunks = 1 + math.max(0, math.ceil((n - size).toDouble / stride).toInt)
          assert(chunks.length === expectChunks, s"n=$n size=$size stride=$stride")
          chunks.foreach { case (_, ci, nt, first, last) =>
            val start = ci.toInt * stride
            val end = math.min(start + size, n)
            assert(nt === (end - start).toLong, s"n=$n ci=$ci")
            assert(first === s"p$start" && last === s"p${end - 1}", s"n=$n ci=$ci")
          }
          // the tail chunk reaches the last token: full coverage, no gap
          val (_, lastCi, _, _, lastTok) = chunks.last
          assert(lastTok === s"p${n - 1}", s"n=$n")
          assert(lastCi.toInt * stride < n, s"tail chunk must start in range (n=$n)")
        }
      }
    }
  }

  test("stride must be positive and no larger than size") {
    intercept[IllegalArgumentException] {
      Chunker.chunkTokens(Seq((1L, "a")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 4, 8)
    }: Unit
  }
}
