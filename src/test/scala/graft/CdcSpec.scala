package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.CdcChunk
import graft.operators.Multimodal

/** Content-defined chunking: the properties that make chunk-level dedup
  * work (exact tiling, bounded lengths, determinism, shift
  * re-alignment), plus the m12 accounting invariants. */
class CdcSpec extends SparkSuite {

  private def sample[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val byteArrays: Gen[Array[Byte]] =
    Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127)
        .map(_.toByte)))

  test("chunks tile the payload exactly with bounded lengths") {
    sample(byteArrays) { data =>
      val ends = CdcChunk.cuts(data)
      val lens = ends.zip(0 +: ends.dropRight(1).toSeq).map {
        case (e, s) => e - s
      }
      assert(lens.sum == data.length)
      assert(ends.sorted.sameElements(ends))
      // every chunk except possibly the last respects [Min, Max]
      lens.dropRight(1).foreach { l =>
        assert(l >= CdcChunk.MinLen && l <= CdcChunk.MaxLen)
      }
      lens.takeRight(1).foreach(l => assert(l <= CdcChunk.MaxLen))
    }
  }

  test("identical content chunks identically; a head insertion " +
    "re-aligns the tail (the property fixed-stride chunking lacks)") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    val shifted = Array.fill[Byte](37)(rnd.nextInt().toByte) ++ base
    assert(CdcChunk.cuts(base).sameElements(CdcChunk.cuts(base)))
    def hashes(d: Array[Byte]): Seq[Long] = {
      val ends = CdcChunk.cuts(d)
      ends.zip(0 +: ends.dropRight(1).toSeq).map {
        case (e, s) => CdcChunk.fnv1a64(d, s, e)
      }.toSeq
    }
    val hb = hashes(base).toSet
    val hs = hashes(shifted)
    // everything past the first re-aligned boundary dedups against the
    // unshifted payload's chunk store
    val shared = hs.count(hb)
    assert(shared >= hs.length - 3,
      s"only $shared of ${hs.length} chunks re-aligned after the shift")
  }

  test("m13 stream chunk-store parity: replay decisions equal the " +
    "batch first-instance derivation; savings reconcile with m12") {
    val batch = Multimodal.m13StreamChunkIngest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("off")) ->
        (r.getAs[Boolean]("stored"), r.getAs[Long]("bytes_written")))
      .toMap
    val stream = graft.streaming.TwsOps.chunkReplay(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("off")) ->
        (r.getAs[Boolean]("stored"), r.getAs[Long]("bytes_written")))
      .toMap
    assert(batch == stream)
    // bytes written by the store equal m12's per-format unique bytes
    val m12 = Multimodal.m12CdcDedup(spark, sf).collect()
      .map(r => r.getAs[String]("format") ->
        r.getAs[Long]("bytes_unique")).toMap
    val written = Multimodal.m13StreamChunkIngest(spark, sf).collect()
      .groupBy(_.getAs[String]("format"))
      .map { case (f, rs) =>
        f -> rs.map(_.getAs[Long]("bytes_written")).sum
      }
    assert(written == m12)
  }

  test("m13b streaming split audit: the prefix replay's emissions " +
    "carry the raw split and first-instance decisions exactly") {
    val out = Multimodal.m13bStreamSplitAudit(spark, sf).collect()
    assert(out.nonEmpty)
    // the replay's chunks ARE the batch prefix split, byte for byte
    val want = Multimodal.m13bPrefixChunks(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("off").toLong)
        -> (r.getAs[Int]("len").toLong, r.getAs[Long]("hash"))).toMap
    val got = out.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("off")) ->
        (r.getAs[Long]("len"), r.getAs[Long]("hash"))).toMap
    assert(got == want)
    // store decisions: first (doc_id, off) instance per
    // (format, hash, len) stores its len, every later one writes 0
    val first = out
      .groupBy(r => (r.getAs[String]("format"), r.getAs[Long]("hash"),
        r.getAs[Long]("len")))
      .map { case (k, rs) => k ->
        rs.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("off")))
          .min }
    out.foreach { r =>
      val k = (r.getAs[String]("format"), r.getAs[Long]("hash"),
        r.getAs[Long]("len"))
      val isFirst =
        first(k) == ((r.getAs[Long]("doc_id"), r.getAs[Long]("off")))
      assert(r.getAs[Boolean]("stored") == isFirst)
      assert(r.getAs[Long]("bytes_written") ==
        (if (isFirst) r.getAs[Long]("len") else 0L))
    }
  }

  test("expression output matches the Scala splitter; m12 accounting " +
    "reconciles and chunking never saves less than whole-asset CAS") {
    val ch = Multimodal.m12Chunks(spark, sf)
    // spot-check one doc end-to-end through the codegen'd expression
    val doc0 = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).select("text").collect()(0)
      .getString(0).getBytes("UTF-8")
    val got = ch.filter(col("doc_id") === 0)
      .orderBy("off").collect()
      .map(r => (r.getAs[Int]("off"), r.getAs[Int]("len"),
        r.getAs[Long]("hash")))
    val ends = CdcChunk.cuts(doc0)
    val want = ends.zip(0 +: ends.dropRight(1).toSeq).map {
      case (e, s) => (s, e - s, CdcChunk.fnv1a64(doc0, s, e))
    }
    assert(got.sameElements(want))

    val out = Multimodal.m12CdcDedup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("cdc_extra_saved") >= 0L)
      assert(r.getAs[Long]("bytes_unique") <=
        r.getAs[Long]("bytes_unique_whole"))
      assert(r.getAs[Long]("n_unique_chunks") <=
        r.getAs[Long]("n_chunks"))
    }
    // chunk bytes_total equals raw payload bytes (exact tiling at
    // corpus scale)
    val rawBytes = Multimodal.media(spark, sf)
      .groupBy("format").agg(sum(col("n_bytes").cast("long")).as("b"))
      .collect().map(r => r.getAs[String]("format") ->
        r.getAs[Long]("b")).toMap
    out.foreach(r => assert(r.getAs[Long]("bytes_total") ==
      rawBytes(r.getAs[String]("format"))))
  }
}
