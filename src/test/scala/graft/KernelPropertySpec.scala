package graft

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.TranscriptGen.mix
import graft.functions.{ScoredId, TopKByScore}
import graft.ops.{Bpe, Multimodal}

/** Property tests over the pure kernels (deterministic splitmix-seeded
  * case generation — same coverage intent as ScalaCheck, zero framework
  * surface). No SparkSession needed: these are the driver-side laws the
  * distributed operators rely on.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def rnd(seed: Long): Iterator[Long] =
    Iterator.iterate(mix(seed))(mix)

  // -------------------------------------------------------------- TopKByScore

  test("TopKByScore == sort-take-k under random values, groupings and merge orders") {
    for (case_ <- 0 until 300) {
      val r = rnd(1000 + case_)
      val n = (r.next() & 0x3f).toInt // 0..63
      val k = 1 + (r.next() & 0x7).toInt // 1..8
      // duplicate cos values on purpose: ties must break by vec_id asc
      val xs = (0 until n).map { i =>
        ScoredId(((r.next() & 0xf).toInt) / 8.0, i.toLong)
      }
      val agg = TopKByScore(k)
      // random partition into buffers (simulating tasks), then merge
      val nBufs = 1 + (r.next() & 0x3).toInt
      val bufs = Array.fill(nBufs)(agg.zero)
      xs.foreach { x =>
        val i = (r.next() & 0x7fffffff).toInt % nBufs
        bufs(i) = agg.reduce(bufs(i), x)
      }
      val merged = bufs.reduceLeft(agg.merge)
      val got = agg.finish(merged)
      val want = xs.sortBy(s => (-s.cos, s.vec_id)).take(k)
      assert(got == want, s"case $case_: got $got want $want")
    }
  }

  // ------------------------------------------------------------ BMP/WAV codec

  test("BMP encode/decode roundtrip over random geometries (padding law)") {
    for (case_ <- 0 until 100) {
      val r = rnd(2000 + case_)
      val w = 1 + (r.next() & 0xf).toInt // 1..16 — strides 3..48, all pad cases
      val h = 1 + (r.next() & 0x7).toInt
      val pix = Array.tabulate[Byte](w * h * 3)(i => (r.next() >>> (i % 56)).toByte)
      val Some((dw, dh, got)) = Multimodal.decodeBmp(Multimodal.bmpFile(w, h, pix))
      assert((dw, dh) == (w, h) && got.toSeq == pix.toSeq, s"case $case_ w=$w h=$h")
    }
  }

  test("PNG encode → ImageIO decode roundtrip over random geometries") {
    // Our stored-deflate encoder, the JDK's REAL PNG pipeline decoding it:
    // any error in scanline filtering, zlib framing, CRC/Adler, or the
    // RGB stream order shows up as a pixel mismatch here.
    for (case_ <- 0 until 100) {
      val r = rnd(4000 + case_)
      val w = 1 + (r.next() & 0xf).toInt
      val h = 1 + (r.next() & 0x7).toInt
      val pix = Array.tabulate[Byte](w * h * 3)(i => (r.next() >>> (i % 56)).toByte)
      val Some((dw, dh, got)) = Multimodal.decodeImage(Multimodal.pngFile(w, h, pix))
      assert((dw, dh) == (w, h) && got.toSeq == pix.toSeq, s"case $case_ w=$w h=$h")
      assert(Multimodal.pngFile(w, h, pix).length == Multimodal.pngFileLength(w, h))
    }
  }

  test("PNG stored-deflate block split: >64KiB raw crosses a block boundary intact") {
    // 150x150 RGB: raw scanlines = 150*(1+450) = 67,650 bytes -> TWO
    // stored blocks; the split must land mid-stream without corrupting
    // the inflate. (Every synthesized fixture is single-block, so this
    // path is otherwise unexercised.)
    val (w, h) = (150, 150)
    val r = rnd(5000)
    val pix = Array.tabulate[Byte](w * h * 3)(i => (r.next() >>> (i % 56)).toByte)
    val file = Multimodal.pngFile(w, h, pix)
    assert(file.length == Multimodal.pngFileLength(w, h))
    val Some((dw, dh, got)) = Multimodal.decodeImage(file)
    assert((dw, dh) == (w, h))
    assert(java.util.Arrays.equals(got, pix))
  }

  test("WAV encode/decode roundtrip incl. extreme samples") {
    for (case_ <- 0 until 100) {
      val r = rnd(3000 + case_)
      val n = (r.next() & 0x7f).toInt
      val samples = Array.tabulate[Short](n) { k =>
        (r.next() & 0x3) match {
          case 0 => Short.MinValue
          case 1 => Short.MaxValue
          case _ => (r.next() & 0xffff).toShort
        }
      }
      val data = new Array[Byte](2 * n)
      samples.zipWithIndex.foreach { case (s, k) =>
        data(2 * k) = s.toByte; data(2 * k + 1) = (s >> 8).toByte
      }
      assert(Multimodal.decodeWav(Multimodal.wavFile(data)).get.toSeq == samples.toSeq)
    }
  }

  // --------------------------------------------------------------------- BPE

  test("incremental BPE trainer emits the SAME merge sequence as a naive recount") {
    // reference: recount every adjacent pair of every word per iteration
    // (the pre-optimization formulation, verbatim)
    def naive(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
      def mergeOnce(syms: Array[String], m: (String, String)): Array[String] = {
        val out = ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toArray
      }
      var words: Array[(Array[String], Long)] = wordCounts.map { case (w, n) =>
        ((w.map(_.toString) :+ Bpe.EndOfWord).toArray, n)
      }.toArray
      val merges = ArrayBuffer.empty[(String, String)]
      var it = 0
      var exhausted = false
      while (it < numMerges && !exhausted) {
        val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        for ((syms, n) <- words; i <- 0 until syms.length - 1)
          pairCounts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + n))
        if (pairCounts.isEmpty) exhausted = true
        else {
          val best = pairCounts.maxBy { case (p, c) => (c, p) }._1
          merges += best
          words = words.map { case (syms, n) => (mergeOnce(syms, best), n) }
        }
        it += 1
      }
      merges.toSeq
    }
    for (case_ <- 0 until 80) {
      val r = rnd(7000 + case_)
      val alphabet = "abcd"
      def word() = {
        val len = 1 + (r.next() & 0x7).toInt
        (0 until len).map(_ => alphabet((r.next() & 0x7fffffff).toInt % 4)).mkString
      }
      val counts = (0 until (2 + (r.next() & 0xf).toInt))
        .map(_ => word() -> (1L + (r.next() & 0xf)))
        .groupBy(_._1).map { case (w, ws) => w -> ws.map(_._2).sum }.toSeq.sortBy(_._1)
      val m = 1 + (r.next() & 0x1f).toInt
      assert(Bpe.trainFromCounts(counts, m) == naive(counts, m), s"case $case_")
    }
  }

  test("BPE laws on random corpora: roundtrip, replay, monotone under merge prefix") {
    for (case_ <- 0 until 60) {
      val r = rnd(4000 + case_)
      val alphabet = "abc"
      def word() = {
        val len = 1 + (r.next() & 0x7).toInt
        (0 until len).map(_ => alphabet((r.next() & 0x7fffffff).toInt % 3)).mkString
      }
      val counts = (0 until (2 + (r.next() & 0x7).toInt))
        .map(_ => word() -> (1L + (r.next() & 0xf)))
        .groupBy(_._1).map { case (w, ws) => w -> ws.map(_._2).sum }.toSeq.sortBy(_._1)
      val merges = Bpe.trainFromCounts(counts, numMerges = 12)
      val ranks = merges.zipWithIndex.toMap
      val probes = counts.map(_._1) ++ Seq(word(), word())
      probes.foreach { w =>
        val toks = Bpe.encodeWord(w, ranks)
        assert(toks.mkString == w + Bpe.EndOfWord, s"case $case_: $w → $toks")
        // monotone: any merge-prefix yields >= tokens
        for (p <- 0 to merges.length) {
          val rp = merges.take(p).zipWithIndex.toMap
          assert(Bpe.encodeWord(w, rp).length >= toks.length)
        }
      }
    }
  }
}
