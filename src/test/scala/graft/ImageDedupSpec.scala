package graft

import org.apache.spark.sql.functions._

import graft.functions.{Functional, Kernels}
import graft.operators.{Dedup, Multimodal}

/** Content-level image dedup: dHash invariances on real PNG
  * encode/decode roundtrips (brightness shift, pixel-replication
  * upscale, local perturbation), decode-failure contracts, and the
  * banded Hamming join surfacing planted near-dups (q289/q290 certify
  * the same signatures and pair set against a DuckDB pixel-arithmetic
  * restatement). */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private val W = 18
  private val H = 16
  private def png(g: Array[Int], w: Int = W, h: Int = H): Array[Byte] =
    Multimodal.encodeGrayPng(g, w, h)
  private val base = Multimodal.synthGray(7L, W, H, seed = 1019L)

  test("dhash64 is invariant to uniform brightness and to 2x " +
      "pixel-replication upscale; a local perturbation moves <= 1 bit") {
    val h0 = Kernels.dhash64(png(base))
    assert(h0 === Kernels.dhash64(png(base.map(_ + 5))),
      "+5 brightness must not move a gradient hash (clamp-free range)")
    val up = Array.tabulate(2 * W * 2 * H) { p =>
      val x = p % (2 * W); val y = p / (2 * W)
      base((y / 2) * W + (x / 2))
    }
    assert(h0 === Kernels.dhash64(png(up, 2 * W, 2 * H)),
      "pixel replication preserves every box average exactly")
    val pert = base.zipWithIndex.map { case (g, p) =>
      if (p % W < 2 && p / W < 2) 255 else g
    }
    val d = Kernels.hamming64(h0, Kernels.dhash64(png(pert)))
    assert(d <= 1, s"corner-cell perturbation moved $d bits (max 1)")
    // a DIFFERENT image must be far away: 64 iid-ish gradient bits
    val other = Multimodal.synthGray(8L, W, H, seed = 1019L)
    assert(Kernels.hamming64(h0, Kernels.dhash64(png(other))) > 3,
      "distinct noise images must not collide within the dedup radius")
  }

  test("dhash64 raises on undecodable bytes and on sub-grid images") {
    assert(intercept[IllegalArgumentException] {
      Kernels.dhash64(Array[Byte](1, 2, 3, 4))
    }.getMessage.contains("not a decodable image"))
    val tiny = Multimodal.encodeGrayPng(Array.fill(8 * 8)(100), 8, 8)
    assert(intercept[IllegalArgumentException] {
      Kernels.dhash64(tiny)
    }.getMessage.contains("9x8"))
  }

  test("hammingPairs surfaces planted near-dups and verifies with " +
      "exact Hamming") {
    val sigs = Seq(
      (1L, Kernels.dhash64(png(base))),
      (2L, Kernels.dhash64(png(base.map(_ + 5)))),
      (3L, Kernels.dhash64(png(Multimodal.synthGray(99L, W, H, 1019L)))))
      .toDF("doc_id", "dhash")
    val got = Dedup.hammingPairs(sigs, "doc_id", "dhash").collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("id_a") === 1L &&
      got.head.getAs[Long]("id_b") === 2L &&
      got.head.getAs[Int]("hamming") === 0 &&
      got.head.getAs[Long]("dropped_candidates") === 0L)
  }

  test("kernel dhash agrees with an in-JVM pixel-arithmetic model " +
      "(the q289 oracle's derivation), certifying the PNG roundtrip") {
    def model(g: Array[Int], w: Int, h: Int): Long = {
      val sum = Array.fill(72)(0L); val cnt = Array.fill(72)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val c = (y * 8 / h) * 9 + (x * 9 / w)
        sum(c) += g(y * w + x); cnt(c) += 1
      }
      var out = 0L
      for (r <- 0 until 8; c <- 0 until 8) {
        if (sum(r * 9 + c) / cnt(r * 9 + c) <
            sum(r * 9 + c + 1) / cnt(r * 9 + c + 1))
          out |= 1L << (63 - (r * 8 + c))
      }
      out
    }
    for (seed <- Seq(3L, 4L, 5L)) {
      val g = Multimodal.synthGray(seed, W, H, 1019L)
      assert(Kernels.dhash64(png(g)) === model(g, W, H),
        s"decoded-pixel dhash diverged from the generator model (seed $seed)")
    }
  }

  test("round-21 fast PNG encode and decode paths are pixel-identical " +
      "to the ImageIO reference on both encoders' bytes") {
    // the pre-round-21 reference pair: BufferedImage + ImageIO.write
    // encoder, ImageIO.read + getRGB + luma-grid decoder — kept here
    // verbatim so the spec-level writer (Multimodal.encodeGrayPng) and
    // the direct PNG decode path inside Kernels.dhash64 stay pinned to
    // the exact behavior they replaced
    def imageioPng(g: Array[Int], w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < g.length) {
        val v = g(p)
        img.setRGB(p % w, p / w, (v << 16) | (v << 8) | v)
        p += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def imageioDhash(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val sum = Array.fill(72)(0L); val cnt = Array.fill(72)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val gray = (299L * ((rgb >> 16) & 0xff) +
          587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
        sum((y * 8 / h) * 9 + (x * 9 / w)) += gray
        cnt((y * 8 / h) * 9 + (x * 9 / w)) += 1
      }
      var out = 0L
      for (r <- 0 until 8; c <- 0 until 8) {
        if (sum(r * 9 + c) / cnt(r * 9 + c) <
            sum(r * 9 + c + 1) / cnt(r * 9 + c + 1))
          out |= 1L << (63 - (r * 8 + c))
      }
      out
    }
    val rnd = new scala.util.Random(42)
    for ((w, h) <- Seq((9, 8), (18, 16), (36, 32), (23, 17), (64, 41))) {
      val g = Array.fill(w * h)(rnd.nextInt(256))
      val fastBytes = Multimodal.encodeGrayPng(g, w, h)
      val refBytes = imageioPng(g, w, h)
      val expected = imageioDhash(refBytes)
      assert(imageioDhash(fastBytes) === expected,
        s"spec-level encoder changed decoded pixels (${w}x$h)")
      assert(Kernels.dhash64(fastBytes) === expected,
        s"fast decode of the spec-level encoding diverged (${w}x$h)")
      assert(Kernels.dhash64(refBytes) === expected,
        s"fast decode of ImageIO-encoded bytes diverged (${w}x$h)")
    }
    // gradient images drive the JDK encoder toward non-trivial row
    // filters (Sub/Up/Average/Paeth) — exercise the unfilter paths
    for ((w, h) <- Seq((18, 16), (40, 30))) {
      val g = Array.tabulate(w * h)(p => ((p % w) * 3 + (p / w) * 7) % 256)
      val refBytes = imageioPng(g, w, h)
      assert(Kernels.dhash64(refBytes) === imageioDhash(refBytes),
        s"fast decode diverged on filtered scanlines (${w}x$h)")
    }
  }

  test("audioFp64: invariant to exact half gain and 2x upsample; a " +
      "frame burst moves <= 1 bit; contracts raise") {
    val base = Multimodal.synthPcm16(7L, 260, seed = 2027L)
    def wav(s: Array[Short]) = Multimodal.encodePcm16Wav(s)
    val h0 = Kernels.audioFp64(wav(base))
    assert(h0 === Kernels.audioFp64(wav(base.map(v => (v / 2).toShort))),
      "half gain on even samples must not move an energy-gradient hash")
    assert(h0 === Kernels.audioFp64(wav(
      Array.tabulate(520)(i => base(i / 2)))),
      "sample duplication doubles every aligned frame energy")
    val burst = base.zipWithIndex.map { case (v, i) =>
      if (i < 4) 16382.toShort else v
    }
    assert(Kernels.hamming64(h0, Kernels.audioFp64(wav(burst))) <= 1)
    val other = Multimodal.synthPcm16(8L, 260, seed = 2027L)
    assert(Kernels.hamming64(h0, Kernels.audioFp64(wav(other))) > 3,
      "distinct noise clips must not collide within the dedup radius")
    assert(intercept[IllegalArgumentException] {
      Kernels.audioFp64(Array[Byte](1, 2, 3))
    }.getMessage.contains("not a RIFF/WAVE"))
    assert(intercept[IllegalArgumentException] {
      Kernels.audioFp64(wav(Array.fill[Short](32)(0)))
    }.getMessage.contains("65-frame"))
    // an unsupported depth (32-bit) raises rather than hashing garbage
    // (synthesizeWavBlob seed 3<<20 derives bits = 32)
    assert(intercept[IllegalArgumentException] {
      Kernels.audioFp64(Multimodal.synthesizeWavBlob(3L << 20))
    }.getMessage.contains("8/16/24-bit"))
    // a negative declared chunk size must raise, not wedge the walk
    val evil = Multimodal.encodePcm16Wav(base)
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte // fmt size = -8
    assert(intercept[IllegalArgumentException] {
      Kernels.audioFp64(evil)
    }.getMessage.contains("negative RIFF chunk size"))
  }

  test("audioFp64 production shapes: stereo 24-bit downmixes by channel " +
      "sum (swap-invariant, half-gain-invariant); 8-bit recenters at " +
      "-128; mono-16 behavior is unchanged") {
    val fr = Multimodal.synthPcm24Stereo(7L, 260, seed = 2027L)
    def wav24(f: Array[Array[Int]]) = Multimodal.encodePcmWav(f, 2, 24)
    val h0 = Kernels.audioFp64(wav24(fr))
    // channel swap leaves every frame's channel sum untouched
    assert(h0 === Kernels.audioFp64(wav24(fr.map(_.reverse))))
    // half gain on even samples is exact in both channels
    assert(h0 === Kernels.audioFp64(wav24(fr.map(_.map(_ / 2)))))
    // a different clip lands outside the dedup radius
    val other = Multimodal.synthPcm24Stereo(8L, 260, seed = 2027L)
    assert(Kernels.hamming64(h0, Kernels.audioFp64(wav24(other))) > 3)
    // 8-bit mono: recentered values reproduce the signed-model hash
    val small = Array.tabulate(130)(i => (i % 97) - 48)
    val h8 = Kernels.audioFp64(
      Multimodal.encodePcmWav(small.map(Array(_)), 1, 8))
    val h16 = Kernels.audioFp64(
      Multimodal.encodePcmWav(small.map(Array(_)), 1, 16))
    assert(h8 === h16,
      "the same centered values must hash identically at 8 and 16 bit")
    // mono-16 via the generic encoder == the dedicated encoder
    val b16 = Multimodal.synthPcm16(7L, 260, seed = 2027L)
    assert(Kernels.audioFp64(Multimodal.encodePcm16Wav(b16)) ===
      Kernels.audioFp64(
        Multimodal.encodePcmWav(b16.map(s => Array(s.toInt)), 1, 16)))
    // WAVE_FORMAT_EXTENSIBLE wrapping of the same samples is a
    // container detail, not a content change
    assert(h0 === Kernels.audioFp64(
      Multimodal.encodePcmWav(fr, 2, 24, extensible = true)))
    // a non-PCM SubFormat must still raise
    val ext = Multimodal.encodePcmWav(fr, 2, 24, extensible = true)
    ext(44) = 3 // SubFormat code -> IEEE float
    assert(intercept[IllegalArgumentException] {
      Kernels.audioFp64(ext)
    }.getMessage.contains("subFormat=3"))
  }

  test("hammingStoreCandidates equals hammingPairs' cross-pair subset " +
      "and only emits store-x-fresh pairs") {
    import graft.functions.Kernels
    def sig(rows: Seq[(Long, Long)]) = rows.toDF("doc_id", "sh")
    val h0 = Kernels.dhash64(png(base))
    val all = Seq(1L -> h0, 2L -> (h0 ^ 1L), 3L -> ~h0,
      10L -> h0, 11L -> (h0 ^ 3L))
    val store = sig(all.filter(_._1 < 10))
    val fresh = sig(all.filter(_._1 >= 10))
    val got = Dedup.hammingStoreCandidates(store, fresh, "doc_id", "sh")
      .distinct().collect().toSeq
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).sorted
    val ref = Dedup.hammingPairs(sig(all), "doc_id", "sh")
      .collect().toSeq
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
      .filter { case (a, b, _) => a < 10 && b >= 10 }.sorted
    assert(got === ref)
    assert(got.contains((1L, 10L, 0)) && got.contains((2L, 10L, 1)))
    assert(got.forall { case (a, b, _) => a < 10 && b >= 10 })
  }

  test("videoFrameHashes: real stsz/stco sample-table walk recovers " +
      "every frame's dhash; malformed containers raise") {
    val frames = (0 until 3).map(f =>
      png(Multimodal.synthGray(100L + f, W, H, 3037L)))
    val mp4 = Multimodal.synthesizeMp4WithFrames(frames)
    val got = {
      val a = Kernels.videoFrameHashes(mp4)
      (0 until a.numElements()).map(a.getLong)
    }
    assert(got === frames.map(Kernels.dhash64),
      "sample-table slicing must hand each frame's exact bytes to dhash")
    assert(intercept[IllegalArgumentException] {
      Kernels.videoFrameHashes(Array[Byte](0, 0, 0, 1))
    }.getMessage.contains("ISO-BMFF"))
    // a valid ftyp+moov WITHOUT a sample table (the header-only synth)
    assert(intercept[IllegalArgumentException] {
      Kernels.videoFrameHashes(Multimodal.synthesizeMp4Blob(5L))
    }.getMessage.contains("stbl"))
    // truncated mdat: the table promises more bytes than the stream has
    val cut = mp4.take(mp4.length - frames.last.length / 2)
    assert(intercept[IllegalArgumentException] {
      Kernels.videoFrameHashes(cut.toArray)
    }.getMessage.contains("overruns"))
  }

  test("videoFrameHashes production shapes: stsc multi-chunk layouts " +
      "(stco and co64) with inter-chunk padding recover the same frame " +
      "hashes as the single-chunk container; corrupt tables raise") {
    val frames = (0 until 6).map(f =>
      png(Multimodal.synthGray(200L + f, W, H, 3037L)))
    val want = frames.map(Kernels.dhash64)
    def hashes(b: Array[Byte]) = {
      val a = Kernels.videoFrameHashes(b)
      (0 until a.numElements()).map(a.getLong)
    }
    // uneven chunks exercising run-length stsc expansion, 32-bit stco
    assert(hashes(Multimodal.synthesizeMp4MultiChunk(
      frames, Seq(1, 3, 2), useCo64 = false)) === want)
    // equal chunks collapsing to ONE stsc entry, 64-bit co64, big pad
    assert(hashes(Multimodal.synthesizeMp4MultiChunk(
      frames, Seq(2, 2, 2), useCo64 = true, pad = 33)) === want)
    // one chunk WITH an explicit stsc also walks
    assert(hashes(Multimodal.synthesizeMp4MultiChunk(
      frames, Seq(6), useCo64 = false, pad = 0)) === want)
    // multi-chunk WITHOUT stsc must raise, not guess the layout
    val noStsc = Multimodal.synthesizeMp4MultiChunk(
      frames, Seq(3, 3), useCo64 = false)
    // surgically blank the stsc box name so findBox misses it
    val idx = noStsc.indexOfSlice("stsc".getBytes("US-ASCII"))
    assert(idx > 0)
    val mutated = noStsc.clone()
    mutated(idx) = 'f'.toByte // now a "ftsc" box: skipped, still walks
    assert(intercept[IllegalArgumentException] {
      Kernels.videoFrameHashes(mutated)
    }.getMessage.contains("no stsc"))
    // an absurd stsz sample count must raise BEFORE allocating
    val big = Multimodal.synthesizeMp4WithFrames(frames)
    val szIdx = big.indexOfSlice("stsz".getBytes("US-ASCII"))
    val corrupt = big.clone()
    corrupt(szIdx + 12) = 0x7f.toByte // sample_count -> ~2^31
    assert(intercept[IllegalArgumentException] {
      Kernels.videoFrameHashes(corrupt)
    }.getMessage.contains("outside the box/stream extent"))
    // multi-trak: a 'soun' trak BEFORE the video trak must be skipped
    // by handler type, not grabbed positionally
    assert(hashes(Multimodal.synthesizeMp4MultiTrak(frames)) === want)
  }

  test("fingerprintOverlap dedups within-id fingerprints so a repeated " +
      "frame cannot inflate a pair's shared count") {
    import org.apache.spark.sql.functions.col
    val fps = Seq((1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 30L)).toDF("id", "fp")
    val got = graft.operators.Dedup
      .fingerprintOverlap(fps, "id", "fp", minShared = 1)
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("shared_fps") === 1L,
      "fp 10 appears twice in id 1 but must count once")
  }

  test("dhash64 runs as a codegen'd column over a blob frame") {
    val df = Seq((1L, png(base)), (2L, png(base.map(_ + 5))))
      .toDF("doc_id", "blob")
      .select($"doc_id", Functional.dhash64($"blob").as("dh"))
    val rows = df.collect().map(r => r.getAs[Long]("dh")).distinct
    assert(rows.length === 1, "brightness twin must hash identically")
  }

  test("fingerprintStoreCandidates equals fingerprintOverlap's " +
      "store-x-fresh subset after the sink's merge step and never " +
      "emits self-pairs") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = Seq( // store ids < 10, fresh >= 10; id 5 on BOTH sides
      (1L, 10L), (1L, 20L), (2L, 10L), (5L, 30L),
      (10L, 10L), (10L, 20L), (11L, 10L), (5L, 30L))
    val fps = rows.toDF("id", "fp")
    val store = fps.where(col("id") < 10)
    val fresh = fps.where(col("id") >= 10)
      .unionByName(Seq((5L, 30L)).toDF("id", "fp")) // self on fresh side
    val got = graft.operators.Dedup
      .fingerprintStoreCandidates(store, fresh, "id", "fp")
      .groupBy("id_a", "id_b")
      .agg(countDistinct(col("fp")).as("shared"))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("shared"))).toSeq.sorted
    assert(got === Seq((1L, 10L, 2L), (1L, 11L, 1L), (2L, 10L, 1L),
      (2L, 11L, 1L)),
      "store x fresh shared counts (and no 5-5 self-pair)")
  }

  test("frameRunOverlap: longest aligned contiguous run separates a " +
      "temporal clone from a reordered cut with the same frame set") {
    val frames = Seq( // video 1: A B C D
      (1L, 0L, 100L), (1L, 1L, 200L), (1L, 2L, 300L), (1L, 3L, 400L),
      // video 2: exact clone -> shared 4, run 4
      (2L, 0L, 100L), (2L, 1L, 200L), (2L, 2L, 300L), (2L, 3L, 400L),
      // video 3: reversed -> shared 4, run 1
      (3L, 0L, 400L), (3L, 1L, 300L), (3L, 2L, 200L), (3L, 3L, 100L),
      // video 4: B C shifted left by one -> shared 2, run 2
      (4L, 0L, 200L), (4L, 1L, 300L), (4L, 2L, 999L), (4L, 3L, 888L))
      .toDF("id", "idx", "fp")
    val got = graft.operators.Dedup
      .frameRunOverlap(frames, "id", "idx", "fp", minShared = 1)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("shared_fps"), r.getAs[Long]("lcr"))).toSeq.sorted
    assert(got === Seq(
      (1L, 2L, 4L, 4L), (1L, 3L, 4L, 1L), (1L, 4L, 2L, 2L),
      (2L, 3L, 4L, 1L), (2L, 4L, 2L, 2L), (3L, 4L, 2L, 1L)))
  }
}
