package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.queries.MultimodalQueries.{DctTable, MediaKernels}

/** Property pins for the exact-integer media kernels (m04/m05/m06) —
  * each judged query calls exactly these functions, and each property
  * checks them against an independently-written reference or a closed
  * mathematical invariant on arbitrary inputs. */
object MediaKernelProps extends Properties("MediaKernels") {

  // BMP code units, biased toward ASCII but exercising the full range
  private val payload: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.choose(32, 126),
    2 -> Gen.choose(0, 0xFFFF))).map(_.map(_.toChar).mkString)

  private val nonEmpty: Gen[String] = payload.suchThat(_.nonEmpty)

  property("resize: output length is min(64, n)") =
    Prop.forAll(nonEmpty) { t =>
      MediaKernels.resizeArea(t).length == math.min(64, t.length)
    }

  property("resize: n <= 64 is the identity") =
    Prop.forAll(Gen.resize(64, nonEmpty)) { t =>
      val out = MediaKernels.resizeArea(t)
      t.length > 64 ||
        out.toSeq == t.map(_.toLong).toSeq
    }

  property("resize: every sample is bounded by the input range") =
    Prop.forAll(nonEmpty) { t =>
      val out = MediaKernels.resizeArea(t)
      val lo = t.map(_.toLong).min
      val hi = t.map(_.toLong).max
      // each output is the floor of a weighted average of inputs, so it
      // sits in [min, max] (the floor cannot undershoot the integer min)
      out.forall(v => v >= lo && v <= hi)
    }

  property("resize: a constant signal resizes to itself") =
    Prop.forAll(Gen.choose(1, 500), Gen.choose(32, 0xFFFF)) { (n, c) =>
      MediaKernels.resizeArea(c.toChar.toString * n)
        .forall(_ == c.toLong)
    }

  property("resize: total area is conserved before the floor") =
    Prop.forAll(nonEmpty) { t =>
      // reference: redo the overlap accumulation naively over the full
      // (input x bucket) grid and compare pre-division sums
      val n = t.length.toLong
      val m = math.min(64L, n)
      val ref = new Array[Long](m.toInt)
      for (i <- 0 until t.length; j <- 0 until m.toInt) {
        val lo = i * m; val hi = lo + m
        val ov = math.min(hi, (j + 1) * n) - math.max(lo, j.toLong * n)
        if (ov > 0) ref(j) += ov * t.charAt(i)
      }
      // the kernel floors per bucket; reconstruct its pre-floor sums by
      // re-running the kernel arithmetic — the naive grid must agree
      // bucket-for-bucket after the same floor
      val out = MediaKernels.resizeArea(t)
      out.toSeq == ref.map(_ / n).toSeq &&
        ref.sum == m * t.map(_.toLong).sum // exact partition of the axis
    }

  property("dct bands: band 0 is exactly 1e8 x length") =
    Prop.forAll(payload) { t =>
      // T[0][x] = 10000 for all x, so D[0][0] = 1e8 x total histogram
      // mass = 1e8 x length — the DC pin that catches any table or
      // indexing slip
      MediaKernels.dctBands(t)(0) == 100000000L * t.length
    }

  property("dct bands: permutation-invariant (histogram semantics)") =
    Prop.forAll(nonEmpty, Gen.choose(1L, Long.MaxValue)) { (t, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(t.toSeq).mkString
      MediaKernels.dctBands(shuffled).toSeq == MediaKernels.dctBands(t).toSeq
    }

  property("dct coef agrees with an independent table fold") =
    Prop.forAll(payload, Gen.choose(0, 7), Gen.choose(0, 7)) { (t, u, v) =>
      val h = MediaKernels.histogram64(t)
      // reference: iterate the histogram buckets directly (b = x*8+y)
      var expect = 0L
      for (b <- 0 until 64)
        expect += DctTable(u * 8 + b / 8) * DctTable(v * 8 + b % 8) * h(b)
      MediaKernels.dctCoef(h, u, v) == expect
    }

  property("phash: bit k-1 tracks the sign of AC coefficient k") =
    Prop.forAll(payload) { t =>
      val h = MediaKernels.histogram64(t)
      val sig = MediaKernels.phash60(t)
      (1 to 60).forall { k =>
        val bit = (sig >> (k - 1)) & 1L
        bit == (if (MediaKernels.dctCoef(h, k / 8, k % 8) > 0) 1L else 0L)
      }
    }

  property("phash: only the low 60 bits are ever set") =
    Prop.forAll(payload) { t =>
      (MediaKernels.phash60(t) >>> 60) == 0L
    }

  private val bmp = graft.queries.MultimodalQueries.BmpCodec

  property("bmp: encoder emits a well-formed container") =
    Prop.forAll(payload) { t =>
      val b = bmp.encode(t)
      b(0) == 'B'.toByte && b(1) == 'M'.toByte &&
        b.length >= 14 + 40 + 1024 + 4 // headers + palette + one padded row
    }

  property("bmp: parser agrees with an independent java.nio LE reader") =
    Prop.forAll(payload) { t =>
      val b = bmp.encode(t)
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val fileSize = buf.getInt(2).toLong & 0xFFFFFFFFL
      val dataOffset = buf.getInt(10).toLong & 0xFFFFFFFFL
      val w = buf.getInt(18).toLong & 0xFFFFFFFFL
      val h = buf.getInt(22).toLong & 0xFFFFFFFFL
      val bpp = buf.getShort(28).toLong & 0xFFFFL
      val rowSize = (w + 3L) & ~3L
      val top = (dataOffset + (h - 1) * rowSize).toInt
      val row0 = (0 until w.toInt).map(c => b(top + c) & 0xffL)
      val m = bmp.decode(b)
      m.n_bytes == fileSize && fileSize == b.length &&
        m.width == w && m.height == h && m.bpp == bpp &&
        m.first_pixel == (if (w > 0) row0.head else 0L) &&
        m.row0_sum == row0.sum
    }

  property("bmp: the decoded top row is the payload's first image row") =
    Prop.forAll(nonEmpty) { t =>
      val m = bmp.decode(bmp.encode(t))
      val expect = t.take(m.width.toInt).map(c => (c % 256).toLong)
      m.first_pixel == expect.head && m.row0_sum == expect.sum &&
        m.width * m.height >= t.length && m.bpp == 8L
    }

  property("bmp: the decoded pixel plane is the payload grid, zero-padded") =
    Prop.forAll(payload) { t =>
      val m = bmp.decode(bmp.encode(t))
      val px = bmp.decodePixels(bmp.encode(t))
      px.length == m.width * m.height &&
        px.toSeq == (0 until px.length).map(i =>
          if (i < t.length) (t.charAt(i) % 256).toLong else 0L)
    }

  property("bmp: a truncated pixel array fails validation, never AIOOBE") =
    Prop.forAll(nonEmpty) { t =>
      val b = bmp.encode(t)
      val cut = java.util.Arrays.copyOf(b, b.length - 1)
      Prop.throws(classOf[IllegalArgumentException])(bmp.decode(cut))
    }

  private val avi = graft.queries.MultimodalQueries.AviCodec

  property("avi: encoder emits a well-formed RIFF container") =
    Prop.forAll(payload) { t =>
      val b = avi.encode(t)
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      new String(b, 0, 4, "ISO-8859-1") == "RIFF" &&
        new String(b, 8, 4, "ISO-8859-1") == "AVI " &&
        8L + (buf.getInt(4).toLong & 0xFFFFFFFFL) == b.length
    }

  property("avi: walker agrees with an independent java.nio LE reader") =
    Prop.forAll(payload) { t =>
      // independent path: the encoder's layout is fixed, so every field
      // sits at a CLOSED-FORM offset — read them there with a ByteBuffer
      // (no chunk walking) and require the walker to land on the same
      // values through the chunk stream.
      val b = avi.encode(t)
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val total = buf.getInt(48).toLong & 0xFFFFFFFFL   // avih dwTotalFrames
      val w = buf.getInt(64).toLong & 0xFFFFFFFFL       // avih dwWidth
      val h = buf.getInt(68).toLong & 0xFFFFFFFFL       // avih dwHeight
      val idx1 = 224 + total.toInt * 24
      val entries = (0 until total.toInt).map { e =>
        (buf.getInt(idx1 + 8 + e * 16 + 8).toLong & 0xFFFFFFFFL,
          buf.getInt(idx1 + 8 + e * 16 + 12).toLong & 0xFFFFFFFFL)
      }
      val m = avi.decode(b)
      m.n_frames == total && m.width == w && m.height == h &&
        m.movi_pos == 220L && m.frames.toSeq == entries
    }

  property("avi: sampled frame bytes are the payload, through the index") =
    Prop.forAll(nonEmpty) { t =>
      val b = avi.encode(t)
      val m = avi.decode(b)
      m.n_frames == math.max(1, (t.length + 15) / 16) &&
        (0 until m.n_frames.toInt).forall { f =>
          val data = avi.frameDataAt(b, m, f)
          (0 until 16).forall { i =>
            val p = f * 16 + i
            (b(data + i) & 0xff) ==
              (if (p < t.length) t.charAt(p) % 256 else 0)
          }
        }
    }

  property("avi: a corrupted frame count fails the avih/strh/idx1 cross-check") =
    Prop.forAll(nonEmpty) { t =>
      val b = avi.encode(t)
      b(48) = ((b(48) & 0xff) ^ 1).toByte // flip a bit in avih dwTotalFrames
      Prop.throws(classOf[IllegalArgumentException])(avi.decode(b))
    }

  property("resize kernel: the string form equals the value-array form") =
    Prop.forAll(nonEmpty) { t =>
      MediaKernels.resizeArea(t).toSeq ==
        MediaKernels.resizeArea(t.map(_.toLong).toArray).toSeq
    }

  property("m07 composition: DC band is 1e8 x the resized-plane mass") =
    Prop.forAll(payload) { t =>
      val px = bmp.decodePixels(bmp.encode(t))
      val img = java.util.Arrays.copyOf(MediaKernels.resizeArea(px), 64)
      MediaKernels.dctBandsOf(img)(0) == 100000000L * img.sum &&
        (MediaKernels.phash60Of(img) >>> 60) == 0L
    }

  private val wav = graft.queries.MultimodalQueries.WavCodec

  property("wav: encoder emits a well-formed RIFF container") =
    Prop.forAll(payload) { t =>
      val b = wav.encode(t)
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      new String(b, 0, 4, "ISO-8859-1") == "RIFF" &&
        new String(b, 8, 4, "ISO-8859-1") == "WAVE" &&
        8L + (buf.getInt(4).toLong & 0xFFFFFFFFL) == b.length
    }

  property("wav: walker agrees with an independent java.nio LE reader") =
    Prop.forAll(payload) { t =>
      // independent path: the canonical 44-byte header puts every field
      // at a CLOSED-FORM offset — read them there with a ByteBuffer (no
      // chunk walking) and require the walker to land on the same values
      // through the chunk stream.
      val b = wav.encode(t)
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rate = buf.getInt(24).toLong & 0xFFFFFFFFL
      val n = (buf.getInt(40).toLong & 0xFFFFFFFFL) / 2
      val m = wav.decode(b)
      m.sample_rate == rate && m.n_samples == n && m.bits == 16L &&
        m.samples.indices.forall(k => m.samples(k) == buf.getShort(44 + 2 * k).toInt)
    }

  property("wav: parsed samples are the payload waveform") =
    Prop.forAll(payload) { t =>
      val m = wav.decode(wav.encode(t))
      m.n_samples == math.max(1, t.length) &&
        m.samples.indices.forall(k => m.samples(k) == wav.sampleAt(t, k))
    }

  property("wav: a corrupted byteRate fails the fmt cross-check") =
    Prop.forAll(payload) { t =>
      val b = wav.encode(t)
      b(28) = ((b(28) & 0xff) ^ 1).toByte // flip a bit in nAvgBytesPerSec
      Prop.throws(classOf[IllegalArgumentException])(wav.decode(b))
    }

  property("wav: frame features match a brute-force reference") =
    Prop.forAll(payload) { t =>
      val m = wav.decode(wav.encode(t))
      val n = math.max(1, t.length)
      val ref = (0 until n).map(wav.sampleAt(t, _)).grouped(wav.FrameLen).map { fr =>
        val en = fr.map(s => s.toLong * s).sum
        val zc = fr.sliding(2).count(p => p.length == 2 && p(0).toLong * p(1) < 0L)
        (en, zc.toLong)
      }.toSeq
      m.samples.length == n && wav.frameFeatures(m).toSeq == ref
    }

  private val png = graft.queries.MultimodalQueries.PngCodec

  /** The formula plane every PNG property checks against: pixel i of the
    * w×h grid is payload code unit i mod 256, zero-padded. */
  private def pngPlane(t: String): (Int, Int, Seq[Int]) = {
    val n = t.length
    val w = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val h = math.max(1, (n + w - 1) / w)
    (w, h, (0 until w * h).map(i => if (i < n) t.charAt(i) % 256 else 0))
  }

  property("png: round-trip through deflate + all five filters is exact") =
    Prop.forAll(payload) { t =>
      val (w, h, plane) = pngPlane(t)
      val m = png.decode(png.encode(t))
      m.width == w && m.height == h && m.bit_depth == 8L &&
        m.color_type == 0L && m.n_chunks == 3L &&
        m.raw_len == h.toLong * (w + 1) && m.pixels.toSeq == plane
    }

  property("png: ImageIO (independent decoder) reads our encoder's output") =
    Prop.forAll(payload) { t =>
      val (w, h, plane) = pngPlane(t)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png.encode(t)))
      img.getWidth == w && img.getHeight == h &&
        (0 until w * h).forall { i =>
          img.getRaster.getSample(i % w, i / w, 0) == plane(i)
        }
    }

  property("png: our decoder reads ImageIO's (independent encoder) output") =
    Prop.forAll(payload) { t =>
      val (w, h, plane) = pngPlane(t)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      plane.indices.foreach(i => img.getRaster.setSample(i % w, i / w, 0, plane(i)))
      val os = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", os)
      val m = png.decode(os.toByteArray)
      // ImageIO picks its own filters/chunking — the decoded plane must
      // still be exact, and chunk count is whatever the foreign encoder
      // emitted (>= 3)
      m.width == w && m.height == h && m.n_chunks >= 3L &&
        m.pixels.toSeq == plane
    }

  property("png: a corrupted IDAT byte fails the CRC check, never decodes") =
    Prop.forAll(nonEmpty) { t =>
      val b = png.encode(t)
      // last IDAT data byte: 12 (IEND) + 4 (IDAT crc) + 1 from the end
      b(b.length - 17) = ((b(b.length - 17) & 0xff) ^ 0x40).toByte
      Prop.throws(classOf[IllegalArgumentException])(png.decode(b))
    }

  property("png: a truncated stream fails validation, never AIOOBE") =
    Prop.forAll(nonEmpty) { t =>
      val b = png.encode(t)
      val cut = java.util.Arrays.copyOf(b, b.length - 13) // into the IDAT crc
      Prop.throws(classOf[IllegalArgumentException])(png.decode(cut))
    }

  property("png and bmp decode to the identical pixel plane (m07 ≡ m10 front-end)") =
    Prop.forAll(payload) { t =>
      // the m10 pipeline's compressed front-end must reconstruct exactly
      // the plane the m07 BMP walk reads — this is what lets the two
      // judged pipeline entries share one closed-form oracle
      val viaPng = png.decode(png.encode(t)).pixels.map(_.toLong).toSeq
      val viaBmp = bmp.decodePixels(bmp.encode(t)).toSeq
      viaPng == viaBmp
    }
}
