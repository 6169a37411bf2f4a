package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Randomized no-throw fuzz over EVERY binary-parser entry point — the
  * systematic form of round 15's hostile-input review (which found six
  * real crash defects by hand): each parser's contract is "value or
  * null, never an exception", and this spec drives that contract with
  * (a) pure random bytes, (b) valid containers with random single-byte
  * corruptions, and (c) every truncation prefix of each valid container.
  * Seeded generators, so a failure is reproducible from the printed
  * (kind, seed/index) alone.
  */
class BinaryFuzzSpec extends AnyFunSuite {

  private def parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    "image_format" -> (b => ImageHeader.format(b)),
    "image_width" -> (b => ImageHeader.width(b)),
    "image_height" -> (b => ImageHeader.height(b)),
    "wav_channels" -> (b => WavHeader.channels(b)),
    "wav_rate" -> (b => WavHeader.sampleRate(b)),
    "wav_duration" -> (b => WavHeader.durationMs(b)),
    "wav_pcm_samples" -> (b => WavHeader.pcmSamples(b)),
    "wav_pcm_sum_sq" -> (b => WavHeader.pcmSumSq(b)),
    "wav_pcm_peak" -> (b => WavHeader.pcmPeak(b)),
    "wav_pcm_stats" -> (b => WavHeader.pcmStatsRow(b)),
    "wav_vad_frames" -> (b => WavHeader.vadFrames(b)),
    "wav_vad_active" -> (b => WavHeader.vadActive(b)),
    "wav_vad_run" -> (b => WavHeader.vadRun(b)),
    "wav_vad_stats" -> (b => WavHeader.vadStatsRow(b)),
    "mp4_brand" -> (b => Mp4Header.brand(b)),
    "mp4_timescale" -> (b => Mp4Header.timescale(b)),
    "mp4_duration" -> (b => Mp4Header.durationMs(b)),
    "mp4_mdat_offset" -> (b => Mp4Header.mdatOffset(b)),
    "mp4_mdat_size" -> (b => Mp4Header.mdatSize(b)),
    "mp4_stsz" -> (b => Mp4Header.stszSizes(b)),
    "png_decode" -> (b => PngCodec.decodeGray(b)),
    "png_brightness" -> (b => PngCodec.brightness(b)),
    "png_resize" -> (b => PngCodec.resizeCsv(b)),
    "png_ahash" -> (b => PngCodec.aHashHex(b)),
    "png_stats" -> (b => PngCodec.decodeStatsRow(b)),
    "tar_entries" -> (b => TarCodec.entries(b)),
  )

  private def assertNoThrow(tag: String, b: Array[Byte]): Unit =
    parsers.foreach { case (name, f) =>
      try f(b)
      catch {
        case e: Throwable =>
          val hex = b.take(64).map(x => f"$x%02x").mkString
          fail(s"$name threw ${e.getClass.getSimpleName} on $tag " +
            s"(len=${b.length}, head=$hex): ${e.getMessage}")
      }
    }

  // valid seed containers, one per family — real encoders/writers where
  // the library has them, the spec-valid hand-built forms elsewhere
  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def wavSeed: Array[Byte] = hexBytes(
    "52494646 3C000000 57415645" +
      " 4C495354 04000000 AABBCCDD" +
      " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      " 64617461 20000000" + "0100 FFFF 0080 7F00" * 4)

  private def mp4Seed: Array[Byte] = hexBytes(
    "00000014 66747970 69736F6D 00000200 69736F6D" +
      " 00000080 6D6F6F76" +
      " 00000010 66726565 4752414654523036" +
      " 00000068 6D766864 00000000 00000000 00000000 00000258 00000190" +
      " 00010000 01000000 0000000000000000" +
      " 000100000000000000000000 000000000001000000000000" +
      " 000000000000000040000000" + "00" * 20 + "FFFFFFFF" +
      " 00000010 6D646174 AABBCCDD EEFF0011")

  private def seeds: Seq[(String, Array[Byte])] = Seq(
    "png" -> PngCodec.encodeGray(9, 7, 123L),
    "wav" -> wavSeed,
    "mp4" -> mp4Seed,
    "tar" -> TarCodec.writeUstar(Seq(
      "a.txt" -> "hello".getBytes("US-ASCII"),
      "b.bin" -> Array.tabulate[Byte](700)(_.toByte))),
  )

  test("pure random bytes: every parser returns or nulls, never throws") {
    val rnd = new scala.util.Random(20260816L)
    (0 until 2000).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(b)
      assertNoThrow(s"random#$i", b)
    }
    // and the structured-garbage corner: arrays of a single repeated
    // byte at magic-relevant lengths (walks that trust a run of 0x00,
    // 0xFF or ' ' are the classic desync inputs)
    Seq(0x00, 0xff, 0x20, 0x52, 0x89).foreach { v =>
      Seq(0, 1, 7, 8, 12, 44, 100, 512, 1024, 1536).foreach { n =>
        assertNoThrow(s"repeat-$v-len$n", Array.fill(n)(v.toByte))
      }
    }
  }

  test("corrupted valid containers: random single-byte flips never throw") {
    val rnd = new scala.util.Random(424242L)
    seeds.foreach { case (kind, seed) =>
      (0 until 500).foreach { i =>
        val b = seed.clone()
        val pos = rnd.nextInt(b.length)
        b(pos) = (b(pos) ^ (1 + rnd.nextInt(255))).toByte
        assertNoThrow(s"$kind-flip#$i@$pos", b)
      }
      // and 2-byte + 4-byte field-sized corruptions (size/length fields)
      (0 until 200).foreach { i =>
        val b = seed.clone()
        val pos = rnd.nextInt(math.max(1, b.length - 4))
        var k = 0
        while (k < 4 && pos + k < b.length) {
          b(pos + k) = rnd.nextInt(256).toByte; k += 1
        }
        assertNoThrow(s"$kind-field#$i@$pos", b)
      }
    }
  }

  test("every truncation prefix of every valid container never throws") {
    seeds.foreach { case (kind, seed) =>
      (0 to seed.length).foreach { n =>
        assertNoThrow(s"$kind-prefix$n", seed.take(n))
      }
    }
  }

  test("the valid seeds themselves parse (the fuzz baseline is real)") {
    assert(ImageHeader.format(seeds.head._2).toString == "png")
    assert(PngCodec.decodeStatsRow(seeds.head._2) != null)
    assert(WavHeader.pcmStatsRow(wavSeed) != null)
    assert(Mp4Header.brand(mp4Seed).toString == "isom")
    assert(Mp4Header.mdatOffset(mp4Seed) != null)
    assert(TarCodec.entries(seeds.last._2).length == 2)
  }
}
