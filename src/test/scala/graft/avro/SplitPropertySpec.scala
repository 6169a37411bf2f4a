package graft.avro

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property-based guard for the round-14 lazy split path: for RANDOM
  * container sizes, codecs and split grids, `planSplits` + the
  * validated lazy `readRange` must partition the container's records
  * exactly — no loss, no duplication — and the structural walk must
  * accept every well-formed container. Complements the fixed-size
  * SplitReadSpec grid and the hand-crafted ValidateRangeSpec bytes with
  * randomized coverage of block/split phase alignments.
  */
class SplitPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def forAll[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a =>
        try f(a)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"property failed for sample: $a", e)
        }
      }
    }

  private val cases = for {
    rows <- Gen.choose(1, 900)
    splitBytes <- Gen.choose(64L, 16384L)
    codec <- Gen.oneOf(Option.empty[String], Some("deflate"), Some("snappy"))
    nameLen <- Gen.choose(1, 600)
  } yield (rows, splitBytes, codec, nameLen)

  test("random (rows, splitBytes, codec, record size): splits partition " +
    "records exactly through validateRange + the lazy reader") {
    val conf = spark.sparkContext.hadoopConfiguration
    forAll(cases, n = 25) { case (rows, splitBytes, codec, nameLen) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-splitprop")
        .toFile.getAbsolutePath
      val path = s"$dir/avro/t/c.avro"
      val pad = "y" * nameLen
      AvroFixtures.writeAvro(path, AvroFixtures.BasicEnvelope,
        (1 to rows).map(i => Map[String, Any](
          "uuid" -> s"u$i", "read_timestamp" -> 0L,
          "source_metadata" -> AvroFixtures.sm("t"),
          "payload" -> Map("id" -> i.toLong, "name" -> s"$pad-$i"))),
        codec = codec)
      val splits = AvroCdcReader.planSplits(spark, Seq(path), conf,
        Some(splitBytes))
      val ids = splits.flatMap(s => AvroCdcReader.readRange(s, conf))
        .map(_.get("payload").asInstanceOf[
          org.apache.avro.generic.GenericRecord].get("id").asInstanceOf[Long])
      assert(ids.sorted == (1L to rows.toLong),
        s"rows=$rows splitBytes=$splitBytes codec=$codec nameLen=$nameLen " +
          s"splits=${splits.size}: got ${ids.size} records")
    }
  }
}
