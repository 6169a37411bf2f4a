package graft.convert

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property-based guard for the ledger's round-15 surface: across RANDOM
  * sequences of (shard-count reopenings, batched adds, compactions,
  * membership filters), the ledger must behave as one grow-only set —
  * `seen()` equals the union of every path ever added, `filterUnseen`
  * returns exactly the never-added candidates in caller order, and no
  * layout change (flat↔sharded migration, fold-on-compact) loses or
  * duplicates an entry. Complements the scenario tests in
  * AvroToParquetJobSpec with randomized coverage of migration × compaction
  * × routing interleavings.
  */
class LedgerPropertySpec extends AnyFunSuite {
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

  // an op sequence: each step reopens the ledger at `shards`, adds a
  // slice of the path universe, sometimes compacts at a random threshold
  private val cases = for {
    nSteps <- Gen.choose(2, 6)
    steps <- Gen.listOfN(nSteps, for {
      shards <- Gen.oneOf(1, 2, 3, 5, 8)
      addFrom <- Gen.choose(0, 180)
      addLen <- Gen.choose(0, 60)
      compactAt <- Gen.oneOf(-1, 0, 2, 10) // -1 = no compact this step
    } yield (shards, addFrom, addLen, compactAt))
  } yield steps

  test("random reopen/add/compact/migrate sequences: the ledger is a " +
    "grow-only set and filterUnseen is exact, order-preserving") {
    val conf = spark.sparkContext.hadoopConfiguration
    val universe = (0 until 260).map(i => s"/land/avro/t$i/part-$i.avro")
    forAll(cases, 25) { steps =>
      val dir = Files.createTempDirectory("graft-ledger-prop").toString
      var added = Set.empty[String]
      steps.foreach { case (shards, addFrom, addLen, compactAt) =>
        val ledger = new FileLedger(dir, conf, shards)
        // membership BEFORE this step's add reflects exactly the history
        val probe = universe.slice(addFrom, addFrom + addLen) ++
          universe.take(5)
        val unseen = ledger.filterUnseen(probe)
        assert(unseen == probe.filterNot(added.contains),
          s"filterUnseen wrong at shards=$shards after ${added.size} adds")
        val batch = universe.slice(addFrom, addFrom + addLen)
        ledger.add(batch)
        added ++= batch
        if (compactAt >= 0) ledger.compact(compactAt)
        assert(ledger.seen() == added,
          s"seen() diverged at shards=$shards (compactAt=$compactAt)")
      }
      // a final flat reopen must still hold the full union
      assert(new FileLedger(dir, conf).seen() == added)
    }
  }
}
