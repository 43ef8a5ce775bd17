package graft

import graft.ops.{Journeys, Rollups, TimeOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5 item 3) over generated
  * journey/leg data: transfer-time clamping, survival-difference
  * histogram identities, rollup totals, and session monotonicity.
  * ScalaCheck generators sampled with a fixed seed (the scalatestplus
  * bridge isn't on the offline classpath, so sampling is driven
  * directly); each property evaluates through the real Spark
  * expressions on a generated DataFrame.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int = 12)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val legGen: Gen[List[(Long, Long, Int, Long)]] = for {
    nUsers <- Gen.choose(1, 5)
    legs <- Gen.listOfN(40, for {
      uid <- Gen.choose(1L, nUsers.toLong)
      journey <- Gen.choose(1L, 3L)
      legId <- Gen.choose(1, 6)
      startUs <- Gen.choose(0L, 86400000000L)
    } yield (uid, journey, legId, startUs))
  } yield legs

  test("transfer gap is always in [0, 240 min] and 0 on last leg") {
    forAll(legGen) { legs =>
      whenever(legs.nonEmpty) {
        val df = legs.toDF("uid", "journey", "leg_id", "start_us")
          .withColumn("ts", timestamp_micros($"start_us"))
          .withColumn("end_ts", timestamp_micros($"start_us" + 60000000L))
        val w = Journeys.orderedWindow(Seq($"uid", $"journey"), Seq($"leg_id", $"start_us"))
        val gaps = df
          .withColumn("next_ts", Journeys.nextInGroup($"ts", w))
          .select(Journeys.transferMicros($"end_ts", $"next_ts").as("gap"),
            $"next_ts".isNull.as("last"))
          .as[(Long, Boolean)].collect()
        assert(gaps.forall { case (g, _) => g >= 0L && g <= 240L * 60000000L })
        assert(gaps.filter(_._2).forall(_._1 == 0L), "last leg gap must be 0")
      }
    }
  }

  test("survival-difference histogram: counts are >= 0 and sum to count(leg 1) - tail") {
    forAll(legGen) { legs =>
      whenever(legs.nonEmpty) {
        val hist = legs.toDF("uid", "journey", "leg_id", "start_us")
          .groupBy($"leg_id").agg(count(lit(1)).as("cnt"))
        val diff = Rollups.survivalDiff(hist, Seq(), $"leg_id", $"cnt", "exactly")
          .select($"leg_id", $"cnt", $"exactly").as[(Int, Long, Long)].collect()
        assert(diff.forall(_._3 >= 0L), "clamped at zero")
        // when counts are monotone non-increasing in leg_id (true survival
        // data), the diffs sum back to the first count
        val sorted = diff.sortBy(_._1)
        if (sorted.sliding(2).forall {
          case Array(a, b) => a._2 >= b._2
          case _ => true
        }) {
          assert(sorted.map(_._3).sum == sorted.head._2,
            "telescoping sum equals count at leg 1 for monotone histograms")
        }
      }
    }
  }

  test("withOverall: the overall row equals the sum of its group rows") {
    forAll(legGen) { legs =>
      whenever(legs.nonEmpty) {
        val df = legs.toDF("uid", "journey", "leg_id", "start_us")
          // uid%3==0 regions are NULL: a genuine NULL group must stay
          // distinct from the rollup row (grouping(), not coalesce)
          .withColumn("region",
            when($"uid" % 3 === 0, lit(null: String))
              .otherwise(concat(lit("r"), $"uid" % 3)))
        val out = Rollups.withOverall(df, Seq($"journey"), "region", "overall",
            Seq(count(lit(1)).as("n"), sum($"leg_id").as("s")))
          .select($"journey", $"region", $"n", $"s")
          .as[(Long, String, Long, Long)].collect()
        out.groupBy(_._1).foreach { case (_, rows) =>
          val overall = rows.find(_._2 == "overall").get
          val regions = rows.filter(_._2 != "overall")
          assert(regions.map(_._3).sum == overall._3)
          assert(regions.map(_._4).sum == overall._4)
        }
      }
    }
  }

  test("sessionize: session ids start at 1 and are non-decreasing in time per user") {
    forAll(legGen) { legs =>
      whenever(legs.nonEmpty) {
        val df = legs.toDF("uid", "journey", "leg_id", "start_us")
          .withColumn("ts", timestamp_micros($"start_us"))
        val sess = Journeys.sessionize(df, Seq($"uid"), $"ts", 30.0, "sid")
          .select($"uid", unix_micros($"ts").as("us"), $"sid")
          .as[(Long, Long, Long)].collect()
          .groupBy(_._1)
        sess.foreach { case (_, rows) =>
          val byTime = rows.sortBy(_._2).map(_._3)
          assert(byTime.head == 1L, "first session is 1")
          assert(byTime.sliding(2).forall {
            case Array(a, b) => b == a || b == a + 1
            case _ => true
          }, "session id increments by at most 1 in time order")
        }
      }
    }
  }

  test("time bins partition the domain: every finite value lands in exactly one bin") {
    forAll(Gen.listOfN(50, Gen.choose(-10.0, 200.0))) { vals =>
      whenever(vals.nonEmpty) {
        val got = vals.toDF("m").select(TimeOps.timeRangeBin($"m")).as[String].collect()
        assert(got.forall(_ != "NA"), "finite values never fall through")
        assert(got.length == vals.length)
      }
    }
  }

  test("roundHalfUpRatio equals exact rational half-up rounding, ties included") {
    // exact reference: BigDecimal(num)/den at `scale` decimals, HALF_UP —
    // the rational arithmetic no double pipeline can promise. Generator
    // includes guaranteed ties (num = den·k + den/2 shapes) via small dens.
    forAll(Gen.listOfN(60, for {
      num <- Gen.choose(0L, 2000000L)
      den <- Gen.choose(1L, 400L)
    } yield (num, den)), n = 6) { pairs =>
      whenever(pairs.nonEmpty) {
        Seq(2, 4).foreach { scale =>
          val got = pairs.toDF("num", "den")
            .select(graft.ops.Cleaning.roundHalfUpRatio($"num", $"den", scale))
            .as[Double].collect()
          // helper contract: num/den is the value pre-scaled by
          // 10^scale, so the reference is half-up to an INTEGER then
          // the same single division
          val want = pairs.map { case (num, den) =>
            (BigDecimal(num) / BigDecimal(den))
              .setScale(0, BigDecimal.RoundingMode.HALF_UP)
              .toLong / math.pow(10, scale)
          }
          got.zip(want).zip(pairs).foreach { case ((g, w), (num, den)) =>
            assert(g == w, s"num=$num den=$den scale=$scale: got $g want $w")
          }
        }
      }
    }
  }

  test("sumExact2 equals the exact rational sum regardless of partitioning") {
    // the operator's whole claim: Σ of 2-decimal values computed in
    // integer cents equals the exact BigDecimal sum, under ANY
    // partition layout (double sums would differ in the last bit)
    forAll(Gen.listOfN(80, Gen.choose(-500000, 500000).map(_ / 100.0)), n = 6) { vals =>
      whenever(vals.nonEmpty) {
        val want = vals.map(v => BigDecimal(math.round(v * 100)))
          .sum.toDouble / 100.0
        Seq(1, 3, 32).foreach { parts =>
          val got = spark.createDataset(vals)(org.apache.spark.sql.Encoders.scalaDouble)
            .repartition(parts).toDF("v")
            .agg(graft.ops.Cleaning.sumExact2($"v")).as[Double].head()
          assert(got == want, s"parts=$parts: got $got want $want")
        }
      }
    }
  }

  test("connectedComponents equals union-find on random graphs, both paths") {
    // random sparse graphs over a small id space force every topology
    // class (isolated pairs, stars, chains, cycles, merged components);
    // both the distributed iterative path (threshold 0) and the driver
    // short-circuit must match a reference union-find
    val graphGen: Gen[List[(Long, Long)]] = for {
      nNodes <- Gen.choose(2, 24)
      nEdges <- Gen.choose(1, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, nNodes.toLong - 1)
        b <- Gen.choose(0L, nNodes.toLong - 1)
      } yield (a, b))
    } yield edges
    forAll(graphGen, n = 6) { edges =>
      val real = edges.filter(e => e._1 != e._2)
      whenever(real.nonEmpty) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        real.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = real.flatMap(e => Seq(e._1, e._2)).distinct
          .map(n => n -> find(n)).toMap
        val df = real.toDF("src", "dst")
        Seq(0L, 1000000L).foreach { thr =>
          val got = graft.llm.Dedup.connectedComponents(df, driverThreshold = thr)
            .as[(Long, Long)].collect().toMap
          assert(got == want, s"threshold=$thr edges=$real")
        }
      }
    }
  }

  test("halfUpScaledLong equals exact rational half-up at the scale, as a Long") {
    // pre-summation form: value·10^scale rounded half-up kept integer —
    // must agree with BigDecimal HALF_UP division at `scale` decimals
    forAll(Gen.listOfN(60, for {
      num <- Gen.choose(0L, 2000000L)
      den <- Gen.choose(1L, 400L)
    } yield (num, den)), n = 6) { pairs =>
      whenever(pairs.nonEmpty) {
        Seq(4, 6).foreach { scale =>
          val got = pairs.toDF("num", "den")
            .select(graft.ops.Cleaning.halfUpScaledLong($"num", $"den", scale))
            .as[Long].collect()
          val want = pairs.map { case (num, den) =>
            (BigDecimal(num) * BigDecimal(10).pow(scale) / BigDecimal(den))
              .setScale(0, BigDecimal.RoundingMode.HALF_UP)
              .toLong
          }
          got.zip(want).zip(pairs).foreach { case ((g, w), (num, den)) =>
            assert(g == w, s"num=$num den=$den scale=$scale: got $g want $w")
          }
        }
      }
    }
  }

  private val packGen: Gen[List[(String, Long, Long)]] = for {
    nShards <- Gen.choose(1, 3)
    rows <- Gen.listOfN(25, for {
      shard <- Gen.choose(0, nShards - 1).map(i => s"s$i")
      id <- Gen.choose(1L, 1000L)
      n <- Gen.choose(0L, 40L)
    } yield (shard, id, n))
  } yield rows.groupBy(r => (r._1, r._2)).values.map(_.head).toList

  private val capGen: Gen[(List[(Long, String)], Long, Int)] = for {
    nSources <- Gen.choose(1, 4)
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 5000000000L) // past 2^31: exercises the hi limb
      // NULL is a legal source (SQL group semantics) — both variants
      // must cap the NULL group like any other
      src <- Gen.frequency(
        (4, Gen.choose(0, nSources - 1).map(i => s"s$i")),
        (1, Gen.const(null: String)))
    } yield (id, src))
    cap <- Gen.oneOf(0L, 1L, 3L, 10L, 1000L)
    bins <- Gen.oneOf(2, 7, 4096)
  } yield (rows.distinctBy(_._1), cap, bins)

  /** Driver-side replica of Sampling.bucket's documented arithmetic. */
  private def refBucket(id: Long): Long = {
    val limb = 2147483647L
    val lo = id % limb
    val hi = (id / limb) % limb
    java.lang.Math.floorMod(
      java.lang.Math.floorMod(lo * 2654435761L + hi * 40503L, 4294967296L),
      1000000L)
  }

  test("perSourceCap: both variants equal the reference order on random ids") {
    import graft.ops.Sampling
    forAll(capGen, n = 8) { case (rows, cap, bins) =>
      whenever(rows.nonEmpty) {
        val want = rows.groupBy(_._2).values.flatMap { grp =>
          grp.sortBy(r => (refBucket(r._1) % bins, r._1)).take(
            math.min(cap, Int.MaxValue.toLong).toInt)
        }.map(_._1).toSet
        val df = rows.toDF("doc_id", "source").repartition(5)
        val viaWindow = Sampling.perSourceCap(df, "doc_id", "source",
          cap, bins).select($"doc_id").as[Long].collect().toSet
        val viaSelection = Sampling.perSourceCapLargeCap(df, "doc_id",
          "source", cap, bins).select($"doc_id").as[Long].collect().toSet
        assert(viaWindow == want, s"window form != reference (cap=$cap bins=$bins)")
        assert(viaSelection == want, s"selection != reference (cap=$cap bins=$bins)")
      }
    }
  }

  test("Packing: bins are contiguous, conserve docs and token budget") {
    import graft.llm.Packing
    forAll(packGen) { rows =>
      whenever(rows.nonEmpty) {
        val budget = 16
        val df = rows.toDF("src", "id", "n")
        val spans = Packing.packedSpans(df, "id", "src", $"n", budget)
          .select($"shard", $"id", $"n_tokens", $"cum_prev",
            $"bin_start", $"bin_end")
          .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        val byShard = rows.groupBy(_._1)
        byShard.foreach { case (shard, docs) =>
          val s = spans.filter(_._1 == shard).sortBy(_._2)
          // direct Scala recomputation of the concat-and-chunk layout
          var cum = 0L
          val want = docs.sortBy(_._2).map { case (_, id, n) =>
            val span = (id, n, cum, cum / budget,
              (cum + math.max(n, 1L) - 1L) / budget)
            cum += n
            span
          }
          assert(s.map(r => (r._2, r._3, r._4, r._5, r._6)) == want,
            s"$shard spans")
          // bins are contiguous: every bin in 0..last is touched
          val lastBin = s.map(_._6).max
          val touched = s.flatMap(r => r._5 to r._6).toSet
          assert(touched == (0L to lastBin).toSet, s"$shard holes: $touched")
          // starts partition the docs: each doc starts exactly once
          val bins = Packing.packedBins(
              Packing.packedSpans(df.where($"src" === shard), "id", "src",
                $"n", budget))
            .agg(sum($"n_starts"), sum($"n_crossers"))
            .as[(Long, Long)].head()
          assert(bins._1 == docs.size, s"$shard starts ${bins._1}")
          // crossers = total extra bins occupied beyond the first
          assert(bins._2 == s.map(r => r._6 - r._5).sum)
        }
      }
    }
  }

  private val docGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 8)
    docs <- Gen.listOfN(nDocs, for {
      nToks <- Gen.choose(0, 15)
      toks <- Gen.listOfN(nToks, Gen.oneOf("a", "b", "c", "dd", "ee"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("Spans: repetition/span stats match a direct Scala recomputation") {
    import graft.llm.Spans
    forAll(docGen) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        def toks(t: String): Seq[String] =
          t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        def grams(ts: Seq[String], n: Int): Seq[String] =
          if (ts.size < n) Seq.empty else ts.sliding(n).map(_.mkString(" ")).toSeq
        // repetitionStats: ratios equal the sliding-window recomputation
        val got = Spans.repetitionStats(df, "doc_id", "text")
          .orderBy($"doc_id")
          .as[(Long, Int, Double, Double, Double)].collect().toSeq
        docs.sortBy(_._1).zip(got).foreach { case ((id, t), (gid, n, d2, d3, top)) =>
          val ts = toks(t)
          assert(gid == id && n == ts.size)
          def dupRatio(k: Int): Double = {
            val g = grams(ts, k)
            if (g.isEmpty) 0.0 else (g.size - g.distinct.size).toDouble / g.size
          }
          assert(d2 == dupRatio(2), s"doc $id dup2")
          assert(d3 == dupRatio(3), s"doc $id dup3")
          val wantTop =
            if (ts.isEmpty) 0.0
            else ts.groupBy(identity).values.map(_.size).max.toDouble / ts.size
          assert(top == wantTop, s"doc $id top-token")
        }
        // spanDedupStats: dup windows equal the brute-force cross-doc
        // recount, and never exceed the window count
        val n = 2
        val span = Spans.spanDedupStats(df, "doc_id", "text", n = n)
          .orderBy($"doc_id")
          .as[(Long, Long, Long, Double)].collect().toSeq
        val all = docs.map { case (id, t) => id -> grams(toks(t), n) }
        val docsPerGram = all.flatMap { case (id, g) => g.distinct.map(_ -> id) }
          .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
        docs.sortBy(_._1).zip(span).foreach { case ((id, t), (gid, nw, dw, ratio)) =>
          val g = grams(toks(t), n)
          assert(gid == id && nw == g.size && dw <= nw)
          val wantDup = g.count(x => docsPerGram(x) >= 2)
          assert(dw == wantDup, s"doc $id dup windows")
          val wantRatio = if (g.isEmpty) 0.0 else wantDup.toDouble / g.size
          assert(ratio == wantRatio, s"doc $id ratio")
        }
      }
    }
  }

  test("binary media kernels never throw on arbitrary or mutated payloads") {
    // the fuzz contract a 100 TB scan needs: a corrupt payload is DATA
    // (hash NULL), never an exception that kills the stage. Three
    // populations: pure random bytes, random bytes behind each magic
    // (forced past the sniff into the parsers), and valid payloads
    // with mutated header/body bytes.
    import graft.functions.{AudioFingerprint, PerceptualHash}
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte),
      "GIF89a".getBytes.toArray, "BM".getBytes.toArray,
      "RIFFxxxxWAVEfmt ".getBytes.toArray)
    def check(b: Array[Byte]): Unit = {
      PerceptualHash.hash64(b, dhash = true)
      PerceptualHash.hash64(b, dhash = false)
      AudioFingerprint.fp64Boxed(b)
      ()
    }
    val rawGen = for {
      n <- Gen.choose(0, 400)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bytes.toArray
    forAll(rawGen, n = 60)(check)
    forAll(for {
      m <- Gen.oneOf(magics)
      n <- Gen.choose(0, 300)
      tail <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield m ++ tail.toArray, n = 80)(check)
    // mutate single bytes of VALID payloads (header fields included)
    val mutGen = for {
      id <- Gen.choose(0L, 50L)
      wav <- Gen.oneOf(true, false)
      pos <- Gen.choose(0, 53)
      v <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield {
      val b = if (wav) graft.llm.Multimodal.syntheticPcmWav(id)
        else graft.llm.Multimodal.syntheticBmp(id)
      b(pos % b.length) = v
      b
    }
    forAll(mutGen, n = 120)(check)
  }

  test("sparseFam: singleton keys never collide with block families and respect the overflow bound") {
    import graft.llm.Multimodal
    // ids across every fixture regime in the repo: driver SFs (< 2^31),
    // GenScale replicas (+k*1e7), GenScaleDocs replicas (+k*1e10)
    val idGen = for {
      base <- Gen.chooseNum(0L, 5000000L)
      j <- Gen.chooseNum(0, 99)
      k <- Gen.chooseNum(0, 9)
    } yield base + j * 10000000L + k * 10000000000L
    val pair = for { a <- idGen; b <- idGen; p <- Gen.oneOf(0L, 2L) }
      yield (a, b, p)
    forAll(pair, n = 400) { case (a, b, phase) =>
      val (fa, fb) = (Multimodal.sparseFam(a, phase),
        Multimodal.sparseFam(b, phase))
      for ((id, f) <- Seq((a, fa), (b, fb))) {
        val partnered = Math.floorMod(id / 100L, 4L) == phase
        // domain split: block fams < 1e9, singletons >= 1e9; and the
        // kernels' fam*2654435761 < 2^63 no-overflow contract holds
        assert(if (partnered) f == id / 100L && f < 1000000000L
               else f >= 1000000000L)
        assert(f <= Long.MaxValue / 2654435761L,
          s"avalanche seed would overflow for fam=$f")
      }
      // singleton keys are injective on ids at driver scale (< 2^31)
      if (a != b && a < 2147483647L && b < 2147483647L &&
          Math.floorMod(a / 100L, 4L) != phase &&
          Math.floorMod(b / 100L, 4L) != phase)
        assert(fa != fb, s"singleton collision: $a $b -> $fa")
    }
  }
}
