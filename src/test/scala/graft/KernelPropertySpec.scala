package graft

import graft.operators.ThreatOps
import graft.streaming.{Event, EventStream, SessionState}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-property tests for the hand-written kernels — the code
  * Catalyst does NOT verify for us. Each property is checked against an
  * obviously-correct reference implementation over many seeded-random
  * inputs (deterministic: fixed seed, so failures reproduce). No
  * SparkSession needed — these exercise pure JVM logic.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("intersectSize kernels match the distinct-common-values reference on random arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (_ <- 1 to 300) {
      val nx = rnd.nextInt(30); val ny = rnd.nextInt(30)
      // small value domain forces duplicates and overlaps; ~10% nulls
      def mk(n: Int): Array[Any] = Array.fill[Any](n)(
        if (rnd.nextInt(10) == 0) null else Integer.valueOf(rnd.nextInt(12) - 6))
      val xs = mk(nx); val ys = mk(ny)
      // reference: array_intersect semantics — distinct elements of x
      // present in y, null included once if null appears in BOTH
      val ysSet = ys.toSet
      val expected = xs.distinct.count(v => ysSet.contains(v) &&
        (v != null || xs.contains(null) && ys.contains(null)))
      val ints = graft.functions.GraftArrayOps.intersectSizeInt(
        ArrayData.toArrayData(xs), ArrayData.toArrayData(ys))
      assert(ints === expected, s"int: ${xs.toList} ∩ ${ys.toList}")
      def widen(a: Array[Any]): Array[Any] = a.map {
        case null => null
        case i: Integer => java.lang.Long.valueOf(i.longValue())
      }
      val longs = graft.functions.GraftArrayOps.intersectSizeLong(
        ArrayData.toArrayData(widen(xs)), ArrayData.toArrayData(widen(ys)))
      assert(longs === expected, s"long: ${xs.toList} ∩ ${ys.toList}")
    }
  }

  test("foldPairs sums match brute force for random groups and any flushAt") {
    for (_ <- 1 to 200) {
      val nGroups = rnd.nextInt(6)
      val groups = List.fill(nGroups) {
        val n = 2 + rnd.nextInt(30)
        Array.fill(n)(rnd.nextLong(50L)).distinct match {
          case a if a.length >= 2 => a
          case a => a ++ Array(a.headOption.getOrElse(0L) + 51L)
        }
      }
      val flushAt = 1 + rnd.nextInt(64)
      val expected = groups.flatMap { g =>
        val s = g.sorted
        for (i <- s.indices; j <- s.indices if s(i) < s(j)) yield (s(i), s(j))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val actual = ThreatOps.foldPairs(groups.iterator.map(_.clone()), flushAt)
        .toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .map { case (pk, c) => ((pk >> 32, pk & 0xffffffffL), c) }.toMap
      assert(actual === expected, s"groups=${groups.map(_.toList)} flushAt=$flushAt")
    }
  }

  test("spaceSaving holds the Metwally invariants on random streams") {
    for (_ <- 1 to 200) {
      val cap = 1 + rnd.nextInt(16)
      val n = rnd.nextInt(400)
      // zipf-ish: small alphabets make hot keys, large make churn
      val alphabet = 1 + rnd.nextInt(40)
      val stream = Seq.fill(n)(s"k${rnd.nextInt(alphabet)}")
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = graft.operators.HeavyHitters.spaceSaving(stream.iterator, cap).toSeq
      // summary size bounded by capacity
      assert(got.size <= cap)
      // total estimated mass equals the stream length (Space-Saving
      // conserves counts: every arrival increments exactly one counter)
      assert(got.map(_._2).sum === n.toLong)
      got.foreach { case (item, est, err) =>
        val truth = exact.getOrElse(item, 0L)
        assert(est >= truth, s"undercount for $item (cap=$cap)")
        assert(est - truth <= err, s"overcount beyond err for $item (cap=$cap)")
        assert(err <= n / cap,
          s"err ${err} above n/cap bound ${n / cap} (cap=$cap n=$n)")
      }
      // guarantee: every item with true count > n/cap is tracked
      val threshold = if (cap == 0) 0 else n / cap
      exact.filter(_._2 > threshold).keys.foreach { hot =>
        assert(got.exists(_._1 == hot),
          s"heavy item $hot (count ${exact(hot)} > $threshold) untracked (cap=$cap)")
      }
    }
  }

  test("LongCountMap increments/drains like a reference HashMap across growth") {
    for (trial <- 1 to 50) {
      val m = new java.util.HashMap[Long, Long]()
      val lcm = new graft.operators.LongCountMap(16) // tiny: forces growth
      val keys = Array.fill(1 + rnd.nextInt(5000))(1L + rnd.nextLong(500L))
      keys.foreach { k =>
        lcm.increment(k)
        m.merge(k, 1L, _ + _)
      }
      assert(lcm.size === m.size, s"trial $trial size")
      val drained = lcm.drain().toMap
      assert(drained.size === m.size)
      m.forEach((k, v) => assert(drained(k) === v, s"trial $trial key $k"))
      assert(lcm.size === 0, "drain resets")
      // reuse after drain must work
      lcm.increment(7L); lcm.increment(7L)
      assert(lcm.drain().toMap === Map(7L -> 2L))
    }
  }

  test("sessionizeUser: sessions partition events; gaps only between sessions") {
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(40)
      val ts = List.fill(n)(60000L + math.abs(rnd.nextLong() % (6L * 3600 * 1000)))
      val events = ts.zipWithIndex.map { case (t, i) =>
        Event(i.toLong, new java.sql.Timestamp(t), 7L, "login", 1.0)
      }
      val state = TestGroupState.create[SessionState](
        Optional.empty[SessionState](), GroupStateTimeout.EventTimeTimeout,
        0L, Optional.of(java.lang.Long.valueOf(0L)), false)
      val closed = EventStream.sessionizeUser(7L, events.iterator, state).toSeq
      val open = if (state.exists) Seq(state.get) else Seq.empty
      // every event lands in exactly one session
      assert(closed.map(_.n_events).sum + open.map(_.n).sum === n.toLong)
      // spans are well-formed and adjacent sessions separated by > gap
      val spans = (closed.map(s =>
        (s.session_start.getTime, s.session_end.getTime)) ++
        open.map(s => (s.start, s.last))).sortBy(_._1)
      spans.foreach { case (a, b) => assert(a <= b) }
      spans.sliding(2).foreach {
        case Seq((_, prevEnd), (nextStart, _)) =>
          assert(nextStart - prevEnd > EventStream.SessionGapMs,
            s"adjacent sessions closer than the gap: $spans")
        case _ => ()
      }
    }
  }

  test("LevenshteinTrim.dist equals UTF8String.levenshteinDistance on random unicode pairs") {
    import org.apache.spark.unsafe.types.UTF8String
    // alphabet mixes 1-, 2-, 3- and 4-byte code points so the byte-level
    // affix trim is exercised across every UTF-8 width (the boundary
    // backoff is the only logic the built-in doesn't own)
    val alphabet = "abcdé漢字🙂αß↔".toCharArray // includes surrogate pair
    def randText(n: Int): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val c = alphabet(rnd.nextInt(alphabet.length))
        // keep surrogate pairs intact
        if (Character.isHighSurrogate(c)) sb.append("🙂") else sb.append(c)
        i += 1
      }
      sb.toString
    }
    for (_ <- 1 to 500) {
      val base = randText(rnd.nextInt(40))
      // bias toward the near-dup shape the verify path feeds: shared
      // prefix/suffix with a small edited window — plus fully random pairs
      val (a, b) =
        if (rnd.nextBoolean()) {
          val edit = randText(rnd.nextInt(5))
          val cut = if (base.isEmpty) 0 else rnd.nextInt(base.length)
          (base, base.substring(0, cut) + edit + base.substring(cut))
        } else (randText(rnd.nextInt(25)), randText(rnd.nextInt(25)))
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val d = ua.levenshteinDistance(ub)
      assert(graft.functions.LevenshteinTrim.dist(ua, ub) === d, s"a='$a' b='$b'")
      assert(graft.functions.LevenshteinTrim.dist(ub, ua) ===
        ub.levenshteinDistance(ua), s"swapped a='$a' b='$b'")
      // bound is a true upper bound, and tight (0) on equality
      val bound = graft.functions.LevenshteinTrim.bound(ua, ub)
      assert(bound >= d, s"bound: a='$a' b='$b'")
      // thresholded variant: exact at or above d, -1 strictly below
      val t = rnd.nextInt(bound + 2)
      val dt = graft.functions.LevenshteinTrim.distThreshold(ua, ub, t)
      assert(dt === (if (d <= t) d else -1), s"threshold $t: a='$a' b='$b'")
    }
  }
}
