package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.streaming.StreamingQueries.{assembleSessions, Ev}
import graft.functions.Aggregators.{VarBuf, WelfordVariance}

/** SURVEY.md §5.3 — algebraic laws via ScalaCheck. Pure-Scala properties run
  * at full case counts; Spark-backed laws live in PropertiesSparkSpec with
  * reduced counts (each case is a Spark job). */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val gapMs = 30L * 60 * 1000

  private val eventsGen: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 60)
    offsets <- Gen.listOfN(n, Gen.choose(0L, 7L * 24 * 3600 * 1000))
  } yield offsets.distinct.sorted.zipWithIndex.map { case (off, i) =>
    Ev(1L, i.toLong, new Timestamp(1700000000000L + off))
  }

  property("sessionization partitions events exhaustively") =
    forAll(eventsGen) { evs =>
      val sessions = assembleSessions(evs, gapMs)
      sessions.map(_.n_events).sum == evs.length
    }

  property("within a session every consecutive gap <= gapMs; across sessions > gapMs") =
    forAll(eventsGen) { evs =>
      val sessions = assembleSessions(evs, gapMs)
      val boundsOk = sessions.forall(s => !s.session_start.after(s.session_end))
      val betweenOk = sessions.zip(sessions.drop(1)).forall { case (a, b) =>
        b.session_start.getTime - a.session_end.getTime > gapMs
      }
      // reconstruct: events within [start,end] of their session count matches
      val withinOk = sessions.forall { s =>
        evs.count(e => !e.ts.before(s.session_start) && !e.ts.after(s.session_end)) == s.n_events
      }
      boundsOk && betweenOk && withinOk
    }

  property("sessionization is idempotent under session-preserving split points") =
    forAll(eventsGen) { evs =>
      // splitting the event list at a session boundary and assembling the
      // halves separately yields the same sessions as assembling the whole
      val sessions = assembleSessions(evs, gapMs)
      if (sessions.length < 2) Prop.passed
      else {
        val cut = sessions.head.n_events.toInt
        val (a, b) = evs.splitAt(cut)
        val recombined = assembleSessions(a, gapMs) ++ assembleSessions(b, gapMs)
        Prop(recombined == sessions)
      }
    }

  private val doublesGen: Gen[List[Double]] =
    Gen.choose(2, 400).flatMap(n => Gen.listOfN(n, Gen.choose(-1e6, 1e6)))

  property("Welford variance matches two-pass variance within 1e-9 relative") =
    forAll(doublesGen) { xs =>
      val buf = xs.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce)
      val welford = WelfordVariance.finish(buf)
      val mean = xs.sum / xs.size
      val twoPass = xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1)
      math.abs(welford - twoPass) <= 1e-9 * math.max(1.0, math.abs(twoPass))
    }

  property("Welford merge is associative-equivalent to sequential reduce (any split)") =
    forAll(doublesGen, Gen.choose(0, 400)) { (xs, rawCut) =>
      val cut = rawCut % xs.size
      val (a, b) = xs.splitAt(cut)
      val seq = xs.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce)
      val merged = WelfordVariance.merge(
        a.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce),
        b.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce))
      val vSeq = WelfordVariance.finish(seq)
      val vMerged = WelfordVariance.finish(merged)
      (vSeq.isNaN && vMerged.isNaN) ||
        math.abs(vSeq - vMerged) <= 1e-9 * math.max(1.0, math.abs(vSeq))
    }

  property("merge with zero is identity") =
    forAll(doublesGen) { xs =>
      val buf = xs.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce)
      WelfordVariance.merge(buf, WelfordVariance.zero) == buf &&
        WelfordVariance.merge(WelfordVariance.zero, buf) == buf
    }
}
