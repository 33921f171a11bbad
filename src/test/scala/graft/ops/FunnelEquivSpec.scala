package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence pin for the r18 single-pass funnel rewrite —
  * the strongest evidence the chronological fold IS the chained-min
  * semantics (the scaladoc's proof, executed): 300 seeded random users
  * with 0–8 events each over a 21-tick clock (heavy timestamp
  * collisions by construction — ties are where a fold could silently
  * diverge from min()), checked against an INDEPENDENT local model
  * that computes the CTE-chain form directly
  * (t₁ = min ts of step 1; t_k = min ts of step k with
  * ts > t_{k−1} [and ts < t_{k−1} + T]), for both the unbounded and a
  * tight windowed variant, in ONE Spark job per variant — hundreds of
  * adversarial cases at fixture cost. The driver oracle hash proves
  * the same equivalence on real data; this proves it on inputs the
  * testdata never produces (equal-instant chains, interleaved noise
  * types, users who never enter). */
class FunnelEquivSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val steps = Seq("view", "click", "purchase")
  private val types = Vector("view", "click", "purchase", "noise")

  // seeded: the test is deterministic across runs
  private def cases: Seq[(Long, String, Long)] = {
    val rnd = new scala.util.Random(42)
    (1 to 300).flatMap { u =>
      (0 until rnd.nextInt(9)).map { _ =>
        (u.toLong, types(rnd.nextInt(types.length)),
          rnd.nextInt(21).toLong) // micros ticks 0..20: many ties
      }
    }
  }

  /** The chained-min model, written the way the oracle SQL is — per
    * step a min() over an independent filter, NOT a fold — so
    * agreement is evidence, not tautology. */
  private def model(evs: Seq[(String, Long)],
      withinUs: Option[Long]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prev = Option.empty[Long]
    var alive = true
    for (st <- steps if alive) {
      val cand = evs.filter(_._1 == st).map(_._2).filter { t =>
        prev match {
          case None => true // step 1: the plain min
          case Some(p) => t > p && withinUs.forall(w => t < p + w)
        }
      }
      if (cand.isEmpty) alive = false
      else {
        val m = cand.min
        out += m
        prev = Some(m)
      }
    }
    out.toSeq
  }

  private def check(withinUs: Option[Long]): Unit = {
    import spark.implicits._
    val data = cases
    val df = data.map { case (u, et, tu) =>
      (u, et, java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plusNanos(tu * 1000)))
    }.toDF("user_id", "event_type", "ts")
    val got = graft.queries.LlmQueries
      .funnelTouches(df, steps, withinUs)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    data.groupBy(_._1).foreach { case (u, evs) =>
      val want = model(evs.map(e => (e._2, e._3)), withinUs)
      if (evs.forall(e => !steps.contains(e._2)))
        assert(!got.contains(u),
          s"user $u has no funnel-type events, must not appear")
      else
        assert(got.getOrElse(u, Seq.empty) == want,
          s"user $u: fold ${got.get(u)} vs chained-min $want " +
            s"over ${evs.sortBy(_._3)}")
    }
    // sanity: the generator actually produced full conversions (the
    // assertions above would pass vacuously on an all-empty corpus)
    assert(got.values.exists(_.length == 3), "some user converts fully")
  }

  test("fold ≡ chained-min on 300 seeded random users with heavy ts " +
      "ties — unbounded") {
    check(None)
  }

  test("fold ≡ chained-min on the same 300 users — windowed (T = 5 " +
      "ticks, tight enough to cut real chains)") {
    check(Some(5L))
  }
}
