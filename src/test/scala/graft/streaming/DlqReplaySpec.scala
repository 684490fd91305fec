package graft.streaming

import graft.SparkSpec

/** q123 — the gate hashes the FINAL table (identical to q31's contract by
  * design: the failure path must be invisible in the result). This spec
  * pins that the green result really traveled retry → DLQ → replay: every
  * wave-2 message must have dead-lettered and come back via
  * [[Subscription.replayDeadLetters]], not landed directly. */
class DlqReplaySpec extends SparkSpec {

  test("q123: the entire second wave dead-letters and replays") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val wave2 = graft.Tables.events(spark, dir)
      .filter($"event_id" % 20 === 0 && $"event_id" % 40 =!= 0).count()
    assert(wave2 > 0, "the corpus must produce a non-trivial second wave")
    val (df, replayed) = graft.queries.StreamQueries.q123DlqReplayCounted(spark, dir)
    assert(replayed === wave2,
      s"every wave-2 message must take the DLQ path: replayed $replayed of $wave2")
    val total = graft.Tables.events(spark, dir).filter($"event_id" % 20 === 0).count()
    assert(df.count() === total, "nothing lost, nothing duplicated")
  }
}
