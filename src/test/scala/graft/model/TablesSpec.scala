package graft.model

import graft.SparkSpec
import graft.streaming.EventStreams

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("typed tables bind and compose with typed transforms") {
    val docs = Tables.docs(spark, Sf)
    val longDocs = docs.filter(_.n_chars > 200).map(d => (d.lang, d.text.length))
    assert(longDocs.count() > 0)

    val vecs = Tables.embeddings(spark, Sf)
    assert(vecs.head().embedding.length === 64)

    val evs = Tables.events(spark, Sf)
    // typed events feed the streaming-shaped API directly
    val sessions = EventStreams.sessionize(
      evs.map(e => EventStreams.Event(e.event_id, e.ts, e.user_id, e.event_type, e.value))
        .toDF())
    assert(sessions.count() > 0)
  }
}
