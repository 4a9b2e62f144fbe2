package graft

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** Structural guard for the one streaming defect class the sf100 runs
  * kept finding by dying: a ROW-GRAIN stream drained through the memory
  * sink is a driver-side collect — dead on maxResultSize the moment the
  * data is real. Policy, enforced here against EVERY `q_stream_*` gate
  * actually running:
  *
  *  - the memory sink is allowed ONLY for the named COMPLETE-mode
  *    bounded-key aggregates (window/enrich/sliding — their state and
  *    output are window-key-sized, not row-sized);
  *  - every other streaming gate must drain through the transactional
  *    file sink (distributed write, exactly-once metadata log).
  *
  * Checked at runtime via a StreamingQueryListener (sink class + state
  * operator names of every stream the gates start), plus a source lint
  * that every `format("memory")` in main sources is a Complete-mode
  * writer — so a new gate that quietly routes row-grain output to the
  * driver fails here BY NAME at review time, not at sf100.
  */
class StreamSinkPolicySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The complete allowed memory-sink set. Adding a query here requires
    * the same argument these three carry: COMPLETE output mode over an
    * aggregation whose key domain is bounded (time windows × small enum),
    * so the in-memory table cannot scale with event volume.
    */
  private val allowedMemory = Set("q_stream_window", "q_stream_enrich", "q_stream_sliding")

  test("every format(\"memory\") in main sources is a Complete-mode writer") {
    val files = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File("src/main/scala")).filter(_.getName.endsWith(".scala"))
    }
    var hits = 0
    for (f <- files) {
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      var i = text.indexOf("format(\"memory\")")
      while (i >= 0) {
        hits += 1
        val stop = text.indexOf(".start()", i)
        assert(stop >= 0, s"${f.getName}: memory sink with no .start() in sight")
        val chain = text.substring(i, stop)
        assert(chain.contains("OutputMode.Complete()"),
          s"${f.getName}: memory sink not in Complete mode — a row-grain Append " +
            s"memory sink is a driver-side collect:\n$chain")
        i = text.indexOf("format(\"memory\")", i + 1)
      }
    }
    assert(hits === allowedMemory.size,
      s"$hits memory-sink call sites vs ${allowedMemory.size} allowed queries — " +
        "update the policy spec alongside the code")
  }

  test("streaming gates: memory sink only under bounded complete-mode aggregates") {
    // runId -> (sink description, state operator names seen)
    val sinks = mutable.Map.empty[java.util.UUID, (String, mutable.Set[String])]
    val terminated = mutable.Set.empty[java.util.UUID]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        synchronized {
          val (_, ops) = sinks.getOrElseUpdate(
            e.progress.runId, (e.progress.sink.description, mutable.Set.empty[String]))
          sinks(e.progress.runId) =
            (e.progress.sink.description, ops ++= e.progress.stateOperators.map(_.operatorName))
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        synchronized { terminated += e.runId }
    }
    spark.streams.addListener(listener)
    try {
      val gates = SparkEntry.queries.keys.filter(_.startsWith("q_stream_")).toSeq.sorted
      assert(gates.size >= 9, s"streaming pack shrank: $gates")
      for (gate <- gates) {
        val before = listener.synchronized(sinks.keySet.toSet)
        SparkEntry.queries(gate)(spark, dir).collect()
        // listener events are delivered async — wait for every stream
        // this gate started to report terminated
        val deadline = System.currentTimeMillis() + 60000
        def mine = listener.synchronized(sinks.keySet.toSet -- before)
        while ({
          val m = mine
          (m.isEmpty || !m.subsetOf(listener.synchronized(terminated.toSet))) &&
            System.currentTimeMillis() < deadline
        }) Thread.sleep(100)
        val ids = mine
        assert(ids.nonEmpty, s"$gate started no streaming query the listener saw")
        val used = listener.synchronized(ids.toSeq.map(sinks))
        for ((sinkDesc, ops) <- used) {
          if (allowedMemory(gate)) {
            assert(sinkDesc.contains("MemorySink"),
              s"$gate is in the allowed-memory set but drained to $sinkDesc — " +
                "either update the policy or the query")
            // bounded complete-mode aggregate: streaming agg state saves
            // only; any row-grain stateful operator (dedupe, stream-stream
            // join, flatMapGroupsWithState, transformWithState, session
            // windows) feeding a memory sink is the defect this guards
            val rowGrain = ops.filterNot(_.contains("stateStoreSave"))
            assert(rowGrain.isEmpty,
              s"$gate: memory sink fed by row-grain state operators $rowGrain")
          } else {
            assert(!sinkDesc.contains("MemorySink"),
              s"$gate drains through the MEMORY sink (a driver-side collect " +
                s"that dies on maxResultSize at scale); state ops: $ops")
          }
        }
      }
    } finally spark.streams.removeListener(listener)
  }
}
