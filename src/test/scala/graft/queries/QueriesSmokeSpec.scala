package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every registered query must RUN at sf0.001 — the same smoke the
  * round driver applies, inside the suite so a runtime regression in
  * any query surfaces at `sbt test` time, not at verify time.
  * Correctness (vs the DuckDB oracle) is local_check.py / the driver;
  * this only guards executability and non-empty results.
  *
  * The staged streaming queries (ev*s_) are excluded here — they run
  * the full Structured Streaming machinery and are covered by
  * StreamingQueriesSpec; paying their state-store boot per smoke run
  * would triple the suite's wall time for no added coverage.
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot(_._1.matches("ev\\d+s_.*")) // staged streaming twins
    .foreach { case (name, fn) =>
      test(s"$name runs at sf0.001") {
        // sf0.001 is tiny; similarity/near-dup queries may legitimately
        // emit zero pairs there — the guard is "executes without error",
        // row-count expectations live with the sf0.01 oracle gate
        assert(fn(spark, sf()).count() >= 0)
      }
    }
}
