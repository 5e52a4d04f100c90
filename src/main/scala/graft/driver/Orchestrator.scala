package graft.driver

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{IngestionSpec, RunLog, RunStatus}
import graft.state.LogStore

/** Multi-spec orchestration — the reference's `ThreadPool(cpu_count())
  * .map(load_ingested_data, …)` fan-out (start_ingestion.py:456-465)
  * re-expressed as concurrent Spark actions in ONE SparkSession.
  *
  * Each spec's lifecycle (IngestionRun) is submitted as a Future; Spark's
  * scheduler interleaves their jobs across the executor pool (enable the
  * FAIR scheduler for true round-robin on a busy cluster). Failures are
  * contained per spec — one table's exception logs `extraction-failure`
  * and doesn't stall the rest, matching the reference's per-thread
  * try/except (ingest_mysql_data.py:610-643).
  */
final class Orchestrator(spark: SparkSession, lakeRoot: String, logStore: LogStore,
                         parallelism: Int = 8) {

  private val run = new IngestionRun(spark, lakeRoot, logStore)

  /** Run every active spec against its source frame; returns per-spec
    * final status (the reference's merged status dict,
    * start_ingestion.py:467-470).
    */
  def runAll(specs: Seq[IngestionSpec], sourceFor: IngestionSpec => DataFrame): Map[Long, String] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = specs.filter(_.activeIndicator == 1).map { spec =>
        Future {
          Try(run.run(spec, sourceFor(spec))) match {
            case Success(logs) => spec.lakeIngestionId -> logs.last.executionStatus
            case Failure(e) =>
              logStore.append(Seq(RunLog(spec.lakeIngestionId, RunStatus.ExtractionFailure,
                "", "", 0L, 0L, s"exception-occured: ${e.getMessage}", LogStore.now())))
              spec.lakeIngestionId -> RunStatus.ExtractionFailure
          }
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf).toMap
    } finally pool.shutdown()
  }
}
