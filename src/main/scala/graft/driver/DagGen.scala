package graft.driver

import org.apache.spark.sql.DataFrame

import graft.model.{IngestionSpec, RunStatus}

/** DAG/schedule generation from the ingestion config — the reference's
  * dag_lif.py:12-95: group specs into named DAGs, each DAG a chain of
  * ordered STAGES whose tasks fan out in parallel
  * (`start >> [stage tasks] >> end_N >> ...`), with an optional
  * dependency on another DAG (the ExternalTaskSensor).
  *
  * Two consumers:
  *  - [[render]] emits the schedule structure as JSON for an external
  *    scheduler (the reference's dag_dict, minus the Airflow objects —
  *    operator construction belongs to the scheduler, not the engine);
  *  - [[executeAll]] runs the same structure in-engine: DAGs in
  *    dependency order, stages sequentially, specs within a stage
  *    fanned out through [[Orchestrator]]. A failed stage halts the
  *    DAG's later stages; a failed DAG skips its dependents — the
  *    sensor semantics, locally.
  */
object DagGen {

  final case class DagStage(order: Int, specs: Seq[IngestionSpec])
  final case class DagPlan(group: String, schedule: String,
                           dependsOn: Option[String], stages: Seq[DagStage])

  /** Group specs by `dagGroup` into ordered stages. `stageOf` assigns a
    * spec's stage (reference: the config's task_order column; default =
    * one parallel stage, its common case). Only active specs plan.
    */
  def plan(specs: Seq[IngestionSpec], schedule: String = "0 8 * * *",
           stageOf: IngestionSpec => Int = _ => 1,
           dependsOn: Map[String, String] = Map.empty): Seq[DagPlan] =
    specs.filter(_.activeIndicator == 1).groupBy(_.dagGroup).toSeq
      .sortBy(_._1)
      .map { case (group, ss) =>
        val stages = ss.groupBy(stageOf).toSeq.sortBy(_._1)
          .map { case (o, s) => DagStage(o, s.sortBy(_.lakeIngestionId)) }
        DagPlan(group, schedule, dependsOn.get(group), stages)
      }

  /** The reference's dag_dict as JSON (tasks keyed by stage order,
    * valued by table names — dag_lif.py:66-88).
    */
  def render(plans: Seq[DagPlan]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    plans.map { p =>
      val tasks = p.stages
        .map(st => q(st.order.toString) + ":" +
          st.specs.map(s => q(s.tablename)).mkString("[", ",", "]"))
        .mkString("{", ",", "}")
      s"""{"dag_name":${q(p.group)},"schedule":${q(p.schedule)},"dependent_dag":${q(p.dependsOn.getOrElse("None"))},"tasks":$tasks}"""
    }.mkString("[", ",", "]")
  }

  /** Topologically order plans by their dependsOn edges; cycles AND
    * dangling dependencies are config errors and fail loudly (a typo'd
    * or all-inactive upstream silently treated as satisfied would run
    * the dependent DAG against a lake its prerequisite never populated —
    * the ExternalTaskSensor this models blocks instead).
    */
  def topoOrder(plans: Seq[DagPlan]): Seq[DagPlan] = {
    val byName = plans.map(p => p.group -> p).toMap
    plans.foreach(p => p.dependsOn.foreach(d =>
      require(byName.contains(d),
        s"DAG '${p.group}' depends on '$d', which has no planned (active) specs")))
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    def visit(p: DagPlan, path: List[String]): Unit = {
      if (seen(p.group)) return
      if (path.contains(p.group))
        throw new IllegalArgumentException(
          s"dependency cycle: ${(p.group :: path).reverse.mkString(" -> ")}")
      p.dependsOn.flatMap(byName.get).foreach(visit(_, p.group :: path))
      seen += p.group
    }
    plans.foreach(visit(_, Nil))
    seen.toSeq.map(byName)
  }

  private def ok(status: String): Boolean =
    status == RunStatus.Success || status == RunStatus.NoData

  /** Run one DAG: stages in order through the Orchestrator; a stage with
    * any failure halts the rest (`start >> tasks >> end` chain
    * semantics). Returns spec id → final status ("skipped:..." for specs
    * never attempted).
    */
  def executeStages(orch: Orchestrator, dag: DagPlan,
                    sourceFor: IngestionSpec => DataFrame): Map[Long, String] = {
    val out = scala.collection.mutable.Map[Long, String]()
    var halted = false
    dag.stages.foreach { st =>
      if (halted)
        st.specs.foreach(s => out(s.lakeIngestionId) = "skipped:upstream-stage-failed")
      else {
        val res = orch.runAll(st.specs, sourceFor)
        out ++= res
        if (!res.values.forall(ok)) halted = true
      }
    }
    out.toMap
  }

  /** Run every DAG in dependency order; a DAG whose dependency failed is
    * skipped entirely (sensor-that-never-fires semantics).
    */
  def executeAll(orch: Orchestrator, plans: Seq[DagPlan],
                 sourceFor: IngestionSpec => DataFrame): Map[Long, String] = {
    val dagOk = scala.collection.mutable.Map[String, Boolean]()
    val out = scala.collection.mutable.Map[Long, String]()
    topoOrder(plans).foreach { dag =>
      if (dag.dependsOn.exists(d => !dagOk.getOrElse(d, true))) {
        dag.stages.flatMap(_.specs)
          .foreach(s => out(s.lakeIngestionId) = "skipped:dependent-dag-failed")
        dagOk(dag.group) = false
      } else {
        val res = executeStages(orch, dag, sourceFor)
        out ++= res
        dagOk(dag.group) = res.values.forall(ok)
      }
    }
    out.toMap
  }
}
