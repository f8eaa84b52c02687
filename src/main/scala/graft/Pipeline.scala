package graft

import graft.loc.Mappings
import graft.model.Catalog
import graft.task.{PTask, RunCtx}
import org.apache.spark.sql.SparkSession

/** Pipeline entry points — reference Run.hs (`runPipelineTask`,
  * RUN:72-124).
  *
  * Lifecycle (SURVEY §3.1, re-expressed):
  *  1. requirements were already accumulated when the task was composed
  *     (strict Scala: no Writer monad needed);
  *  2. the job spec / mappings bind virtual paths to physical layers;
  *  3. `Mappings.bind` VALIDATES ahead of any job: unbound required
  *     inputs, extension-vs-format clashes (PorcupineTree.hs:647-694);
  *  4. the task runs under a [[RunCtx]]; Catalyst plans lazily per
  *     action as usual.
  */
object Pipeline {

  def run[A, B](spark: SparkSession, task: PTask[A, B],
                mappings: Mappings, input: A,
                cacheRoot: Option[String] = None): B = {
    val bindings = mappings.bind(task.requirements)
    val ctx = RunCtx(spark, task.requirements, bindings, mappings,
      cache = cacheRoot.map(r => graft.cache.Memo(spark, r)))
    task.run(ctx, input)
  }

  /** `show-tree` / describe (reference CLI.hs:393-427): what the
    * pipeline needs, facet-filtered by [[graft.model.ShowOpts]];
    * the `-m` facet resolves locations through `mappings` when given. */
  def describe(task: PTask[_, _], mappings: Option[Mappings] = None,
               opts: graft.model.ShowOpts = graft.model.ShowOpts()): String = {
    val cat = task.requirements
    cat.describe(opts, p => mappings.map { m =>
      m.layersFor(p, cat(p).defaultExt) match {
        case graft.loc.Resolved.Bound(ls) => ls.map(_.toString)
        case graft.loc.Resolved.Unbound   => Seq.empty
      }
    })
  }

  /** Introspection — reference `taskRequirements` (PTask.hs:141-142). */
  def requirements(task: PTask[_, _]): Catalog = task.requirements
}
