package graft.access

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stream splitting / teeing — reference `Streaming.TaskPipelineUtils`
  * (STU): `filters` with `a -> Either b c` (split a stream in two,
  * STU:86-89), stacked filters + `Copy` (multi-way split / tee,
  * STU:91-114), `mapCopy` (side-output a transformed copy while the
  * original flows on, STU:119-134), `With`/`mapStreamW` (annotated
  * elements, STU:139-157).
  *
  * Spark shape: N filtered children of ONE cached parent — the parent
  * is evaluated once (memory-and-disk, spill-safe), each branch is a
  * Catalyst-optimizable filter over it. At 100 TB prefer a single
  * pass writing `partitionBy(branch)` (see partitioned writes) when
  * branches all land on disk; the cached-parent form is for branches
  * that continue as live DataFrames.
  */
object Split {

  /** Two-way split by predicate — `Either`-filter semantics: rows
    * where `cond` holds, and the rest (null counts as false). Parent
    * is cached so upstream runs once for both branches. */
  def splitEither(df: DataFrame, cond: Column): (DataFrame, DataFrame) = {
    val parent = df.persist(StorageLevel.MEMORY_AND_DISK)
    (parent.filter(coalesce(cond, lit(false))),
      parent.filter(!coalesce(cond, lit(false))))
  }

  /** Multi-way split: one named branch per predicate, evaluated over a
    * single cached pass of the parent. Branches may overlap and need
    * not cover (reference stacked filters are first-match, see
    * [[splitFirstMatch]] for that semantics). */
  def multiSplit(df: DataFrame, branches: Seq[(String, Column)])
      : Map[String, DataFrame] = {
    val parent = df.persist(StorageLevel.MEMORY_AND_DISK)
    branches.map { case (name, cond) => name -> parent.filter(cond) }.toMap
  }

  /** First-match multi-way split (the reference's stacked-filters
    * semantics: each element goes to the FIRST filter that accepts it;
    * an optional rest-branch catches the remainder). */
  def splitFirstMatch(df: DataFrame, branches: Seq[(String, Column)],
                      restName: Option[String] = None)
      : Map[String, DataFrame] = {
    val parent = df.persist(StorageLevel.MEMORY_AND_DISK)
    val named = branches.zipWithIndex.map { case ((name, cond), i) =>
      val notEarlier = branches.take(i)
        .map(b => !coalesce(b._2, lit(false)))
        .foldLeft(lit(true))(_ && _)
      name -> parent.filter(notEarlier && coalesce(cond, lit(false)))
    }
    val rest = restName.map { rn =>
      val noneMatch = branches.map(b => !coalesce(b._2, lit(false)))
        .foldLeft(lit(true))(_ && _)
      rn -> parent.filter(noneMatch)
    }
    (named ++ rest).toMap
  }

  /** Tee with transform — `mapCopy`: run `side` on a transformed copy
    * (e.g. write it somewhere) and return the original unchanged for
    * the rest of the pipeline. The parent is cached so the side effect
    * and the continuation share one evaluation. */
  def teeThrough(df: DataFrame)(transform: DataFrame => DataFrame)(
      side: DataFrame => Unit): DataFrame = {
    val parent = df.persist(StorageLevel.MEMORY_AND_DISK)
    side(transform(parent))
    parent
  }

  /** Annotated-element map — `With`/`mapStreamW`: apply a column
    * transform to payload columns while key/annotation columns pass
    * through untouched. */
  def mapAnnotated(df: DataFrame, keyCols: Seq[String],
                   payload: Map[String, Column]): DataFrame =
    payload.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
      .select((keyCols ++ payload.keys).map(col): _*)
}
